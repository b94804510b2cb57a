package graft

import org.apache.spark.sql.SparkSessionExtensions

/** The library's `SparkSessionExtensions` entry point:
  * `--conf spark.sql.extensions=graft.GraftExtensions` makes every
  * native expression ([[graft.functions.GraftFunctions.all]])
  * available to SQL text in the session. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.GraftFunctions.inject(ext)
}
