package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorOps.{cosine, simRank7}

/** INCREMENTALLY MAINTAINED IVF index — the persisted, cell-partitioned
  * ANN index (see `ann_ivf_topk` in SimilaritySearch, and
  * [[Bucketing.writePartitioned]] for the layout idea) composed with a
  * changelog upsert, so vector inserts/deletes rewrite ONLY the cells
  * they touch instead of rebuilding the corpus.
  *
  * Layout: `path/cent_id=<cell>/…` parquet (partition pruning gives a
  * probe its corpus/C × nprobe scan), plus the FROZEN coarse quantizer
  * at `path/_centroids` (underscore-prefixed → invisible to Spark
  * reads of `path`). Freezing the quantizer at build time is the
  * standard IVF maintenance contract: assignments stay consistent
  * across any number of upserts, and retraining the quantizer is
  * explicitly a [[build]] (rebuild) — otherwise every centroid move
  * would invalidate every cell.
  *
  * Changelog contract (mirrors the delta engine's signed events):
  * `(vec_id, v, tag)` with tag +1 insert / −1 delete; DELETES CARRY
  * THE VECTOR (it routes the event to its cell — the CDC shape, where
  * the before-image is on the wire). An insert REPLACES any existing
  * row with the same vec_id in an affected cell; an update whose
  * VALUE moves cells must ship delete(old v) + insert(new v), which
  * routes to both cells. Identical duplicate events collapse
  * (idempotent under upsert semantics).
  *
  * 100 TB shape: routing is a constant-size broadcast of the centroid
  * set; the rewrite reads only the affected cells' partitions
  * (partition-pruned scan) and dynamic partition overwrite
  * (`partitionOverwriteMode=dynamic`, set per-write, never on the
  * session) replaces only the partitions present in the output. The
  * one driver-side collect is the affected-cell id list — bounded by
  * the CELL COUNT (a parameter, ≈√n), not the data. Cells whose rows
  * all net away are cleared explicitly (dynamic overwrite cannot
  * write an empty partition). In production the staging hop for the
  * read-then-overwrite cycle would be a table format's (Delta/Iceberg)
  * transaction; here `localCheckpoint` materializes the affected
  * cells' new contents (bounded by the touched data, not the corpus)
  * before the overwrite deletes the files they came from.
  */
object IvfIndex {

  private def centroidsPath(path: String) = s"$path/_centroids"

  /** Nearest frozen centroid per distinct event `(vec_id, tag, v)` —
    * constant-size broadcast, rank on [[simRank7]] so a last-ulp
    * cosine flip cannot move a vector across a cell boundary
    * non-reproducibly. */
  private[graft] def route(events: DataFrame, cents: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id"), col("tag"), col("v"))
      .orderBy(simRank7(cosine(col("v"), col("cv"))).desc, col("cent_id"))
    events.join(broadcast(cents))
      .withColumn("__r", row_number().over(w)).filter(col("__r") === 1)
      .select(col("vec_id"), col("v"), col("tag"), col("cent_id"))
  }

  /** Build (or rebuild) the index: freeze the quantizer
    * ([[graft.operators.SimilaritySearch.seedCentroids]] — bounded,
    * deterministic), assign, write cell-partitioned. `vectors` is
    * `(vec_id, v: array<double>)`. */
  def build(vectors: DataFrame, path: String, cells: Int): Unit = {
    val cents = graft.operators.SimilaritySearch.seedCentroids(vectors, cells)
      .localCheckpoint(true) // reused for assignment AFTER the path overwrite
    // index first (overwrite truncates `path`), THEN the quantizer
    // under it — later dynamic-overwrite upserts replace only
    // cent_id=… partitions and never touch _centroids
    route(vectors.withColumn("tag", lit(1)), cents)
      .drop("tag")
      .write.mode(SaveMode.Overwrite).partitionBy("cent_id").parquet(path)
    cents.write.mode(SaveMode.Overwrite).parquet(centroidsPath(path))
  }

  /** The frozen coarse quantizer persisted by [[build]]. */
  def centroids(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(centroidsPath(path))

  /** The whole index (probe via [[Bucketing.readPartition]] for the
    * pruned per-cell read). Partition-value inference types the
    * directory column as int — cast back to the quantizer's long. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).withColumn("cent_id", col("cent_id").cast("long"))

  /** INDEX-QUALITY maintenance: split every cell holding more than
    * `maxRows` vectors into `subCells` sub-cells — the drift story
    * [[upsert]] alone cannot tell: membership maintenance keeps cells
    * CORRECT while inserts concentrate into hot cells until a probe's
    * corpus/C × nprobe contract is broken; the split restores it.
    *
    * The split is LOCAL (the standard no-global-retrain contract):
    * sub-seeds are chosen INSIDE the oversized cell by the same
    * deterministic md5-of-id rule as [[graft.operators.SimilaritySearch.seedCentroids]]
    * (current centroid ids excluded so cell directory names stay
    * unique), only that cell's members re-assign (routed by the same
    * [[graft.functions.VectorOps.simRank7]] key as [[route]]), and
    * every other cell's assignment is untouched — so the index
    * remains an exact partition of the corpus and time/work is
    * bounded by the oversized cells' data, not the index. Retraining
    * the coarse quantizer globally remains an explicit [[build]].
    *
    * Returns the cell ids that were split. */
  def resplit(spark: SparkSession, path: String, maxRows: Long, subCells: Int = 2): Seq[Long] = {
    require(subCells >= 2, s"subCells must be >= 2, got $subCells")
    val cents = centroids(spark, path).localCheckpoint(true)
    val oversized0: Seq[Long] = read(spark, path).groupBy("cent_id").count()
      .filter(col("count") > maxRows)
      .select("cent_id").collect().map(_.getLong(0)).toSeq.sorted
    if (oversized0.isEmpty) return Nil
    val members0 = Bucketing.readPartition(spark, path, "cent_id", oversized0)
      .select(col("vec_id"), col("v"), col("cent_id").cast("long").as("old_cent"))
      .localCheckpoint(true)
    // sub-seeds per cell: the seedCentroids rule applied within the cell
    val seedW = Window.partitionBy(col("old_cent"))
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
    val subs = members0
      .join(broadcast(cents.select(col("cent_id").as("__taken"))),
        col("vec_id") === col("__taken"), "left_anti")
      .withColumn("__r", row_number().over(seedW)).filter(col("__r") <= subCells)
      .select(col("old_cent"), col("vec_id").as("new_cent"), col("v").as("cv"))
      .localCheckpoint(true)
    // a degenerate cell that cannot yield a full seed set (members are
    // all existing centroid ids) is left unsplit rather than shrunk
    val splittable: Seq[Long] = subs.groupBy("old_cent").count()
      .filter(col("count") === subCells)
      .select("old_cent").collect().map(_.getLong(0)).toSeq.sorted
    if (splittable.isEmpty) return Nil
    val members = members0.filter(col("old_cent").isin(splittable.map(Long.box): _*))
    val picked = subs.filter(col("old_cent").isin(splittable.map(Long.box): _*))
      .withColumnRenamed("old_cent", "sub_old")
    // each member re-routes among ITS OWN cell's sub-seeds
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(simRank7(cosine(col("v"), col("cv"))).desc, col("new_cent"))
    val newRows = members.join(broadcast(picked), col("old_cent") === col("sub_old"))
      .withColumn("__r", row_number().over(w)).filter(col("__r") === 1)
      .select(col("vec_id"), col("v"), col("new_cent").as("cent_id"))
      .localCheckpoint(true) // materialized before the overwrite below
    val newCents = cents.filter(!col("cent_id").isin(splittable.map(Long.box): _*))
      .unionByName(picked.select(col("new_cent").as("cent_id"), col("cv")))
      .localCheckpoint(true)
    newRows.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("cent_id").parquet(path)
    val conf = spark.sparkContext.hadoopConfiguration
    splittable.foreach { c =>
      val dir = new org.apache.hadoop.fs.Path(s"$path/cent_id=$c")
      val fs = dir.getFileSystem(conf)
      fs.delete(dir, true): Unit
    }
    newCents.write.mode(SaveMode.Overwrite).parquet(centroidsPath(path))
    splittable
  }

  /** POST-UPSERT maintenance hook — [[resplit]] wired into the
    * maintained path: when ingestion has pushed any cell past the
    * RELATIVE bound (corpus/`denom` — relative, so the check stays
    * meaningful as the corpus grows), split it locally. Returns the
    * split cell ids (empty when every cell is within bound). Cost:
    * one metadata count + the resplit's own oversized-cell work —
    * O(hot cells' data), never the index. A maintained ingest loop
    * calls this after its upserts, restoring the corpus/C × nprobe
    * probe contract that a mass-concentrating changelog erodes. */
  def maintain(spark: SparkSession, path: String, denom: Long,
               subCells: Int = 2): Seq[Long] = {
    val total = read(spark, path).count()
    if (total == 0) Nil else resplit(spark, path, total / denom, subCells)
  }

  /** Apply a `(vec_id, v, tag)` changelog to the index, rewriting only
    * the affected cells. */
  def upsert(spark: SparkSession, path: String, changelog: DataFrame): Unit = {
    val cents = centroids(spark, path)
    val routed = route(changelog.select("vec_id", "v", "tag"), cents)
      .localCheckpoint(true) // routing reused 3× below; also cuts lineage
    // affected cells: bounded by the cell count (quantizer parameter),
    // so this collect is constant-size — same justification as the
    // constant-broadcast allowlist in RelationalSpec's plan audit
    val cells: Seq[Long] = routed.select("cent_id").distinct()
      .collect().map(_.getLong(0)).toSeq
    if (cells.isEmpty) return
    // partition-pruned read of ONLY the affected cells; keep rows not
    // touched by any event, then add the inserts (replace semantics)
    val existing = Bucketing.readPartition(spark, path, "cent_id", cells)
      .select(col("vec_id"), col("v"), col("cent_id").cast("long").as("cent_id"))
    val touched = routed.select("vec_id").distinct()
    val newRows = existing.join(touched, Seq("vec_id"), "left_anti")
      .unionByName(routed.filter(col("tag") > 0).select("vec_id", "v", "cent_id"))
      // materialize BEFORE the overwrite below deletes the files this
      // plan reads (bounded by the affected cells' data)
      .localCheckpoint(true)
    val written: Set[Long] = newRows.select("cent_id").distinct()
      .collect().map(_.getLong(0)).toSet
    if (written.nonEmpty)
      newRows.write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("cent_id").parquet(path)
    // a cell whose rows all netted away never appears in newRows, so
    // dynamic overwrite leaves its stale files — clear it explicitly
    val emptied = cells.filterNot(written)
    if (emptied.nonEmpty) {
      val conf = spark.sparkContext.hadoopConfiguration
      emptied.foreach { c =>
        val dir = new org.apache.hadoop.fs.Path(s"$path/cent_id=$c")
        val fs = dir.getFileSystem(conf)
        fs.delete(dir, true): Unit
      }
    }
  }
}
