package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}
import graft.GraftQuery.{rowsOnly, sql}

/** Multimodal-column plumbing: image/audio/video payloads modeled as
  * opaque `binary` columns with typed metadata, processed by
  * per-partition batch operators.
  *
  * The container has no image/audio libraries, so the DECODE step is a
  * clearly-marked deterministic STUB ([[MediaStub]]); everything
  * around it — schema, binary encoding, partition-batched iteration,
  * frame-sampling fan-out, feature schema — is real and tested. In
  * production the stub body is replaced by the actual codec call; the
  * Spark plumbing (a `mapPartitions` over a typed Dataset, so the
  * codec context is initialized once per partition, not per row — the
  * Scala analogue of `mapInPandas` batching) does not change.
  *
  * Scale: decode is the canonical CPU-heavy embarrassingly-parallel
  * stage. No shuffle anywhere in this module; payload bytes stream
  * straight from the parquet scan through the partition iterator.
  * `spark.sql.files.maxPartitionBytes` controls batch granularity at
  * 100 TB.
  */
object Multimodal {

  /** A media payload: the binary column + carried metadata. */
  final case class MediaAsset(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Output schema of the (stubbed) decoder. */
  final case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Int,
                                 width: Int, height: Int, mean_luma: Double)

  /** One sampled "frame". */
  final case class FrameSample(doc_id: Long, frame_idx: Int, byte_offset: Int, frame_hash: Long)

  /** A resized payload (thumbnail): target dims + new bytes. */
  final case class ResizedAsset(doc_id: Long, media_type: String,
                                target_w: Int, target_h: Int, payload: Array[Byte])

  /** STUB decoder — deterministic fake features derived from the raw
    * bytes. Replace `decode` with the real codec (e.g. javax.imageio /
    * ffmpeg JNI) in production; signature and call pattern stay. */
  object MediaStub {
    def decode(a: MediaAsset): MediaFeatures = {
      val n = a.payload.length
      // ??? real codec goes here — below is a deterministic fake
      val width = 64 + (n % 448)
      val height = 64 + ((n * 7) % 448)
      val luma = if (n == 0) 0.0
        else a.payload.iterator.map(b => (b & 0xff).toDouble).sum / n / 255.0
      MediaFeatures(a.doc_id, a.media_type, n, width, height, luma)
    }

    /** STUB resize — strided byte sampling to exactly w·h output
      * bytes (a real implementation decodes, scales, re-encodes; the
      * deterministic fake keeps the contract: output size is a pure
      * function of the target dims). */
    def resize(a: MediaAsset, w: Int, h: Int): ResizedAsset = {
      val n = a.payload.length
      val out = new Array[Byte](w * h)
      // ??? real scaler goes here — below is a deterministic fake
      var i = 0
      while (i < out.length) {
        out(i) = if (n == 0) 0 else a.payload((i.toLong * n / out.length).toInt)
        i += 1
      }
      ResizedAsset(a.doc_id, a.media_type, w, h, out)
    }

    def sampleFrames(a: MediaAsset, frames: Int): Seq[FrameSample] = {
      val n = a.payload.length
      (0 until frames).map { i =>
        val off = if (n == 0) 0 else (i.toLong * n / frames).toInt
        val h = graft.functions.RollingHash.hashBytes(
          a.payload.slice(off, math.min(off + 16, n)))
        FrameSample(a.doc_id, i, off, h)
      }
    }
  }

  /** documents → media assets (text bytes stand in for image bytes). */
  def assets(s: SparkSession, dir: String): Dataset[MediaAsset] = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), lit("image/stub").as("media_type"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaAsset]
  }

  /** Partition-batched decode — codec init happens once per partition
    * inside the iterator wrapper, the `mapInPandas` idiom in Scala. */
  def extractFeatures(ds: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition codec initialization would go here
      it.map(MediaStub.decode)
    }
  }

  def sampleFrames(ds: Dataset[MediaAsset], frames: Int): Dataset[FrameSample] = {
    import ds.sparkSession.implicits._
    ds.flatMap(MediaStub.sampleFrames(_, frames))
  }

  def resizeAll(ds: Dataset[MediaAsset], w: Int, h: Int): Dataset[ResizedAsset] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition scaler initialization would go here
      it.map(MediaStub.resize(_, w, h))
    }
  }

  val defs: Seq[GraftQuery] = Seq(

    // Binary-column metadata — fully SQL-expressible, oracle-checked:
    // byte length and content digest of the payload must round-trip
    // identically through Spark's binary encode and DuckDB's.
    sql("multimodal_meta",
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        | sha256(text) AS payload_sha,
        | 64 + octet_length(encode(text)) % 448 AS width,
        | 64 + (octet_length(encode(text)) * 7) % 448 AS height
        |FROM documents""".stripMargin) {
      (s, d) => Tables.documents(s, d).select(
        col("doc_id"),
        octet_length(encode(col("text"), "UTF-8")).as("n_bytes"),
        sha2(encode(col("text"), "UTF-8"), 256).as("payload_sha"),
        (lit(64) + octet_length(encode(col("text"), "UTF-8")) % 448).as("width"),
        (lit(64) + (octet_length(encode(col("text"), "UTF-8")) * 7) % 448).as("height"))
    },

    // The stubbed decode pipeline (JVM-side stub → no SQL oracle;
    // covered by MultimodalSpec instead).
    rowsOnly("multimodal_features") {
      (s, d) => extractFeatures(assets(s, d)).toDF()
    },

    rowsOnly("multimodal_frame_sample") {
      (s, d) => sampleFrames(assets(s, d), frames = 8).toDF()
    },

    rowsOnly("multimodal_resize") {
      (s, d) => resizeAll(assets(s, d), w = 32, h = 32).toDF()
        .select(col("doc_id"), col("target_w"), col("target_h"),
          octet_length(col("payload")).as("n_bytes"))
    })
}
