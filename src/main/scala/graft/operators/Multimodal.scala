package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}
import graft.GraftQuery.sql

/** Multimodal-column plumbing: image/audio/video payloads modeled as
  * opaque `binary` columns with typed metadata, processed by
  * per-partition batch operators.
  *
  * IMAGE decode and resize are REAL: [[MediaCodec]] sniffs the payload
  * magic bytes and runs the JDK's built-in `javax.imageio` (PNG, BMP,
  * JPEG, GIF — no external libraries) for true width/height/luma and a
  * bilinear rescale re-encoded as PNG. Payloads that aren't a
  * supported image (this fixture carries text bytes) fall back to the
  * deterministic [[MediaStub]], so the pipeline is total either way.
  * Video frame-sampling stays a declared stub — the JDK ships no video
  * codec; the byte-offset sampling keeps the contract and shape.
  *
  * Scale: decode is the canonical CPU-heavy embarrassingly-parallel
  * stage. No shuffle anywhere in this module; payload bytes stream
  * straight from the parquet scan through the partition iterator
  * (`mapPartitions`, so codec init happens once per partition — the
  * Scala analogue of `mapInPandas` batching).
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
    * bytes; the fallback [[MediaCodec]] uses when the payload is not a
    * decodable image (and the only path for video, which the JDK has
    * no codec for). */
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

  /** REAL image codec on the JDK's javax.imageio — decode, luma and
    * bilinear resize for PNG/BMP/JPEG/GIF payloads, identified by
    * MAGIC BYTES (metadata is advisory; bytes are the truth). Anything
    * else falls back to [[MediaStub]]. */
  object MediaCodec {
    import java.awt.image.BufferedImage
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.ImageIO

    /** Magic-byte sniff. None = not an image this JVM can decode. */
    def sniff(p: Array[Byte]): Option[String] = {
      def at(i: Int, v: Int) = i < p.length && (p(i) & 0xff) == v
      if (at(0, 0x89) && at(1, 'P') && at(2, 'N') && at(3, 'G')) Some("image/png")
      else if (at(0, 'B') && at(1, 'M')) Some("image/bmp")
      else if (at(0, 0xff) && at(1, 0xd8)) Some("image/jpeg")
      else if (at(0, 'G') && at(1, 'I') && at(2, 'F')) Some("image/gif")
      else None
    }

    private def read(p: Array[Byte]): Option[BufferedImage] =
      try Option(ImageIO.read(new ByteArrayInputStream(p)))
      catch { case _: Exception => None }

    /** Mean Rec.601 luma in [0, 1] over all pixels. */
    private def meanLuma(img: BufferedImage): Double = {
      var sum = 0.0
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
          sum += 0.299 * r + 0.587 * g + 0.114 * b
          x += 1
        }
        y += 1
      }
      sum / (img.getWidth.toLong * img.getHeight) / 255.0
    }

    def decode(a: MediaAsset): MediaFeatures = sniff(a.payload) match {
      case Some(fmt) => read(a.payload) match {
        case Some(img) =>
          MediaFeatures(a.doc_id, fmt, a.payload.length,
            img.getWidth, img.getHeight, meanLuma(img))
        case None => MediaStub.decode(a) // sniffed but corrupt → stub
      }
      case None => MediaStub.decode(a)
    }

    /** Real bilinear rescale, re-encoded as PNG. */
    def resize(a: MediaAsset, w: Int, h: Int): ResizedAsset =
      sniff(a.payload).flatMap(_ => read(a.payload)) match {
        case Some(img) =>
          val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
          val g2 = out.createGraphics()
          try {
            g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g2.drawImage(img, 0, 0, w, h, null)
          } finally g2.dispose()
          val bos = new ByteArrayOutputStream()
          ImageIO.write(out, "png", bos)
          ResizedAsset(a.doc_id, "image/png", w, h, bos.toByteArray)
        case None => MediaStub.resize(a, w, h)
      }
  }

  /** Decoded audio features (see [[AudioCodec]]). */
  final case class AudioFeatures(doc_id: Long, sample_rate: Long, channels: Long,
                                 bits: Long, n_samples: Long, duration_ms: Long,
                                 peak: Long, rms: Double)

  /** REAL audio plumbing — RIFF/WAV is a pure byte format, so unlike
    * video there is no codec to stub: [[writeWav]] emits a canonical
    * 44-byte-header PCM file and [[decode]] is a proper CHUNK WALKER
    * (validates RIFF/WAVE magics, scans chunk-by-chunk to `fmt ` and
    * `data` wherever they sit, honors word-aligned chunk padding)
    * rather than a fixed-offset peek — extra chunks (LIST/INFO
    * metadata) parse correctly. Features: stream params from `fmt `,
    * peak and RMS from the decoded little-endian int16 samples. */
  object AudioCodec {
    def writeWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
      val dataLen = samples.length * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1) // PCM, mono
        .putInt(sampleRate).putInt(sampleRate * 2)
        .putShort(2).putShort(16) // block align, bits
      bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
      samples.foreach(bb.putShort)
      bb.array()
    }

    def decode(id: Long, bytes: Array[Byte]): AudioFeatures = {
      val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def ascii(n: Int): String = {
        val a = new Array[Byte](n); bb.get(a); new String(a, "US-ASCII")
      }
      require(ascii(4) == "RIFF", s"doc $id: not a RIFF file")
      bb.getInt // declared riff size (unused; chunk walk is authoritative)
      require(ascii(4) == "WAVE", s"doc $id: not a WAVE stream")
      var rate = 0; var channels = 0; var bits = 0
      var samples: Array[Short] = null
      while (bb.remaining() >= 8 && (rate == 0 || samples == null)) {
        val cid = ascii(4)
        val len = bb.getInt
        require(len >= 0, s"doc $id: corrupt chunk '$cid' with negative length $len")
        val next = bb.position() + len + (len & 1) // chunks are word-aligned
        cid match {
          case "fmt " =>
            val fmt = bb.getShort
            require(fmt == 1, s"doc $id: not PCM (fmt $fmt)")
            channels = bb.getShort
            rate = bb.getInt
            bb.getInt; bb.getShort // byte rate, block align
            bits = bb.getShort
          case "data" =>
            samples = new Array[Short](len / 2)
            bb.asShortBuffer().get(samples)
          case _ => // skip LIST/INFO/etc.
        }
        bb.position(math.min(next, bytes.length))
      }
      require(rate > 0 && samples != null, s"doc $id: missing fmt /data chunk")
      // validated AFTER the walk: with data-before-fmt layouts the bit
      // depth is only known once both chunks parsed — checking inside
      // the data case would silently int16-decode an 8/24-bit stream
      require(bits == 16, s"doc $id: only 16-bit PCM supported, got $bits")
      var peak = 0L
      var sumSq = 0.0
      samples.foreach { v =>
        val a = math.abs(v.toLong)
        if (a > peak) peak = a
        sumSq += v.toDouble * v.toDouble
      }
      val n = samples.length.toLong
      AudioFeatures(id, rate.toLong, channels.toLong, bits.toLong, n,
        n * 1000L / rate, peak,
        if (n == 0) 0.0 else math.sqrt(sumSq / n))
    }
  }

  /** Deterministic synthetic WAV per document: a ±A square wave whose
    * amplitude, length, and half-period are pure functions of doc_id,
    * written by the real RIFF writer in-query. A square wave's peak
    * AND RMS are exactly A (A² and n·A² are sub-2^53 integers, the
    * division is exact, IEEE sqrt of an exact square is exact), so
    * the real parser's output is closed-form SQL per doc_id — the
    * audio twin of [[synthAssets]]'s PNG trick. */
  def synthWavAssets(s: SparkSession, dir: String): Dataset[MediaAsset] = {
    import s.implicits._
    Tables.documents(s, dir).select(col("doc_id")).as[Long].map { id =>
      val n = (800 + id % 800).toInt
      val amp = (1000 + id * 13 % 20000).toInt
      val half = (1 + id % 7).toInt
      val samples = Array.tabulate(n)(i =>
        (if ((i / half) % 2 == 0) amp else -amp).toShort)
      MediaAsset(id, "audio/wav", AudioCodec.writeWav(samples, sampleRate = 8000))
    }
  }

  def extractAudioFeatures(ds: Dataset[MediaAsset]): Dataset[AudioFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map(a => AudioCodec.decode(a.doc_id, a.payload)))
  }

  /** Deterministic synthetic PNG per document: a solid-color image
    * whose dims and RGB are pure functions of doc_id, encoded by the
    * real codec in-query. PNG is lossless, so the REAL decode's
    * width/height/mean-luma become SQL-expressible constants per
    * doc_id — this is what puts `javax.imageio` behind the hash gate.
    * (The luma oracle is FP-safe: luma·10⁶ has fractional part a
    * multiple of 5/255, never within 0.0098 of the rounding boundary,
    * while the codec-vs-formula FP difference is ~1e-13.) */
  def synthAssets(s: SparkSession, dir: String): Dataset[MediaAsset] = {
    import s.implicits._
    Tables.documents(s, dir).select(col("doc_id")).as[Long].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { id =>
        val w = (8 + id % 24).toInt
        val h = (8 + (id * 3) % 24).toInt
        val rgb = ((id * 37 % 256) << 16 | (id * 59 % 256) << 8 | (id * 83 % 256)).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        MediaAsset(id, "image/png", bos.toByteArray)
      }
    }
  }

  /** Deterministic synthetic GRADIENT PNG per document, for the
    * perceptual-hash entry: 18×16 gray pixels
    * `v(x, y) = ((id%40)·31 + x·7 + y·11) % 200 + id%3` — the image
    * CONTENT is a pure function of `id % 40` (the near-dup group) and
    * the `id % 3` term is a constant brightness offset, which a
    * difference hash cancels by construction. Gray means r=g=b=v, so
    * integer Rec.601 luma `(299r+587g+114b)/1000` is EXACTLY v and the
    * real decode's dHash equals the oracle's closed-form one. */
  def synthGradAssets(s: SparkSession, dir: String): Dataset[MediaAsset] = {
    import s.implicits._
    Tables.documents(s, dir).select(col("doc_id")).as[Long].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { id =>
        val img = new java.awt.image.BufferedImage(
          18, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < 16) {
          var x = 0
          while (x < 18) {
            val v = (((id % 40) * 31 + x * 7 + y * 11) % 200 + id % 3).toInt
            img.setRGB(x, y, v << 16 | v << 8 | v)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        MediaAsset(id, "image/png", bos.toByteArray)
      }
    }
  }

  /** 63-bit DIFFERENCE HASH (dHash) of a decoded image — all integer
    * arithmetic, so the value is exact and cross-engine mirrorable:
    * integer Rec.601 luma per pixel, 2×2 mean-pool to a 9×8 cell grid
    * (`//4` — our own pooling, not the codec's resampler, precisely so
    * the oracle can reproduce it), bit `i = cy·8+cx` set when
    * `cell(cx,cy) < cell(cx+1,cy)`, bits 0..62 only (bit 63 would make
    * the BIGINT negative and poison shift/band arithmetic). Brightness
    * shifts cancel: pooling a +k image yields +k cells, and the
    * comparisons are translation-invariant — the property that makes
    * dHash a PERCEPTUAL (not exact) fingerprint. */
  def dHash63(img: java.awt.image.BufferedImage): Long = {
    require(img.getWidth == 18 && img.getHeight == 16,
      s"dHash63 pools a fixed 18x16 frame, got ${img.getWidth}x${img.getHeight}")
    def luma(x: Int, y: Int): Long = {
      val p = img.getRGB(x, y)
      (299L * ((p >> 16) & 255) + 587L * ((p >> 8) & 255) + 114L * (p & 255)) / 1000L
    }
    def cell(cx: Int, cy: Int): Long =
      (luma(2 * cx, 2 * cy) + luma(2 * cx + 1, 2 * cy) +
        luma(2 * cx, 2 * cy + 1) + luma(2 * cx + 1, 2 * cy + 1)) / 4L
    var h = 0L
    var cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 8) {
        val i = cy * 8 + cx
        if (i < 63 && cell(cx, cy) < cell(cx + 1, cy)) h |= 1L << i
        cx += 1
      }
      cy += 1
    }
    h
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
      // per-partition codec init: disk-cache off once, not per image
      javax.imageio.ImageIO.setUseCache(false)
      it.map(MediaCodec.decode)
    }
  }

  def sampleFrames(ds: Dataset[MediaAsset], frames: Int): Dataset[FrameSample] = {
    import ds.sparkSession.implicits._
    ds.flatMap(MediaStub.sampleFrames(_, frames))
  }

  def resizeAll(ds: Dataset[MediaAsset], w: Int, h: Int): Dataset[ResizedAsset] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map(MediaCodec.resize(_, w, h))
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

    // REAL image decode behind the hash gate: payloads are PNGs the
    // codec itself encoded in-query ([[synthAssets]]), so the decoded
    // width/height/luma must equal the oracle's closed-form values —
    // any codec, sniff, or luma drift fails the hash. (n_bytes is the
    // PNG encoder's output size — encoder-dependent, so not part of
    // the oracle projection.)
    sql("multimodal_features",
      """SELECT doc_id, 'image/png' AS media_type,
        | CAST(8 + doc_id % 24 AS BIGINT) AS width,
        | CAST(8 + (doc_id * 3) % 24 AS BIGINT) AS height,
        | FLOOR((0.299 * (doc_id * 37 % 256) + 0.587 * (doc_id * 59 % 256)
        |   + 0.114 * (doc_id * 83 % 256)) / 255 * 1000000 + 0.5) / 1000000 AS mean_luma
        |FROM documents""".stripMargin) {
      (s, d) =>
        import graft.functions.VectorOps.floorRound6
        extractFeatures(synthAssets(s, d)).toDF()
          .select(col("doc_id"), col("media_type"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height"),
            floorRound6(col("mean_luma")).as("mean_luma"))
    },

    // PERCEPTUAL-HASH IMAGE DEDUP — the multimodal near-dup pipeline:
    // REAL PNG decode → integer dHash (2×2 mean-pool, 63 comparison
    // bits) → 16-bit LSH bands → band equi-join candidates → hamming
    // confirm (never all-pairs — the same blocking discipline as
    // every dedup entry). The synthetic gradients group by id%40 with
    // an id%3 brightness offset the dHash must CANCEL (translation
    // invariance is the perceptual property under test); the oracle
    // computes the identical hash from the closed-form pixel formula
    // WITHOUT decoding, so codec, luma, pooling or banding drift all
    // fail the value hash. At corpus scale: hash is per-image map
    // work, candidates partition by (band, value), the confirm is one
    // xor+popcount per candidate pair.
    sql("multimodal_phash_dedup",
      """WITH ids AS (SELECT doc_id AS id FROM documents),
        |cells AS (
        | SELECT id, cx.cx AS cx, cy.cy AS cy,
        |  ((((id%40)*31 + (2*cx.cx)*7   + (2*cy.cy)*11)   % 200 + id%3)
        | + (((id%40)*31 + (2*cx.cx+1)*7 + (2*cy.cy)*11)   % 200 + id%3)
        | + (((id%40)*31 + (2*cx.cx)*7   + (2*cy.cy+1)*11) % 200 + id%3)
        | + (((id%40)*31 + (2*cx.cx+1)*7 + (2*cy.cy+1)*11) % 200 + id%3)) // 4 AS cell
        | FROM ids
        | CROSS JOIN (SELECT unnest(generate_series(0, 8)) AS cx) cx
        | CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS cy) cy),
        |bits AS (
        | SELECT a.id, a.cy * 8 + a.cx AS i,
        |  CASE WHEN a.cell < b.cell THEN 1 ELSE 0 END AS bit
        | FROM cells a JOIN cells b ON b.id = a.id AND b.cy = a.cy AND b.cx = a.cx + 1
        | WHERE a.cx < 8 AND a.cy * 8 + a.cx < 63),
        |hashes AS (SELECT id AS doc_id,
        |  CAST(SUM(bit * (1::BIGINT << i)) AS BIGINT) AS phash
        | FROM bits GROUP BY id),
        |bands AS (SELECT doc_id, phash, k.k AS k,
        |  (phash >> (16 * k.k)) & (CASE WHEN k.k = 3 THEN 32767 ELSE 65535 END) AS bv
        | FROM hashes CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k) k),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, a.phash AS ha,
        |                b.doc_id AS doc_b, b.phash AS hb
        | FROM bands a JOIN bands b
        |  ON a.k = b.k AND a.bv = b.bv AND a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
        |FROM cand WHERE bit_count(xor(ha, hb)) <= 4""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val hashes = synthGradAssets(s, d).mapPartitions { it =>
          javax.imageio.ImageIO.setUseCache(false)
          it.map { a =>
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(a.payload))
            (a.doc_id, dHash63(img))
          }
        }.toDF("doc_id", "phash")
        val bands = hashes.select(col("doc_id"), col("phash"),
          explode(array((0 to 3).map { k =>
            struct(lit(k).as("k"),
              shiftrightunsigned(col("phash"), 16 * k)
                .bitwiseAND(lit(if (k == 3) 32767L else 65535L)).as("bv"))
          }: _*)).as("s"))
          .select(col("doc_id"), col("phash"),
            col("s.k").as("k"), col("s.bv").as("bv"))
        val cand = bands.as("a").join(bands.as("b"),
            col("a.k") === col("b.k") && col("a.bv") === col("b.bv") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("a.phash").as("ha"),
            col("b.doc_id").as("doc_b"), col("b.phash").as("hb"))
          .distinct()
        cand
          .withColumn("hamming", expr("bit_count(ha ^ hb)").cast("long"))
          .filter(col("hamming") <= 4)
          .select(col("doc_a"), col("doc_b"), col("hamming"))
    },

    // Frame sampling behind the hash gate: offsets are integer
    // arithmetic over the payload length, and the 16-byte frame hash
    // is the same rolling polynomial `text_rolling_fingerprint`
    // mirrors — here DuckDB reads the exact payload bytes through
    // hex(encode(text)) (two hex chars per byte, decoded by strpos
    // lookup), so any drift in offset math, slicing, or the hash
    // kernel fails the value hash.
    sql("multimodal_frame_sample",
      s"""WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
         |                  octet_length(encode(text)) AS n FROM documents),
         |f AS (SELECT doc_id, n, hx, i FROM b, generate_series(0, 7) t(i)),
         |s AS (SELECT doc_id, i, (i * n) // 8 AS off,
         |       substr(hx, 2 * ((i * n) // 8) + 1, 32) AS hs FROM f),
         |h AS (SELECT doc_id, i, off, list_reduce(
         |   list_prepend(${graft.functions.RollingHash.Seed}::HUGEINT,
         |     list_transform(generate_series(1, length(hs) // 2),
         |       j -> (16 * (strpos('0123456789ABCDEF', substr(hs, 2*j - 1, 1)) - 1)
         |           + strpos('0123456789ABCDEF', substr(hs, 2*j, 1)) - 1)::HUGEINT)),
         |   (acc, v) -> (acc * ${graft.functions.RollingHash.Prime}::HUGEINT + v)
         |     % 18446744073709551616::HUGEINT) AS h
         | FROM s)
         |SELECT doc_id, i AS frame_idx, off AS byte_offset,
         | CAST(CASE WHEN h >= 9223372036854775808::HUGEINT
         |   THEN h - 18446744073709551616::HUGEINT ELSE h END AS BIGINT) AS frame_hash
         |FROM h""".stripMargin) {
      (s, d) => sampleFrames(assets(s, d), frames = 8).toDF()
    },

    // REAL audio decode behind the hash gate: payloads are WAVs the
    // RIFF writer emitted in-query ([[synthWavAssets]]), the decoder
    // is a genuine chunk walker, and a ±A square wave's peak and RMS
    // are EXACTLY A (see synthWavAssets scaladoc for the FP-exactness
    // argument) — so stream params, duration, peak and RMS are all
    // closed-form SQL per doc_id. Any drift in header layout, chunk
    // walking, LE int16 decoding, or the RMS fold fails the hash.
    sql("multimodal_audio_features",
      """SELECT doc_id,
        | CAST(8000 AS BIGINT) AS sample_rate, CAST(1 AS BIGINT) AS channels,
        | CAST(16 AS BIGINT) AS bits,
        | CAST(800 + doc_id % 800 AS BIGINT) AS n_samples,
        | CAST((800 + doc_id % 800) * 1000 // 8000 AS BIGINT) AS duration_ms,
        | CAST(1000 + doc_id * 13 % 20000 AS BIGINT) AS peak,
        | CAST(1000 + doc_id * 13 % 20000 AS DOUBLE) AS rms
        |FROM documents""".stripMargin) {
      (s, d) => extractAudioFeatures(synthWavAssets(s, d)).toDF()
    },

    // REAL bilinear resize behind the hash gate: solid-color synth
    // PNGs resize to a solid image of the same color (verified exact
    // for Java2D's fixed-point bilinear kernel), so decoding the
    // resized payload back must reproduce the target dims and the
    // SAME closed-form luma as `multimodal_features`. A stub fallback
    // anywhere in the path (sniff failure, codec error) would emit
    // non-PNG bytes whose re-decode produces stub dims — hash
    // mismatch. Same FP-safety argument as the features oracle.
    sql("multimodal_resize",
      """SELECT doc_id, 'image/png' AS media_type,
        | CAST(16 AS BIGINT) AS width, CAST(12 AS BIGINT) AS height,
        | FLOOR((0.299 * (doc_id * 37 % 256) + 0.587 * (doc_id * 59 % 256)
        |   + 0.114 * (doc_id * 83 % 256)) / 255 * 1000000 + 0.5) / 1000000 AS mean_luma
        |FROM documents""".stripMargin) {
      (s, d) =>
        import s.implicits._
        import graft.functions.VectorOps.floorRound6
        val resized = resizeAll(synthAssets(s, d), w = 16, h = 12)
          .map(r => MediaAsset(r.doc_id, r.media_type, r.payload))
        extractFeatures(resized).toDF()
          .select(col("doc_id"), col("media_type"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height"),
            floorRound6(col("mean_luma")).as("mean_luma"))
    })
}
