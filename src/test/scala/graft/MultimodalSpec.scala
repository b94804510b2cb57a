package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaAsset, MediaCodec, MediaStub}

class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfTiny}

  /** A real w×h image: left half pure white, right half pure black. */
  private def makeImage(w: Int, h: Int, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0xffffff else 0x000000)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  test("feature extraction is deterministic and schema-complete") {
    val feats = Multimodal.extractFeatures(Multimodal.assets(spark, sfTiny)).collect()
    val docs = Tables.documents(spark, sfTiny).count()
    assert(feats.length == docs)
    feats.foreach { f =>
      assert(f.n_bytes > 0)
      assert(f.width >= 64 && f.width < 512 && f.height >= 64 && f.height < 512)
      assert(f.mean_luma > 0 && f.mean_luma <= 1.0)
    }
  }

  test("stub decode matches a locally-computed reference") {
    val a = MediaAsset(7L, "image/stub", "hello multimodal".getBytes("UTF-8"))
    val f = MediaStub.decode(a)
    assert(f.n_bytes == 16)
    assert(f.width == 64 + 16 % 448 && f.height == 64 + (16 * 7) % 448)
    val expectedLuma = a.payload.map(b => (b & 0xff).toDouble).sum / 16 / 255.0
    assert(math.abs(f.mean_luma - expectedLuma) < 1e-12)
  }

  test("real PNG/BMP decode through the Dataset pipeline: true dims and luma") {
    import spark.implicits._
    val assets = Seq(
      MediaAsset(1L, "application/octet-stream", makeImage(12, 7, "png")),
      MediaAsset(2L, "whatever", makeImage(9, 4, "bmp")), // sniffed by bytes, not metadata
      MediaAsset(3L, "image/stub", "not an image".getBytes("UTF-8"))).toDS()
    val feats = Multimodal.extractFeatures(assets).collect().sortBy(_.doc_id)

    val png = feats(0)
    assert(png.media_type == "image/png")
    assert(png.width == 12 && png.height == 7)
    // left half (6 of 12 cols) white → mean luma = 0.5 exactly
    assert(math.abs(png.mean_luma - 0.5) < 1e-9, s"luma ${png.mean_luma}")

    val bmp = feats(1)
    assert(bmp.media_type == "image/bmp")
    assert(bmp.width == 9 && bmp.height == 4)
    // 4 of 9 columns white (x < 9/2 = 4) → luma = 4/9
    assert(math.abs(bmp.mean_luma - 4.0 / 9.0) < 1e-9, s"luma ${bmp.mean_luma}")

    // non-image payload falls back to the deterministic stub
    val stub = feats(2)
    assert(stub == MediaStub.decode(MediaAsset(3L, "image/stub", "not an image".getBytes("UTF-8"))))
  }

  test("real resize: output re-decodes to the target dims with preserved structure") {
    val resized = MediaCodec.resize(
      MediaAsset(5L, "x", makeImage(32, 20, "png")), 8, 5)
    assert(resized.target_w == 8 && resized.target_h == 5)
    assert(MediaCodec.sniff(resized.payload).contains("image/png"))
    val back = MediaCodec.decode(MediaAsset(5L, "x", resized.payload))
    assert(back.width == 8 && back.height == 5)
    // white-left/black-right structure survives the rescale: luma ≈ 0.5
    assert(math.abs(back.mean_luma - 0.5) < 0.1, s"luma ${back.mean_luma}")
  }

  test("dHash is brightness-invariant and content-sensitive") {
    def grad(off: Int, slope: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(18, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 18) {
        val v = ((x * slope + y * 11) % 200 + off).min(255)
        img.setRGB(x, y, v << 16 | v << 8 | v)
      }
      img
    }
    // a constant brightness shift must CANCEL (pooling a +k image
    // yields +k cells; the comparisons are translation-invariant)
    val h0 = Multimodal.dHash63(grad(0, 7))
    assert(h0 == Multimodal.dHash63(grad(2, 7)))
    assert(h0 == Multimodal.dHash63(grad(50, 7)))
    // a different CONTENT (slope) must move many bits
    val hOther = Multimodal.dHash63(grad(0, 193))
    assert(java.lang.Long.bitCount(h0 ^ hOther) > 4,
      s"slope change must move the hash: ${java.lang.Long.bitCount(h0 ^ hOther)} bits")
    // bit 63 is never set (the sign bit would poison band arithmetic)
    assert(h0 >= 0 && hOther >= 0)
    // the hash survives the REAL PNG encode/decode round trip
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(grad(0, 7), "png", bos)
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    assert(Multimodal.dHash63(back) == h0)
  }

  test("frame sampling fans out exactly n frames with increasing offsets") {
    val frames = Multimodal.sampleFrames(Multimodal.assets(spark, sfTiny), 8).collect()
    val docs = Tables.documents(spark, sfTiny).count()
    assert(frames.length == docs * 8)
    frames.groupBy(_.doc_id).foreach { case (_, fs) =>
      val sorted = fs.sortBy(_.frame_idx)
      assert(sorted.map(_.frame_idx).toSeq == (0 until 8))
      assert(sorted.map(_.byte_offset).toSeq == sorted.map(_.byte_offset).sorted.toSeq)
    }
  }

  test("resize produces exactly w*h bytes, deterministically") {
    val resized = Multimodal.resizeAll(Multimodal.assets(spark, sfTiny), 32, 32).collect()
    val docs = Tables.documents(spark, sfTiny).count()
    assert(resized.length == docs)
    resized.foreach { r =>
      assert(r.payload.length == 32 * 32 && r.target_w == 32 && r.target_h == 32)
    }
    // deterministic: a second run yields identical bytes
    val again = Multimodal.resizeAll(Multimodal.assets(spark, sfTiny), 32, 32).collect()
    val a = resized.sortBy(_.doc_id).map(_.payload.toSeq)
    val b = again.sortBy(_.doc_id).map(_.payload.toSeq)
    assert(a.zip(b).forall { case (x, y) => x == y })
  }

  test("wav decode is a real chunk walker: LIST chunks and odd padding survive") {
    import Multimodal.AudioCodec
    val samples = Array.tabulate(100)(i => (if (i % 2 == 0) 5000 else -5000).toShort)
    val canonical = AudioCodec.writeWav(samples, 8000)
    val feats = AudioCodec.decode(7L, canonical)
    assert(feats.sample_rate == 8000 && feats.channels == 1 && feats.bits == 16)
    assert(feats.n_samples == 100 && feats.peak == 5000 && feats.rms == 5000.0)
    // splice an odd-length LIST chunk between fmt and data: a
    // fixed-offset peek would read garbage; the walker must skip it
    // (including the word-alignment pad byte)
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ "INFOx".getBytes("US-ASCII") ++ Array[Byte](0)
    val spliced = canonical.slice(0, 36) ++ list ++ canonical.slice(36, canonical.length)
    // fix up the RIFF size field (bytes 4-7, LE)
    val bb = java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8)
    val feats2 = AudioCodec.decode(8L, spliced)
    assert(feats2.copy(doc_id = 7L) == feats)
    // non-RIFF bytes fail loudly, not silently
    val err = intercept[IllegalArgumentException](
      AudioCodec.decode(9L, "not audio at all".getBytes("US-ASCII")))
    assert(err.getMessage.contains("RIFF"))
    // an 8-bit PCM file with the DATA chunk BEFORE fmt must fail loud
    // ("only 16-bit"), never silently int16-decode: bit depth is only
    // known after both chunks parse
    val bb8 = java.nio.ByteBuffer.allocate(44 + 4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb8.put("RIFF".getBytes("US-ASCII")).putInt(40)
      .put("WAVE".getBytes("US-ASCII"))
    bb8.put("data".getBytes("US-ASCII")).putInt(4).put(Array[Byte](1, 2, 3, 4))
    bb8.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(8000).putShort(1).putShort(8) // 8-bit!
    val err8 = intercept[IllegalArgumentException](AudioCodec.decode(10L, bb8.array()))
    assert(err8.getMessage.contains("16-bit"), err8.getMessage)
    // corrupt negative chunk length fails loud instead of looping
    val neg = canonical.clone()
    val nb = java.nio.ByteBuffer.wrap(neg).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    nb.putInt(16, -8) // fmt chunk length
    val errNeg = intercept[IllegalArgumentException](AudioCodec.decode(11L, neg))
    assert(errNeg.getMessage.contains("negative"), errNeg.getMessage)
  }

  test("square-wave WAV features are exactly closed-form through the pipeline") {
    val feats = Multimodal.extractAudioFeatures(
        Multimodal.synthWavAssets(spark, sfTiny))
      .collect().sortBy(_.doc_id)
    assert(feats.nonEmpty)
    feats.foreach { f =>
      val amp = 1000 + f.doc_id * 13 % 20000
      assert(f.n_samples == 800 + f.doc_id % 800)
      assert(f.peak == amp && f.rms == amp.toDouble, s"doc ${f.doc_id}")
      assert(f.duration_ms == f.n_samples * 1000 / 8000)
    }
  }
}
