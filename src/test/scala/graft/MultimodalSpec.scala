package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaAsset, MediaStub}

class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfTiny}

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
}
