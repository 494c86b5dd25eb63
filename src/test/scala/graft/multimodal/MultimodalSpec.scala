package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.multimodal.Multimodal._

class MultimodalSpec extends SparkSpec {

  private lazy val assets = Multimodal.dataset(spark, 60)

  test("synthetic assets decode to valid typed metadata") {
    val metas = decodeMeta(assets).collect()
    assert(metas.length == 60 && metas.forall(_.valid))
    assert(metas.count(_.kind == "image") == 20)
    assert(metas.count(_.kind == "audio") == 20)
    assert(metas.count(_.kind == "video") == 20)
    metas.filter(_.kind == "image").foreach { m =>
      assert(m.width >= 16 && m.height >= 16 && m.payload_bytes == m.width * m.height)
    }
    metas.filter(_.kind == "audio").foreach(m => assert(m.sample_rate >= 8000))
  }

  test("malformed binary yields valid=false, never throws") {
    import spark.implicits._
    val bad = Seq(
      MediaAsset(100L, "image", Array[Byte](1, 2, 3), "synth"),
      MediaAsset(101L, "image", null, "synth"),
      MediaAsset(102L, "image", "GMM1".getBytes ++ Array[Byte](105, 0, 0, 0, 99), "synth"))
      .toDS()
    val metas = decodeMeta(bad).collect()
    assert(metas.forall(!_.valid))
  }

  test("feature extraction: L1-normalized 32-bin histogram") {
    val feats = extractFeatures(assets).collect()
    assert(feats.forall(_.feature.length == 32))
    feats.foreach { f =>
      val sum = f.feature.sum
      assert(math.abs(sum - 1.0f) < 1e-3, s"${f.asset_id}: $sum")
    }
    // deterministic across runs
    val again = extractFeatures(Multimodal.dataset(spark, 60)).collect()
    assert(feats.sortBy(_.asset_id).zip(again.sortBy(_.asset_id))
      .forall { case (a, b) => a.feature.sameElements(b.feature) })
  }

  test("resize halves image dimensions and stays decodable") {
    val resized = decodeMeta(resizeImages(assets)).collect()
    val orig = decodeMeta(assets).filter(col("kind") === "image").collect()
      .map(m => m.asset_id -> m).toMap
    assert(resized.nonEmpty)
    resized.foreach { m =>
      assert(m.valid)
      assert(m.width == orig(m.asset_id).width / 2)
      assert(m.height == orig(m.asset_id).height / 2)
    }
  }

  test("frame sampling keeps every k-th frame with correct byte length") {
    val frames = sampleFrames(assets, 2).collect()
    assert(frames.nonEmpty)
    val metas = decodeMeta(assets).filter(col("kind") === "video").collect()
      .map(m => m.asset_id -> m).toMap
    frames.foreach { r =>
      val m = metas(r.getLong(0))
      assert(r.getInt(1) % 2 == 0 && r.getInt(1) < m.n_frames)
      assert(r.getAs[Array[Byte]](2).length == m.width * m.height)
    }
    val perVideo = frames.groupBy(_.getLong(0))
    perVideo.foreach { case (id, fs) =>
      assert(fs.length == (metas(id).n_frames + 1) / 2)
    }
  }
}
