package graft

import graft.ops.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal binary-column plumbing: schema, metadata propagation,
  * encode/decode roundtrip, pooling/frame-sampling arithmetic, and the
  * per-partition batch path. */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val media = Multimodal.mediaTable(spark, sf0001)

  test("media schema: opaque payload + typed metadata") {
    val f = media.schema.fields.map(x => x.name -> x.dataType.simpleString).toMap
    assert(f("payload") == "binary")
    assert(f("meta") == "struct<width:int,height:int,channels:int,codec:string>")
    assert(media.count() > 0)
  }

  test("encode/decode roundtrip is lossless") {
    val orig = Tables.embeddings(spark, sf0001)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val decoded = Multimodal.extractFeatures(media)
      .select("media_id", "n_px").collect()
    decoded.foreach { r =>
      assert(r.getInt(1) == orig(r.getLong(0)).length)
    }
    // spot-check exact bytes→floats equality through the stub codec
    val row = media.select("media_id", "payload").first()
    assert(Multimodal.decodeF32(row.getAs[Array[Byte]](1)).toSeq
      == orig(row.getLong(0)))
  }

  test("feature extraction computes mean/max over decoded pixels") {
    val feats = Multimodal.extractFeatures(media)
      .select("media_id", "mean_px", "max_px").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getFloat(2))).toList
    val orig = Tables.embeddings(spark, sf0001)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    feats.foreach { case (id, mean, mx) =>
      val px = orig(id)
      assert(mx == px.max)
      assert(math.abs(mean - px.map(_.toDouble).sum / px.length) < 1e-9)
    }
  }

  test("resizeHalf pools 2x2 blocks and halves the metadata dims") {
    val out = Multimodal.resizeHalf(media)
    val r = out.select("meta.width", "meta.height", "payload").first()
    assert(r.getInt(0) == 4 && r.getInt(1) == 4)
    assert(r.getAs[Array[Byte]](2).length == 4 * 4 * 4)
    // pooled value = mean of the top-left 2x2 block of the original
    val id = out.select("media_id").first().getLong(0)
    val px = Tables.embeddings(spark, sf0001)
      .filter(col("vec_id") === id).select("embedding")
      .first().getSeq[Float](0)
    val pooled = Multimodal.decodeF32(
      out.filter(col("media_id") === id).select("payload")
        .first().getAs[Array[Byte]](0))
    assert(math.abs(pooled(0) - (px(0) + px(1) + px(8) + px(9)) / 4) < 1e-6)
  }

  test("frameSample keeps every k-th row-frame") {
    val out = Multimodal.frameSample(media, 3)
    val r = out.select("meta.height", "payload").first()
    assert(r.getInt(0) == 3) // ceil(8/3)
    assert(r.getAs[Array[Byte]](1).length == 3 * 8 * 4)
  }

  test("declared framesample digests match a direct digest of the sampled rows") {
    val direct = Multimodal.featureDigest(Multimodal.frameSample(media, 3))
      .collect().map(r => (r.getLong(0),
        (r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val full = Multimodal.featureDigest(media).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(direct.nonEmpty)
    direct.foreach { case (_, (nPx, _, _)) => assert(nPx == 24) } // 3 rows × 8
    // sampling must be a strict subset: sampled n_px < full n_px
    full.foreach { case (id, n) => assert(direct(id)._1 < n) }
  }

  test("per-partition batched path equals the row-at-a-time path") {
    val batched = Multimodal.extractFeaturesBatched(media)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val rowWise = Multimodal.extractFeatures(media)
      .select("media_id", "mean_px").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(batched.keySet == rowWise.keySet)
    batched.foreach { case (k, v) => assert(math.abs(v - rowWise(k)) < 1e-9) }
  }
}
