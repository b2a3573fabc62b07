package graft.ops

import java.nio.{ByteBuffer, ByteOrder}

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as an opaque `binary` payload plus a
  * typed metadata struct, carried through relational ops and processed in
  * per-partition batches.
  *
  * The container has no image/audio codec libraries, so the actual
  * decode is a clearly-marked deterministic STUB (`decodeF32`): payloads
  * are little-endian f32 arrays ("f32le"), standing in for JPEG/PCM/etc.
  * Everything around the stub — schema, metadata propagation, UDF
  * signatures, mapPartitions batch shape, partitioning — is real and
  * tested (MultimodalSpec), which is the part that matters at 100 TB:
  * a decode swap-in changes one function, not the pipeline.
  */
object Multimodal {

  /** Metadata carried alongside every payload. */
  val metaType: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("codec", StringType)))

  /** ENCODE stub: float array → opaque bytes (the shape an image/audio
    * encoder would produce). */
  private[graft] def encodeF32(xs: Seq[Float]): Array[Byte] = {
    val bb = ByteBuffer.allocate(xs.length * 4).order(ByteOrder.LITTLE_ENDIAN)
    xs.foreach(bb.putFloat)
    bb.array()
  }

  /** DECODE stub: opaque bytes → float array. A real deployment replaces
    * this one function with an actual codec; callers only see
    * `array<float>`. */
  private[graft] def decodeF32(bytes: Array[Byte]): Array[Float] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    Array.fill(bytes.length / 4)(bb.getFloat)
  }

  private val encodeUdf = udf((xs: Seq[Float]) => encodeF32(xs))
  private val decodeUdf = udf((b: Array[Byte]) => decodeF32(b))

  /** Synthesize a media table from `embeddings`: each 64-float vector
    * becomes an 8x8 single-channel "image" payload. */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).select(
      col("vec_id").as("media_id"),
      lit("image").as("kind"),
      struct(lit(8).as("width"), lit(8).as("height"),
        lit(1).as("channels"), lit("f32le").as("codec")).as("meta"),
      encodeUdf(col("embedding")).as("payload"))

  /** Decode + per-item features. Only the decode is a UDF; the feature
    * math runs as codegen'd SQL expressions over the decoded array. */
  def extractFeatures(media: DataFrame): DataFrame =
    media.withColumn("px", decodeUdf(col("payload")))
      .withColumn("n_px", size(col("px")))
      .withColumn("mean_px",
        expr("aggregate(px, 0D, (a, v) -> a + cast(v as double)) / n_px"))
      .withColumn("max_px", array_max(col("px")))
      .drop("px")

  /** Integer feature digest of each payload — the hash-comparable declared
    * form of [[extractFeatures]]: pixel count plus `Σ floor(x·2^20)` and
    * `floor(max·2^20)`. Every step is exact binary arithmetic (f32→f64
    * widen, power-of-two scale, floor), so DuckDB computes the identical
    * integers from the source vectors (same discipline as
    * `multimodal_join`'s digest). Only the decode is a UDF; the digest
    * math runs as codegen'd higher-order array expressions. */
  def featureDigest(media: DataFrame): DataFrame =
    media.withColumn("px", decodeUdf(col("payload")))
      .select(col("media_id"),
        col("meta.width").cast(LongType).as("width"),
        col("meta.height").cast(LongType).as("height"),
        size(col("px")).cast(LongType).as("n_px"),
        expr("""aggregate(px, 0L,
                 (a, x) -> a + cast(floor(cast(x as double) * 1048576d) as bigint))""")
          .as("px_sum_fp"),
        expr("cast(floor(cast(array_max(px) as double) * 1048576d) as bigint)")
          .as("max_fp"))

  /** 2x downscale by average-pooling 2x2 blocks; payload re-encoded and
    * metadata updated in lockstep. */
  def resizeHalf(media: DataFrame): DataFrame = {
    val pool = udf((b: Array[Byte], w: Int, h: Int) => {
      val px = decodeF32(b)
      val (w2, h2) = (w / 2, h / 2)
      encodeF32(scala.collection.immutable.ArraySeq.unsafeWrapArray(
        Array.tabulate(w2 * h2) { i =>
        val (x, y) = (i % w2, i / w2)
        val s = px(2 * y * w + 2 * x) + px(2 * y * w + 2 * x + 1) +
          px((2 * y + 1) * w + 2 * x) + px((2 * y + 1) * w + 2 * x + 1)
        s / 4
      }))
    })
    media
      .withColumn("payload",
        pool(col("payload"), col("meta.width"), col("meta.height")))
      .withColumn("meta", struct(
        (col("meta.width") / 2).cast(IntegerType).as("width"),
        (col("meta.height") / 2).cast(IntegerType).as("height"),
        col("meta.channels").as("channels"), col("meta.codec").as("codec")))
  }

  /** Treat each payload row (width floats) as a video frame; keep every
    * k-th frame. */
  def frameSample(media: DataFrame, k: Int): DataFrame = {
    val sample = udf((b: Array[Byte], w: Int, h: Int) => {
      val px = decodeF32(b)
      encodeF32((0 until h by k).flatMap(f => px.slice(f * w, (f + 1) * w)))
    })
    media
      .withColumn("payload",
        sample(col("payload"), col("meta.width"), col("meta.height")))
      .withColumn("meta", struct(
        col("meta.width").as("width"),
        expr(s"cast(ceil(meta.height / ${k}D) as int)").as("height"),
        col("meta.channels").as("channels"), col("meta.codec").as("codec")))
  }

  /** The batch-processing path: decode whole partitions at a time through
    * one reusable buffer per partition — the Scala analog of an Arrow
    * batch UDF, and the shape a native decoder wants (amortized init, no
    * per-row JNI churn). Returns (media_id, mean_px). */
  def extractFeaturesBatched(media: DataFrame): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init would live here (decoder handles, buffers)
        it.map { case (id, bytes) =>
          val px = decodeF32(bytes)
          (id, px.foldLeft(0d)(_ + _) / px.length)
        }
      }
      .toDF("media_id", "mean_px")
  }
}
