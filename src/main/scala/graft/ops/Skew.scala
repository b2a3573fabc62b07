package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities.
  *
  * AQE's skew-join split (on by default) handles most runtime skew; this
  * is the explicit salting fallback for the cases AQE can't fix — e.g. a
  * single hot key in a shuffle whose other side is small enough to
  * replicate but too big to broadcast whole. The hot-side key is salted
  * with a deterministic hash-derived shard, the small side is replicated
  * across all shards, and the join key becomes (key, salt): one hot key's
  * rows spread over `salts` reducers instead of one.
  *
  * SkewSpec demonstrates both layers: OptimizeSkewedJoin firing on a
  * synthetic hot key (a partition is split when its size exceeds
  * `spark.sql.adaptive.skewJoin.skewedPartitionFactor` × median and
  * `...skewedPartitionThresholdInBytes`, into chunks of
  * `spark.sql.adaptive.advisoryPartitionSizeInBytes`), and the salted
  * join's row-identity with the plain join.
  */
object Skew {

  /** The shard a row joins under — exposed so specs can assert the
    * planted-corpus spread with the EXACT expression the join uses. */
  def saltColumn(saltBy: Column, salts: Int): Column =
    pmod(hash(saltBy), lit(salts))

  /** Inner equi-join `large ⋈ small` on `key`, salted `salts` ways.
    * `disambig` columns must not collide; result equals the plain join
    * row-for-row (SkewSpec proves it). */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      salts: Int, saltBy: Column): DataFrame = {
    val l = large.withColumn("__salt", saltColumn(saltBy, salts))
    val r = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
