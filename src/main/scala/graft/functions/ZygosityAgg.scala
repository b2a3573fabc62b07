package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Per-zygosity support counts folded in one pass. */
case class ZygCounts(het_support: Long, hom_support: Long)

/** Typed UDAF (SURVEY.md §2 "UDF/UDAF surface"): aggregates (zygosity,
  * support) pairs into a single struct per group — the reference's
  * het/hom frequency split as one partial-aggregable fold instead of two
  * conditional sums. Register with `functions.udaf(ZygositySupportAgg)`;
  * Spark plans it with map-side partial aggregation like any built-in
  * (buffer is a tiny case class, merge is associative+commutative). */
object ZygositySupportAgg
    extends Aggregator[(String, Int), ZygCounts, ZygCounts] {

  override def zero: ZygCounts = ZygCounts(0L, 0L)

  override def reduce(b: ZygCounts, a: (String, Int)): ZygCounts = a._1 match {
    case "heterozygous" => b.copy(het_support = b.het_support + a._2)
    case "homozygous"   => b.copy(hom_support = b.hom_support + a._2)
    case _              => b
  }

  override def merge(x: ZygCounts, y: ZygCounts): ZygCounts =
    ZygCounts(x.het_support + y.het_support, x.hom_support + y.hom_support)

  override def finish(r: ZygCounts): ZygCounts = r

  override def bufferEncoder: Encoder[ZygCounts] = Encoders.product[ZygCounts]
  override def outputEncoder: Encoder[ZygCounts] = Encoders.product[ZygCounts]
}
