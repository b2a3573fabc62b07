package graft

import graft.functions.ZygositySupportAgg
import graft.varda.VardaOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The typed UDAF equals the two-conditional-sum formulation and keeps
  * partial aggregation in the plan. */
class ZygosityAggSpec extends AnyFunSuite {
  import TestSpark._

  test("one-pass zygosity aggregator matches conditional sums") {
    val zagg = udaf(ZygositySupportAgg)
    val obs = VardaOps.obs(spark, sf0001)
    val viaUdaf = obs
      .groupBy("chromosome", "position", "reference", "observed")
      .agg(zagg(col("zygosity"), col("support")).as("z"))
      .select(col("chromosome"), col("position"), col("reference"),
        col("observed"), col("z.het_support"), col("z.hom_support"))
    val viaSums = obs
      .groupBy("chromosome", "position", "reference", "observed")
      .agg(
        sum(when(col("zygosity") === "heterozygous", col("support")).otherwise(0))
          .as("het_support"),
        sum(when(col("zygosity") === "homozygous", col("support")).otherwise(0))
          .as("hom_support"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getLong(4), r.getLong(5))).toSet
    val u = rows(viaUdaf)
    assert(u.nonEmpty)
    assert(u == rows(viaSums))
    // partial (ObjectHashAggregate partial) happens below the exchange
    viaUdaf.collect()
    val plan = viaUdaf.queryExecution.executedPlan.toString
    assert(plan.contains("partial_zygositysupportagg")
      || plan.toLowerCase.contains("partial_"), s"no partial agg:\n$plan")
  }
}
