package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native codegen'd FloatDotProduct: bit-identical to the SQL fold,
  * null-safe, type-checked, and actually codegen'd (no fallback). */
class FloatDotSpec extends AnyFunSuite {
  import TestSpark._

  test("float_dot equals the aggregate(zip_with(...)) fold bit for bit") {
    GraftFunctions.registerAll(spark)
    val e = Tables.embeddings(spark, sf0001)
    val both = e.select(col("vec_id"),
      expr("float_dot(embedding, embedding)").as("native"),
      expr("""aggregate(zip_with(embedding, embedding,
                (x, y) -> cast(x as double) * cast(y as double)),
              0D, (acc, v) -> acc + v)""").as("fold"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1))
        == java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"vec ${r.getLong(0)}: ${r.getDouble(1)} != ${r.getDouble(2)}")
    }
  }

  test("float_dot is null-safe and rejects wrong types") {
    GraftFunctions.registerAll(spark)
    import spark.implicits._
    val df = Seq((Some(Array(1f, 2f)), Some(Array(3f, 4f))),
      (None, Some(Array(1f)))).toDF("a", "b")
    val out = df.select(expr("float_dot(a, b)")).collect()
    assert(out(0).getDouble(0) == 11.0)
    assert(out(1).isNullAt(0))
    val err = intercept[Exception] {
      spark.range(1).select(expr("float_dot(id, id)")).collect()
    }
    assert(err.getMessage.contains("float_dot") || err.getMessage.contains("DATATYPE"))
  }

  test("float_dot stays inside whole-stage codegen") {
    GraftFunctions.registerAll(spark)
    val e = Tables.embeddings(spark, sf0001)
    val df = e.select(expr("float_dot(embedding, embedding)").as("x"))
      .agg(sum("x"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the projection computing float_dot carries the codegen marker `*(n)`
    assert("\\*\\(\\d+\\) Project".r.findFirstIn(plan).isDefined
      || "\\*\\(\\d+\\) HashAggregate".r.findFirstIn(plan).isDefined,
      s"float_dot fell out of codegen:\n$plan")
  }
}
