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

  test("posting_pairs: interpreted and codegen paths match the reference") {
    GraftFunctions.registerAll(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val lists = (0 until 30).map(_ =>
      (0 until rnd.nextInt(12)).map(_ => rnd.nextLong().abs).sorted.toArray)
    def expected(a: Array[Long]) =
      (for { i <- a.indices; j <- i + 1 until a.length } yield (a(i), a(j))).toSeq
    // column input → whole-stage codegen path
    val viaCol = lists.zipWithIndex.map { case (a, i) => (i, a) }
      .toDF("id", "docs")
      .select(col("id"), expr("posting_pairs(docs)").as("ps"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(p => (p.getLong(0), p.getLong(1))))
      .toMap
    lists.zipWithIndex.foreach { case (a, i) =>
      assert(viaCol(i) == expected(a), s"codegen mismatch on list $i")
    }
    // foldable input → Catalyst constant-folds through the INTERPRETED
    // nullSafeEval — the other implementation of the same loop
    val lit = lists(1).mkString("array(", "L,", "L)")
    val viaEval = spark.sql(s"SELECT posting_pairs($lit) AS ps")
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
      .map(p => (p.getLong(0), p.getLong(1)))
    assert(viaEval == expected(lists(1)), "interpreted eval mismatch")
  }

  test("lsh_band_buckets: interpreted and codegen paths match the sign reference") {
    GraftFunctions.registerAll(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(6)
    val vecs = (0 until 20).map(i =>
      (i, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
    def expected(v: Array[Float], bands: Int, bits: Int): Seq[Int] =
      (0 until bands).map { b =>
        (0 until bits).map { j =>
          val p = b * bits + j
          val dot = v.zipWithIndex.map { case (x, i) =>
            x.toDouble * graft.functions.LshBandBuckets.sign(i, p) }.sum
          if (dot > 0) 1 << j else 0
        }.sum
      }
    val viaCol = vecs.toDF("id", "v")
      .select(col("id"), expr("lsh_band_buckets(v, 4, 8)").as("b"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Int](1)).toMap
    vecs.foreach { case (i, v) =>
      assert(viaCol(i) == expected(v, 4, 8), s"codegen mismatch on vec $i")
    }
    val lit = vecs(3)._2.mkString("cast(array(", "F,", "F) as array<float>)")
    val viaEval = spark.sql(s"SELECT lsh_band_buckets($lit, 4, 8) AS b")
      .collect()(0).getSeq[Int](0)
    assert(viaEval == expected(vecs(3)._2, 4, 8), "interpreted eval mismatch")
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
