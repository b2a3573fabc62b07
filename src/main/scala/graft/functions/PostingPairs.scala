package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** All ordered pairs (a[i], a[j]), i < j, of a sorted `array<bigint>`
  * posting list, as `array<struct<d1,d2>>` — the candidate-pair
  * enumeration step of the inverted-index jaccard dedup
  * ([[graft.ops.Llm.jaccardPairs]]).
  *
  * Replaces a `flatten(transform(..., slice(...)))` lambda chain: Spark
  * evaluates higher-order functions interpreted, per posting row, with a
  * nested-array allocation per element — measured as the dominant cost of
  * the whole pair pipeline. This expression runs the same enumeration as
  * one generated double loop, and the downstream `explode` of its result
  * is codegen'd too. Custom-Expression tier, same rationale as
  * [[FloatDotProduct]] / [[LshBandBuckets]].
  */
case class PostingPairs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("d1", LongType, nullable = false),
      StructField("d2", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"posting_pairs expects array<bigint>, got $t")
    }

  override protected def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    // n*(n-1)/2 wraps Int at n >= 46342 — fail with the actual remedy
    // instead of a NegativeArraySizeException from nowhere. The size must
    // also be COMPUTED in Long: for n in [46342, 65536] the Int multiply
    // n*(n-1) wraps even when the final quotient fits.
    require(n.toLong * (n - 1) / 2 <= Int.MaxValue - 8,
      s"posting list of $n documents yields more than 2^31 candidate " +
        "pairs; cap hot shingles with jaccardPairs(maxDf = ...)")
    val out = new Array[Any]((n.toLong * (n - 1) / 2).toInt)
    var k = 0
    var i = 0
    while (i < n) {
      val d1 = a.getLong(i)
      var j = i + 1
      while (j < n) {
        out(k) = new GenericInternalRow(
          Array[Any](d1, a.getLong(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val arr = ctx.freshName("arr")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val n = ctx.freshName("n")
      val d1 = ctx.freshName("d1")
      s"""
         |int $n = $a.numElements();
         |if ((long) $n * ($n - 1) / 2 > Integer.MAX_VALUE - 8) {
         |  throw new IllegalArgumentException("posting list of " + $n +
         |    " documents yields more than 2^31 candidate pairs; cap hot" +
         |    " shingles with jaccardPairs(maxDf = ...)");
         |}
         |Object[] $arr = new Object[(int) ((long) $n * ($n - 1) / 2)];
         |int $k = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $d1 = $a.getLong($i);
         |  for (int $j = $i + 1; $j < $n; $j++) {
         |    $arr[$k++] = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |      new Object[]{$d1, $a.getLong($j)});
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
