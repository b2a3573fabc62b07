package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Banded sign-LSH signature of an `array<float>` vector: `bands` bucket
  * ids, bucket b = the integer of `bits` sign bits, bit j = the sign of
  * the vector's projection onto deterministic Rademacher hyperplane
  * (b·bits + j) — all computed in ONE codegen'd pass per row, for
  * [[graft.ops.Analysis.nearIdenticalLsh]].
  *
  * Component i of plane p is `1 - 2·(fmix32(i, p) & 1)` ∈ {−1, +1},
  * derived in-code from the indices, so every executor computes identical
  * planes with no model to fit, persist or broadcast. Emitting the packed
  * band buckets directly (rather than raw projections) keeps the
  * downstream plan to a plain `posexplode` — band_id is the array
  * position — instead of a generated projection with bands×bits
  * element_at/CASE chains, whose Janino compile time dwarfed the actual
  * arithmetic in the first cut. Custom-Expression tier, same rationale as
  * [[FloatDotProduct]].
  */
case class LshBandBuckets(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType, _), IntegerType, IntegerType)
          if second.foldable && third.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"lsh_band_buckets expects (array<float>, literal int, literal int), got ($a, $b, $c)")
    }

  private lazy val nBands: Int = second.eval().asInstanceOf[Int]
  private lazy val nBits: Int = third.eval().asInstanceOf[Int]

  override protected def nullSafeEval(v: Any, b: Any, c: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Int](nBands)
    var band = 0
    while (band < nBands) {
      var bucket = 0
      var j = 0
      while (j < nBits) {
        val p = band * nBits + j
        var acc = 0.0
        var i = 0
        while (i < n) {
          acc += a.getFloat(i).toDouble * LshBandBuckets.sign(i, p)
          i += 1
        }
        if (acc > 0) bucket |= 1 << j
        j += 1
      }
      out(band) = bucket
      band += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _, _) => {
      val arr = ctx.freshName("arr")
      val acc = ctx.freshName("acc")
      val bucket = ctx.freshName("bucket")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val p = ctx.freshName("p")
      val band = ctx.freshName("band")
      val n = ctx.freshName("n")
      // the mix below MUST stay identical to LshBandBuckets.sign:
      // full murmur3 fmix32 avalanche — a weaker mix leaves linear
      // structure in bit 0 (odd-multiplier low bits), making consecutive
      // planes near-negations of each other and collapsing the bands
      s"""
         |int $n = $a.numElements();
         |int[] $arr = new int[$nBands];
         |for (int $band = 0; $band < $nBands; $band++) {
         |  int $bucket = 0;
         |  for (int $j = 0; $j < $nBits; $j++) {
         |    int $p = $band * $nBits + $j;
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      int $h = $i * 0x9E3779B9 + $p * 0x85EBCA6B;
         |      $h ^= $h >>> 16; $h *= 0x85EBCA6B; $h ^= $h >>> 13;
         |      $h *= 0xC2B2AE35; $h ^= $h >>> 16;
         |      $acc += ((double) $a.getFloat($i)) * (1 - 2 * ($h & 1));
         |    }
         |    if ($acc > 0) $bucket |= 1 << $j;
         |  }
         |  $arr[$band] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object LshBandBuckets {
  /** ±1 plane component — keep bit-identical to the generated Java.
    * Murmur3 fmix32: bit 0 must carry no linear structure in (i, p). */
  def sign(i: Int, p: Int): Int = {
    var h = i * 0x9E3779B9 + p * 0x85EBCA6B
    h ^= h >>> 16; h *= 0x85EBCA6B; h ^= h >>> 13
    h *= 0xC2B2AE35; h ^= h >>> 16
    1 - 2 * (h & 1)
  }
}
