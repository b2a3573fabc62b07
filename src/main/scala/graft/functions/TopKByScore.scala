package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions

/** One scored candidate: `score` is an exact integer rank key (the ANN
  * tier scales its DECIMAL(18,6) cosine by 10^6 — monotone, so ordering
  * is unchanged), `id` the deterministic tiebreak. */
case class ScoredId(score: Long, id: Long)

/** BOUNDED per-group top-k aggregate (round 17 — VERDICT item 4): the
  * ANN keys' rank stage used a `row_number` WINDOW over the candidate
  * set, which shuffles EVERY candidate row to its query's reducer and
  * sorts there — O(candidates) shuffle volume that grew the in-session
  * IVF key's per-query cost past its designed √n bound at the sf10
  * decade. This aggregate keeps only k rows per group in its buffer, so
  * the map-side PARTIAL (ObjectHashAggregate) truncates each partition's
  * candidates to k before the exchange: shuffle volume drops from
  * O(candidates) to O(k · queries), and the reducer merges tiny sorted
  * lists instead of sorting the candidate set. Ordering is (score DESC,
  * id ASC) — exactly the window's (cos_d DESC, nid ASC) discipline, so
  * the replacement is row-identical (AnnTopkSpec pins it against the
  * window form on near-tie fixtures). */
class TopKByScore(k: Int)
    extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
  require(k > 0, s"top-k aggregate needs k > 0, got $k")

  private def before(a: ScoredId, b: ScoredId): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: Seq[ScoredId] = Nil

  /** Insert one candidate into the sorted ≤k buffer. */
  override def reduce(buf: Seq[ScoredId], in: ScoredId): Seq[ScoredId] = {
    if (buf.length >= k && !before(in, buf.last)) buf
    else {
      val at = buf.indexWhere(before(in, _)) match {
        case -1 => buf.length
        case i => i
      }
      val grown = buf.patch(at, Seq(in), 0)
      if (grown.length > k) grown.take(k) else grown
    }
  }

  /** Merge two sorted ≤k buffers, keep k. */
  override def merge(a: Seq[ScoredId], b: Seq[ScoredId]): Seq[ScoredId] = {
    val out = new scala.collection.mutable.ArrayBuffer[ScoredId](k)
    var i = 0
    var j = 0
    while (out.length < k && (i < a.length || j < b.length)) {
      if (j >= b.length || (i < a.length && before(a(i), b(j)))) {
        out += a(i); i += 1
      } else {
        out += b(j); j += 1
      }
    }
    out.toSeq
  }

  override def finish(r: Seq[ScoredId]): Seq[ScoredId] = r
  override def bufferEncoder: Encoder[Seq[ScoredId]] =
    ExpressionEncoder[Seq[ScoredId]]()
  override def outputEncoder: Encoder[Seq[ScoredId]] =
    ExpressionEncoder[Seq[ScoredId]]()
}

object TopKByScore {
  /** `topk(k, score, id)` as a DataFrame aggregate Column: the group's
    * top-k (score DESC, id ASC) as an ordered array of (score, id)
    * structs — posexplode for (rank, id) rows. */
  def topk(k: Int, score: Column, id: Column): Column =
    functions.udaf(new TopKByScore(k), ExpressionEncoder[ScoredId]())
      .apply(score, id)
}
