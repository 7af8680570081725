package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Misra–Gries frequency summary over a string stream — the bounded-
  * state heavy-hitter CANDIDATE generator: at most `k` counters per buffer,
  * with the classic guarantee that every item of true frequency > N/(k+1)
  * survives in the final summary (counts are under-estimates; only the KEY
  * SET is meaningful). Partial aggregation ships ≤ k (key, count) entries
  * per partition; merges use the Agarwal et al. rule (sum counterparts,
  * then subtract the (k+1)-th largest count and drop non-positives), which
  * preserves the guarantee under any merge tree.
  *
  * The candidate SET depends on partition order (Misra–Gries is stream-
  * order-sensitive), so this aggregator is NOT directly oracle-able —
  * [[graft.operators.Retrieval.heavyHitters]] wraps it in the two-phase
  * sketch-then-verify pattern whose final output IS deterministic: exact
  * counts of the candidates, thresholded at a fraction ≥ 1/(k+1).
  */
class FreqKAggregator(k: Int) extends Aggregator[String, FreqKAggregator.Buf, Seq[String]] {
  import FreqKAggregator.Buf
  require(k > 0, s"k must be positive: $k")

  override def zero: Buf = Buf(Map.empty)

  override def reduce(b: Buf, a: String): Buf =
    b.counts.get(a) match {
      case Some(c) => Buf(b.counts.updated(a, c + 1))
      case None if b.counts.size < k => Buf(b.counts.updated(a, 1L))
      case None =>
        // Full and missing: decrement every counter (amortized O(1) per
        // item — each pass pays down k+1 total count including the new
        // item's, so passes are bounded by N/(k+1)).
        Buf(b.counts.collect { case (key, c) if c > 1 => key -> (c - 1) })
    }

  override def merge(b1: Buf, b2: Buf): Buf = {
    val sum = b2.counts.foldLeft(b1.counts) { case (m, (key, c)) =>
      m.updated(key, m.getOrElse(key, 0L) + c)
    }
    if (sum.size <= k) Buf(sum)
    else {
      // Subtract the (k+1)-th largest count from everything; at most k
      // keys can stay strictly positive afterwards.
      val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
      Buf(sum.collect { case (key, c) if c > cut => key -> (c - cut) })
    }
  }

  override def finish(b: Buf): Seq[String] = b.counts.keys.toSeq.sorted

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object FreqKAggregator {
  final case class Buf(counts: Map[String, Long])
}
