package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed exact top-k aggregator: per group, keep the k highest-scoring
  * (score, id) pairs; ties broken by lower id (deterministic).
  *
  * Why this exists (SURVEY §4.3 — the one custom-aggregate candidate): the
  * window formulation (`row_number().over(partitionBy(g).orderBy(score))`)
  * SORTS every group in full after shuffling every row. This Aggregator is
  * a bounded structure updated in the partial-aggregation (map) phase, so
  * the shuffle carries at most k pairs per (group × partition) — at 100 TB
  * that's the difference between shuffling the corpus and shuffling k rows
  * per group.
  *
  * Buffer is a plain sorted List (k is small); `Encoders.product` keeps the
  * buffer serializable between partial and final aggregation.
  */
class TopKAggregator(k: Int) extends Aggregator[(Double, Long), TopKAggregator.Buf, Seq[(Double, Long)]] {
  import TopKAggregator.Buf
  require(k > 0, s"k must be positive: $k")

  override def zero: Buf = Buf(Nil)

  // descending by score, ascending by id on ties
  private def outranks(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(items: List[(Double, Long)], x: (Double, Long)): List[(Double, Long)] = {
    // O(k) splice at the insertion point, not a per-row re-sort; once the
    // buffer is full, rows that don't outrank the current k-th are rejected
    // in one comparison — the steady state for most of a partition's rows.
    if (items.lengthCompare(k) >= 0 && !outranks(x, items.last)) items
    else {
      val (ahead, behind) = items.span(outranks(_, x))
      (ahead ::: x :: behind).take(k)
    }
  }

  override def reduce(b: Buf, a: (Double, Long)): Buf = Buf(insert(b.items, a))

  override def merge(b1: Buf, b2: Buf): Buf =
    Buf((b1.items ++ b2.items).sortBy { case (s, id) => (-s, id) }.take(k))

  override def finish(b: Buf): Seq[(Double, Long)] = b.items

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object TopKAggregator {
  final case class Buf(items: List[(Double, Long)])
}
