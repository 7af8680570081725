package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed bounded min-k aggregator over 64-bit hashes — the KMV ("k minimum
  * values") distinct-count sketch builder. Per group it keeps the k SMALLEST
  * distinct hash values; the k-th smallest estimates the group's distinct
  * cardinality as `(k-1) / (h_k / 2^60)` (hashes are
  * [[Hashing.hash64]]-uniform on [0, 2^60)).
  *
  * Why this over `approx_count_distinct`: HLL++ registers are
  * implementation-defined — no other engine reproduces them, so the result
  * can't be oracled. A KMV sketch is a pure ORDER STATISTIC of a
  * deterministic hash: any engine that can sort reproduces it bit-for-bit,
  * and two sketches merge by keeping the k smallest of their union (the
  * `merge` below), which makes it a legitimate distributed sketch — partial
  * aggregation ships at most k longs per (group × partition), never the
  * distinct set itself.
  *
  * Buffer is a sorted List (k is small, default 64); duplicate hashes are
  * rejected on insert so the sketch sees the DISTINCT hash stream without a
  * pre-distinct shuffle.
  */
class MinKAggregator(k: Int) extends Aggregator[Long, MinKAggregator.Buf, Seq[Long]] {
  import MinKAggregator.Buf
  require(k > 0, s"k must be positive: $k")

  override def zero: Buf = Buf(Nil)

  private def insert(items: List[Long], x: Long): List[Long] = {
    // Steady state: one comparison rejects anything not below the current
    // k-th smallest; the O(k) splice also drops exact duplicates.
    if (items.lengthCompare(k) >= 0 && x >= items.last) items
    else {
      val (ahead, behind) = items.span(_ < x)
      if (behind.headOption.contains(x)) items
      else (ahead ::: x :: behind).take(k)
    }
  }

  override def reduce(b: Buf, a: Long): Buf = Buf(insert(b.items, a))

  override def merge(b1: Buf, b2: Buf): Buf =
    Buf(b2.items.foldLeft(b1.items)(insert))

  override def finish(b: Buf): Seq[Long] = b.items

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object MinKAggregator {
  final case class Buf(items: List[Long])
}
