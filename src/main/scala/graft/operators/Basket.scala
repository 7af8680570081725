package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association mining: co-occurrence counts and lift over a
  * (basket, item) relation — the classic warehouse companion to the
  * recommendation features a training pipeline derives from event logs.
  */
object Basket {

  /** Top-`topK` item pairs by lift with support >= `minSupport`.
    *
    * lift(a,b) = P(a,b) / (P(a)·P(b)) over basket presence (multiplicity
    * within a basket is ignored — the standard formulation), emitted as the
    * exact scaled long `cnt_ab * nBaskets * 1e6 div (cnt_a * cnt_b)` —
    * integer arithmetic end-to-end, so cross-engine identical and safe to
    * rank on. Exact to ~3e6 baskets per verification shard
    * (`cnt_ab * nBaskets * 1e6` must fit a signed long); production ranks in
    * doubles beyond that, this form is the verification path.
    *
    * Scale design: the quadratic step is the per-basket pair fan-out
    * (self-equi-join on the basket key), bounded by the largest basket —
    * retail-shaped baskets are tens of items, so the shuffle carries
    * O(Σ |basket|²) fixed-width id pairs; `minSupport` then prunes the
    * pair tail before the lift joins, and the per-item count table is a
    * dimension-sized aggregate the optimizer broadcasts back. Pathological
    * mega-baskets (a basket == a crawl day) should be capped upstream —
    * the same guard stance as `jaccardPairs.maxBlockRows`. The deduped
    * (basket, item) relation feeds FOUR consumers (basket count, item
    * counts, both join sides) and Spark does not CSE DataFrame branches,
    * so it is materialized once ([[Lineage.truncate]] — the reliable-
    * checkpoint knob applies) instead of re-shuffling the corpus 4×.
    */
  def pairLift(
      baskets: DataFrame,
      basketCol: String,
      itemCol: String,
      minSupport: Long = 2,
      topK: Int = 100,
  ): DataFrame = {
    val items = Lineage.truncate(baskets.select(col(basketCol).as("b"), col(itemCol).as("i")).distinct())
    val n = items.agg(countDistinct(col("b")).as("n_baskets"))
    val itemCnt = items.groupBy(col("i")).agg(count(lit(1)).as("cnt"))
    val pairs = items
      .as("l")
      .join(items.as("r"), col("l.b") === col("r.b") && col("l.i") < col("r.i"))
      .groupBy(col("l.i").as("item_a"), col("r.i").as("item_b"))
      .agg(count(lit(1)).as("cnt_ab"))
      .filter(col("cnt_ab") >= minSupport)
    pairs
      .join(itemCnt.select(col("i").as("item_a"), col("cnt").as("cnt_a")), "item_a")
      .join(itemCnt.select(col("i").as("item_b"), col("cnt").as("cnt_b")), "item_b")
      .crossJoin(broadcast(n))
      .select(
        col("item_a"),
        col("item_b"),
        col("cnt_ab"),
        expr("cnt_ab * n_baskets * 1000000 div (cnt_a * cnt_b)").as("lift_scaled"),
      )
      .orderBy(col("lift_scaled").desc, col("item_a"), col("item_b"))
      .limit(topK)
  }
}
