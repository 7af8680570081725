package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join/aggregate via key salting.
  *
  * AQE's skew-join splitting (on by default) handles most shuffle skew at
  * runtime; salting is the explicit, plan-level tool for the cases AQE can't
  * touch — e.g. a broadcast-too-big dimension with a handful of mega-keys,
  * or aggregation skew. Pattern:
  *
  *  - fact side: append a random-ish salt in `[0, buckets)` derived from a
  *    uniform row attribute (deterministic — no RNG, replayable).
  *  - dim side: explode each row into all `buckets` salts.
  *  - join on (key, salt): the mega-key's rows now spread over `buckets`
  *    reducers instead of one straggler.
  *
  * Two-phase aggregate: partial agg on (key, salt), final agg on key — same
  * rebalancing for `groupBy` hotspots.
  */
object SkewJoin {

  /** Deterministic salt from an arbitrary unique-ish column (e.g. the fact
    * table's primary key): uniform, reproducible, shippable to any engine.
    */
  def salt(uniqueCol: Column, buckets: Int): Column =
    pmod(xxhash64(uniqueCol), lit(buckets))

  /** Salted equi-join: `fact ⋈ dim` on `key`, with `dim` replicated
    * `buckets`× and `fact` salted by `saltSource`.
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      saltSource: Column,
      buckets: Int,
      joinType: String = "inner",
  ): DataFrame = {
    val salted = fact.withColumn("__salt", salt(saltSource, buckets))
    val replicated = dim
      .withColumn("__salt", explode(array((0 until buckets).map(lit): _*)))
    salted
      .join(replicated, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /** Two-phase (salted) aggregation: partial on (key, salt), final on key.
    * `partials` build the salted stage from input columns; `finals` fold the
    * partials — e.g. partial `sum(x) as s` then final `sum(s)`.
    */
  def saltedAgg(
      df: DataFrame,
      key: String,
      saltSource: Column,
      buckets: Int,
      partials: Seq[Column],
      finals: Seq[Column],
  ): DataFrame =
    df.withColumn("__salt", salt(saltSource, buckets))
      .groupBy(col(key), col("__salt"))
      .agg(partials.head, partials.tail: _*)
      .groupBy(col(key))
      .agg(finals.head, finals.tail: _*)

  /** Skew profile for a prospective shuffle key: the top-`topN` heaviest
    * keys with their global share (basis points, exact integer) and the
    * salt bucket count that would level each onto `targetRowsPerTask`-row
    * reducers — the measurement that decides BETWEEN plain shuffle, AQE
    * skew split, and explicit salting, instead of guessing.
    *
    * Shape: one map-side-combined count aggregate (the only corpus-sized
    * shuffle), a broadcast-scalar total, and a TakeOrdered top-N — no sort
    * of the full key census. Deterministic order: count desc, then key.
    */
  def skewReport(
      df: DataFrame,
      key: String,
      targetRowsPerTask: Long = 1000000L,
      topN: Int = 20,
  ): DataFrame = {
    require(targetRowsPerTask > 0, s"targetRowsPerTask must be positive: $targetRowsPerTask")
    val counts = Lineage.truncate(df.groupBy(col(key)).agg(count(lit(1)).as("cnt")))
    val total = counts.agg(sum(col("cnt")).as("__total"))
    counts
      .crossJoin(broadcast(total))
      .orderBy(col("cnt").desc, col(key))
      .limit(topN)
      .select(
        col(key),
        col("cnt"),
        expr("cnt * 10000 div __total").as("share_bp"),
        expr(s"(cnt + ${targetRowsPerTask - 1}) div $targetRowsPerTask").as("salt_buckets"),
      )
  }

  /** Shuffle-bucket skew audit: hash the join/partition key the way an
    * exchange would ([[graft.functions.Hashing.hash64]] mod `buckets` — a
    * deterministic, engine-mirrorable stand-in for the engine's
    * partitioner) and report each bucket's row count plus its load relative
    * to the perfect split in per-mille (`1000` = exactly fair; the max row
    * answers "what does the slowest reducer carry?"). The pre-flight a
    * planner reads before picking salt factors for a 100 TB shuffle.
    *
    * Scale: one partial-aggregating groupBy into exactly `buckets` rows;
    * the fairness window runs over those `buckets` rows, not the input.
    */
  def keyHashSkewAudit(df: DataFrame, key: Column, buckets: Int = 32): DataFrame = {
    require(buckets >= 1, s"keyHashSkewAudit: bad buckets $buckets")
    import org.apache.spark.sql.expressions.Window
    df.groupBy(pmod(graft.functions.Hashing.hash64(key), lit(buckets.toLong)).as("bucket"))
      .agg(count(lit(1)).as("n"))
      .withColumn("__tot", sum(col("n")).over(Window.partitionBy()))
      .select(
        col("bucket"),
        col("n"),
        expr(s"n * $buckets * 1000 div __tot").as("load_milli"),
      )
  }
}
