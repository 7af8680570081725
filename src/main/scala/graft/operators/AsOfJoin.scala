package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: attach to each fact row the most recent dimension state at or
  * before the fact's event time, per key — the temporal-enrichment operator
  * (slowly-changing dimensions, price-at-trade-time, last-profile-update).
  *
  * Implementation (prompt preference (a): compose built-ins): UNION the two
  * sides tagged, then one window pass per key ordered by (ts, dim-first) with
  * `last(value, ignoreNulls)` carrying the dimension state forward. ONE
  * sort-shuffle on (key, ts) total — no range-condition join (which Spark
  * would plan as a broadcast-nested-loop or an exploded range join), no
  * per-fact probe. At 100 TB both sides shuffle once, sorted merge happens
  * inside the window operator, and skewed keys split via AQE. Dimension rows
  * sort BEFORE facts at equal timestamps, giving inclusive (<=) as-of
  * semantics — the same as DuckDB's native ASOF JOIN (which the oracle uses).
  */
object AsOfJoin {

  /** Left as-of join. `dim` must be unique per (keyCols, dimTs) — pre-dedupe
    * (e.g. max per key+ts) for deterministic results. Fact columns pass
    * through; each `valueCols` entry appears with the dimension's value as of
    * the fact row's `factTs` (null when no earlier dimension row exists).
    */
  def asOf(
      fact: DataFrame,
      dim: DataFrame,
      keyCols: Seq[String],
      factTs: String,
      dimTs: String,
      valueCols: Seq[String],
  ): DataFrame = asOfImpl(fact, dim, keyCols, factTs, dimTs, valueCols, forward = false)

  /** FORWARD as-of join: the EARLIEST dimension state at or after the fact's
    * time, per key — "next quote after the order", "first profile update
    * following the signup", the lookahead mirror of [[asOf]]. Same single
    * (key, ts)-sorted union-window plan, with the frame reversed
    * (`first(value, ignoreNulls)` over current→following) and dim rows
    * sorting AFTER facts at equal timestamps so >= stays inclusive —
    * matching DuckDB's `ASOF JOIN ... ON dim.ts >= fact.ts`.
    */
  def asOfForward(
      fact: DataFrame,
      dim: DataFrame,
      keyCols: Seq[String],
      factTs: String,
      dimTs: String,
      valueCols: Seq[String],
  ): DataFrame = asOfImpl(fact, dim, keyCols, factTs, dimTs, valueCols, forward = true)

  /** Backward as-of join with a STALENESS BOUND: the most recent dimension
    * state at or before the fact's time — but only if it is at most
    * `toleranceMicros` old; staler state enriches as NULL ("a quote from
    * last week is not a quote"). Same single union-window plan: the carried
    * struct already holds the dim row's own timestamp, so the bound is one
    * projection-level comparison after the carry — no second join, no extra
    * shuffle.
    */
  def asOfWithin(
      fact: DataFrame,
      dim: DataFrame,
      keyCols: Seq[String],
      factTs: String,
      dimTs: String,
      valueCols: Seq[String],
      toleranceMicros: Long,
  ): DataFrame = {
    require(toleranceMicros > 0, s"asOfWithin: tolerance must be positive: $toleranceMicros")
    asOfImpl(fact, dim, keyCols, factTs, dimTs, valueCols, forward = false, tolerance = Some(toleranceMicros))
  }

  private def asOfImpl(
      fact: DataFrame,
      dim: DataFrame,
      keyCols: Seq[String],
      factTs: String,
      dimTs: String,
      valueCols: Seq[String],
      forward: Boolean,
      tolerance: Option[Long] = None,
  ): DataFrame = {
    val factCols = fact.columns.toSeq
    val reserved = Seq("__ts", "__is_dim", "__dim", "__dts")
    require(keyCols.nonEmpty, "asOf: at least one key column is required")
    require(
      valueCols.intersect(factCols).isEmpty && reserved.intersect(factCols ++ dim.columns).isEmpty,
      s"asOf: valueCols must not collide with fact columns, and ${reserved.mkString("/")} are reserved",
    )
    // Join-semantics guards: a NULL dim timestamp can never satisfy ts<=factTs,
    // and NULL keys never equality-match — drop such dim rows up front
    // (Spark's nulls-first ordering / null-grouping partitionBy would
    // otherwise let them enrich facts).
    val dimClean = dim.filter(col(dimTs).isNotNull && keyCols.map(col(_).isNotNull).reduce(_ && _))
    // Carry the dim row as ONE struct: last(ignoreNulls) then picks the last
    // dim ROW atomically — a dim row whose value fields are genuinely NULL
    // still wins (per-column carry would skip it and mix columns from
    // different dim rows).
    val dimSide = dimClean.select(
      keyCols.map(col) ++
        Seq(
          col(dimTs).as("__ts"),
          lit(1).as("__is_dim"),
          // the dim row's own timestamp rides in the struct so a staleness
          // bound is a post-carry projection, not a second join
          struct((col(dimTs).as("__dts") +: valueCols.map(col)): _*).as("__dim"),
        ) ++
        factCols.filterNot(c => keyCols.contains(c)).map(c => lit(null).cast(fact.schema(c).dataType).as(c)): _*
    )
    val factSide = fact.select(
      keyCols.map(col) ++
        Seq(col(factTs).as("__ts"), lit(0).as("__is_dim")) ++
        factCols.filterNot(c => keyCols.contains(c)).map(col): _*
    )
    val factTagged = factSide.withColumn(
      "__dim",
      lit(null).cast(dimSide.schema("__dim").dataType),
    )
    // Backward: dims sort BEFORE facts at equal ts (inclusive <=), state
    // carried by last(ignoreNulls) over preceding→current. Forward: dims
    // sort AFTER facts (inclusive >=), state pulled by first(ignoreNulls)
    // over current→following.
    val w0 = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts").asc, if (forward) col("__is_dim").asc else col("__is_dim").desc)
    val (w, carry) =
      if (forward)
        (w0.rowsBetween(Window.currentRow, Window.unboundedFollowing),
         first(col("__dim"), ignoreNulls = true))
      else
        (w0.rowsBetween(Window.unboundedPreceding, Window.currentRow),
         last(col("__dim"), ignoreNulls = true))
    val fresh = tolerance.fold(lit(true)) { tol =>
      if (forward) unix_micros(col("__dim.__dts")) - unix_micros(col("__ts")) <= tol
      else unix_micros(col("__ts")) - unix_micros(col("__dim.__dts")) <= tol
    }
    factTagged
      .unionByName(dimSide)
      .withColumn("__dim", carry.over(w))
      .filter(col("__is_dim") === 0)
      .select(
        factCols.map(col) ++
          valueCols.map(v => when(fresh, col(s"__dim.$v")).otherwise(lit(null)).as(v)): _*
      )
  }
}
