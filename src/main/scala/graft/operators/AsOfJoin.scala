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
  ): DataFrame = {
    val factCols = fact.columns.toSeq
    val dimSide = dim.select(
      keyCols.map(col) ++
        Seq(col(dimTs).as("__ts"), lit(1).as("__is_dim")) ++
        valueCols.map(col) ++
        factCols.filterNot(c => keyCols.contains(c)).map(c => lit(null).cast(fact.schema(c).dataType).as(c)): _*
    )
    val factSide = fact.select(
      keyCols.map(col) ++
        Seq(col(factTs).as("__ts"), lit(0).as("__is_dim")) ++
        valueCols.map(c => lit(null).cast(dim.schema(c).dataType).as(c)) ++
        factCols.filterNot(c => keyCols.contains(c)).map(col): _*
    )
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts").asc, col("__is_dim").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.foldLeft(factSide.unionByName(dimSide)) { case (df, v) =>
      df.withColumn(v, last(col(v), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("__is_dim") === 0)
      .select(factCols.map(col) ++ valueCols.map(col): _*)
  }
}
