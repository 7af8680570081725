package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Wide→nested / wide→long reshape — the reference's signature operator
  * (R1, reference `src/parser.py:28-41`; SURVEY §2.3).
  *
  * Two forms, both shuffle-free where possible:
  *
  *  - [[nest]] — the faithful mapping of `fix_record`: fold all date columns
  *    of a row into `time_series: array<struct<date,value>>` in column
  *    (= chronological) order. A pure projection: no shuffle, no sort, order
  *    exact by construction. At 100 TB this is the only shape that scales —
  *    the relational alternative (`melt` + `collect_list`) shuffles the entire
  *    fact table and needs `sort_array` to repair nondeterministic
  *    post-shuffle order.
  *
  *  - [[melt]] — relational long form via Spark's built-in `unpivot`
  *    (codegen'd Expand, no shuffle). The right intermediate for joins and
  *    aggregation over the time dimension, and for parser2's per-date merge.
  */
object Unpivot {

  /** R1 nest: `time_series` = array(struct(dateLiteral, cast(col, int))).
    * `dateCols` must be in chronological order (CSV column order); each
    * element's `date` is the driver-normalized literal (P4), so Catalyst
    * constant-folds it — per row only the int casts execute.
    */
  def nest(df: DataFrame, dateCols: Seq[String], valueType: String = "int"): DataFrame = {
    val elems: Seq[Column] = dateCols.map { c =>
      struct(
        lit(Normalize.normalizeDateName(c)).as("date"),
        col(c).cast(valueType).as("value"),
      )
    }
    val keep = df.columns.filterNot(dateCols.contains).map(col)
    df.select((array(elems: _*).as("time_series") +: keep.toSeq): _*)
  }

  /** Long form: one row per (id, variable, value). Spark's native `unpivot`
    * plans as an Expand (row generator) inside whole-stage codegen — no
    * shuffle, streams at scan speed.
    */
  def melt(
      df: DataFrame,
      idCols: Seq[String],
      valueCols: Seq[String],
      varName: String = "variable",
      valName: String = "value",
  ): DataFrame =
    df.unpivot(idCols.map(col).toArray, valueCols.map(col).toArray, varName, valName)

  /** Melt the reference's dynamic date columns (discovered by P1 regex) into
    * `(…, date, value)` with P4-normalized date strings. The date rename is a
    * driver-side map over column names; per-row work is just the Expand.
    */
  def meltDates(df: DataFrame, valueType: String = "int"): DataFrame = {
    val cls = Normalize.classify(df.columns.toSeq)
    val renamed = df.select(
      (cls.other ++ cls.latLong).map(col) ++
        cls.dateCols.map(c => col(c).as(Normalize.normalizeDateName(c))): _*
    )
    val long = melt(
      renamed,
      (cls.other ++ cls.latLong).toSeq,
      cls.dateCols.map(Normalize.normalizeDateName),
      "date",
      "raw_value",
    )
    long.withColumn("value", col("raw_value").cast(valueType)).drop("raw_value")
  }

  /** Re-nest a long form back into an ordered array-of-structs.
    * `collect_list` order is undefined after a shuffle (SURVEY §7.3-2), so the
    * array is built sorted: `sort_array` on a struct whose FIRST field is the
    * sort key. One shuffle (the groupBy) — unavoidable for re-nesting; prefer
    * [[nest]] when the input is still wide.
    */
  def renest(
      long: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      valueCols: Seq[String],
      arrayName: String = "time_series",
  ): DataFrame = {
    val elem = struct((orderCol +: valueCols).map(col): _*)
    long
      .groupBy(keyCols.map(col): _*)
      .agg(sort_array(collect_list(elem)).as(arrayName))
  }
}
