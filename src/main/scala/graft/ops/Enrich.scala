package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dimension-lookup enrichment with first-match semantics (J1/J3, reference
  * `src/parser.py:64-70`, `src/parser2.py:126-134`; SURVEY §2.4).
  *
  * The reference does a nested-loop probe that `break`s on the FIRST matching
  * lookup row in file order — the lookup table has duplicate keys (country
  * row + per-province rows), so first-match is semantically load-bearing.
  *
  * Spark mapping: dedupe the build side to one row per key *before* the join
  * (window `row_number() == 1` over an explicit order column), then broadcast
  * left-outer join. The dedup runs once over the ~4k-row dimension (cheap);
  * the fact side is never shuffled — at 100 TB the plan is scan → broadcast
  * hash join → project, all inside one codegen stage. `dropDuplicates` would
  * NOT work here: it keeps an arbitrary row, not the first (SURVEY §7.3-1).
  */
object Enrich {

  /** Stamp a file-order row id on a freshly read small dimension. Only
    * deterministic when the source is a single partition/file (true for the
    * reference's one lookup CSV); for pre-ordered data pass any explicit
    * order column to [[firstMatch]] instead.
    */
  def withFileOrder(df: DataFrame, name: String = "__row_id"): DataFrame =
    df.coalesce(1).withColumn(name, monotonically_increasing_id())

  /** First row per key by `orderCol` — the build side for a first-match join. */
  def firstMatch(lookup: DataFrame, keyCols: Seq[String], orderCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol))
    lookup
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** J1/J3 — left-outer broadcast enrich. `projections` maps lookup columns to
    * output names (with casts), e.g. `iso2 -> country-iso2` (reference
    * `src/parser.py:67-69`). No match → nulls; the JSON writer's default
    * `ignoreNullFields=true` then reproduces the reference's absent-key
    * output (E3, SURVEY §1.2).
    */
  def enrich(
      fact: DataFrame,
      lookup: DataFrame,
      factKey: Seq[String],
      lookupKey: Seq[String],
      orderCol: String,
      projections: Seq[(Column, String)],
  ): DataFrame = {
    val dim = firstMatch(lookup, lookupKey, orderCol)
      .select((lookupKey.map(col) ++ projections.map { case (c, n) => c.as(n) }): _*)
    val cond = factKey
      .zip(lookupKey)
      .map { case (f, l) => fact(f) === dim(l) }
      .reduce(_ && _)
    val joined = fact.join(broadcast(dim), cond, "left_outer")
    joined.select(
      fact.columns.map(fact(_)).toSeq ++ projections.map { case (_, n) => joined(n) }: _*
    )
  }
}
