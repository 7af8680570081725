package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Testdata access + cross-engine determinism helpers.
  *
  * The driver hash-compares our parquet output against DuckDB running the
  * `oracleSql` on the same tables (BASELINE.md "Rebuild target"). Floating
  * point sums are order-dependent and Spark's partial aggregation order is
  * nondeterministic, so every SUM/AVG over a double column goes through an
  * exact DECIMAL accumulator and is cast back to double at the end — both
  * engines then produce bit-identical doubles regardless of execution order.
  */
object Tables {

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects; read it as long nanos (legacy conf) and narrow to microsecond
    * timestamps (truncation — matches DuckDB's ns→formatted-second behavior
    * for the oracle).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(spark, sfDir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Order-independent exact sum of a (money-like) double column: the cast to
    * DECIMAL(18,4) is unambiguous because the doubles encode <=2-decimal
    * values, and decimal addition is exact and associative.
    */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast("double")

  /** Deterministic average built from the exact sum. */
  def davg(c: Column): Column = (sum(c.cast(DecimalType(18, 4))).cast("double") / count(c))

  /** DuckDB-side equivalents, for composing oracle SQL. */
  def dsumSql(c: String): String = s"CAST(SUM(CAST($c AS DECIMAL(18,4))) AS DOUBLE)"
  def davgSql(c: String): String = s"CAST(SUM(CAST($c AS DECIMAL(18,4))) AS DOUBLE) / COUNT($c)"
}
