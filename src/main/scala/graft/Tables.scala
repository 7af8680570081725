package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DecimalType, LongType, TimestampNTZType, TimestampType}

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

  /** Schema-adaptive `events` reader. The driver may regenerate the testdata
    * between rounds with a different physical encoding for `ts` (observed:
    * parquet TIMESTAMP(NANOS) through round 7, plain timestamp[us] from
    * round 8), so we bind to the LOGICAL schema and normalize every variant
    * to session-zoned microsecond `TimestampType` — the type every
    * downstream watermark/window/interval operator was written against:
    *
    *  - `TimestampNTZType` (timestamp[us], isAdjustedToUTC=false): cast to
    *    `timestamp`. Sessions run with `spark.sql.session.timeZone=UTC`, so
    *    the cast is value-preserving.
    *  - `TimestampType`: already what we want — pass through.
    *  - `LongType`: legacy nanos surfaced via
    *    `spark.sql.legacy.parquet.nanosAsLong`; narrow ns → µs (truncation,
    *    matching DuckDB's read of the same file).
    *
    * A parquet TIMESTAMP(NANOS) file makes the plain read throw at schema
    * conversion; only then do we flip the legacy conf and retry — the conf
    * is never touched for modern encodings (it globally changes how nanos
    * columns load for the whole session, so an unconditional set inside a
    * table accessor would be a side effect on unrelated reads).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw =
      try t(spark, sfDir, "events")
      catch {
        case scala.util.control.NonFatal(_) =>
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          t(spark, sfDir, "events")
      }
    raw.schema("ts").dataType match {
      case TimestampType    => raw
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case other =>
        throw new IllegalStateException(
          s"testdata schema drift: events.ts is ${other.simpleString}, expected timestamp/timestamp_ntz/bigint(ns)")
    }
  }

  /** One loud session-start probe against testdata drift: asserts each
    * table's binding columns carry a type the engine can consume, so a
    * regenerated parquet fails here with ONE diagnostic line naming the
    * field instead of as dozens of scattered AnalysisExceptions downstream.
    * Timestamp-like columns accept every variant `events` can adapt to.
    */
  def assertTestdataSchema(spark: SparkSession, sfDir: String): Unit = {
    val ints: Set[DataType] = Set(LongType, org.apache.spark.sql.types.IntegerType)
    val ts: Set[DataType]   = Set(TimestampType, TimestampNTZType, LongType)
    val str: Set[DataType]  = Set(org.apache.spark.sql.types.StringType)
    val dbl: Set[DataType]  = Set(org.apache.spark.sql.types.DoubleType)
    val expected: Seq[(String, Seq[(String, Set[DataType])])] = Seq(
      "region"    -> Seq("r_regionkey" -> ints, "r_name" -> str),
      "nation"    -> Seq("n_nationkey" -> ints, "n_name" -> str, "n_regionkey" -> ints),
      "customer"  -> Seq("c_custkey" -> ints, "c_name" -> str, "c_nationkey" -> ints,
                         "c_acctbal" -> dbl, "c_mktsegment" -> str),
      "supplier"  -> Seq("s_suppkey" -> ints, "s_name" -> str, "s_nationkey" -> ints, "s_acctbal" -> dbl),
      "part"      -> Seq("p_partkey" -> ints, "p_name" -> str, "p_brand" -> str, "p_type" -> str,
                         "p_retailprice" -> dbl),
      "orders"    -> Seq("o_orderkey" -> ints, "o_custkey" -> ints, "o_orderstatus" -> str,
                         "o_totalprice" -> dbl, "o_orderdate" -> ts, "o_orderpriority" -> str),
      "lineitem"  -> Seq("l_orderkey" -> ints, "l_partkey" -> ints, "l_suppkey" -> ints,
                         "l_quantity" -> dbl, "l_extendedprice" -> dbl, "l_discount" -> dbl,
                         "l_tax" -> dbl, "l_returnflag" -> str, "l_linestatus" -> str,
                         "l_shipdate" -> ts),
      "events"    -> Seq("event_id" -> ints, "ts" -> ts, "user_id" -> ints,
                         "event_type" -> str, "value" -> dbl, "props" -> str),
      "documents" -> Seq("doc_id" -> ints, "text" -> str, "lang" -> str, "source" -> str,
                         "n_chars" -> ints),
      "embeddings" -> Seq("vec_id" -> ints, "label" -> ints,
                          "embedding" -> Set[DataType](
                            org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, true),
                            org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, false))),
    )
    val drift = expected.flatMap { case (table, cols) =>
      val schema =
        try {
          if (table == "events") events(spark, sfDir).schema else t(spark, sfDir, table).schema
        } catch {
          case scala.util.control.NonFatal(e) =>
            throw new IllegalStateException(
              s"testdata schema drift: cannot read $sfDir/$table.parquet: ${e.getMessage.takeWhile(_ != '\n')}")
        }
      val byName = schema.fields.map(f => f.name -> f.dataType).toMap
      cols.flatMap { case (name, ok) =>
        byName.get(name) match {
          case None => Some(s"$table.$name missing (have: ${schema.fieldNames.mkString(",")})")
          case Some(dt) if !ok(dt) =>
            Some(s"$table.$name is ${dt.simpleString}, expected one of ${ok.map(_.simpleString).mkString("/")}")
          case _ => None
        }
      }
    }
    if (drift.nonEmpty)
      throw new IllegalStateException(s"testdata schema drift: ${drift.mkString("; ")}")
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
