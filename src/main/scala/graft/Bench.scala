package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, struct, sum, xxhash64}
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen/parquet-reader warmup so the first timed query doesn't
    // absorb session startup (measured ~3s on the first action otherwise).
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // Reduce every row to a hash and sum — a bare count() lets Catalyst
      // prune the projections, so expensive output columns (regex, JSON,
      // custom expressions) would never execute and the timing would not
      // measure what the correctness gate verifies.
      try {
        val out = fn(spark, sfDir)
        out
          .select(xxhash64(struct(out.columns.map(col): _*)).as("__h"))
          .agg(sum(col("__h")))
          .collect()
      } catch { case _: Throwable => }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
