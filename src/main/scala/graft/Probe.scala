package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, expr, struct, xxhash64}

/** Dev harness: time individual [[SparkEntry.queries]] entries in a warm JVM
  * (`runMain graft.Probe <sfDir> <query> [query...]`), with the same
  * pruning-proof hash action as [[Bench]]. Each query runs twice; the second
  * number is the one to compare (first absorbs codegen/reader warmup).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession
      .builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val out = fn(spark, sfDir)
        out.select(xxhash64(struct(out.columns.map(col): _*)).as("__h")).agg(expr("bit_xor(__h)")).collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $name cold=${times(0)}%.2fs warm=${times(1)}%.2fs")
    }
    spark.stop()
  }
}
