package graft

import graft.operators.{Curate, Dedup}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling harness (not part of the library surface). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession
      .builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROFILE $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.t(spark, sfDir, "documents")

    val sig = time("withMinhash+checkpoint") {
      Dedup.withMinhash(docs.select(col("doc_id"), col("text")), Seq("doc_id"), col("text"), 8).localCheckpoint()
    }
    time("sig.count")(println(sig.count()))
    val q22 = Dedup.minhashNearDupPairs(docs, "doc_id", "text", 8, 4, 0.8, 4)
    println("==== q22 plan ====")
    println(q22.queryExecution.executedPlan.toString.linesIterator.filter(l =>
      l.contains("Join") || l.contains("Exchange") || l.contains("Scan") || l.contains("Broadcast")).mkString("\n"))
    time("q22 full")(q22.count())
    time("q49 curate") {
      Curate.curate(docs).count()
    }
    spark.stop()
  }
}
