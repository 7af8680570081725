package graft

import graft.streaming.EventStream
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling/debug harness (not part of the library surface). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession
      .builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = Tables
      .events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
    val streamed = EventStream.sessionizeOneShot(spark, ev, "graft_dbg")
    println(s"STREAMED sessions: ${streamed.count()}")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val batch = ev
      .withColumn("prev", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn(
        "new_s",
        when(col("prev").isNull || unix_micros(col("ts")) - col("prev") > 30L * 60 * 1000000, 1).otherwise(0),
      )
      .withColumn("sid", sum(col("new_s")).over(w))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("ts")).as("s"), max(col("ts")).as("e"), count(lit(1)).as("n"))
    println(s"BATCH sessions: ${batch.count()}")
    val sj = streamed.select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
    val bj = batch.select(col("user_id"), col("s").as("session_start"), col("e").as("session_end"), col("n").as("n_events"))
    println("stream MINUS batch:")
    sj.exceptAll(bj).show(10, false)
    println("batch MINUS stream:")
    bj.exceptAll(sj).show(10, false)
    spark.stop()
  }
}
