package graft

import org.apache.spark.sql.SparkSession

/** Drives the driver's t1 smoke contract locally: `SparkEntry.entry` on
  * sf0.001 must return rows. Prints the row count and the schema.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    df.printSchema()
    df.show(5, truncate = 120)
    println(s"[smoke] entry rows = ${df.count()}")
    spark.stop()
  }
}
