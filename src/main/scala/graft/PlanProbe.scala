package graft
import org.apache.spark.sql.SparkSession

/** Dev harness: dump the AQE-finalized executed plan of one
  * [[SparkEntry.queries]] entry (`runMain graft.PlanProbe <query> <sfDir>`) —
  * the plan-shape companion to [[Probe]]'s timings.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args(0))(spark, args(1))
    df.collect()
    println(df.queryExecution.executedPlan.toString.take(6000))
    spark.stop()
  }
}
