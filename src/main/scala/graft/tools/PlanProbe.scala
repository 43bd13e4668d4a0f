package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: execute one SparkEntry query under bench-like session
  * settings and print the AQE-final physical plan. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.write.format("noop").mode("overwrite").save()
    println("=== FINAL PLAN " + name + " ===")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
