package graft.tools
import org.apache.spark.sql.SparkSession
object TagProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("tag-probe").config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sc = spark.sparkContext
    import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
    val cpu = new java.util.concurrent.atomic.AtomicLong
    sc.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        if (e.stageInfo.taskMetrics != null) cpu.addAndGet(e.stageInfo.taskMetrics.executorCpuTime/1000000L)
    })
    def job(): Unit = spark.range(1L<<27).selectExpr("sum(id % 1000000)").collect()
    def measure(label: String)(f: => Unit): Unit = {
      cpu.set(0); val t0=System.nanoTime(); f
      org.apache.spark.graftshim.ListenerShim.drain(sc)
      println(f"[probe] $label%-12s wall ${(System.nanoTime()-t0)/1e9}%6.3f s  cpu ${cpu.get}%6d ms")
    }
    job() // warm
    (1 to 3).foreach { _ =>
      measure("no-tag")(job())
      sc.addJobTag("probe-tag")
      measure("tagged")(job())
      sc.removeJobTag("probe-tag")
      sc.setJobGroup("probe-group","g",true)
      measure("grouped")(job())
      sc.clearJobGroup()
    }
    spark.stop()
  }
}
