package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tuner for the gate metric (not part of the driver contract):
  * sweeps the two knobs that govern the corpus word-count's task shape
  * — scan-split target bytes and reduce-side partition count — and
  * prints the median-of-3 wall for each combo, same measurement as
  * Bench's corpus run (full formattedBytes, file sink). The corpus is
  * 15 MB / ~57k vocabulary, so the optimum is dominated by fixed
  * per-task overhead, not data volume; this sweep is how the committed
  * defaults in WordCount.formattedBytes were (re)chosen.
  *
  *   sbt "runMain graft.tools.WcTune"
  */
object WcTune {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-wctune")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpusDir = new java.io.File("/root/reference/raw_text_input")
    val paths = corpusDir.list().sorted.map(f => s"${corpusDir.getPath}/$f").toSeq

    def run(): Unit = {
      val bytes = graft.operators.WordCount.formattedBytesInner(
        spark, paths, paths.head, includeUnique = true)
      val out = java.io.File.createTempFile("graft_wctune", ".txt")
      try java.nio.file.Files.write(out.toPath, bytes)
      finally out.delete()
    }
    def median3(): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
      }
      ts.sorted.apply(1)
    }

    spark.conf.set("spark.sql.files.openCostInBytes", (64L * 1024).toString)
    spark.conf.set("spark.sql.files.maxPartitionBytes", (256L * 1024).toString)
    run(); run() // warm
    for (splitKb <- Seq(128, 256, 512, 1024, 2048);
         shuffleParts <- Seq(4, 8, 16, 32)) {
      spark.conf.set("spark.sql.files.maxPartitionBytes", (splitKb * 1024L).toString)
      spark.conf.set("spark.sql.shuffle.partitions", shuffleParts.toString)
      val t = median3()
      println(f"[wctune] splitKb=$splitKb%5d shuffleParts=$shuffleParts%2d -> $t%.3f s")
    }
    spark.stop()
  }
}
