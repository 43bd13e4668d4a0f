package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only sub-step timer for the composed curation pipelines: times
  * each staged frame of the qm/dsir samples pipelines in isolation so a
  * regression localizes to redact / near-dup / fit / score / chunk
  * rather than to "the query". Not part of the driver contract. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    (1 to 2).foreach { round =>
      println(s"=== round $round ===")
      val docs = graft.sources.Tables.documents(spark, sfDir)
      val red = t("red materialize") {
        graft.operators.Materialize.frame(docs
          .repartition(spark.sparkContext.defaultParallelism, $"doc_id")
          .select($"doc_id", $"lang",
            graft.operators.TextAnalysis.redactedCol($"text").as("text")))
      }
      println(s"[probe] red partitions = ${red.rdd.getNumPartitions}")
      val drop = t("ngram-jaccard drop") {
        graft.operators.Materialize.frame(
          graft.operators.Dedup.dedupNgramJaccardOnDocs(red.select($"doc_id", $"text"))
            .select($"doc_b".as("doc_id")).distinct())
      }
      val kept = red.join(drop, Seq("doc_id"), "left_anti")
      val freshKept = t("freshKept materialize") {
        graft.operators.Materialize.frame(kept
          .filter(pmod($"doc_id", lit(graft.operators.Dedup.SnapshotMod)) >=
            graft.operators.Dedup.SnapshotNewMin)
          .select($"doc_id", $"text")
          .repartition(spark.sparkContext.defaultParallelism, $"doc_id"))
      }
      println(s"[probe] freshKept partitions = ${freshKept.rdd.getNumPartitions}")
      val target = red
        .filter(pmod($"doc_id", lit(graft.operators.Dedup.SnapshotMod)) <
          graft.operators.Dedup.SnapshotNewMin && $"lang" === "en")
        .select($"text")
      val weights = t("dsir weights+select") {
        graft.operators.Curation.probeDsirSelect(target, freshKept)
      }
      t("samples tail") {
        graft.operators.Curation.probeSamplesOfGood(
          freshKept.join(weights.select($"doc_id"), Seq("doc_id"), "left_semi"))
          .write.format("noop").mode("overwrite").save()
      }
      // the r14 restaged dsir pipeline: artifact phase vs post-drop tail
      t("dsir r14 STAGED total") {
        graft.operators.Curation.probeDsirStaged(docs)
      }
    }
    spark.stop()
  }
}
