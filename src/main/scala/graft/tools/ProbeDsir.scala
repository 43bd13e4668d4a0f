package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only sub-step timer for the RESTAGED (r14 raw-first) DSIR
  * pipeline: times the two concurrent artifact chains separately, then
  * each post-barrier tail step, so the remaining wall localizes to
  * barrier-side (pair search vs weights) or tail (rank / chunk). Not
  * part of the driver contract. */
object ProbeDsir {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-probe-dsir")
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

    (1 to 3).foreach { round =>
      println(s"=== round $round ===")
      val docs = graft.sources.Tables.documents(spark, sfDir)
      val width = spark.sparkContext.defaultParallelism
      val raw = docs.repartition(width, $"doc_id").select($"doc_id", $"text")
      val target = docs
        .filter(pmod($"doc_id", lit(graft.operators.Dedup.SnapshotMod)) <
          graft.operators.Dedup.SnapshotNewMin && $"lang" === "en")
        .repartition(width, $"doc_id")
        .select($"text")
      val fresh = raw
        .filter(pmod($"doc_id", lit(graft.operators.Dedup.SnapshotMod)) >=
          graft.operators.Dedup.SnapshotNewMin)

      val drop = t("A: pair search") {
        graft.operators.Materialize.frame(
          graft.operators.Dedup.dedupNgramJaccardOnDocs(
              docs.select($"doc_id", $"text"))
            .select($"doc_b".as("doc_id")))
      }
      val tagged = target
        .select(lit(null).cast("long").as("doc_id"), $"text", lit(true).as("tgt"))
        .unionByName(fresh.select($"doc_id", $"text", lit(false).as("tgt")))
      val ex = t("B1: ex checkpoint") {
        graft.operators.Materialize.frame(
          graft.operators.TextAnalysis.qmFeatures(tagged)
            .groupBy($"tgt", $"doc_id", $"b").agg(count(lit(1)).as("k")))
      }
      val ct = ex.filter($"tgt").groupBy($"b").agg(sum($"k").as("c"))
      val rdfAll = ex.filter(!$"tgt").select($"doc_id", $"b", $"k")
      val wAll = t("B2: weights from rdf") {
        graft.operators.Materialize.frame(
          graft.operators.Curation.dsirWeightsFromRdf(ct, rdfAll))
      }
      val wKept = wAll.join(drop, Seq("doc_id"), "left_anti")
      val selected = t("T1: rank+select") {
        graft.operators.Curation.dsirSelectFrom(wKept).select($"doc_id")
      }
      val selCount = t("T1b: selected count") { selected.count() }
      println(s"[probe] selected = $selCount")
      val good = docs.join(selected, Seq("doc_id"), "left_semi")
        .select($"doc_id",
          graft.operators.TextAnalysis.redactedCol($"text").as("text"))
      val n = t("T2: samplesOfGood tail") {
        graft.operators.Curation.samplesOfGood(good).count()
      }
      println(s"[probe] rows = $n")
      spark.sharedState.cacheManager.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
