package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Curation

/** Pins the scale-safe two-pass packBins to the readable window
  * formulation, and keeps the single-partition funnel out of its plan. */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf0001

  test("pipeline summary equals the independent stage-by-stage composition") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // recompute the composition from the three ALREADY-CHECKED stage
    // queries (dedup_kept, text_quality, chunk arithmetic) and require
    // the one-dataflow pipeline to agree exactly
    val docs = graft.sources.Tables.documents(spark, sf).select($"doc_id", $"lang")
    val kept = graft.operators.Dedup.dedupKept(spark, sf).select($"doc_id")
    val quality = graft.operators.TextAnalysis.textQuality(spark, sf)
      .select($"doc_id", $"n_tokens", $"quality")
    val expected = docs.join(kept, "doc_id").join(quality, "doc_id")
      .filter($"quality" >= Curation.QualityCut)
      .select($"lang", $"n_tokens",
        ceil($"n_tokens".cast("double") / Curation.ChunkStride).cast("long").as("n_chunks"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chunks").as("n_chunks"),
        sum($"n_tokens").as("n_tokens"))
      .orderBy($"lang")
      .collect().map(_.toSeq).toSeq
    val got = Curation.pipelineCurate(spark, sf).collect().map(_.toSeq).toSeq
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("packBins ≡ the global-window formulation (differential)") {
    val fast = Curation.packBins(spark, sf).collect().map(_.toSeq)
    val ref = Curation.packBinsWindowed(spark, sf).collect().map(_.toSeq)
    assert(fast.toSeq == ref.toSeq)
  }

  test("packBins plan has no Window and no single-partition exchange") {
    val p = Curation.packBins(spark, sf).queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p.take(800))
    assert(!p.contains("SinglePartition"), p.take(800))
  }

  test("packBins bins respect the token budget invariants") {
    val rows = Curation.packBins(spark, sf).collect()
    val bins = rows.map(_.getLong(0))
    assert(bins.toSeq == bins.sorted.toSeq && bins.distinct.length == bins.length)
    // every bin's exclusive prefix starts inside the bin => bins contiguous
    assert(bins.zipWithIndex.forall { case (b, i) => b == bins(0) + i })
  }
}
