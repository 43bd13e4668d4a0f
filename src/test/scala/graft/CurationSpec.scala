package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Curation

/** Pins the scale-safe two-pass packBins to the readable window
  * formulation, and keeps the single-partition funnel out of its plan. */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf0001

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
