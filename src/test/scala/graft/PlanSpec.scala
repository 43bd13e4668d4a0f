package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators._

/** Physical-plan shape assertions — the scale contract, kept honest in
  * CI: filters reach the parquet scan, dimension joins broadcast, top-k
  * avoids full sorts, aggregation is two-phase (map-side partial). */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf0001

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q2: predicate and projection are pushed into the parquet scan") {
    val p = plan(Relational.q2FilterProject(spark, sf))
    assert(p.contains("PushedFilters:"), p.take(500))
    assert(p.contains("GreaterThan(l_quantity") || p.contains("l_quantity"), p.take(500))
    // column pruning: unreferenced wide columns are absent from ReadSchema
    assert(!p.contains("l_comment"))
  }

  test("q4: dimension joins are broadcast, not shuffled") {
    val p = plan(Relational.q4StarJoinNationRevenue(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p.take(800))
  }

  test("q5: top-k plans as TakeOrderedAndProject (no global sort)") {
    val p = plan(Relational.q5TopOrders(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
  }

  test("word count: two-phase hash aggregation with whole-stage codegen") {
    val counts = WordCount.counts(
      WordCount.tokenize(graft.sources.Tables.documents(spark, sf), "text"))
    val p = plan(counts)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(800))
    // the fused tokenizer replaces split/explode/normalize/filter with a
    // single Generate directly over the scan
    assert(p.contains("Generate tokenize_normalize"), p.take(800))
    assert(!p.contains("+- Filter"), p.take(800))
  }

  test("q1: partial aggregation precedes the exchange") {
    val p = plan(Relational.q1PricingSummary(spark, sf))
    val exchangeIdx = p.indexOf("Exchange")
    val partialIdx = p.indexOf("partial_")
    assert(exchangeIdx > 0 && partialIdx > 0, p.take(800))
  }
}
