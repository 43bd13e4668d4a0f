package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational

class RelationalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf0001

  test("approx percentiles track the exact ones within the rank-error bound") {
    // accuracy=10000 bounds rank error at n/10000; with the additional
    // interpolation difference (exact `percentile` interpolates between
    // elements, the sketch returns an actual element) the observed
    // relative value error on this data stays well under 2%
    def byFlag(df: org.apache.spark.sql.DataFrame): Map[String, (Double, Double, Double, Long)] =
      df.collect().map { r =>
        r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4))
      }.toMap
    val exact = byFlag(Relational.q26Percentiles(spark, sf))
    val approx = byFlag(Relational.q26PercentilesApprox(spark, sf))
    assert(exact.keySet === approx.keySet)
    for ((flag, (e50, e90, e99, en)) <- exact) {
      val (a50, a90, a99, an) = approx(flag)
      assert(an === en, s"count drift for $flag")
      for (((e, a), p) <- Seq(e50 -> a50, e90 -> a90, e99 -> a99).zip(Seq("p50", "p90", "p99")))
        assert(math.abs(a - e) / e < 0.02, s"$flag $p: exact=$e approx=$a")
    }
  }

  test("approx percentiles partial-aggregate before the exchange (mergeable sketch)") {
    val p = Relational.q26PercentilesApprox(spark, sf).queryExecution.executedPlan.toString
    val exchangeIdx = p.indexOf("Exchange")
    val partialIdx = p.indexOf("partial_")
    assert(exchangeIdx > 0 && partialIdx > 0, p.take(800))
    assert(partialIdx > exchangeIdx, // plan prints top-down: partial is BELOW the exchange
      s"partial agg must precede the exchange\n${p.take(800)}")
  }
}
