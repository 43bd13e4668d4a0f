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

  test("rolling RANGE window: boundary inclusion, peer rows, partition isolation") {
    import spark.implicits._
    val h = 3600000L
    val e = Seq(
      // user 1: events at 0, exactly 1h later (IN frame: boundary is
      // inclusive), 1h+1ms after the first (OUT for event 0's frame),
      // plus a timestamp PEER of event 2 (both always co-framed)
      (0L, 1L, 0L, 10L),
      (1L, 1L, h, 20L),
      (2L, 1L, h + 1, 30L),
      (3L, 1L, h + 1, 40L),
      // user 2 at the same instants: must not leak into user 1's frames
      (4L, 2L, h, 99L)
    ).toDF("event_id", "user_id", "t_ms", "cents")
    val got = graft.operators.Temporal.rollingWindowOn(e)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSeq
    assert(got === Seq(
      (0L, 1L, 10L),        // alone in its trailing hour
      (1L, 2L, 30L),        // includes event 0 (inclusive 1h boundary)
      (2L, 3L, 90L),        // events 1,2,3: 0 dropped, peer 3 included
      (3L, 3L, 90L),        // peer rows share the identical frame
      (4L, 1L, 99L)))       // user 2 isolated
  }
}
