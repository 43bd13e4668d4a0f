package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Streaming
import graft.operators.WordCount

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf0001

  test("streaming word count equals the batch pipeline result") {
    val streamed = Streaming.streamWordCounts(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = WordCount.counts(
        WordCount.tokenize(graft.sources.Tables.documents(spark, sf), "text"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed === batch)
  }

  test("stateful user totals equal the batch aggregation") {
    import org.apache.spark.sql.functions._
    val streamed = Streaming.streamUserTotals(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val batch = graft.sources.Tables.events(spark, sf)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(streamed === batch)
  }
}
