package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Watermark semantics under append mode across multiple micro-batches:
  * a window only emits once the watermark passes its end, and late data
  * behind the watermark is dropped — the part of event-time streaming a
  * bounded single-batch replay can't show. */
class WatermarkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("append-mode windowed agg finalizes windows and drops late rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val agg = input.toDF().toDF("ts", "v")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "10 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select($"w.start".as("start"), $"n")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("graft_wm_test").start()
    def t(min: Int) = new Timestamp(min * 60000L)
    try {
      // batch 1: two rows in window [0,10)
      input.addData((t(1), 1L), (t(2), 2L))
      q.processAllAvailable()
      assert(spark.table("graft_wm_test").count() === 0) // nothing finalized yet
      // batch 2: event at t=25 advances watermark to 15 -> window [0,10) closes
      input.addData((t(25), 3L))
      q.processAllAvailable()
      // batch 3: a late row for the closed window must be dropped
      input.addData((t(3), 4L))
      q.processAllAvailable()
      // batch 4: advance far enough to close [20,30) too
      input.addData((t(45), 5L))
      q.processAllAvailable()
      val rows = spark.table("graft_wm_test").collect()
        .map(r => r.getTimestamp(0).getTime / 60000L -> r.getLong(1)).toMap
      assert(rows.get(0L) === Some(2L), s"window[0,10) should have exactly the 2 on-time rows: $rows")
      assert(rows.get(20L) === Some(1L), s"window[20,30): $rows")
    } finally q.stop()
  }
}
