package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract checks over the assembled driver surface: unique keys, every
  * oracle key backed by a query, every query runnable at sf0.001 with the
  * schema the oracle expects (column-name parity is what the driver's
  * hash compare keys on). */
class QueriesSmokeSpec extends AnyFunSuite {

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("module query maps do not collide on keys") {
    import graft.operators._
    import graft.streaming.Streaming
    // every module that feeds SparkEntry.queries — a collision would be
    // silently resolved by Map ++ and drop a query from the driver surface
    val moduleSizes = Seq(
      Relational.queries.size, WordCount.queries.size, Dedup.queries.size,
      Similarity.queries.size, TextAnalysis.queries.size,
      Multimodal.queries.size, Streaming.queries.size,
      Temporal.queries.size, Sessions.queries.size, Curation.queries.size)
    assert(SparkEntry.queries.size === moduleSizes.sum,
      "duplicate query keys across modules (Map ++ dropped an entry)")
  }

  test("every query returns rows at sf0.001") {
    val spark = SparkTestSession.spark
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, SparkTestSession.sf0001).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }
}
