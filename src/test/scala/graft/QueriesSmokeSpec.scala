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
    val maps = Seq(
      "relational" -> Relational.queries.keySet,
      "wordcount" -> WordCount.queries.keySet)
    val all = maps.flatMap(_._2)
    assert(all.size === all.distinct.size, "duplicate query keys across modules")
  }

  test("every query returns rows at sf0.001") {
    val spark = SparkTestSession.spark
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, SparkTestSession.sf0001).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }
}
