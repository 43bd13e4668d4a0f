package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Cross-consistency of the dedup family at sf0.001: the three near-dup
  * detectors must agree on the planted duplicate pairs. */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf0001

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("minhash LSH finds exactly the exact-jaccard pairs (perfect recall here)") {
    val exact = pairSet(Dedup.dedupNgramJaccard(spark, sf))
    val lsh = pairSet(Dedup.dedupMinHashLsh(spark, sf))
    assert(exact.nonEmpty, "test data should contain planted near-dup pairs")
    assert(lsh === exact)
  }

  test("near-dup pairs have small simhash hamming distance; random pairs do not") {
    val sims = Dedup.dedupSimHash(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val nearPairs = pairSet(Dedup.dedupNgramJaccard(spark, sf))
    val nearDists = nearPairs.toSeq.map { case (a, b) => hamming(sims(a), sims(b)) }
    assert(nearDists.forall(_ <= 8), s"near-dup hamming distances too large: $nearDists")
    // background distribution: consecutive unrelated docs
    val ids = sims.keys.toSeq.sorted
    val bg = ids.zip(ids.tail)
      .filterNot(p => nearPairs.contains(p))
      .take(100)
      .map { case (a, b) => hamming(sims(a), sims(b)) }
    assert(bg.count(_ > 8) > bg.size / 2,
      s"background hamming distances unexpectedly small: ${bg.take(20)}")
  }

  test("dedup_kept removes exactly the doc_b side of near-dup pairs") {
    val pairs = pairSet(Dedup.dedupNgramJaccard(spark, sf))
    val dropped = pairs.map(_._2)
    val keptIds = Dedup.dedupKept(spark, sf).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val allIds = graft.sources.Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptIds === allIds -- dropped)
  }

  test("exact dedup partitions all documents (sum of group sizes = row count)") {
    val total = graft.sources.Tables.documents(spark, sf).count()
    val groups = Dedup.dedupExact(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("n_dups")).collect()(0).getLong(0)
    assert(groups === total)
  }
}
