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

  test("simhash banded search finds exactly the capped-jaccard pairs") {
    val exact = pairSet(Dedup.dedupNgramJaccard(spark, sf))
    val banded = pairSet(Dedup.dedupSimHashPairs(spark, sf))
    assert(exact.nonEmpty)
    assert(banded === exact)
  }

  test("max-DF cap keeps a planted hot shingle out of the pair join") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 40 docs that all share one boilerplate shingle ("common header text")
    // but are otherwise disjoint; plus one genuine near-dup pair.
    val docs = ((0 until 40).map { i =>
      (i.toLong, s"common header text unique$i alpha$i beta$i gamma$i delta$i")
    } ++ Seq(
      // 12 tokens, last differs: 10 shingles, 9 common → j = 9/11 ≈ 0.818
      (100L, "zeta eta theta iota kappa lambda mu nu xi omicron pi rho"),
      (101L, "zeta eta theta iota kappa lambda mu nu xi omicron pi sigma"),
    )).toDF("doc_id", "text")
    val sh = Dedup.shingles(docs)
    // uncapped: the hot shingle alone contributes 40·39/2 = 780 candidate
    // pairs; capped at DF≤8 it contributes none, and the planted pair
    // (which shares only rare shingles) is still found at full jaccard.
    val capped = Dedup.dedupNgramJaccardOn(sh, maxDf = 8L)
      .select($"doc_a", $"doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(capped.toSet === Set((100L, 101L)))
    // and the capped inverted index itself is bounded: no shingle fans out
    // past the cap (this is the 100 TB shuffle-key guarantee)
    val fanout = sh.select($"doc_id", explode($"sh").as("s"))
      .groupBy($"s").count().filter(col("count") > 8).count()
    assert(fanout === 1, "exactly the planted hot shingle family exceeds the cap")
  }

  test("exact dedup partitions all documents (sum of group sizes = row count)") {
    val total = graft.sources.Tables.documents(spark, sf).count()
    val groups = Dedup.dedupExact(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("n_dups")).collect()(0).getLong(0)
    assert(groups === total)
  }
}
