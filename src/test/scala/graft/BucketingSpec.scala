package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Bucketing — the shuffle-elimination lever for repeated co-located
  * joins at scale (SURVEY §2.2 / build-prompt "bucketing for co-located
  * joins"): two tables bucketed on the join key join WITHOUT a shuffle
  * exchange on either side. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("bucketed tables join without shuffle exchanges") {
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      val sf = SparkTestSession.sf0001
      Tables.orders(spark, sf).write.mode("overwrite")
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable("graft_orders_bucketed")
      Tables.customer(spark, sf).write.mode("overwrite")
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .saveAsTable("graft_customer_bucketed")
      val joined = spark.table("graft_orders_bucketed")
        .join(spark.table("graft_customer_bucketed"),
          $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must not shuffle either side; the only allowed
      // Exchange is the one feeding the final aggregation
      val joinIdx = plan.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, plan.take(1200))
      val belowJoin = plan.substring(joinIdx)
      assert(!belowJoin.contains("Exchange hashpartitioning(o_custkey") &&
        !belowJoin.contains("Exchange hashpartitioning(c_custkey"),
        s"bucketed join still shuffles:\n${belowJoin.take(1200)}")
      // correctness: equals the unbucketed join
      val expected = Tables.orders(spark, sf)
        .join(Tables.customer(spark, sf), $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === expected)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS graft_orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS graft_customer_bucketed")
    }
  }

  test("band index as a bucketed artifact: delta probe joins with NO index-side shuffle") {
    // substantiates the dedupMinHashIncremental scale claim: the prior
    // corpus's band index is a write-once artifact bucketed on
    // (band, bh); a fresh snapshot's probe join then shuffles ONLY the
    // delta-sized side — the index (corpus-sized at 100 TB) is read
    // bucket-aligned with no exchange. The probe's result must equal
    // the inline dedupMinHashIncrementalOn on the same slices.
    import spark.implicits._
    import graft.operators.Dedup
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      val sf = SparkTestSession.sf0001
      val docs = Tables.documents(spark, sf)
      val prior = docs.filter(pmod($"doc_id", lit(Dedup.SnapshotMod)) < Dedup.SnapshotNewMin)
      val fresh = docs.filter(pmod($"doc_id", lit(Dedup.SnapshotMod)) >= Dedup.SnapshotNewMin)
      def banded(df: org.apache.spark.sql.DataFrame) = df
        .filter($"doc_id".isNotNull)
        .select($"doc_id", graft.functions.ShingleXxh64($"text").as("hv"))
        .filter(size($"hv") > 0)
        .select($"doc_id", $"hv",
          posexplode(graft.functions.MinHashBandHashes($"hv")).as(Seq("band", "bh")))
      // write-once: the index artifact, bucketed on the probe key
      banded(prior).write.mode("overwrite")
        .bucketBy(8, "band", "bh").sortBy("band", "bh")
        .saveAsTable("graft_band_index")
      val index = spark.table("graft_band_index")
      val probe = banded(fresh)
      val candidates = index.as("a").join(probe.as("b"),
          $"a.band" === $"b.band" && $"a.bh" === $"b.bh")
        .select($"a.doc_id".as("doc_a"), $"a.hv".as("hva"),
          $"b.doc_id".as("doc_b"), $"b.hv".as("hvb"))
      val pairs = candidates
        .select($"doc_a", $"doc_b",
          graft.functions.SetJaccardSorted($"hva", $"hvb").as("jacc"))
        .filter($"jacc" >= Dedup.JaccardThreshold)
        .groupBy($"doc_a", $"doc_b")
        .agg(round(max($"jacc"), 3).as("jaccard"))
      val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      // plan shape: exactly ONE (band, bh) exchange — the delta probe
      // side; the bucketed index scans exchange-free. Cut the echoed
      // "Initial Plan" section so AQE's pre-run copy is not re-counted.
      val full = pairs.queryExecution.executedPlan.toString
      val cut = full.indexOf("Initial Plan")
      val plan = if (cut >= 0) full.substring(0, cut) else full
      val bandExchanges = "Exchange hashpartitioning\\(band".r.findAllIn(plan).size
      assert(bandExchanges == 1,
        s"expected exactly one (band,bh) exchange (the delta side), got $bandExchanges:\n${plan.take(1500)}")
      assert(plan.contains("Bucketed: true"),
        s"index scan is not bucket-aligned:\n${plan.take(1500)}")
      // correctness: identical pair set to the inline incremental form
      val expected = Dedup.dedupMinHashIncrementalOn(prior, fresh).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got === expected)
      assert(got.nonEmpty, "testdata should contain cross-snapshot near-dups")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS graft_band_index")
    }
  }

  test("SimHash chunk index as a bucketed artifact: delta probe joins with NO index-side shuffle") {
    // the dedupSimHashIncremental scale claim, demonstrated the same
    // way as the MinHash band index above: the prior fingerprints'
    // (chunk, value) index is a write-once artifact bucketed on the
    // probe key; a fresh snapshot's radius-1 probe balls then shuffle
    // ONLY the delta-sized side, the corpus-sized index reads
    // bucket-aligned with no exchange, and the result equals the inline
    // dedupSimHashIncrementalOn on the same slices.
    import spark.implicits._
    import graft.operators.Dedup
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      val sf = SparkTestSession.sf0001
      val docs = Tables.documents(spark, sf)
      val prior = docs.filter(pmod($"doc_id", lit(Dedup.SnapshotMod)) < Dedup.SnapshotNewMin)
      val fresh = docs.filter(pmod($"doc_id", lit(Dedup.SnapshotMod)) >= Dedup.SnapshotNewMin)
      def hashed(df: org.apache.spark.sql.DataFrame) = df
        .filter($"doc_id".isNotNull)
        .select($"doc_id", graft.functions.ShingleMd5Low64($"text").as("shc"))
        .filter(size($"shc") > 0)
        .select($"doc_id", $"shc",
          graft.functions.SimHash64FromHashes($"shc").as("f"))
      val mask = (1L << Dedup.SimHashChunkBits) - 1
      def chunk(c: Int) =
        shiftrightunsigned($"f", c * Dedup.SimHashChunkBits).bitwiseAND(lit(mask))
      val indexKeys = (0 until Dedup.SimHashChunks).map { c =>
        struct(lit(c).as("c"), chunk(c).as("v"))
      }
      val probeKeys = (0 until Dedup.SimHashChunks).flatMap { c =>
        (Seq(0L) ++ (0 until Dedup.SimHashChunkBits).map(1L << _)).map { flip =>
          struct(lit(c).as("c"), chunk(c).bitwiseXOR(lit(flip)).as("v"))
        }
      }
      // write-once: the prior fingerprint index, bucketed on (c, v)
      hashed(prior)
        .select($"doc_id", $"shc", $"f", explode(array(indexKeys: _*)).as("k"))
        .select($"doc_id", $"shc", $"f", $"k.c".as("c"), $"k.v".as("v"))
        .write.mode("overwrite")
        .bucketBy(8, "c", "v").sortBy("c", "v")
        .saveAsTable("graft_simhash_index")
      val index = spark.table("graft_simhash_index")
      val probe = hashed(fresh)
        .select($"doc_id", $"shc", $"f", explode(array(probeKeys: _*)).as("k"))
        .select($"doc_id", $"shc", $"f", $"k.c".as("c"), $"k.v".as("v"))
      val pairs = index.as("a").join(probe.as("b"),
          $"a.c" === $"b.c" && $"a.v" === $"b.v" &&
            expr("bit_count(a.f ^ b.f)") <= Dedup.MaxPairHamming)
        .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"),
          graft.functions.SetJaccardSorted($"a.shc", $"b.shc").as("jacc"))
        .filter($"jacc" >= Dedup.JaccardThreshold)
        .groupBy($"doc_a", $"doc_b")
        .agg(round(max($"jacc"), 3).as("jaccard"))
      val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val full = pairs.queryExecution.executedPlan.toString
      val cut = full.indexOf("Initial Plan")
      val plan = if (cut >= 0) full.substring(0, cut) else full
      val keyExchanges = "Exchange hashpartitioning\\(c".r.findAllIn(plan).size
      assert(keyExchanges == 1,
        s"expected exactly one (c,v) exchange (the delta side), got $keyExchanges:\n${plan.take(1500)}")
      assert(plan.contains("Bucketed: true"),
        s"index scan is not bucket-aligned:\n${plan.take(1500)}")
      val expected = Dedup.dedupSimHashIncrementalOn(prior, fresh).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got === expected)
      assert(got.nonEmpty, "testdata should contain cross-snapshot near-dups")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS graft_simhash_index")
    }
  }

  test("substring gram index as a bucketed artifact: delta probe joins with NO index-side shuffle") {
    // the dedupSubstringIncremental scale claim, demonstrated like the
    // band/chunk indexes above: the prior corpus's DISTINCT gram-hash
    // index (8 B/gram) is a write-once artifact bucketed on h; the
    // fresh delta's positional-gram probe then shuffles ONLY the
    // delta-sized side, and the composed result equals the inline op.
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import graft.operators.Dedup
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      val sf = SparkTestSession.sf0001
      val W = Dedup.ExactSubstrTokens
      val docs = Tables.documents(spark, sf)
      val prior = docs.filter(pmod($"doc_id", lit(Dedup.SnapshotMod)) < Dedup.SnapshotNewMin)
      val fresh = docs.filter(pmod($"doc_id", lit(Dedup.SnapshotMod)) >= Dedup.SnapshotNewMin)
      def posGrams(df: org.apache.spark.sql.DataFrame) = df
        .filter($"doc_id".isNotNull && $"text".isNotNull)
        .select($"doc_id", posexplode(
          graft.functions.NGramXxh64Pos($"text", W)).as(Seq("pos", "h")))
      posGrams(prior).select($"h").distinct()
        .write.mode("overwrite").bucketBy(8, "h").sortBy("h")
        .saveAsTable("graft_gram_index")
      val index = spark.table("graft_gram_index")
      val freshG = posGrams(fresh)
      val inPrior = freshG.join(index, Seq("h"), "left_semi")
        .select($"doc_id", $"pos")
      inPrior.collect()
      val full = inPrior.queryExecution.executedPlan.toString
      val cut = full.indexOf("Initial Plan")
      val plan = if (cut >= 0) full.substring(0, cut) else full
      val hExchanges = "Exchange hashpartitioning\\(h".r.findAllIn(plan).size
      assert(hExchanges == 1,
        s"expected exactly one h exchange (the delta side), got $hExchanges:\n${plan.take(1500)}")
      assert(plan.contains("Bucketed: true"),
        s"index scan is not bucket-aligned:\n${plan.take(1500)}")
      // compose with the within-delta window and the shared run merge:
      // must equal the inline incremental form
      val byHash = Window.partitionBy($"h")
      val withinFresh = freshG
        .withColumn("mn", min($"doc_id").over(byHash))
        .withColumn("mx", max($"doc_id").over(byHash))
        .filter($"mn" =!= $"mx")
        .select($"doc_id", $"pos")
      val shared = withinFresh.unionByName(inPrior).distinct()
      val byDocPos = Window.partitionBy($"doc_id").orderBy($"pos")
      val got = shared
        .withColumn("rid", $"pos" - row_number().over(byDocPos))
        .groupBy($"doc_id", $"rid")
        .agg(min($"pos").cast("long").as("start_token"),
          (count(lit(1)) + lit(W - 1)).as("len_tokens"))
        .select($"doc_id", $"start_token", $"len_tokens")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val expected = Dedup.dedupSubstringIncrementalOn(prior, fresh).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === expected)
      assert(got.nonEmpty, "testdata should contain cross-snapshot shared spans")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS graft_gram_index")
    }
  }
}
