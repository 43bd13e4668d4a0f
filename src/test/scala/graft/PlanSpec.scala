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

  /** Final (post-execution) AQE plan, truncated before the echoed
    * "Initial Plan" section so node counts reflect what actually ran. */
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    val cut = s.indexOf("Initial Plan")
    if (cut >= 0) s.substring(0, cut) else s
  }

  test("minhash: banding and verify share ONE documents scan (exchange reuse)") {
    // the regression this pins: a consumer-side projection or an inferred
    // isnotnull constraint de-canonicalizes one branch of the shared
    // subtree, and the scan + shuffle silently run twice (stages 7→8,
    // input 2× — see SetJaccardSorted/dedupMinHashLsh comments)
    val p = finalPlan(Dedup.dedupMinHashLsh(spark, sf))
    val scans = "FileScan parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected 1 documents scan in the final plan, got $scans\n${p.take(1200)}")
    assert(p.contains("ReusedExchange"), p.take(1200))
  }

  test("simhash pairs: ONE documents scan — DF-cap agg and pair branches reuse the expansion") {
    // the regression this pins: the candidate/verify joins INFER
    // isnotnull(doc_id) on their branches while the groupBy(h) DF-count
    // branch doesn't, de-canonicalizing the shared expansion subtree —
    // scan and both exchanges silently run twice (measured at sf0.1:
    // stages 1/2 and 4/6 with identical shuffle writes). Guarded by the
    // explicit isnotnull(doc_id) in simHashCappedBase.
    val p = finalPlan(Dedup.dedupSimHashPairs(spark, sf))
    val scans = "FileScan parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected 1 documents scan in the final plan, got $scans\n${p.take(1200)}")
    assert(p.contains("ReusedExchange"), p.take(1200))
  }

  test("ngram jaccard: ONE documents scan — same reuse guard as simhash") {
    val p = finalPlan(Dedup.dedupNgramJaccard(spark, sf))
    val scans = "FileScan parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected 1 documents scan in the final plan, got $scans\n${p.take(1200)}")
    assert(p.contains("ReusedExchange"), p.take(1200))
  }

  test("incremental minhash: each snapshot side scans and shingles ONCE (exchange reuse)") {
    // banding and verify both consume each side's shingle subtree; the
    // explicit isnotnull(doc_id) in hashedOf keeps the branches
    // canonically identical so AQE reuses each side's exchange — 2
    // documents scans total (prior slice + delta slice), not 4
    val p = finalPlan(Dedup.dedupMinHashIncremental(spark, sf))
    val scans = "FileScan parquet".r.findAllIn(p).size
    assert(scans <= 2,
      s"expected at most 2 documents scans (one per snapshot side), got $scans\n${p.take(1200)}")
  }

  test("incremental simhash: each snapshot side scans and hashes ONCE (exchange reuse)") {
    // band and verify branches both consume each side's (doc_id, shc)
    // subtree; TWO trick-filters keep them canonically identical — the
    // isnotnull(doc_id) the minhash twin needs, plus isnotnull(f):
    // the band join infers non-nullness of its fingerprint key and
    // pushes it below the repartition on the band branches only, which
    // measured as documents=4 until the constraint was mirrored into
    // the shared subtree (see dedupSimHashIncrementalOn)
    val p = finalPlan(Dedup.dedupSimHashIncremental(spark, sf))
    val scans = "FileScan parquet".r.findAllIn(p).size
    assert(scans <= 2,
      s"expected at most 2 documents scans (one per snapshot side), got $scans\n${p.take(1200)}")
  }

  test("winnow fingerprint: pure map + explode, spread + final sort exchanges only") {
    val p = finalPlan(TextAnalysis.textFingerprintWinnow(spark, sf))
    val exchanges = "Exchange".r.findAllIn(p).size
    // r22: one doc_id spread ahead of the Karp–Rabin expansion (the
    // single-row-group scan otherwise serializes it into one task) +
    // the final range sort — still no data-dependent shuffle
    assert(exchanges == 2,
      s"expected the doc_id spread + final sort exchange, got $exchanges\n${p.take(1200)}")
    assert(p.contains("gram_window_mins"), p.take(1200))
  }

  test("samples pipeline: chunk expansion runs once (window keep-first, single consumer)") {
    // the regression this pins: rounds 5–10 kept-first via a
    // representative agg + semi-join — two consumers of the chunk
    // fan-out whose shared exchange round 11 measured as NOT reused in
    // the cc/ccq variants (the optimizer pulls the user repartition
    // above the semi join, de-canonicalizing the branches, and the
    // chunk Generate + anti-join + corpus redaction ran twice). The
    // window form consumes chunks once: exactly ONE chunk Generate in
    // the plan, keep-first as row_number
    val p = finalPlan(Curation.pipelineCurateSamples(spark, sf))
    val scans = "FileScan parquet".r.findAllIn(p).size
    assert(scans == 2,
      s"expected 2 documents scans (pair search + kept side), got $scans\n${p.take(1200)}")
    val chunkGenerates = "posexplode".r.findAllIn(p).size
    assert(chunkGenerates == 1,
      s"expected exactly 1 chunk fan-out Generate, got $chunkGenerates\n${p.take(1200)}")
    assert(p.contains("row_number"), p.take(1200))
    // and the cc variant — where the old shape silently doubled the
    // expansion — must show the same single-Generate tail
    val pcc = finalPlan(Curation.pipelineCurateSamplesCc(spark, sf))
    val ccChunkGenerates = "posexplode".r.findAllIn(pcc).size
    assert(ccChunkGenerates == 1,
      s"expected exactly 1 chunk fan-out Generate in cc, got $ccChunkGenerates\n${pcc.take(1200)}")
  }

  test("lines pipeline: ONE documents scan — the line stage's rebuild exchange is reused by both branches") {
    // red (line stage + redact) has two consumers — the pair search and
    // the anti-join probe. The rebuild agg ends in a hash(doc_id)
    // exchange whose two subtrees stay canonically identical, so the
    // whole line stage (scan + line explode + keep semi-join + rebuild)
    // runs ONCE and re-enters as ReusedExchange on the probe branch; a
    // de-canonicalization regression would show up as a second FileScan
    // re-running the full line dedup.
    val p = finalPlan(Curation.pipelineCurateSamplesLines(spark, sf))
    val scans = "FileScan parquet".r.findAllIn(p).size
    assert(scans == 1,
      s"expected 1 documents scan (line stage shared), got $scans\n${p.take(1200)}")
    assert(p.contains("ReusedExchange"), p.take(1200))
    assert(p.contains("row_number"), p.take(1200))
    // the full-C4 composition adds the badwords page drop ahead of the
    // line stage as a scan-fused filter — the one-scan / reused-exchange
    // shape must survive (the scaladoc's "zero new scans" claim)
    val pc4 = finalPlan(Curation.pipelineCurateSamplesC4(spark, sf))
    val c4Scans = "FileScan parquet".r.findAllIn(pc4).size
    assert(c4Scans == 1,
      s"expected 1 documents scan in the c4 pipeline, got $c4Scans\n${pc4.take(1200)}")
    assert(pc4.contains("ReusedExchange"), pc4.take(1200))
  }

  test("events: ts range predicate pushes through the encoding normalization into the scan") {
    // the 100 TB contract of the events loader: a time-range filter must
    // reach the parquet scan (PushedFilters), or every event query scans
    // the full log. With native-timestamp testdata (MICROS/NTZ) the
    // NTZ→LTZ cast is unwrapped by Catalyst under the UTC session and ts
    // pushes down; with NANOS-as-long data the column is computed
    // (div 1000) and pushdown is structurally impossible — assert only
    // when the footer carries a native timestamp.
    import org.apache.spark.sql.functions.{col, lit}
    val nativeTs = scala.util.Try(
      spark.read.parquet(s"$sf/events.parquet").schema("ts").dataType)
      .toOption.exists {
        case org.apache.spark.sql.types.TimestampType => true
        case org.apache.spark.sql.types.TimestampNTZType => true
        case _ => false
      }
    assume(nativeTs, "testdata is NANOS-encoded; ts pushdown not expressible")
    val ev = graft.sources.Tables.events(spark, sf)
      .filter(col("ts") >= lit("2024-01-02 00:00:00").cast("timestamp"))
    val p = plan(ev)
    assert("PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(ts".r.findFirstIn(p).isDefined,
      s"ts range predicate did not reach the scan:\n${p.take(1200)}")
  }

  test("bloom incremental: novel branch join-free, one sketch build, probe at the scan") {
    // the 100 TB contract of dedupIncrementalBloom: certainly-novel
    // groups must flow scan→filter→agg with NO join anywhere (one join
    // total = the maybe-sliver's anti-join), the Bloom probe must reach
    // the scan's data filters (rows drop before the shuffle), and the
    // sketch subquery must be built once (all probes share one exchange).
    // Parquet-backed fixture WITH cross-snapshot dups: at sf0.001 the
    // maybe branch is empty and AQE's empty-relation propagation deletes
    // the anti-join outright (good at scale, but it would un-pin this).
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bloom_plan").toFile
    dir.deleteOnExit()
    (0L until 200L).map(i => (i, s"prior doc $i")).toDF("doc_id", "text")
      .write.parquet(s"$dir/prior")
    ((1000L until 1040L).map(i => (i, s"fresh doc $i")) ++
      Seq((2000L, "prior doc 7"), (2001L, "prior doc 23")))
      .toDF("doc_id", "text").write.parquet(s"$dir/fresh")
    // AQE off for THIS plan render only: the staged form interleaves
    // nested "Initial Plan" sections that defeat string assertions (and
    // at runtime AQE may legitimately delete an empty maybe-branch join
    // — the static shape is what this test pins)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val p =
      try plan(Dedup.dedupIncrementalBloomOn(
        spark.read.parquet(s"$dir/prior"), spark.read.parquet(s"$dir/fresh")))
      finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    val joins = "Join".r.findAllIn(p).size
    assert(joins == 1,
      s"expected exactly one join (the maybe-branch anti-join), got $joins\n${p.take(1500)}")
    assert(p.contains("might_contain"), p.take(800))
    // probe pushed into the scan: DataFilters on the fresh-side FileScan
    // carry the might_contain predicate
    assert("DataFilters: \\[[^\\]]*might_contain".r.findFirstIn(p).isDefined,
      s"bloom probe not pushed to the scan's DataFilters\n${p.take(1500)}")
    // one physical sketch build: every rendered Subquery instance points
    // at the SAME SinglePartition exchange (subquery/exchange reuse) —
    // count distinct plan_ids among the sketch-side exchanges
    val sketchExchanges = "Exchange SinglePartition[^\\[]*\\[plan_id=(\\d+)\\]".r
      .findAllMatchIn(p).map(_.group(1)).toSet
    assert(sketchExchanges.size == 1,
      s"sketch built ${sketchExchanges.size} times (distinct exchanges $sketchExchanges)")
  }

  test("AQE splits a planted hot key in a sort-merge join (skew=true)") {
    // the skew-join mitigation SCALING.md relies on for hot join keys at
    // 100 TB, demonstrated end-to-end: one key carrying ~100× the rows
    // of any other lands in one shuffle partition; with the skew
    // thresholds scaled down to spec-sized data, AQE must detect and
    // split it — visible as SortMergeJoin(skew=true) in the final plan.
    // Thresholds only scale the trigger; the MECHANISM exercised is the
    // production one.
    import spark.implicits._
    import org.apache.spark.sql.functions.when
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // hot key 0: 200k rows (~3 MB in one hash partition) vs ~2k for
      // the rest; the probe side is small but over the broadcast cutoff
      val left = spark.range(0, 220000)
        .select(when($"id" < 200000, 0L).otherwise($"id" % 100).as("k"),
          $"id".as("v"))
      val right = spark.range(0, 100).select($"id".as("k"), ($"id" * 7).as("w"))
      val joined = left.join(right, "k")
      // collect() (not count(), which plans a different query) so THIS
      // frame's AQE plan is the executed, final one
      assert(joined.collect().length === 220000)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"AQE did not split the hot key:\n${p.take(1500)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q1: partial aggregation precedes the exchange") {
    val p = plan(Relational.q1PricingSummary(spark, sf))
    val exchangeIdx = p.indexOf("Exchange")
    val partialIdx = p.indexOf("partial_")
    assert(exchangeIdx > 0 && partialIdx > 0, p.take(800))
  }

  test("quality model: the ≤4096-row model BROADCASTS into the scoring expansion") {
    // the scale contract of the learned scorer: the fresh side's
    // feature fan-out is map work probing a broadcast — a shuffled
    // model join would re-exchange the corpus-sized expansion
    val p = plan(TextAnalysis.textQualityModel(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("SortMergeJoin"), p.take(1200))
  }

  test("exact-substring: join-free — two window exchanges over the positional gram frame") {
    // shared-gram detection is min≠max over the hash window and the run
    // merge a window + agg on doc_id: no join, no broadcast, and the
    // groupBy(doc_id, rid) rides the second window's partitioning
    val p = plan(Dedup.dedupExactSubstring(spark, sf))
    assert(!p.contains("Join"), p.take(1200))
    assert("Window".r.findAllIn(p).size >= 2, p.take(1200))
  }

  test("DSIR weights: both models BROADCAST into the scoring side") {
    // the scale contract: the raw expansion is map work probing two
    // ≤4096-row broadcasts; a shuffled model join would re-exchange
    // the corpus-sized per-(doc, bucket) frame
    val p = plan(Curation.dsirWeights(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(1200))
    assert(!p.contains("SortMergeJoin"), p.take(1200))
  }

  test("IVF-PQ refine: pool and query vectors broadcast — no corpus-side exchange for re-rank") {
    // the refine store read must be a broadcast-probed point lookup;
    // a shuffle here would move the vector corpus to re-rank 200 rows
    val p = plan(Similarity.simAnnIvfPqRerank(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("SortMergeJoin"), p.take(1200))
  }

  test("aHash dedup: one hash-key aggregation, no pair join") {
    // perceptual collapse = groupBy(ahash) with partial agg below the
    // exchange; any Join beyond the group-info re-attach (broadcast or
    // shuffled-hash on the tiny group table) is a design break — the
    // operator must never enumerate pairs
    val p = plan(Multimodal.mmDedupAhash(spark, sf))
    assert(!p.contains("CartesianProduct"), p.take(1200))
    assert(p.contains("HashAggregate"), p.take(1200))
  }
}
