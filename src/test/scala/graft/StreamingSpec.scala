package graft

import java.io.File
import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Streaming
import graft.operators.WordCount

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf0001

  /** Write `df` as a single parquet file at `dest` (one file = one
    * micro-batch under maxFilesPerTrigger=1), optionally pinning its
    * mtime so the file source feeds batches oldest-first. */
  private def writeOneFile(df: org.apache.spark.sql.DataFrame, dest: String,
      mtime: Long = -1L): Unit = {
    val tmp = Files.createTempDirectory("graft_stream_batch_").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.copy(part.toPath, Paths.get(dest))
    if (mtime >= 0L) Files.setLastModifiedTime(Paths.get(dest),
      java.nio.file.attribute.FileTime.fromMillis(mtime))
  }

  test("streaming word count equals the batch pipeline result") {
    val streamed = Streaming.streamWordCounts(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = WordCount.counts(
        WordCount.tokenize(graft.sources.Tables.documents(spark, sf), "text"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed === batch)
  }

  test("streaming line dedup: a shared line in a LATER batch with a smaller doc_id steals the win") {
    import spark.implicits._
    // reflow-aligned 10-token lines; the boilerplate line sits at
    // line_idx 1 of batch-1's doc 10 and at line_idx 0 of batch-2's
    // doc 5 — the final keep must move to (5, 0) (impossible without
    // cross-batch state), and n_dups = 2 must survive the batch split.
    val bp = (0 until 10).map(i => s"bp$i").mkString(" ")
    def toks(p: String) = (0 until 10).map(i => s"$p$i").mkString(" ")
    val in = Files.createTempDirectory("graft_lines_in_").toString
    writeOneFile(Seq((10L, toks("u") + " " + bp), (11L, toks("w")))
      .toDF("doc_id", "text"), s"$in/batch1.parquet")
    writeOneFile(Seq((5L, bp + " " + toks("v"))).toDF("doc_id", "text"),
      s"$in/batch2.parquet")
    Files.setLastModifiedTime(Paths.get(s"$in/batch2.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(
        Files.getLastModifiedTime(Paths.get(s"$in/batch1.parquet"))
          .toMillis + 60000))
    val schema = spark.read.parquet(in).schema
    val docs = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val got = Streaming.runDedupLinesStream(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length === 4, s"4 distinct lines expected: ${got.toSeq}")
    val dup = got.filter(_._4 == 2L)
    assert(dup.length === 1 && dup.head._2 === 5L && dup.head._3 === 0L,
      s"cross-batch line win must move to (5, 0): ${got.toSeq}")
  }

  test("ingestion dedup suppresses a duplicate arriving in a LATER batch") {
    import org.apache.spark.sql.DataFrame
    import spark.implicits._
    // one parquet file per micro-batch (maxFilesPerTrigger = 1): the
    // duplicate of batch-1's doc 10 arrives in batch 2 with a LOWER id,
    // so the final fold must both keep cross-batch state (n_dups = 2 is
    // impossible if batch 2 starts from empty state) and fold the min
    // (keep_id = 5 only via the later emission).
    val in = Files.createTempDirectory("graft_dedup_in_").toString
    writeOneFile(Seq((10L, "dup text"), (11L, "only a")).toDF("doc_id", "text"),
      s"$in/batch1.parquet")
    writeOneFile(Seq((5L, "dup text"), (12L, "only b")).toDF("doc_id", "text"),
      s"$in/batch2.parquet")
    Files.setLastModifiedTime(Paths.get(s"$in/batch2.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(
        Files.getLastModifiedTime(Paths.get(s"$in/batch1.parquet"))
          .toMillis + 60000)) // file source feeds oldest-first
    val schema = spark.read.parquet(in).schema
    val docs = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val got = Streaming.runDedupStream(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    // equals the batch dedup_exact result over the union of both batches
    val expected = spark.read.parquet(in)
      .groupBy(org.apache.spark.sql.functions.md5($"text").as("h"))
      .agg(org.apache.spark.sql.functions.min($"doc_id").as("keep_id"),
        org.apache.spark.sql.functions.count($"doc_id").as("n_dups"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got === expected)
    val dup = got.find(_._3 == 2L)
    assert(dup.exists(_._2 == 5L),
      s"cross-batch fold must keep id 5 with n_dups 2, got ${got.toSeq}")
  }

  test("TTL dedup: in-window duplicates fold, watermark-evicted keys restart an epoch") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions.{expr => fexpr}
    import spark.implicits._
    val in = Files.createTempDirectory("graft_ttl_in_").toString
    val t0 = 1700000000L // event-time origin, seconds
    def docs(rows: Seq[(Long, String, Long)]): DataFrame =
      rows.toDF("doc_id", "text", "sec")
        .select($"doc_id", $"text", fexpr("timestamp_seconds(sec)").as("ts"))
    val base = System.currentTimeMillis()
    // batch 1: a dup pair inside the 60s TTL window + a singleton
    writeOneFile(docs(Seq((10L, "dup text", t0), (11L, "only a", t0 + 5),
      (12L, "dup text", t0 + 10))), s"$in/b1.parquet", base)
    // batch 2: far-future singleton — advances the watermark to
    // (t0+10000) - 60s, far past batch-1's timeouts (t0+10+60)
    writeOneFile(docs(Seq((20L, "only b", t0 + 10000))), s"$in/b2.parquet", base + 60000)
    // batch 3: another singleton, NOT touching "dup text" — the batch in
    // which dup/only-a's event-time timeouts fire (a group with data in
    // the same batch would be processed with its old state instead of
    // timing out, so the eviction needs a batch where the key is absent)
    writeOneFile(docs(Seq((25L, "only c", t0 + 10010))), s"$in/b3.parquet", base + 120000)
    // batch 4: "dup text" AGAIN, after eviction, with a higher doc_id
    writeOneFile(docs(Seq((30L, "dup text", t0 + 10020))), s"$in/b4.parquet", base + 180000)
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val got = Streaming.runDedupStreamTTL(stream, "60 seconds")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    val dupHash = got.filter(t => t._2 == 10L && t._3 == 2L)
    // keep_id 10 + n_dups == 2 (not 3) proves both halves: the
    // in-window fold (10,12) ran with shared state, and doc 30 arrived
    // AFTER eviction into a fresh epoch — with unbounded state the
    // count would be 3
    assert(dupHash.size == 1, s"expected evicted-epoch (10, 2), got $got")
    assert(got.map(_._2).toSet === Set(10L, 11L, 20L, 25L),
      s"keep_ids must be first-epoch minima, got $got")
  }

  test("TTL dedup: out-of-order older rows do not pull the eviction deadline back") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions.{expr => fexpr}
    import spark.implicits._
    val in = Files.createTempDirectory("graft_ttl2_in_").toString
    val t0 = 1700000000L
    def docs(rows: Seq[(Long, String, Long)]): DataFrame =
      rows.toDF("doc_id", "text", "sec")
        .select($"doc_id", $"text", fexpr("timestamp_seconds(sec)").as("ts"))
    val base = System.currentTimeMillis()
    // batch 1: the key's NEWEST arrival (t0+100) → deadline t0+160;
    // watermark after b1 = t0+40
    writeOneFile(docs(Seq((10L, "dup text", t0 + 100))), s"$in/b1.parquet", base)
    // batch 2: an OLDER but non-late row for the same key (t0+45 ≥
    // watermark t0+40). A deadline armed from only this batch's max
    // would regress to t0+105; the monotone deadline stays t0+160.
    writeOneFile(docs(Seq((11L, "dup text", t0 + 45))), s"$in/b2.parquet", base + 60000)
    // batch 3: key-absent singleton at t0+170 → watermark t0+110,
    // which is past the REGRESSED deadline but not the monotone one
    writeOneFile(docs(Seq((20L, "only w", t0 + 170))), s"$in/b3.parquet", base + 120000)
    // batch 4: the key again at t0+155 — within ttl of its newest
    // arrival (155−100 < 60), so the accuracy contract says it folds
    // into the SAME epoch (n_dups 3); premature eviction would have
    // split it into a fresh epoch (n_dups 2)
    writeOneFile(docs(Seq((12L, "dup text", t0 + 155))), s"$in/b4.parquet", base + 180000)
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val got = Streaming.runDedupStreamTTL(stream, "60 seconds")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    val dup = got.filter(_._2 == 10L)
    assert(dup.size == 1 && dup.head._3 == 3L,
      s"monotone deadline must keep the epoch alive through batch 4 " +
        s"(expected (10, 3)), got $got")
  }

  test("TTL BPE encode: in-window pieces reassemble across batches, evicted doc restarts an epoch") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions.{expr => fexpr}
    import spark.implicits._
    val in = Files.createTempDirectory("graft_bpe_ttl_in_").toString
    val t0 = 1700000000L
    def docs(rows: Seq[(Long, String, Long)]): DataFrame =
      rows.toDF("doc_id", "text", "sec")
        .select($"doc_id", $"text", fexpr("timestamp_seconds(sec)").as("ts"))
    val base = System.currentTimeMillis()
    // fit corpus shares no word with the feed, so every feed word takes
    // the OOV character-decomposition path: n_sub = len(w) + 1, exactly
    // predictable without replaying the fit
    val corpus = Seq((1L, "zzz")).toDF("doc_id", "text")
    // b1: doc 10's first piece + doc 11's first piece
    writeOneFile(docs(Seq((10L, "hello", t0), (11L, "foo", t0))),
      s"$in/b1.parquet", base)
    // b2: doc 11's SECOND piece, in-window (t0+5) — must fold into the
    // same epoch and extend the reassembly
    writeOneFile(docs(Seq((11L, "bar", t0 + 5))), s"$in/b2.parquet", base + 60000)
    // b3: far-future singleton advances the watermark way past
    // (t0 + 5) + 60s — docs 10/11 become evictable
    writeOneFile(docs(Seq((20L, "w", t0 + 10000))), s"$in/b3.parquet", base + 120000)
    // b4: key-absent singleton — the batch in which 10/11's event-time
    // timeouts actually fire (a keyed arrival would be processed with
    // its old state instead of timing out)
    writeOneFile(docs(Seq((25L, "x", t0 + 10010))), s"$in/b4.parquet", base + 180000)
    // b5: doc 10 AGAIN after eviction — a fresh epoch reassembling only
    // this piece; with unbounded state it would extend the old one
    writeOneFile(docs(Seq((10L, "hi", t0 + 10020))), s"$in/b5.parquet", base + 240000)
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val got = Streaming.runBpeEncodeStreamTTL(stream, corpus, "60 seconds")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // doc 11: cross-batch IN-WINDOW fold — both pieces, in the twins'
    // shared (pos, seq) order (both pieces are pos 0, so seq breaks the
    // tie: "b a r </w>" < "f o o </w>" — the unbounded fold's answer,
    // NOT arrival order)
    assert(got(11L) === (8L, "b a r </w> f o o </w>"),
      s"in-window pieces must reassemble across batches in (pos, seq) " +
        s"order, got ${got(11L)}")
    // doc 10: the fold keeps the more complete epoch (6 tokens from
    // "hello"); unbounded state would have concatenated into 9
    assert(got(10L) === (6L, "h e l l o </w>"),
      s"post-eviction arrival must start a fresh epoch, got ${got(10L)}")
    assert(got(20L)._1 === 2L && got(25L)._1 === 2L)
  }

  test("TTL BPE encode: multi-word cross-batch pieces reassemble exactly as the unbounded twin") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions.{expr => fexpr}
    import spark.implicits._
    val t0 = 1700000000L
    val base = System.currentTimeMillis()
    val corpus = Seq((1L, "zzz")).toDF("doc_id", "text")
    // MULTI-WORD pieces of one document split across batches, each
    // restarting pos at 0 (the posexplode-per-text shape the r19 ADVICE
    // flagged as unpinned): piece1 "hello world" (pos 0,1), piece2
    // "foo bar" (pos 0,1), both in-window. Doc 20 pins the COMPARATOR
    // itself: a high-BMP char (U+FB00 'ﬀ', UTF-8 EF…) vs a
    // supplementary char (U+1D11E '𝄞', UTF-8 F0…, UTF-16 surrogate
    // 0xD834) tie at pos 0 — Scala String order puts the surrogate
    // FIRST, Spark's UTF8String byte order puts it LAST, so a
    // String-keyed state sort diverges from the unbounded fold here
    val frags = Seq((10L, "hello world", t0), (10L, "foo bar", t0 + 5),
      (20L, "ﬀ", t0), (20L, "𝄞", t0 + 5))
    val inT = Files.createTempDirectory("graft_bpe_ttl_mw_").toString
    def docs(rows: Seq[(Long, String, Long)]): DataFrame =
      rows.toDF("doc_id", "text", "sec")
        .select($"doc_id", $"text", fexpr("timestamp_seconds(sec)").as("ts"))
    val (b1, b2) = frags.partition(_._3 == t0)
    writeOneFile(docs(b1), s"$inT/b1.parquet", base)
    writeOneFile(docs(b2), s"$inT/b2.parquet", base + 60000)
    val schemaT = spark.read.parquet(inT).schema
    val streamT = spark.readStream.schema(schemaT)
      .option("maxFilesPerTrigger", "1").parquet(inT)
    val ttl = Streaming.runBpeEncodeStreamTTL(streamT, corpus, "60 seconds")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    // the unbounded twin over the SAME fragments (no ts column — its
    // feed shape), same two-batch split
    val inU = Files.createTempDirectory("graft_bpe_unb_mw_").toString
    writeOneFile(b1.map(t => (t._1, t._2)).toDF("doc_id", "text"),
      s"$inU/b1.parquet", base)
    writeOneFile(b2.map(t => (t._1, t._2)).toDF("doc_id", "text"),
      s"$inU/b2.parquet", base + 60000)
    val schemaU = spark.read.parquet(inU).schema
    val streamU = spark.readStream.schema(schemaU)
      .option("maxFilesPerTrigger", "1").parquet(inU)
    val unb = Streaming.runBpeEncodeStream(streamU, corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(ttl === unb,
      s"TTL and unbounded twins must share the (pos, seq) piece order:\n  ttl $ttl\n  unb $unb")
    // and the shared order is the DOCUMENTED one: (pos, seq) — pos ties
    // break by seq, NOT by arrival (arrival order would put hello first)
    assert(ttl.head === (10L, 20L,
      "f o o </w> h e l l o </w> b a r </w> w o r l d </w>"),
      s"expected (pos, seq) interleaving, got $ttl")
    // the comparator pin: byte order puts 'ﬀ' (EF…) before '𝄞' (F0…);
    // a UTF-16 String sort would reverse them and fail the twin match
    val seq20 = ttl.find(_._1 == 20L).get._3
    assert(seq20.indexOf("ﬀ") >= 0 && seq20.indexOf("ﬀ") < seq20.indexOf("𝄞"),
      s"pos-tied pieces must order by UTF-8 bytes, got $seq20")
  }

  test("TTL BPE encode: a batch emits only the docs it touches (no resident re-emission)") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions.{expr => fexpr}
    import spark.implicits._
    val in = Files.createTempDirectory("graft_bpe_ttl_emit_").toString
    val t0 = 1700000000L
    val base = System.currentTimeMillis()
    val corpus = Seq((1L, "zzz")).toDF("doc_id", "text")
    def docs(rows: Seq[(Long, String, Long)]): DataFrame =
      rows.toDF("doc_id", "text", "sec")
        .select($"doc_id", $"text", fexpr("timestamp_seconds(sec)").as("ts"))
    // b1 touches docs 10 and 11; b2 touches ONLY doc 12 (in-window, so
    // 10/11 stay RESIDENT in state); b3 touches only doc 10 again
    writeOneFile(docs(Seq((10L, "aa", t0), (11L, "bb", t0))),
      s"$in/b1.parquet", base)
    writeOneFile(docs(Seq((12L, "cc", t0 + 5))), s"$in/b2.parquet", base + 60000)
    writeOneFile(docs(Seq((10L, "dd", t0 + 10))), s"$in/b3.parquet", base + 120000)
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    // RAW append-sink rows (not the folded tail): emission economy is a
    // sink-traffic property, visible only before the fold. Expected
    // traffic: b1 → 2 rows (docs 10, 11), b2 → 1 row (doc 12 only —
    // residents 10/11 are NOT re-emitted), b3 → 1 row (doc 10's
    // extended reassembly). A per-batch full-resident re-emission
    // would write 2 + 3 + 4 = 9 rows; touched-only writes 4.
    val name = s"graft_emit_pin_${System.nanoTime()}"
    val q = Streaming.bpeEncodeTTLStreamFrame(stream, corpus, "60 seconds")
      .writeStream.outputMode("append").format("memory").queryName(name)
      .start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table(name)
      .collect().map(r => (r.getLong(0), r.getString(2))).toSeq
    assert(rows.length === 4,
      s"sink traffic must be O(docs touched per batch), got ${rows.toSeq}")
    assert(rows.count(_._1 == 10L) === 2 && rows.count(_._1 == 11L) === 1 &&
      rows.count(_._1 == 12L) === 1,
      s"untouched residents must not re-emit, got ${rows.toSeq}")
    // the b3 re-emission carries doc 10's FULL current reassembly
    assert(rows.filter(_._1 == 10L).map(_._2).toSet ===
      Set("a a </w>", "a a </w> d d </w>"), s"got ${rows.toSeq}")
  }

  test("near-dup dedup pairs a later batch's re-crawl with the original document") {
    import org.apache.spark.sql.DataFrame
    import spark.implicits._
    def toks(r: Range, p: String) = r.map(i => s"$p$i").mkString(" ")
    val in = Files.createTempDirectory("graft_nd_in_").toString
    val base = System.currentTimeMillis()
    // batch 1: the original (100 tokens) + an unrelated doc
    writeOneFile(Seq((10L, toks(0 until 100, "w")),
      (11L, toks(0 until 60, "z"))).toDF("doc_id", "text"),
      s"$in/b1.parquet", base)
    // batch 2: a near-identical re-crawl of doc 10 (one token dropped,
    // J = 97/98 ≈ 0.99 — certain LSH recall) + another unrelated doc.
    // The pair can ONLY come from cross-batch state: doc 10 is not in
    // this batch.
    writeOneFile(Seq((20L, toks(0 until 99, "w")),
      (21L, toks(0 until 60, "q"))).toDF("doc_id", "text"),
      s"$in/b2.parquet", base + 60000)
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val got = Streaming.runNearDupStream(stream)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.map(p => (p._1, p._2)) === Seq((10L, 20L)),
      s"expected exactly the cross-batch pair (10, 20), got $got")
    // 97 shared shingles of 98 total: round(0.98979..., 3) = 0.99
    assert(got.head._3 === 0.99, s"jaccard should be 97/98 rounded, got ${got.head._3}")
  }

  test("TTL near-dup: in-window re-crawl pairs, watermark-evicted resident does not") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions.{expr => fexpr}
    import spark.implicits._
    def toks(r: Range, p: String) = r.map(i => s"$p$i").mkString(" ")
    def docs(rows: Seq[(Long, String, Long)]): DataFrame =
      rows.toDF("doc_id", "text", "sec")
        .select($"doc_id", $"text", fexpr("timestamp_seconds(sec)").as("ts"))
    val in = Files.createTempDirectory("graft_ndttl_in_").toString
    val t0 = 1700000000L
    val base = System.currentTimeMillis()
    // batch 1: two families' originals — w (will be evicted before its
    // re-crawl) and z (re-crawled in-window)
    writeOneFile(docs(Seq((10L, toks(0 until 100, "w"), t0),
      (11L, toks(0 until 100, "z"), t0))), s"$in/b1.parquet", base)
    // batch 2: z re-crawl 30 s later (inside the 60 s TTL) + a far-
    // future watermark pusher → wm = (t0+10000) − 60
    writeOneFile(docs(Seq((20L, toks(0 until 99, "z"), t0 + 30),
      (30L, toks(0 until 60, "p"), t0 + 10000))), s"$in/b2.parquet", base + 60000)
    // batch 3: w re-crawl at t0+9950 (non-late) — resident 10 has
    // ts + ttl = t0+60 far behind the watermark, so it was evicted and
    // NO pair may be reported (unbounded state would pair them)
    writeOneFile(docs(Seq((21L, toks(0 until 99, "w"), t0 + 9950))),
      s"$in/b3.parquet", base + 120000)
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val got = Streaming.runNearDupStreamTTL(stream, 60000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((11L, 20L)),
      s"expected only the in-window pair (11, 20) — the w-family pair must " +
        s"be suppressed by eviction — got $got")
  }

  test("TTL chunk near-dup: cross-batch chunk pairs at the right idx, evicted chunk does not") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions.{expr => fexpr}
    import spark.implicits._
    def toks(r: Range, p: String) = r.map(i => s"$p$i").mkString(" ")
    def docs(rows: Seq[(Long, String, Long)]): DataFrame =
      rows.toDF("doc_id", "text", "sec")
        .select($"doc_id", $"text", fexpr("timestamp_seconds(sec)").as("ts"))
    val in = Files.createTempDirectory("graft_cnttl_in_").toString
    val t0 = 1700000000L
    val base = System.currentTimeMillis()
    // batch 1: doc 10 = 40 tokens (ONE chunk, idx 0; family w — will be
    // evicted before its re-crawl) and doc 11 = 80 tokens (chunks idx 0
    // = z0..z49 and idx 1 = z40..z79; family z — matched in-window)
    writeOneFile(docs(Seq((10L, toks(0 until 40, "w"), t0),
      (11L, toks(0 until 80, "z"), t0))), s"$in/b1.parquet", base)
    // batch 2, 30 s later (inside the 60 s TTL): doc 20 = doc 11's
    // SECOND chunk with one mid-token substituted — its idx-0 chunk must
    // pair with doc 11's idx-1 chunk ACROSS batches and positions
    // (38 shingles each, 3 killed by the substitution: J = 35/41) —
    // plus a far-future watermark pusher
    val zvar = ((40 until 60).map(i => s"z$i") ++ Seq("SUB") ++
      (61 until 80).map(i => s"z$i")).mkString(" ")
    writeOneFile(docs(Seq((20L, zvar, t0 + 30),
      (30L, toks(0 until 40, "p"), t0 + 10000))), s"$in/b2.parquet", base + 60000)
    // batch 3: the w-family re-crawl at t0+9950 (non-late) — doc 10's
    // chunk has ts + ttl far behind the watermark, so it was evicted
    // and no pair may be reported
    val wvar = ((0 until 20).map(i => s"w$i") ++ Seq("SUB") ++
      (21 until 40).map(i => s"w$i")).mkString(" ")
    writeOneFile(docs(Seq((21L, wvar, t0 + 9950))),
      s"$in/b3.parquet", base + 120000)
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val got = Streaming.runDedupChunksStreamTTL(stream, 60000L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getDouble(4))).toSeq
    assert(got.map(p => (p._1, p._2, p._3, p._4)) === Seq((11L, 1, 20L, 0)),
      s"expected exactly the cross-batch cross-idx pair (11.1, 20.0) — the " +
        s"w-family pair must be suppressed by eviction — got $got")
    // 35 shared shingles, 38 per side: round(35/41, 3) = 0.854
    assert(got.head._5 === 0.854, s"jaccard should be 35/41 rounded, got ${got.head._5}")
  }

  test("streaming samples pipeline keeps first-seen chunks across batches, redacted") {
    import org.apache.spark.sql.DataFrame
    import spark.implicits._
    // one stopword-dense 50-token body (= exactly one chunk) with a
    // planted email; the same text arrives again in a LATER batch under
    // a lower doc_id — the cross-batch min-fold must keep doc 5's copy
    val stop = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")
    val body = ((0 until 24).map(i => stop(i % 10)) ++ Seq("write", "bob@ex.org") ++
      (0 until 24).map(i => stop((i + 3) % 10))).mkString(" ") // 50 tokens
    val in = Files.createTempDirectory("graft_sp_in_").toString
    val base = System.currentTimeMillis()
    writeOneFile(Seq((10L, body)).toDF("doc_id", "text"), s"$in/b1.parquet", base)
    writeOneFile(Seq((5L, body)).toDF("doc_id", "text"), s"$in/b2.parquet", base + 60000)
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val got = Streaming.runPipelineSamplesStream(stream)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    // 50 tokens ⇒ chunk starts 0 and 40 ⇒ two distinct chunks, BOTH
    // folded to doc 5's copies (doc 10's duplicates suppressed)
    assert(got.map(c => (c._1, c._2)).toSeq === Seq((5L, 0), (5L, 1)),
      s"cross-batch keep-first must fold both chunks to doc 5, got ${got.toSeq}")
    assert(got.head._3.contains("<EMAIL>") && !got.head._3.contains("bob@ex.org"),
      s"streamed sample must be redacted: ${got.head._3}")
  }

  test("TTL samples pipeline: in-window chunk dups fold, evicted hashes restart an epoch") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions.{expr => fexpr}
    import spark.implicits._
    val stop = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")
    // 50 punctuation-free stopword tokens = exactly two chunks (starts
    // 0 and 40), quality far above the cut
    val bodyA = (0 until 50).map(i => stop(i % 10)).mkString(" ")
    // pushers must PASS the quality gate (half stopwords): Catalyst
    // pushes the text-only quality predicate below the watermark node,
    // so a gate-dropped row would never advance the watermark
    def pusher(p: String) = (0 until 50)
      .map(i => if (i % 2 == 0) stop((i / 2) % 10) else s"$p$i").mkString(" ")
    val in = Files.createTempDirectory("graft_spttl_in_").toString
    val t0 = 1700000000L
    val base = System.currentTimeMillis()
    def docs(rows: Seq[(Long, String, Long)]): DataFrame =
      rows.toDF("doc_id", "text", "sec")
        .select($"doc_id", $"text", fexpr("timestamp_seconds(sec)").as("ts"))
    // b1: the original at t0
    writeOneFile(docs(Seq((10L, bodyA, t0))), s"$in/b1.parquet", base)
    // b2: an IN-WINDOW duplicate under a higher id + the far-future
    // watermark pusher (wm after b2 = t0+10000−60)
    writeOneFile(docs(Seq((11L, bodyA, t0 + 30), (90L, pusher("p"), t0 + 10000))),
      s"$in/b2.parquet", base + 60000)
    // b3: bodyA-absent batch — bodyA's chunk groups time out here
    // (deadline t0+30+60 is far behind the watermark)
    writeOneFile(docs(Seq((91L, pusher("q"), t0 + 10010))),
      s"$in/b3.parquet", base + 120000)
    // b4: bodyA AGAIN, after eviction, under id 30
    writeOneFile(docs(Seq((30L, bodyA, t0 + 10020))), s"$in/b4.parquet", base + 180000)
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val emitted = Streaming.pipelineSamplesTTLEmissions(stream, "60 seconds")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq
    // in-window fold: batch 2's arrival under id 11 must emit the FOLDED
    // keep key 10 (state survived), so no emission ever carries 11
    assert(!emitted.exists(_._2 == 11L),
      s"in-window duplicate must fold into the live state, got $emitted")
    // eviction: batch 4's arrival re-keys to 30 — with unbounded state
    // every bodyA emission would carry 10
    assert(emitted.count(_._2 == 30L) == 2,
      s"post-eviction arrival must start a fresh epoch keyed 30, got $emitted")
    assert(emitted.map(_._2).toSet === Set(10L, 30L, 90L, 91L),
      s"emissions must carry only the epochs' keep keys + pusher chunks, got $emitted")
    // epoch restart stays consistent with the batch fold: min per hash
    // across ALL epochs = the unbounded/batch keep-first result
    val folded = emitted.groupBy(_._1).values
      .map(_.map(e => (e._2, e._3)).min).toSeq.sorted
    assert(folded.filter(_._1 < 90L) === Seq((10L, 0), (10L, 1)),
      s"final min-fold must keep doc 10's two chunks, got $folded")
  }

  test("single-batch near-dup stream equals the batch minhash pair search") {
    val streamed = Streaming.streamDedupMinhash(spark, sf)
      .collect().map(_.toSeq).toSeq
    val batch = graft.operators.Dedup.dedupMinHashLsh(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("streaming decontamination flags planted overlap across batches, equals batch") {
    import spark.implicits._
    val eval13 = (1 to 13).map(i => s"e$i").mkString(" ")
    val evalDf = Seq((107L, eval13)).toDF("doc_id", "text")
    val in = Files.createTempDirectory("graft_decontam_in_").toString
    writeOneFile(Seq(
      (1L, s"x $eval13 y"),                                // contaminated (1 of 3 windows)
      (2L, (1 to 15).map(i => s"c$i").mkString(" "))       // clean, 3 windows
    ).toDF("doc_id", "text"), s"$in/batch1.parquet")
    writeOneFile(Seq(
      (3L, s"$eval13 z1 z2"),                              // contaminated in a LATER batch
      (4L, "a b c")                                        // under the window width: no grams
    ).toDF("doc_id", "text"), s"$in/batch2.parquet",
      Files.getLastModifiedTime(Paths.get(s"$in/batch1.parquet")).toMillis + 60000)
    val schema = spark.read.parquet(in).schema
    val train = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val got = Streaming.runDecontamStream(train, evalDf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, 3L, 1L), (3L, 3L, 1L)),
      s"planted overlap must flag docs 1 and 3 only, got $got")
    // differential: equals the batch operator over the union of batches
    val batch = graft.operators.Curation
      .decontaminateOn(spark.read.parquet(in), evalDf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === batch)
  }

  test("streaming mixture sampling equals the batch sampler across batches") {
    import spark.implicits._
    def doc(id: Long, lang: String, n: Int): (Long, String, String) =
      (id, lang, (1 to n).map(i => s"w$i").mkString(" "))
    val b1 = Seq(doc(1, "en", 40), doc(2, "en", 35), doc(3, "de", 6),
      doc(4, "en", 30), doc(5, "fr", 8))
    val b2 = Seq(doc(6, "en", 25), doc(7, "de", 5), doc(8, "fr", 7),
      doc(9, "en", 20), doc(10, "de", 4))
    val in = Files.createTempDirectory("graft_mix_in_").toString
    writeOneFile(b1.toDF("doc_id", "lang", "text"), s"$in/batch1.parquet")
    writeOneFile(b2.toDF("doc_id", "lang", "text"), s"$in/batch2.parquet",
      Files.getLastModifiedTime(Paths.get(s"$in/batch1.parquet")).toMillis + 60000)
    val snapshot = spark.read.parquet(in) // probabilities fitted on the union
    val schema = snapshot.schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val got = Streaming.runMixSampleStream(stream, snapshot)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val batch = graft.operators.Curation.mixSampleOn(snapshot)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === batch, s"stream fold $got must equal batch $batch")
    // the smoothing must actually bite: high-resource en downsampled
    // (keep_p < 1 ⇒ q_keep < 2^20), low-resource de kept whole
    val qk = got.map(r => r._1 -> r._4).toMap
    assert(qk("de") === (1L << 20), s"low-resource lang must keep all, got $qk")
    assert(qk("en") < (1L << 20), s"high-resource lang must downsample, got $qk")
  }

  test("warm-start near-dup: prior index bootstraps state; output = pairs with a fresh member") {
    import graft.operators.Dedup
    def pairSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = pairSet(Streaming.streamDedupMinhashWarmstart(spark, sf))
    val full = pairSet(Dedup.dedupMinHashLsh(spark, sf))
    val fresh = (id: Long) => id % Dedup.SnapshotMod >= Dedup.SnapshotNewMin
    val expected = full.filter { case (a, b, _) => fresh(a) || fresh(b) }
    assert(got === expected,
      s"warm-start must equal the full pairs with >=1 fresh member\n got=$got\n exp=$expected")
    assert(got.nonEmpty)
    // the pin must BITE: prior-prior pairs exist in the full result and
    // are absent here (prior residents live only in initial state and
    // never pair with each other), and at least one delta-internal
    // (fresh-fresh) pair proves arrivals also pair against earlier
    // arrivals, not just the bootstrapped index
    assert(expected.size < full.size,
      "testdata lost its prior-prior pairs; this spec no longer pins anything")
    assert(got.exists { case (a, b, _) => fresh(a) && fresh(b) },
      "testdata lost its delta-internal pair; the earlier-arrival path is unpinned")
  }

  test("warm-start TTL: in-window feed equals the NoTimeout warm-start") {
    // synthetic in-window timestamps ⇒ no eviction fires ⇒ the bounded
    // form must reproduce the unbounded bootstrap exactly (the driver's
    // oracle makes the same claim against DuckDB; this is the in-repo pin)
    def pairSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val ttl = pairSet(Streaming.streamDedupMinhashWarmstartTTL(spark, sf))
    val unbounded = pairSet(Streaming.streamDedupMinhashWarmstart(spark, sf))
    assert(ttl.nonEmpty)
    assert(ttl === unbounded)
  }

  test("warm-start TTL: bootstrapped resident is watermark-evicted like any other") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions.{expr => fexpr}
    import spark.implicits._
    def toks(r: Range, p: String) = r.map(i => s"$p$i").mkString(" ")
    def docs(rows: Seq[(Long, String, Long)]): DataFrame =
      rows.toDF("doc_id", "text", "sec")
        .select($"doc_id", $"text", fexpr("timestamp_seconds(sec)").as("ts"))
    val in = Files.createTempDirectory("graft_wsttl_in_").toString
    val t0 = 1700000000L
    val base = System.currentTimeMillis()
    // PRIOR (batch bootstrap, never streamed): family w's original at t0
    // — will age out before its re-crawl — and family z's original at
    // t0+9900, still in-window when its re-crawl arrives
    val prior = docs(Seq((10L, toks(0 until 100, "w"), t0),
      (11L, toks(0 until 100, "z"), t0 + 9900)))
    // delta batch 1: z re-crawl 30 s after its bootstrapped original
    // (inside the 60 s TTL; first-batch watermark is zero, so the pair
    // against INITIAL STATE must be emitted) + a far-future watermark
    // pusher → wm = (t0+10000) − 60
    writeOneFile(docs(Seq((20L, toks(0 until 99, "z"), t0 + 9930),
      (30L, toks(0 until 60, "p"), t0 + 10000))), s"$in/b1.parquet", base)
    // delta batch 2: w re-crawl at t0+9950 (non-late) — bootstrapped
    // resident 10 has ts + ttl = t0+60 far behind the watermark, so it
    // was evicted and NO pair may be reported (the NoTimeout warm-start
    // would pair them — this is exactly what the TTL twin adds)
    writeOneFile(docs(Seq((21L, toks(0 until 99, "w"), t0 + 9950))),
      s"$in/b2.parquet", base + 60000)
    val schema = spark.read.parquet(in).schema
    val delta = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val got = Streaming.runNearDupStreamWarmstartTTL(delta, prior, 60000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((11L, 20L)),
      s"expected only the in-window bootstrap pair (11, 20) — the aged-out " +
        s"bootstrapped resident must be evicted — got $got")
  }

  test("TTL sessions: in-window gap folds, evicted user restarts an epoch") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions.{expr => fexpr}
    import spark.implicits._
    val in = Files.createTempDirectory("graft_sessttl_in_").toString
    val t0 = 1700000000L
    val base = System.currentTimeMillis()
    def ev(rows: Seq[(Long, Long, Long)]): DataFrame =
      rows.toDF("user_id", "event_id", "sec")
        .select($"user_id", $"event_id", fexpr("timestamp_seconds(sec)").as("ts"))
    // b1: user 7 — two events 10 min apart (one session; deadline
    // t0+600+gap)
    writeOneFile(ev(Seq((7L, 100L, t0), (7L, 101L, t0 + 600))), s"$in/b1.parquet", base)
    // b2: watermark pusher far in the future (wm ≈ t0+100000−gap)
    writeOneFile(ev(Seq((90L, 900L, t0 + 100000))), s"$in/b2.parquet", base + 60000)
    // b3: quiet batch — user 7's state times out against the advanced
    // watermark
    writeOneFile(ev(Seq((91L, 910L, t0 + 100010))), s"$in/b3.parquet", base + 120000)
    // b4: user 7 returns after eviction — a fresh epoch counting from 1
    writeOneFile(ev(Seq((7L, 102L, t0 + 100020))), s"$in/b4.parquet", base + 180000)
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val emitted = Streaming.sessionsTTLEmissions(stream)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSeq
    // epoch restart: the post-eviction emission counts from total = 1
    // (unbounded state would carry total = 3 and n_sessions = 2)
    assert(emitted.contains((7L, 1L, 1L)),
      s"post-eviction arrival must start a fresh epoch, got $emitted")
    assert(emitted.contains((7L, 1L, 2L)),
      s"the first epoch's two-event session must have been emitted, got $emitted")
    // the snapshot fold keeps the LARGEST epoch — the documented
    // per-epoch trade (exact within an epoch)
    val folded = Streaming.runSessionsStreamTTL(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(in))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(folded.filter(_._1 == 7L) === Seq((7L, 1L, 2L)),
      s"fold must keep the largest epoch (2-event session), got $folded")
  }

  test("streaming LM scoring equals the batch scorer across batches") {
    import org.apache.spark.sql.DataFrame
    import spark.implicits._
    // fit snapshot "a b a c" (V=3); fresh docs arrive over TWO batches
    // — per-doc scores are complete on each doc's own batch, so the
    // stream must equal the batch transform on the union
    val fit = Seq((1L, "a b a c")).toDF("doc_id", "text")
    val in = Files.createTempDirectory("graft_lm_in_").toString
    val base = System.currentTimeMillis()
    writeOneFile(Seq((8L, "a b x")).toDF("doc_id", "text"), s"$in/b1.parquet", base)
    writeOneFile(Seq((9L, "z z"), (10L, "solo")).toDF("doc_id", "text"),
      s"$in/b2.parquet", base + 60000)
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val got = Streaming.runLmScoreStream(stream, fit).collect().map(_.toSeq).toSeq
    val batch = graft.operators.TextAnalysis.textLmScoreOn(
      fit, spark.read.parquet(in)).collect().map(_.toSeq).toSeq
    assert(got === batch, s"stream $got != batch $batch")
    assert(got.size === 2) // "solo" has no bigrams
  }

  test("buffered sessions: in-watermark OUT-OF-ORDER arrival folds in event-time order") {
    import org.apache.spark.sql.functions.{expr => fexpr}
    import spark.implicits._
    val gapMin = graft.operators.Sessions.GapMinutes // 30
    val t0 = 1700000000L
    def docs(rows: Seq[(Long, Long, Long)]) =
      rows.toDF("user_id", "event_id", "sec")
        .select($"user_id", $"event_id", fexpr("timestamp_seconds(sec)").as("ts"))
    val in = Files.createTempDirectory("graft_sb_in_").toString
    val base = System.currentTimeMillis()
    // batch 1: user 7 at t0 and t0+50min → watermark advances to t0+20min
    writeOneFile(docs(Seq((7L, 1L, t0), (7L, 2L, t0 + 50 * 60))), s"$in/b1.parquet", base)
    // batch 2: t0+25min — ahead of the watermark (admissible) but BEHIND
    // the already-seen t0+50min: event-time order says the three events
    // are ONE session (gaps 25, 25 ≤ 30); arrival order says two
    writeOneFile(docs(Seq((7L, 3L, t0 + 25 * 60))), s"$in/b2.parquet", base + 60000)
    // batch 3: another user far in the future — advances the watermark
    // past user 7 entirely, forcing the buffered state to seal + evict
    writeOneFile(docs(Seq((9L, 4L, t0 + 36000))), s"$in/b3.parquet", base + 120000)
    val schema = spark.read.parquet(in).schema
    def stream() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val buffered = Streaming.runSessionsStreamBuffered(stream())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(buffered === Set((7L, 1L, 3L), (9L, 1L, 1L)),
      s"buffered fold must be event-time-exact, got $buffered")
    // the contrast that motivates the buffered form: the arrival-order
    // TTL fold splits at the 50-minute gap it saw first and can never
    // unsee it — same feed, 2 sessions
    val ttl = Streaming.runSessionsStreamTTL(stream())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(ttl.contains((7L, 2L, 2L)),
      s"expected the arrival-order fold to split user 7, got $ttl")
    // and the buffered result equals the batch window formulation on
    // the union — the shared-oracle claim
    val batch = graft.operators.Sessions.sessionsOn(spark.read.parquet(in))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(buffered === batch)
  }

  test("streaming decontam strip equals the batch surgery across batches") {
    import spark.implicits._
    // eval tokens e0..e29; train doc 20 embeds e5..e17 (one full
    // 13-window) mid-doc, doc 21 is clean, doc 22 arrives in a LATER
    // batch with a different embedded window — stateless per-doc
    // surgery must match the batch transform on the union
    val evalToks = (0 until 30).map(i => s"e$i")
    val ev = Seq((7L, evalToks.mkString(" "))).toDF("doc_id", "text")
    val in = Files.createTempDirectory("graft_sds_in_").toString
    val base = System.currentTimeMillis()
    writeOneFile(Seq(
      (20L, "x1 x2 " + evalToks.slice(5, 18).mkString(" ") + " x3"),
      (21L, (0 until 20).map(i => s"y$i").mkString(" "))).toDF("doc_id", "text"),
      s"$in/b1.parquet", base)
    writeOneFile(Seq(
      (22L, evalToks.slice(10, 23).mkString(" ") + " z1 z2")).toDF("doc_id", "text"),
      s"$in/b2.parquet", base + 60000)
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val got = Streaming.runDecontamStripStream(stream, ev).collect().map(_.toSeq).toSet
    val batch = graft.operators.Curation.decontamStripOn(
      spark.read.parquet(in), ev).collect().map(_.toSeq).toSet
    assert(got === batch, s"stream $got != batch $batch")
    assert(got.exists(r => r.head == 20L && r(1) == "x1 x2 x3"))
  }

  test("streaming quality-model scoring equals the batch scorer across batches") {
    import spark.implicits._
    // fit = one positive (10 stopwords, quality 1.5) + one negative
    // ("zzz", 0.05); fresh docs split over two batches — the frozen
    // prior-slice model must score the union exactly like the batch
    val fit = Seq((1L, Seq.fill(10)("the").mkString(" ")), (2L, "zzz"))
      .toDF("doc_id", "text")
    val in = Files.createTempDirectory("graft_qm_in_").toString
    val base = System.currentTimeMillis()
    writeOneFile(Seq((8L, "the zzz ccc")).toDF("doc_id", "text"), s"$in/b1.parquet", base)
    writeOneFile(Seq((9L, "qqq"), (10L, "the the")).toDF("doc_id", "text"),
      s"$in/b2.parquet", base + 60000)
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val got = Streaming.runQualityModelStream(stream, fit).collect().map(_.toSeq).toSeq
    val batch = graft.operators.TextAnalysis.textQualityModelOn(
      fit, spark.read.parquet(in)).collect().map(_.toSeq).toSeq
    assert(got === batch, s"stream $got != batch $batch")
    assert(got.size === 3)
  }

  test("streaming novelty equals the batch miss rate across batches") {
    import spark.implicits._
    val W = graft.operators.Curation.DecontamGram
    val priorRun = (0 until 20).map(i => s"p$i").mkString(" ")
    val prior = Seq((1L, priorRun)).toDF("doc_id", "text")
    val in = Files.createTempDirectory("graft_nov_in_").toString
    val base = System.currentTimeMillis()
    writeOneFile(Seq((10L, priorRun)).toDF("doc_id", "text"), s"$in/b1.parquet", base)
    writeOneFile(Seq(
      (11L, (100 until 120).map(i => s"n$i").mkString(" ")),
      (12L, (0 until W).map(i => s"p$i").mkString(" ") + " " +
        (200 until 210).map(i => s"m$i").mkString(" ")))
      .toDF("doc_id", "text"), s"$in/b2.parquet", base + 60000)
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val got = Streaming.runNoveltyStream(stream, prior).collect().map(_.toSeq).toSeq
    val batch = graft.operators.Curation.noveltyOn(prior, spark.read.parquet(in))
      .collect().map(_.toSeq).toSeq
    assert(got === batch, s"stream $got != batch $batch")
    assert(got.size === 3)
  }

  test("streaming aHash dedup equals the batch perceptual collapse across batches") {
    import spark.implicits._
    // the perturbed twin lands in a DIFFERENT batch than its original —
    // the fold must still collapse the pair (the hash table is global)
    val a = "z" * 96 + "A" * 96
    val b = "y" + "z" * 95 + "A" * 96
    val c = "A" * 96 + "z" * 96
    val in = Files.createTempDirectory("graft_sah_in_").toString
    val base = System.currentTimeMillis()
    writeOneFile(Seq((1L, a), (3L, c)).toDF("doc_id", "text"), s"$in/b1.parquet", base)
    writeOneFile(Seq((2L, b)).toDF("doc_id", "text"), s"$in/b2.parquet", base + 60000)
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val got = Streaming.runDedupAhashStream(stream).collect().map(_.toSeq).toSeq
    val batch = graft.operators.Multimodal.mmDedupAhashOn(spark.read.parquet(in))
      .collect().map(_.toSeq).toSeq
    assert(got === batch, s"stream $got != batch $batch")
    val byDoc = got.map(r => (r.head.asInstanceOf[Long],
      r(2).asInstanceOf[Long], r(3).asInstanceOf[Boolean])).toSet
    assert(byDoc === Set((1L, 2L, true), (2L, 2L, false), (3L, 1L, true)))
  }

  test("streaming substring-incremental: retroactive cross-batch flush equals batch") {
    import spark.implicits._
    val W = graft.operators.Dedup.ExactSubstrTokens
    // shared 30-token run S: doc 20 (batch 1) and doc 21 (batch 2) — the
    // batch-1 occurrences must flush RETROACTIVELY when doc 21 arrives;
    // doc 22 repeats a PRIOR doc's run (emits on arrival, pre-emitted
    // state); doc 23 repeats its own run twice (single doc — silent)
    val s = (0 until 30).map(i => s"s$i").mkString(" ")
    val p = (0 until 30).map(i => s"p$i").mkString(" ")
    val own = (0 until W).map(i => s"o$i").mkString(" ")
    val prior = Seq((1L, "pa pb " + p)).toDF("doc_id", "text")
    val in = Files.createTempDirectory("graft_ssi_in_").toString
    val base = System.currentTimeMillis()
    writeOneFile(Seq(
      (20L, "x1 x2 " + s + " x3"),
      (23L, own + " z9 " + own)).toDF("doc_id", "text"), s"$in/b1.parquet", base)
    writeOneFile(Seq(
      (21L, "y1 " + s + " y2 y3"),
      (22L, p + " w1 w2")).toDF("doc_id", "text"), s"$in/b2.parquet", base + 60000)
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val got = Streaming.runSubstringIncrementalStream(stream, prior)
      .collect().map(_.toSeq).toSeq
    val batch = graft.operators.Dedup.dedupSubstringIncrementalOn(
        prior, spark.read.parquet(in)).collect().map(_.toSeq).toSeq
    assert(got === batch, s"stream $got != batch $batch")
    val byDoc = got.map(r => r.head.asInstanceOf[Long]).toSet
    assert(byDoc === Set(20L, 21L, 22L), s"flagged docs: $byDoc")
  }

  test("streaming Gopher rules equals the batch filter across batches") {
    import spark.implicits._
    // boundary docs split over two batches — per-row verdicts must be
    // identical to the batch rule evaluation over the union
    def words(n: Int, w: String) = Seq.fill(n)(w).mkString(" ")
    val in = Files.createTempDirectory("graft_gr_in_").toString
    val base = System.currentTimeMillis()
    writeOneFile(Seq((1L, words(49, "and")), (2L, "the and " + words(48, "box")))
      .toDF("doc_id", "text"), s"$in/b1.parquet", base)
    writeOneFile(Seq((3L, "the of lorem ipsum " + words(46, "box")))
      .toDF("doc_id", "text"), s"$in/b2.parquet", base + 60000)
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val got = Streaming.runGopherRulesStream(stream).collect().map(_.toSeq).toSeq
    val batch = graft.operators.TextAnalysis.gopherRulesOn(spark.read.parquet(in))
      .collect().map(_.toSeq).toSeq
    assert(got === batch, s"stream $got != batch $batch")
    assert(got.size === 3)
  }

  test("streaming line filter equals the batch filter across batches") {
    import spark.implicits._
    // stateless per-row verdicts: the filtered rebuild of each doc must
    // match the batch lineFilterOn over the union, whatever the split
    val in = Files.createTempDirectory("graft_lf_in_").toString
    val base = System.currentTimeMillis()
    def toks(p: String, n: Int) = (0 until n).map(i => s"$p$i").mkString(" ")
    writeOneFile(Seq(
      (1L, toks("a", 10) + " has { brace " + toks("b", 6)),
      (2L, toks("c", 20))).toDF("doc_id", "text"), s"$in/b1.parquet", base)
    writeOneFile(Seq(
      (3L, "enable javascript now please kindly " + toks("d", 14)))
      .toDF("doc_id", "text"), s"$in/b2.parquet", base + 60000)
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val got = Streaming.runLineFilterStream(stream).collect().map(_.toSeq).toSeq
    val batch = graft.operators.Curation.lineFilterOn(spark.read.parquet(in),
      graft.operators.Curation.reflowLinesArr(org.apache.spark.sql.functions.col("text")))
      .collect().map(_.toSeq).toSeq
    assert(got === batch, s"stream $got != batch $batch")
    assert(got.size === 3)
  }

  test("streaming badwords filter equals the batch filter across batches") {
    import spark.implicits._
    // stateless per-row verdicts; doc 3 arrives in batch 2 with a
    // substring-only line that must NOT match (token-exact semantics)
    val in = Files.createTempDirectory("graft_bw_in_").toString
    val base = System.currentTimeMillis()
    writeOneFile(Seq(
      (1L, "all clean words here"),
      (2L, "a dup and another dup word")).toDF("doc_id", "text"),
      s"$in/b1.parquet", base)
    writeOneFile(Seq(
      (3L, "dups induped only"),
      (4L, "late obscenity arrival")).toDF("doc_id", "text"),
      s"$in/b2.parquet", base + 60000)
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val got = Streaming.runBadwordsStream(stream).collect().map(_.toSeq).toSeq
    val batch = graft.operators.Curation.badwordsFilterOn(spark.read.parquet(in))
      .collect().map(_.toSeq).toSeq
    assert(got === batch, s"stream $got != batch $batch")
    assert(got === Seq(Seq(2L, 2L), Seq(4L, 1L)))
  }

  test("streaming badwords at production list size equals the batch automaton across batches") {
    import spark.implicits._
    // multi-word phrase semantics survive the stream: "table hash"
    // matches only as consecutive tokens; each doc's verdict is final
    // on arrival (stateless, like the 3-word form)
    val in = Files.createTempDirectory("graft_bwbig_in_").toString
    val base = System.currentTimeMillis()
    writeOneFile(Seq(
      (1L, "all clean words here"),
      (2L, "a table hash inside")).toDF("doc_id", "text"),
      s"$in/b1.parquet", base)
    writeOneFile(Seq(
      (3L, "table only then hash split"),
      (4L, "dup plus customer join late")).toDF("doc_id", "text"),
      s"$in/b2.parquet", base + 60000)
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val got = Streaming.runBadwordsBigStream(stream).collect().map(_.toSeq).toSeq
    val batch = graft.operators.Curation.badwordsBigFilterOn(
        spark.read.parquet(in), graft.operators.Curation.BadWordsBig)
      .collect().map(_.toSeq).toSeq
    assert(got === batch, s"stream $got != batch $batch")
    assert(got === Seq(Seq(2L, 1L), Seq(4L, 2L)))
  }

  test("streaming BPE encode equals the batch encode across batches (frozen vocab)") {
    import spark.implicits._
    // the tokenizer-service split: vocab fit ONCE on the full static
    // corpus, documents arriving across two batches must encode exactly
    // as the batch query over the same corpus (per-doc reassembly is the
    // only streaming agg; verdicts final on arrival)
    val in = Files.createTempDirectory("graft_bpe_in_").toString
    val base = System.currentTimeMillis()
    writeOneFile(Seq(
      (1L, "low low low"),
      (2L, "lower lower")).toDF("doc_id", "text"),
      s"$in/b1.parquet", base)
    writeOneFile(Seq(
      (3L, "newest"),
      (4L, "low lower newest")).toDF("doc_id", "text"),
      s"$in/b2.parquet", base + 60000)
    val corpus = spark.read.parquet(in)
    val schema = corpus.schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val got = Streaming.runBpeEncodeStream(stream, corpus)
      .collect().map(_.toSeq).toSeq
    val batch = graft.operators.TextAnalysis.textBpeEncodeOn(
        corpus, graft.operators.TextAnalysis.BpeFitMerges)
      .collect().map(_.toSeq).toSeq
    assert(got === batch, s"stream $got != batch $batch")
    assert(got.nonEmpty)
  }

  test("streaming byte BPE encode: two-batch ≡ batch; OOV pretokens stay in-alphabet") {
    import spark.implicits._
    // the byte tokenizer service: vocab fit ONCE on the static corpus,
    // two arriving batches must encode exactly as the batch byte query;
    // then an OOV feed — at byte level the fallback IS the mode's point
    // (hex pairs are always base symbols, no unknown-token case exists)
    val in = Files.createTempDirectory("graft_bpeb_in_").toString
    val base = System.currentTimeMillis()
    writeOneFile(Seq(
      (1L, "low low low"),
      (2L, "lower lower")).toDF("doc_id", "text"),
      s"$in/b1.parquet", base)
    writeOneFile(Seq(
      (3L, "newest"),
      (4L, "low lower newest")).toDF("doc_id", "text"),
      s"$in/b2.parquet", base + 60000)
    val corpus = spark.read.parquet(in)
    val stream = spark.readStream.schema(corpus.schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val got = Streaming.runBpeEncodeBytesStream(stream, corpus)
      .collect().map(_.toSeq).toSeq
    val batch = graft.operators.TextAnalysis.textBpeEncodeBytesOn(
        corpus, graft.operators.TextAnalysis.BpeFitMerges)
      .collect().map(_.toSeq).toSeq
    assert(got === batch, s"stream $got != batch $batch")
    // OOV feed: fit on corpus A, stream a doc of only unseen pretokens —
    // it survives as raw byte symbols ("zq" = 7a 71, " xv" = 20 78 76)
    val in2 = Files.createTempDirectory("graft_bpeb_oov_").toString
    writeOneFile(Seq((9L, "zq xv")).toDF("doc_id", "text"),
      s"$in2/b1.parquet", base)
    val stream2 = spark.readStream.schema(corpus.schema)
      .option("maxFilesPerTrigger", "1").parquet(in2)
    val oov = Streaming.runBpeEncodeBytesStream(stream2,
      Seq((0L, "low low low lower")).toDF("doc_id", "text")).collect()
    assert(oov.map(_.getLong(0)).toSeq === Seq(9L))
    assert(oov.head.getString(2) === "7a 71 20 78 76")
    assert(oov.head.getLong(1) === 5L)
  }

  test("streaming BPE encode: OOV words char-decompose instead of dropping") {
    import spark.implicits._
    // the r17 ADVICE defect: vocab frozen from the FIT corpus, a word
    // unseen at fit time was inner-joined away — a doc of only OOV words
    // vanished entirely. Fit on corpus A, stream words NOT in A.
    val in = Files.createTempDirectory("graft_bpe_oov_").toString
    val base = System.currentTimeMillis()
    writeOneFile(Seq(
      (1L, "low low lower"),
      (2L, "zq low")).toDF("doc_id", "text"), // zq: OOV, all-OOV doc below
      s"$in/b1.parquet", base)
    writeOneFile(Seq((3L, "zq xv")).toDF("doc_id", "text"),
      s"$in/b2.parquet", base + 60000)
    // frozen vocab fit ONLY on "low low low lower" — zq/xv are unseen
    val fitCorpus = Seq((0L, "low low low lower")).toDF("doc_id", "text")
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val got = Streaming.runBpeEncodeStream(stream, fitCorpus)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    // every doc survives — including doc 3, which is ALL OOV words
    assert(got.map(_._1) === Seq(1L, 2L, 3L))
    val byDoc = got.map(r => r._1 -> r).toMap
    // OOV words appear as their base char decomposition, in word order
    assert(byDoc(3L)._3 === "z q </w> x v </w>")
    assert(byDoc(3L)._2 === 6L) // 2 chars + </w>, twice
    // mixed doc: in-vocab word keeps its fitted encoding, OOV falls back
    assert(byDoc(2L)._3.endsWith("</w>") && byDoc(2L)._3.startsWith("z q </w>"))
    // vocab-covered docs are untouched by the fallback branch: doc 1's
    // encoding is exactly the frozen vocab's per-word sequences in order
    val vocab = graft.operators.TextAnalysis.bpeEncodedVocab(
        fitCorpus, graft.operators.TextAnalysis.BpeFitMerges)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byDoc(1L)._3 === Seq("low", "low", "lower").map(vocab).mkString(" "))
  }

  test("streaming semantic decontam equals the batch top-20 across batches") {
    import spark.implicits._
    // stateless stream-static cosine: train vectors split across two
    // batches must reproduce the batch crossJoin's exact scores + tie
    // ordering over the union
    val eval = Seq((90L, Array(3f, 4f)), (91L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val in = Files.createTempDirectory("graft_sd_in_").toString
    val base = System.currentTimeMillis()
    writeOneFile(Seq((10L, Array(3f, 4f)), (11L, Array(1f, 0f)))
      .toDF("vec_id", "embedding"), s"$in/b1.parquet", base)
    writeOneFile(Seq((12L, Array(0f, 2f)))
      .toDF("vec_id", "embedding"), s"$in/b2.parquet", base + 60000)
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val got = Streaming.runDecontamSemanticStream(stream, eval)
      .collect().map(_.toSeq).toSeq
    val batch = graft.operators.Curation.decontamSemanticOn(
      spark.read.parquet(in), eval).collect().map(_.toSeq).toSeq
    assert(got === batch, s"stream $got != batch $batch")
    assert(got.size === 6)
  }

  test("streaming ANN encode equals the frozen-model batch encode across batches") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{lit, pmod}
    import graft.operators.{Dedup, Similarity}
    val sfDir = SparkTestSession.sf0001
    val fresh = graft.sources.Tables.embeddings(spark, sfDir)
      .filter(pmod($"vec_id", lit(Dedup.SnapshotMod)) >= Dedup.SnapshotNewMin)
      .select($"vec_id", $"embedding")
    val in = Files.createTempDirectory("graft_enc_in_").toString
    val base = System.currentTimeMillis()
    writeOneFile(fresh.filter($"vec_id" % 2 === 0), s"$in/b1.parquet", base)
    writeOneFile(fresh.filter($"vec_id" % 2 === 1), s"$in/b2.parquet", base + 60000)
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
      .select($"vec_id", graft.functions.VectorOps.toDouble($"embedding").as("v"))
    val got = Streaming.runAnnEncodeStream(stream, spark, sfDir)
      .collect().map(_.toSeq).toSeq
    // batch expected: the identical frozen models applied to the fresh
    // slice in one go — per-row deterministic encode, so batch order
    // and batching cannot matter
    val (cents, cb) = Similarity.ivfPqFrozenModels(spark, sfDir)
    val batch = Similarity.annEncodeFlat(
        fresh.select($"vec_id",
          graft.functions.VectorOps.toDouble($"embedding").as("v")), cents, cb)
      .orderBy($"vec_id", $"m").collect().map(_.toSeq).toSeq
    assert(got === batch, s"stream size ${got.size} != batch size ${batch.size} or content drift")
    assert(got.nonEmpty)
  }

  test("streaming CMS heavy hitters equals the batch sketch across batches") {
    import spark.implicits._
    // two batches with overlapping hot tokens — the streaming state's
    // cumulative cell counts folded by max must equal the batch sketch
    // over the union, including the min-over-rows estimates
    val in = Files.createTempDirectory("graft_cms_in_").toString
    val base = System.currentTimeMillis()
    writeOneFile(Seq((1L, "aa bb aa cc"), (2L, "bb aa dd")).toDF("doc_id", "text"),
      s"$in/b1.parquet", base)
    writeOneFile(Seq((3L, "aa ee bb"), (4L, "ff aa")).toDF("doc_id", "text"),
      s"$in/b2.parquet", base + 60000)
    val schema = spark.read.parquet(in).schema
    def stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val got = Streaming.runHeavyHittersCmsStream(stream, stream)
      .collect().map(_.toSeq).toSeq
    val batchDocs = spark.read.parquet(in)
    val words = graft.operators.WordCount.tokenize(batchDocs, "text")
    val batch = graft.operators.WordCount.heavyHittersTail(
      graft.operators.WordCount.counts(words)
        .orderBy($"cnt".desc, $"word".asc).limit(20),
      graft.operators.WordCount.cmsSketch(words))
      .collect().map(_.toSeq).toSeq
    assert(got === batch, s"stream $got != batch $batch")
    assert(got.head(0) === "aa" && got.head(1) === 5L)
    // the one-sided CMS bound holds for every emitted token
    got.foreach(r => assert(r(2).asInstanceOf[Long] >= r(1).asInstanceOf[Long]))
  }

  test("streaming DSIR scores DRIFTED docs via the background floor") {
    import spark.implicits._
    // the production case the frozen-model seam models: the stream has
    // moved past the fitted raw snapshot. A doc whose every bucket is
    // unseen in the raw fit must still score — every occurrence
    // smoothed by the qq floor — not deflate or vanish
    val target = Seq((1L, "alpha beta alpha")).toDF("doc_id", "text")
    val raw = Seq((8L, "alpha beta"), (9L, "beta koppa")).toDF("doc_id", "text")
    val in = Files.createTempDirectory("graft_dsird_in_").toString
    writeOneFile(Seq((30L, "qq1 qq2 qq3 qq4")).toDF("doc_id", "text"),
      s"$in/b1.parquet", System.currentTimeMillis())
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val got = Streaming.runDsirStream(stream, target, raw).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSeq === Seq(30L))
    assert(got.head._2 === 7L, s"4 unigrams + 3 bigrams expected: $got")
    // all buckets unseen in BOTH models → weight = 7·(qp0 − qq0), a
    // finite integer (would have been an empty result pre-floor)
  }

  test("streaming DSIR scoring equals the batch weights across batches") {
    import spark.implicits._
    // target vocabulary {alpha,beta}; raw slice split over two batches
    // — frozen target + background models must score the union exactly
    // like the batch per-(doc,bucket) formulation
    val target = Seq((1L, "alpha beta alpha beta"), (2L, "beta alpha"))
      .toDF("doc_id", "text")
    val in = Files.createTempDirectory("graft_dsir_in_").toString
    val base = System.currentTimeMillis()
    writeOneFile(Seq((8L, "alpha beta zeta")).toDF("doc_id", "text"),
      s"$in/b1.parquet", base)
    writeOneFile(Seq((9L, "koppa yota"), (10L, "beta beta alpha")).toDF("doc_id", "text"),
      s"$in/b2.parquet", base + 60000)
    val raw = spark.read.parquet(in)
    val schema = raw.schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val got = Streaming.runDsirStream(stream, target, raw).collect().map(_.toSeq).toSeq
    // sort both sides: the batch weights core no longer carries an
    // incidental doc_id sort (r14 — every consumer re-sorts or is
    // order-free), so equality is a row-SET claim here
    val batch = graft.operators.Curation.dsirWeightsOn(target, raw)
      .orderBy($"doc_id").collect().map(_.toSeq).toSeq
    assert(got.sortBy(_.head.toString.toLong) === batch,
      s"stream $got != batch $batch")
    assert(got.size === 3)
  }

  test("warm-start samples: prior chunk suppressed, novel folds, eviction reopens") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions.{expr => fexpr, lit}
    import spark.implicits._
    val stop = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")
    // two distinct 40-token all-stopword bodies = one chunk each,
    // quality 1.0; P is IN the prior snapshot, Z is novel
    val bodyP = (0 until 40).map(i => stop(i % 10)).mkString(" ")
    val bodyZ = (0 until 40).map(i => stop((i + 3) % 10)).mkString(" ")
    def pusher(p: String) = (0 until 50)
      .map(i => if (i % 2 == 0) stop((i / 2) % 10) else s"$p$i").mkString(" ")
    val t0 = 1700000000L
    val prior = Seq((1L, bodyP)).toDF("doc_id", "text")
      .select($"doc_id", $"text",
        fexpr(s"timestamp_seconds($t0)").as("ts"))
    val in = Files.createTempDirectory("graft_spws_in_").toString
    val base = System.currentTimeMillis()
    def docs(rows: Seq[(Long, String, Long)]): DataFrame =
      rows.toDF("doc_id", "text", "sec")
        .select($"doc_id", $"text", fexpr("timestamp_seconds(sec)").as("ts"))
    // b1: a delta re-crawl of the PRIOR body (must be suppressed — its
    // content is already a training sample) + a novel body
    writeOneFile(docs(Seq((20L, bodyP, t0), (21L, bodyZ, t0 + 1))),
      s"$in/b1.parquet", base)
    // b2: an in-window duplicate of the novel body under a LOWER id
    // (keep-first folds to 15) + the far-future watermark pusher
    writeOneFile(docs(Seq((15L, bodyZ, t0 + 30), (90L, pusher("p"), t0 + 10000))),
      s"$in/b2.parquet", base + 60000)
    // b3: quiet batch — bodyP's prior-owned group (touched in b1,
    // deadline ~t0+60) times out against the advanced watermark
    writeOneFile(docs(Seq((91L, pusher("q"), t0 + 10010))),
      s"$in/b3.parquet", base + 120000)
    // b4: the prior body AGAIN after its suppression state evicted —
    // a fresh epoch may now legitimately emit it
    writeOneFile(docs(Seq((30L, bodyP, t0 + 10020))), s"$in/b4.parquet", base + 180000)
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val emitted = Streaming.pipelineSamplesWarmstartTTLEmissions(
        stream, prior, "60 seconds")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq
    // suppression: the b1 re-crawl of prior content must emit NOTHING
    assert(!emitted.exists(_._2 == 20L),
      s"prior-owned chunk must be suppressed, got $emitted")
    // novel body: b1 emits keyed 21, b2 folds to 15 — never re-keys up
    assert(emitted.exists(_._2 == 21L) && emitted.exists(_._2 == 15L),
      s"novel chunk must emit and fold across batches, got $emitted")
    // eviction: after the prior-owned state ages out, the content
    // re-emits under the fresh epoch's key
    assert(emitted.exists(_._2 == 30L),
      s"post-eviction arrival must start a fresh epoch keyed 30, got $emitted")
    assert(emitted.map(_._2).toSet === Set(21L, 15L, 30L, 90L, 91L),
      s"unexpected emission keys: $emitted")
  }

  test("eventsStream scopes the nanosAsLong flag: restored after, stream still runs") {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    assert(Streaming.streamEventsHourly(spark, sf).count() > 0)
    assert(spark.conf.getOption(key) === prev,
      s"nanosAsLong leaked from eventsStream: ${spark.conf.getOption(key)}")
    // a NANOS-free read and the batch events twin both behave after the
    // stream — no session-global legacy-long contamination either way
    assert(graft.sources.Tables.documents(spark, sf).count() > 0)
    assert(graft.sources.Tables.events(spark, sf)
      .schema("ts").dataType.typeName === "timestamp")
  }

  test("streaming sessionization folds gaps across micro-batches") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions.{expr => fexpr}
    import spark.implicits._
    val in = Files.createTempDirectory("graft_sess_in_").toString
    val t0 = 1700000000L
    val base = System.currentTimeMillis()
    def ev(rows: Seq[(Long, Long, Long)]): DataFrame =
      rows.toDF("user_id", "event_id", "sec")
        .select($"user_id", $"event_id", fexpr("timestamp_seconds(sec)").as("ts"))
    // batch 1: user 1 — two events 10 min apart (one open session)
    writeOneFile(ev(Seq((1L, 100L, t0), (1L, 101L, t0 + 600))), s"$in/b1.parquet", base)
    // batch 2: 40 min gap (> 30 min) ⇒ NEW session, then +5 min ⇒ same;
    // the gap is computed against BATCH 1's last ts — pure cross-batch
    // state. user 2 appears only here: one singleton session.
    writeOneFile(ev(Seq((1L, 102L, t0 + 600 + 2400), (1L, 103L, t0 + 600 + 2700),
      (2L, 200L, t0))), s"$in/b2.parquet", base + 60000)
    val schema = spark.read.parquet(in).schema
    // mirror streamSessions' transform over a plantable source (the
    // production entry reads the NANOS events table; the fold under
    // test is identical)
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val got = Streaming.runSessionsStream(stream)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1).toSeq
    assert(got === Seq((1L, 2L, 2L, 2.0), (2L, 1L, 1L, 1.0)),
      s"expected two sessions of 2 for user 1 (cross-batch gap) and a " +
        s"singleton for user 2, got $got")
  }

  test("shard fold: offset carries across micro-batches, ids monotone and budget-bounded") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val budget = graft.operators.Curation.ShardBudget // 5000
    val feed = MemoryStream[(Long, Int, Long)]
    // batch 1 arrives out of order — in-batch order must be (doc, idx):
    // tokens 3000+3000 ⇒ doc 1 in shard 0, doc 2 starts shard 1 (offset
    // 3000 ⇒ still 0? no: 3000/5000=0 — then doc2 pre=3000 → shard 0,
    // post 6000). Sizes chosen so batch 2's first sample lands in a
    // LATER shard purely from batch 1's carried offset.
    feed.addData((2L, 0, 3000L), (1L, 0, 3000L))
    feed.addData((3L, 0, 4500L), (4L, 0, 100L))
    val q = Streaming.shardFoldStream(feed.toDS()).writeStream
      .outputMode("append").format("memory").queryName("graft_shard_fold").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("graft_shard_fold").collect()
      .map(r => (r.getLong(0), r.getLong(3))).sortBy(_._1).toSeq
    // exclusive prefix sums: doc1 pre=0→shard0, doc2 pre=3000→shard0,
    // doc3 pre=6000→shard1 (the cross-batch carry), doc4 pre=10500→shard2
    assert(got === Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 2L)))
    assert(got.map(_._2) === got.map(_._2).sorted, "ids must be monotone")
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

  test("substring-incremental TTL: in-window pair flags; evicted residents AND evicted prior-index entries both forget") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{expr => fexpr}
    val in = Files.createTempDirectory("graft_substr_ttl_").toString
    val t0 = 1700000000L
    def toks(p: String) = (0 until 30).map(i => s"$p$i").mkString(" ")
    def docs(rows: Seq[(Long, String, Long)]) =
      rows.toDF("doc_id", "text", "sec")
        .select($"doc_id", $"text", fexpr("timestamp_seconds(sec)").as("ts"))
    val base = System.currentTimeMillis()
    // prior snapshot: family F lives in the stored gram index
    val prior = Seq((1L, toks("f"))).toDF("doc_id", "text")
    // b1: an in-window fresh pair (d), a single-doc family (a, buffers),
    // and a probe of the prior index (f, flags immediately)
    writeOneFile(docs(Seq(
      (100L, toks("a"), t0), (110L, toks("d"), t0 + 1),
      (111L, toks("d"), t0 + 2), (120L, toks("f"), t0 + 3))),
      s"$in/b1.parquet", base)
    // b2: far-future singleton advances the watermark past b1's
    // deadlines (60 s ttl); b3: b1 keys absent → their timeouts fire
    writeOneFile(docs(Seq((200L, toks("x"), t0 + 10000))),
      s"$in/b2.parquet", base + 60000)
    writeOneFile(docs(Seq((210L, toks("y"), t0 + 10010))),
      s"$in/b3.parquet", base + 120000)
    // b4: families a and f again — BOTH were evicted, so neither the
    // buffered resident (100) nor the probed-then-evicted index entry
    // fires; with unbounded state this batch would flag 100/300/310
    writeOneFile(docs(Seq((300L, toks("a"), t0 + 10020),
      (310L, toks("f"), t0 + 10030))), s"$in/b4.parquet", base + 180000)
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val got = Streaming.runSubstringIncrementalStreamTTL(stream, prior, "60 seconds")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      .sortBy(_._1)
    assert(got === Seq((110L, 0L, 30L), (111L, 0L, 30L), (120L, 0L, 30L)),
      s"only the in-window pair and the warm prior probe may flag; got $got")
  }
}
