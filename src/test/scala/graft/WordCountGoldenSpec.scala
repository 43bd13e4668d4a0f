package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.WordCount

/** Differential golden tests against freshly regenerated committed-source
  * reference output (FIXTURES.md §3 — the goldens in
  * src/test/resources/golden/ were produced by compiling the committed
  * `omp.cpp` and running it over the reference corpus; the committed
  * `*_out.txt` artifacts are stale and never used). */
class WordCountGoldenSpec extends AnyFunSuite {
  private val corpusDir = "/root/reference/raw_text_input"

  private def golden(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/golden/$name")
    assert(in != null, s"missing golden resource $name")
    try in.readAllBytes() finally in.close()
  }

  /** Shell-glob order = byte-order sort of ASCII names. */
  private def corpusPaths: Seq[String] =
    new java.io.File(corpusDir).list().sorted.toSeq
      .map(f => s"$corpusDir/$f")

  test("fused tokenizer ≡ unfused explode/split/normalize/filter composition") {
    val spark = SparkTestSession.spark
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val fused = WordCount.counts(WordCount.tokenize(docs, "text"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val unfused = WordCount.counts(WordCount.tokenizeUnfused(docs, "text"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fused === unfused)
    // and on the nastiest real input: the full reference corpus
    val lines = WordCount.linesFromFiles(spark, corpusPaths)
    val a = WordCount.counts(WordCount.tokenize(lines, "value"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = WordCount.counts(WordCount.tokenizeUnfused(lines, "value"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("approx distinct is within its 2% standard error contract (<=5% observed)") {
    val r = WordCount.wcApproxDistinct(SparkTestSession.spark, "/root/testdata/sf0.001")
      .collect()(0)
    val exact = r.getLong(0).toDouble
    val approx = r.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact <= 0.05,
      s"approx=$approx exact=$exact")
  }

  test("count-min sketch: one-sided bound for EVERY token; sketch is mergeable") {
    import org.apache.spark.sql.functions._
    val spark = SparkTestSession.spark
    import spark.implicits._
    val sf = SparkTestSession.sf0001
    val words = graft.sources.Tables.documents(spark, sf)
      .select(explode(split($"text", "\\s+")).as("word"))
      .filter(length($"word") > 0)
    val cms = WordCount.cmsSketch(words)
    // one-sided bound: est(w) = min_i c(i, bucket_i(w)) >= true count
    // for ALL tokens, not just the emitted top-20 — the CMS guarantee
    val truth = words.groupBy($"word").agg(count(lit(1)).as("cnt"))
    val est = truth
      .select($"word", $"cnt",
        posexplode(array((0 until WordCount.CmsRows).map(i =>
          WordCount.cmsBucket(i, $"word")): _*)).as(Seq("r", "b")))
      .join(cms, Seq("r", "b"))
      .groupBy($"word", $"cnt").agg(min($"c").as("est"))
    val violations = est.filter($"est" < $"cnt").count()
    assert(violations === 0, "CMS estimate must never undercount")
    assert(est.count() === truth.count())
    // mergeability: cell-wise sum of the two halves' sketches ≡ the
    // full sketch — what makes the artifact buildable per-partition
    val h1 = WordCount.cmsSketch(words.filter(crc32($"word") % 2 === 0))
    val h2 = WordCount.cmsSketch(words.filter(crc32($"word") % 2 === 1))
    val merged = h1.unionByName(h2)
      .groupBy($"r", $"b").agg(sum($"c").as("c"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val full = cms.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(merged === full, "sketch must merge by cell-wise addition")
  }

  test("Text5: engine output byte-identical to reference (omp format)") {
    val got = WordCount.formattedBytes(SparkTestSession.spark,
      Seq(s"$corpusDir/Text5.txt"), "raw_text_input/Text5.txt",
      includeUnique = false)
    assert(got.toSeq === golden("golden_text5.txt").toSeq)
  }

  test("Text5+Text6: all-files aggregation, header names first path") {
    val got = WordCount.formattedBytes(SparkTestSession.spark,
      Seq(s"$corpusDir/Text5.txt", s"$corpusDir/Text6.txt"),
      "raw_text_input/Text5.txt", includeUnique = false)
    assert(got.toSeq === golden("golden_text56.txt").toSeq)
  }

  test("full 29-file corpus: byte-identical, 2658450 total / 56642 unique") {
    val paths = corpusPaths
    assert(paths.size === 29)
    val label = "raw_text_input/" + new java.io.File(paths.head).getName
    val got = WordCount.formattedBytes(SparkTestSession.spark, paths, label,
      includeUnique = false)
    val exp = golden("golden_corpus.txt")
    val gotHead = new String(got.take(80), "UTF-8")
    assert(gotHead.startsWith("Filename: raw_text_input/1399.txt.utf-8.txt, total words: 2658450"), gotHead)
    assert(got.length === exp.length, s"byte length ${got.length} vs ${exp.length}")
    assert(got.toSeq === exp.toSeq)
  }
}
