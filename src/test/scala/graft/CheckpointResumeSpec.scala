package graft

import java.io.File
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Restart-resume over a real checkpoint: the one production property
  * the memory-sink streaming harness can't show. A file-source →
  * parquet-file-sink stream is stopped and restarted twice; `_metadata`
  * provenance on every sink row proves the resumed query processed ONLY
  * the files that arrived after the checkpointed offsets — no
  * reprocessing, no loss. */
class CheckpointResumeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("file-sink stream resumes from checkpoint: new files only") {
    val base = Files.createTempDirectory("graft_resume_").toString
    val in = s"$base/in"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    new File(in).mkdirs()

    def runOnce(): Unit = {
      val toks = spark.readStream.text(in)
        .select(col("_metadata.file_name").as("src"),
          explode(split(col("value"), "\\s+")).as("word"))
        .filter(length(col("word")) > 0)
      val q = toks.writeStream.outputMode("append").format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    Files.writeString(Paths.get(s"$in/a.txt"), "hello world hello")
    runOnce()
    val after1 = spark.read.parquet(out)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(after1.length === 3)
    assert(after1.forall(_._1 == "a.txt"))

    Files.writeString(Paths.get(s"$in/b.txt"), "foo hello")
    runOnce() // restart: offsets for a.txt are committed; only b.txt runs
    val after2 = spark.read.parquet(out)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(after2.length === 5, "restart must not reprocess or drop files")
    assert(after2.count(_._1 == "a.txt") === 3)
    assert(after2.filter(_._1 == "b.txt").map(_._2).sorted.toSeq ===
      Seq("foo", "hello"))

    runOnce() // second restart with nothing new: committed no-op
    assert(spark.read.parquet(out).count() === 5)
  }

  test("TTL BPE encode: reassembly STATE survives a checkpointed restart") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{expr => fexpr}
    val base = Files.createTempDirectory("graft_bpe_resume_").toString
    val in = s"$base/in"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    new File(in).mkdirs()
    val t0 = 1700000000L
    // fit corpus shares no word with the feed, so every feed word takes
    // the OOV character path: n_sub = len(w) + 1, exactly predictable
    val corpus = Seq((1L, "zzz")).toDF("doc_id", "text")
    def writeBatch(name: String, rows: Seq[(Long, String, Long)]): Unit =
      rows.toDF("doc_id", "text", "sec")
        .select($"doc_id", $"text", fexpr("timestamp_seconds(sec)").as("ts"))
        .coalesce(1).write.mode("append").parquet(in)

    def runOnce(): Unit = {
      val schema = spark.read.parquet(in).schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(in)
      val q = graft.streaming.Streaming
        .bpeEncodeTTLStreamFrame(stream, corpus, "1 hour")
        .writeStream.outputMode("append").format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    writeBatch("b1", Seq((10L, "hello", t0)))
    runOnce()
    val r1 = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(r1.toSeq === Seq((10L, 6L, "h e l l o </w>")))

    // STOP, then a MULTI-WORD second piece of the SAME document arrives
    // after the restart (in-window, t0+5): the resumed query must
    // reassemble it WITH the pre-restart piece — possible only if the
    // state store's contents came back from the checkpoint, not just
    // the offsets — and in the twins' (pos, seq) order: the restart
    // piece restarts pos at 0, so its first word ties pos 0 with the
    // checkpointed "hello" and seq breaks the tie ("h…" < "o…"),
    // pinning the r20 ordering contract across a restart
    writeBatch("b2", Seq((10L, "out there", t0 + 5)))
    runOnce()
    val r2 = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(_._2)
    assert(r2.length === 2, s"append sink keeps both emissions: ${r2.toSeq}")
    assert(r2.last === (10L, 16L,
      "h e l l o </w> o u t </w> t h e r e </w>"),
      s"restart must resume the doc's piece state in (pos, seq) order, " +
        s"got ${r2.toSeq}")
  }
}
