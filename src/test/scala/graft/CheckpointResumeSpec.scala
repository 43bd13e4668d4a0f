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
}
