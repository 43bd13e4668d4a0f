package graft

import java.io.File
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.IndexStore

/** The artifact store's cache-key and crash-safety contracts (r17
  * ADVICE): a constant change must force a rebuild, and a crashed or
  * retried append must never leave partial/duplicate rows served under
  * the original `_SUCCESS`. */
class IndexStoreSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_idxstore_").toString

  test("params fingerprint: changing a build constant changes the path") {
    val sf = SparkTestSession.sf0001
    val p1 = IndexStore.artifactPath(spark, sf, "x", "documents", Seq(25, 10, 8))
    val p2 = IndexStore.artifactPath(spark, sf, "x", "documents", Seq(26, 10, 8))
    val p1again = IndexStore.artifactPath(spark, sf, "x", "documents", Seq(25, 10, 8))
    assert(p1 !== p2) // a changed constant can never serve the old artifact
    assert(p1 === p1again) // …while an unchanged build stays cached
    // no-params form stays the bare corpus fingerprint (layout stability)
    assert(!IndexStore.artifactPath(spark, sf, "x", "documents")
      .split('/').last.contains("-"))
  }

  test("stale-constant rebuild: new params → build runs again") {
    val sf = SparkTestSession.sf0001
    val prev = spark.conf.getOption(IndexStore.DirKey)
    spark.conf.set(IndexStore.DirKey, tmp())
    try {
      var builds = 0
      def build(v: Int) = { builds += 1; Seq((1L, v)).toDF("id", "v") }
      def path(c: Int) =
        IndexStore.artifactPath(spark, sf, "probe", "documents", Seq(c))
      IndexStore.readOrBuild(spark, path(7), build(7)).collect()
      IndexStore.readOrBuild(spark, path(7), build(7)).collect()
      assert(builds === 1) // second call with the same constant: pure read
      val got = IndexStore.readOrBuild(spark, path(8), build(8)).collect()
      assert(builds === 2) // changed constant: rebuild, not a stale serve
      assert(got.map(_.getInt(1)).toSeq === Seq(8))
    } finally prev match {
      case Some(v) => spark.conf.set(IndexStore.DirKey, v)
      case None => spark.conf.unset(IndexStore.DirKey)
    }
  }

  test("append is staged: a crash BEFORE commit leaves the artifact clean") {
    val path = s"${tmp()}/idx"
    IndexStore.readOrBuild(spark, path, Seq((1L, "a")).toDF("id", "band"))
    // simulate a mid-write crash: staged files present, no _COMMIT marker
    val stage = new File(path, "_staging")
    stage.mkdirs()
    Seq((99L, "z")).toDF("id", "band").write.mode("overwrite")
      .parquet(s"$path/_staging/dead")
    // the staging dir is invisible to readers (underscore prefix) …
    assert(spark.read.parquet(path).collect().map(_.getLong(0)).toSeq === Seq(1L))
    // … and the next append discards it instead of promoting partial rows
    IndexStore.append(spark, path, Seq((2L, "b")).toDF("id", "band"))
    assert(!stage.exists())
    assert(spark.read.parquet(path).collect().map(_.getLong(0)).sorted
      === Seq(1L, 2L))
  }

  test("append is staged: a crash AFTER commit rolls forward exactly once") {
    val path = s"${tmp()}/idx"
    IndexStore.readOrBuild(spark, path, Seq((1L, "a")).toDF("id", "band"))
    // simulate a crash between commit and promote: write the delta to
    // staging BY HAND and drop the commit marker, but never move it
    Seq((2L, "b")).toDF("id", "band").write.mode("overwrite")
      .parquet(s"$path/_staging")
    Files.createFile(Paths.get(path, "_staging", "_COMMIT"))
    // next read rolls the committed delta forward — no row lost …
    val got = IndexStore.readOrBuild(spark, path,
      sys.error("must not rebuild"): org.apache.spark.sql.DataFrame)
    assert(got.collect().map(_.getLong(0)).sorted === Seq(1L, 2L))
    assert(!new File(path, "_staging").exists())
    // … and no row doubled (file-level moves are idempotent)
    assert(spark.read.parquet(path).count() === 2)
  }

  test("compact collapses append-accumulated files, content identical") {
    val path = s"${tmp()}/idx"
    IndexStore.readOrBuild(spark, path,
      Seq((1L, "a"), (2L, "b")).toDF("id", "band"), Seq("band"))
    // a week of daily appends: each adds one file per touched partition
    (3L to 9L).foreach { d =>
      IndexStore.append(spark, path, Seq((d, "a")).toDF("id", "band"), Seq("band"))
    }
    def partFiles = {
      def walk(d: File): Seq[File] = d.listFiles().toSeq
        .flatMap(f => if (f.isDirectory) walk(f) else Seq(f))
      walk(new File(path)).count(_.getName.endsWith(".parquet"))
    }
    val before = spark.read.parquet(path).as[(Long, String)].collect().sorted.toSeq
    val filesBefore = partFiles
    assert(filesBefore >= 9) // 2 initial + 7 appended
    IndexStore.compact(spark, path, Seq("band"))
    assert(spark.read.parquet(path).as[(Long, String)].collect().sorted.toSeq
      === before)
    assert(partFiles < filesBefore)
    assert(!new File(s"${path}_compact").exists())
    assert(!new File(s"${path}_old").exists())
  }

  test("partitioned append promotes into live partition dirs") {
    val path = s"${tmp()}/idx"
    IndexStore.readOrBuild(spark, path,
      Seq((1L, "a"), (2L, "b")).toDF("id", "band"), Seq("band"))
    IndexStore.append(spark, path,
      Seq((3L, "a"), (4L, "c")).toDF("id", "band"), Seq("band"))
    val got = spark.read.parquet(path).as[(Long, String)].collect().sorted
    assert(got.toSeq === Seq((1L, "a"), (2L, "b"), (3L, "a"), (4L, "c")))
    // untouched partition b kept its single file; touched a gained one
    def parts(b: String) = new File(path, s"band=$b").listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(parts("a") === 2 && parts("b") === 1 && parts("c") === 1)
    assert(!new File(path, "_staging").exists())
  }
}
