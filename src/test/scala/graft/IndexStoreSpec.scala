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
    // a READER does not repair writer state (r18 ADVICE — reader-side
    // recovery could race the live writer): the committed delta stays
    // staged and invisible, the pre-append artifact is served whole …
    val got = IndexStore.readOrBuild(spark, path,
      sys.error("must not rebuild"): org.apache.spark.sql.DataFrame)
    assert(got.collect().map(_.getLong(0)).toSeq === Seq(1L))
    assert(new File(path, "_staging/_COMMIT").exists())
    // … and the WRITER's next call rolls it forward — no row lost …
    IndexStore.append(spark, path, Seq((3L, "c")).toDF("id", "band"))
    assert(spark.read.parquet(path).collect().map(_.getLong(0)).sorted
      === Seq(1L, 2L, 3L))
    assert(!new File(path, "_staging").exists())
    // … and no row doubled (file-level moves are idempotent)
    assert(spark.read.parquet(path).count() === 3)
  }

  test("compact crash between the swap moves: writer recovers, reader redirects") {
    import org.apache.spark.sql.functions.col
    val path = s"${tmp()}/idx"
    IndexStore.readOrBuild(spark, path,
      Seq((1L, "a"), (2L, "b")).toDF("id", "band"), Seq("band"))
    IndexStore.append(spark, path, Seq((3L, "a")).toDF("id", "band"), Seq("band"))
    // simulate the worst crash window (r18 ADVICE): compact completed
    // its packed copy AND moved the live tree aside, then died before
    // installing the copy — the live path is GONE, all data lives only
    // in the two siblings
    spark.read.parquet(path).repartition(1).write.partitionBy("band")
      .parquet(s"${path}_compact")
    Files.move(Paths.get(path), Paths.get(s"${path}_old"))
    assert(!new File(path).exists())
    // a reader neither rebuilds (dropping the appended delta) nor
    // repairs: it redirect-reads the completed compacted copy …
    val seen = IndexStore.readOrBuild(spark, path,
      sys.error("must not rebuild"): org.apache.spark.sql.DataFrame)
    assert(seen.collect().map(_.getLong(0)).sorted === Seq(1L, 2L, 3L))
    assert(!new File(path).exists()) // reader moved nothing
    // … and the writer's next compact call recovers THEN packs — the
    // old code deleted both siblings first and lost the artifact
    IndexStore.compact(spark, path, Seq("band"))
    assert(spark.read.parquet(path).collect().map(_.getLong(0)).sorted
      === Seq(1L, 2L, 3L))
    assert(!new File(s"${path}_compact").exists())
    assert(!new File(s"${path}_old").exists())
  }

  test("compact crash BEFORE the packed copy completed: writer rolls back") {
    val path = s"${tmp()}/idx"
    IndexStore.readOrBuild(spark, path,
      Seq((1L, "a"), (2L, "b")).toDF("id", "band"), Seq("band"))
    // crash after moving the live tree aside with the packed copy only
    // partially written (no _SUCCESS in _compact)
    new File(s"${path}_compact").mkdirs()
    Files.createFile(Paths.get(s"${path}_compact", "part-junk.parquet"))
    Files.move(Paths.get(path), Paths.get(s"${path}_old"))
    IndexStore.append(spark, path, Seq((3L, "c")).toDF("id", "band"), Seq("band"))
    // the append recovered the original tree first — the delta landed
    // on prior ∪ today, not on an empty path
    assert(spark.read.parquet(path).collect().map(_.getLong(0)).sorted
      === Seq(1L, 2L, 3L))
    assert(!new File(s"${path}_compact").exists())
    assert(!new File(s"${path}_old").exists())
  }

  test("params fingerprint is injective across the separator") {
    // a bare ';'-join would alias these two param vectors (r18 ADVICE)
    assert(IndexStore.paramsFingerprint(Seq("a;b"))
      !== IndexStore.paramsFingerprint(Seq("a", "b")))
    assert(IndexStore.paramsFingerprint(Seq(12, 3))
      !== IndexStore.paramsFingerprint(Seq(1, 23)))
  }

  test("auto-compaction soak: file count stays bounded with no manual compact") {
    val path = s"${tmp()}/idx"
    val prev = spark.conf.getOption(IndexStore.CompactFilesKey)
    spark.conf.set(IndexStore.CompactFilesKey, "12")
    try {
      IndexStore.readOrBuild(spark, path,
        Seq((1L, "a"), (2L, "b")).toDF("id", "band"), Seq("band"))
      def partFiles = {
        def walk(d: File): Seq[File] = Option(d.listFiles()).toSeq.flatten
          .flatMap(f => if (f.isDirectory) walk(f) else Seq(f))
        walk(new File(path)).count(_.getName.endsWith(".parquet"))
      }
      // a month of daily appends across three partitions; every append
      // checks the threshold, so the count can never run away
      var maxFiles = 0
      (3L to 32L).foreach { d =>
        IndexStore.append(spark, path,
          Seq((d, if (d % 3 == 0) "a" else if (d % 3 == 1) "b" else "c"))
            .toDF("id", "band"), Seq("band"))
        maxFiles = math.max(maxFiles, partFiles)
      }
      // bounded by threshold + files-per-append, NOT by append count
      assert(maxFiles <= 12 + 3,
        s"soak max $maxFiles files — auto-compaction did not bound growth")
      // and no row was lost or doubled across the automatic rewrites
      assert(spark.read.parquet(path).select("id").as[Long].collect().sorted
        === (1L to 32L).toArray)
    } finally prev match {
      case Some(v) => spark.conf.set(IndexStore.CompactFilesKey, v)
      case None => spark.conf.unset(IndexStore.CompactFilesKey)
    }
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
