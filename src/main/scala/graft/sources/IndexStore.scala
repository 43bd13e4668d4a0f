package graft.sources

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Build-once / read-many storage for index ARTIFACTS — the steady-state
  * half of every incremental operator. The inline incremental queries
  * (`dedup_minhash_incremental`, `sim_ann_ivfpq_incremental`, …)
  * recompute their "prior snapshot index" from the corpus on every run
  * so the oracle can mirror them end to end; a production daily-crawl
  * never refits — it reads the bucketed parquet artifact the previous
  * run wrote (the reference persists its results for exactly this
  * reason: recomputation was the failure mode, hybrid.cpp:444-453).
  * The `*_stored` query twins route through here: first run writes the
  * artifact, every later run is pure read + probe, which is the wall a
  * steady-state ingest actually pays.
  *
  * Layout: `<root>/<name>/<corpus-fingerprint>[-<params-fingerprint>]/`
  * — the corpus fingerprint is a digest of the source table's parquet
  * file names/lengths/mtimes (filesystem metadata only, no Spark job),
  * so a regenerated corpus can NEVER be served a stale index: new bytes
  * → new path → rebuild. The params fingerprint (r17 ADVICE) digests
  * the ALGORITHM CONSTANTS the artifact was built under — shingle
  * width, band geometry, token counts, DF caps — so changing a constant
  * also forces a rebuild instead of silently serving an index computed
  * under the old value; every `*_stored` call site passes the constants
  * its build reads. Root defaults to a tmpdir and is overridable via
  * `spark.graft.index.dir`; at cluster scale it is the object-store
  * prefix the ingest pipeline owns.
  *
  * Scale notes: artifacts are written `partitionBy` their probe key's
  * coarse component (band / cell) so an append is partition-local and a
  * cell-pruned probe reads only probed partitions; the fully
  * shuffle-free probe layout is the `bucketBy(band, bh)` /
  * `bucketBy(c, v)` TABLE form whose plan shape BucketingSpec pins —
  * kept out of this path only because bucketed tables need a metastore
  * entry, and a plain directory is what survives across driver runs
  * everywhere.
  *
  * Concurrency contract: ONE writer per artifact path (the daily-ingest
  * owner); readers are unrestricted. [[append]] is crash-safe under
  * that contract — see its staged-commit protocol — but two concurrent
  * appenders can still interleave their staging, exactly like two
  * concurrent jobs appending to the same parquet directory. */
object IndexStore {
  /** Artifact root override (default: `<java.io.tmpdir>/graft-index`). */
  final val DirKey = "spark.graft.index.dir"

  def root(spark: SparkSession): String = spark.conf.get(
    DirKey, s"${System.getProperty("java.io.tmpdir")}/graft-index")

  /** Digest of a source table's on-disk identity (file name, length,
    * mtime for every part file) — staleness guard, no data read. */
  private[graft] def corpusFingerprint(sfDir: String, table: String): String = {
    val target = new File(s"$sfDir/$table.parquet")
    val files: Seq[File] =
      if (target.isDirectory) target.listFiles().toSeq.sortBy(_.getName)
      else Seq(target)
    val md = MessageDigest.getInstance("MD5")
    files.foreach { f =>
      md.update(s"${f.getName}:${f.length}:${f.lastModified};".getBytes("UTF-8"))
    }
    md.digest().map("%02x".format(_)).mkString.take(16)
  }

  /** Digest of the algorithm constants an artifact is built under —
    * the cache key's second half (see the layout scaladoc). Values
    * render via toString; order matters (callers pass a fixed
    * sequence). */
  private[graft] def paramsFingerprint(params: Seq[Any]): String = {
    val md = MessageDigest.getInstance("MD5")
    params.foreach(p => md.update(s"$p;".getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString.take(8)
  }

  /** The artifact directory for (index name, source corpus, build
    * constants). `params` carries every constant the build reads —
    * omitted only for artifacts whose derivation has no tunable (a
    * plain column projection). */
  def artifactPath(spark: SparkSession, sfDir: String, name: String,
      table: String, params: Seq[Any] = Nil): String = {
    val suffix = if (params.isEmpty) "" else s"-${paramsFingerprint(params)}"
    s"${root(spark)}/$name/${corpusFingerprint(sfDir, table)}$suffix"
  }

  /** Read the artifact at `path`, building and writing it first if no
    * completed write (`_SUCCESS`) is present. `build` runs AT MOST on
    * the first call per corpus; every later call is a plain parquet
    * scan — the steady-state read path. A pending crashed append is
    * rolled forward first (see [[append]]) so a reader never sees a
    * half-committed delta alongside `_SUCCESS`. */
  def readOrBuild(spark: SparkSession, path: String, build: => DataFrame,
      partitionCols: Seq[String] = Nil): DataFrame = {
    recoverPendingAppend(path)
    if (!new File(s"$path/_SUCCESS").exists()) {
      val w = build.write.mode("overwrite")
      (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
        .parquet(path)
    }
    spark.read.parquet(path)
  }

  /** Append a delta's index rows to an EXISTING artifact — the day-2
    * maintenance write of the daily loop the `*_stored` twins read
    * from: probe the delta against the current artifact FIRST, then
    * append its rows, so tomorrow's delta sees prior ∪ today and a
    * delta never pairs against itself through the index (the
    * incremental contract). `partitionBy` the same coarse probe-key
    * component as the original write keeps the append partition-local:
    * only the touched band/cell partitions gain files, untouched ones
    * are not rewritten. DedupSpec's day-2 spec pins the loop:
    * build → probe → append → next-day probe ≡ the inline incremental
    * over the grown prior.
    *
    * Staged commit (r17 ADVICE — a bare `mode("append")` that died
    * mid-write left partial rows served under the original `_SUCCESS`,
    * and a retry then duplicated them): the delta is written whole to
    * `<path>/_staging` (underscore-prefixed — invisible to every
    * parquet reader), a `_COMMIT` marker is dropped once the write
    * completed, and only then are the part files moved into the live
    * partition directories (per-file atomic rename on a real
    * filesystem). Crash windows: before `_COMMIT` → the staging dir is
    * discarded on the next call and the caller's retry rewrites the
    * delta (no partial rows ever served); after `_COMMIT` → the next
    * [[append]]/[[readOrBuild]] on this path rolls the move FORWARD
    * (file-level moves are idempotent — each file is either still
    * staged or already live), so the retrying writer must NOT re-append
    * the same delta. Exactly-once under the single-writer contract
    * above. */
  def append(spark: SparkSession, path: String, delta: DataFrame,
      partitionCols: Seq[String] = Nil): Unit = {
    recoverPendingAppend(path)
    val stage = stagingDir(path)
    // One file per TOUCHED PARTITION per append, not one per shuffle
    // task per partition: unclustered, a 32-task delta adds 32 files to
    // every touched band dir per day (soak-measured: 512 files/day on
    // the 16-band index, probe wall ×1.9 by day 8). Clustering the
    // delta on the partition key bounds file growth to
    // appends × touched-partitions at the cost of append parallelism =
    // partition-value count — the right side of the trade for a daily
    // maintenance write (compaction cadence drops ~30×); a delta too
    // big for that width should compact right after instead.
    val clustered =
      if (partitionCols.isEmpty) delta
      else delta.repartition(spark.sparkContext.defaultParallelism,
        partitionCols.map(org.apache.spark.sql.functions.col): _*)
    val w = clustered.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(stage)
    Files.createFile(Paths.get(stage, CommitMarker))
    promoteStaging(path)
  }

  /** Rewrite an artifact into freshly-packed part files — the
    * maintenance move for an append-heavy index whose partitions have
    * accumulated one small file per appended day (K appends → K + 1
    * files per touched partition; probe wall creeps with per-file scan
    * overhead — IndexSoakProbe measures the curve). Rewrites through a
    * sibling temp dir, then swaps directories: the artifact is either
    * the old tree or the new one, never a mix. The swap window (old
    * moved aside, new not yet in place) is NOT reader-transparent —
    * run compaction from the single writer in its maintenance slot,
    * same ownership contract as [[append]]; a reader racing the swap
    * sees a missing dir and rebuilds, which is wasteful but never
    * wrong. A crash mid-compact leaves `<path>_compact`/`<path>_old`
    * siblings that the next compact call clears. */
  def compact(spark: SparkSession, path: String,
      partitionCols: Seq[String] = Nil): Unit = {
    recoverPendingAppend(path)
    val tmp = new File(s"${path}_compact")
    val old = new File(s"${path}_old")
    deleteRecursively(tmp)
    deleteRecursively(old)
    val w = spark.read.parquet(path)
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(tmp.getPath)
    Files.move(Paths.get(path), old.toPath, StandardCopyOption.ATOMIC_MOVE)
    Files.move(tmp.toPath, Paths.get(path), StandardCopyOption.ATOMIC_MOVE)
    deleteRecursively(old)
  }

  private final val CommitMarker = "_COMMIT"
  private def stagingDir(path: String): String = s"$path/_staging"

  /** Roll a committed-but-unmoved staging dir forward, or discard an
    * uncommitted one (crashed mid-write — its delta was never fully
    * staged and will be rewritten by the caller's retry). */
  private def recoverPendingAppend(path: String): Unit = {
    val stage = new File(stagingDir(path))
    if (stage.isDirectory) {
      if (new File(stage, CommitMarker).exists()) promoteStaging(path)
      else deleteRecursively(stage)
    }
  }

  /** Move every staged part file into its live partition directory
    * (creating partition dirs a delta touches first), then drop the
    * staging dir. Only data files move; `_SUCCESS`/`_COMMIT` markers
    * are staging-local. Idempotent: interrupted and re-run, it moves
    * whatever is still staged. */
  private def promoteStaging(path: String): Unit = {
    val stageRoot = new File(stagingDir(path))
    def walk(dir: File, rel: String): Unit =
      dir.listFiles().toSeq.sortBy(_.getName).foreach { f =>
        if (f.isDirectory) walk(f, s"$rel${f.getName}/")
        else if (!f.getName.startsWith("_") && !f.getName.startsWith(".")) {
          val targetDir = new File(path, rel)
          targetDir.mkdirs()
          Files.move(f.toPath, Paths.get(targetDir.getPath, f.getName),
            StandardCopyOption.ATOMIC_MOVE)
        }
      }
    walk(stageRoot, "")
    deleteRecursively(stageRoot)
  }

  private def deleteRecursively(f: File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    f.delete()
  }
}
