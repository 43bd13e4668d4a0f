package graft.sources

import java.io.File
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
  * Layout: `<root>/<name>/<corpus-fingerprint>/` — the fingerprint is a
  * digest of the source table's parquet file names/lengths/mtimes
  * (filesystem metadata only, no Spark job), so a regenerated corpus
  * can NEVER be served a stale index: new bytes → new path → rebuild.
  * Root defaults to a tmpdir and is overridable via
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
  */
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

  /** The artifact directory for (index name, source corpus). */
  def artifactPath(spark: SparkSession, sfDir: String, name: String,
      table: String): String =
    s"${root(spark)}/$name/${corpusFingerprint(sfDir, table)}"

  /** Read the artifact at `path`, building and writing it first if no
    * completed write (`_SUCCESS`) is present. `build` runs AT MOST on
    * the first call per corpus; every later call is a plain parquet
    * scan — the steady-state read path. */
  def readOrBuild(spark: SparkSession, path: String, build: => DataFrame,
      partitionCols: Seq[String] = Nil): DataFrame = {
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
    * over the grown prior. */
  def append(spark: SparkSession, path: String, delta: DataFrame,
      partitionCols: Seq[String] = Nil): Unit = {
    val w = delta.write.mode("append")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path)
  }
}
