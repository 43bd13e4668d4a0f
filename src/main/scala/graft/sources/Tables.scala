package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TESTDATA star schema
  * (`/root/testdata/sf*`, see TESTDATA.md). Schemas come from the parquet
  * footers — never hand-maintained (FIXTURES.md §4).
  *
  * Scale stance: a plain `spark.read.parquet(dir)` keeps partition planning
  * with `FileSourceScanExec` (`maxPartitionBytes`/`openCostInBytes` pack
  * splits), so the same call works on one file locally or 100 TB of files on
  * a cluster. Filters/projections applied by callers are pushed into the
  * scan by Catalyst — loaders must NOT cache or materialize.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** Rebuild a (µs) timestamp from an INT64 nanosecond column. MUST be
    * integer division: `/` on longs is double division in Spark, and a
    * ns epoch (~1.7e18) exceeds 2^53 — the rounded quotient comes out
    * 1 µs low for ~13% of rows, silently shifting ms-boundary
    * comparisons vs the oracle. `div` truncates toward zero, which
    * matches floor for these post-1970 values. */
  private[graft] def nanosToTimestamp(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** events.parquet stores `ts` as INT64 TIMESTAMP(NANOS), which Spark's
    * parquet reader rejects. `nanosAsLong` is a session-global legacy
    * flag (no per-read option exists); setting it here is a deliberate
    * one-way switch — any other NANOS column read on this session will
    * also surface as LongType. The testdata has exactly one such column. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    nanosToTimestamp(load(s, d, "events"))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
