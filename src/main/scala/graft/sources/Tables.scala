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
    * flag (no per-read option exists), so it is set ONLY for the scope of
    * the schema-inference call and restored after: the flag is consulted
    * exactly when `DataFrameReader.parquet` converts the footer schema
    * (measured — actions on the returned frame, including materializing
    * the ts column, run fine after restore), so the scoped form keeps the
    * frame valid without leaking a session-global behavior change to
    * every later NANOS read on the session (TablesSpec pins both). */
  def events(s: SparkSession, d: String): DataFrame = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = s.conf.getOption(key)
    s.conf.set(key, "true")
    try nanosToTimestamp(load(s, d, "events"))
    finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
