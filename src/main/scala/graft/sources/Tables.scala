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
  /** events.parquet stores `ts` as INT64 TIMESTAMP(NANOS) which Spark's
    * parquet reader rejects; read nanos as long and rebuild a (µs) timestamp
    * column. Truncation ns→µs is exact for this data (driver generates
    * ms-resolution values) and harmless for bucketed aggs either way. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    load(s, d, "events")
      .withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
