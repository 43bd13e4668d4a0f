package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Source/sink surface (SURVEY §2.2): csv and json readers/writers and
  * partitioned parquet writes round-trip data losslessly — proven by
  * aggregate equality against the direct parquet read. */
class SourcesSinksSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf0001

  private def tmpDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_$tag").toFile
    d.deleteOnExit()
    d.getPath
  }

  private def nationAgg(df: org.apache.spark.sql.DataFrame): Map[Int, Long] =
    df.groupBy("n_regionkey").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap

  test("csv writer/reader round-trip preserves the table") {
    val n = Tables.nation(spark, sf)
    val out = tmpDir("csv")
    n.write.mode("overwrite").option("header", "true").csv(out)
    val back = spark.read.option("header", "true").schema(n.schema).csv(out)
    assert(nationAgg(back) === nationAgg(n))
    assert(back.count() === n.count())
  }

  test("json writer/reader round-trip preserves the table") {
    val n = Tables.nation(spark, sf)
    val out = tmpDir("json")
    n.write.mode("overwrite").json(out)
    val back = spark.read.schema(n.schema).json(out)
    assert(nationAgg(back) === nationAgg(n))
  }

  test("orc writer/reader round-trip preserves the table") {
    val n = Tables.nation(spark, sf)
    val out = tmpDir("orc")
    n.write.mode("overwrite").orc(out)
    val back = spark.read.orc(out)
    assert(nationAgg(back) === nationAgg(n))
  }

  test("partitioned parquet write prunes partitions on read") {
    val c = Tables.customer(spark, sf)
    val out = tmpDir("part")
    c.write.mode("overwrite").partitionBy("c_mktsegment").parquet(out)
    val one = spark.read.parquet(out).filter(col("c_mktsegment") === "BUILDING")
    val expected = c.filter(col("c_mktsegment") === "BUILDING").count()
    assert(one.count() === expected)
    // partition pruning visible in the plan: only the BUILDING directory scans
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(500))
  }

  test("Tables.events scopes the nanosAsLong flag: restored after, frame stays live") {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    assert(spark.conf.getOption(key).forall(_ == "false"),
      "precondition: flag not set by anything else in the suite")
    val ev = Tables.events(spark, sf)
    // the session-global legacy flag must NOT leak past the loader call
    assert(spark.conf.getOption(key).forall(_ == "false"),
      s"nanosAsLong leaked: ${spark.conf.getOption(key)}")
    // ...and the returned frame must still materialize the rebuilt
    // timestamp column (the flag is consulted only at schema inference,
    // so restoring it cannot invalidate the frame — this pins that)
    val r = ev.agg(min(col("ts")), max(col("ts")), count(lit(1))).collect()(0)
    assert(r.getLong(2) > 0)
    assert(r.getTimestamp(0).before(r.getTimestamp(1)))
    // a nanos-free parquet read right after sees ordinary types
    assert(Tables.nation(spark, sf).schema("n_nationkey").dataType ===
      org.apache.spark.sql.types.IntegerType)
  }

  test("corrupt json records quarantine in PERMISSIVE mode, abort in FAILFAST") {
    import org.apache.spark.sql.types._
    // a real ingestion feed always contains some malformed rows; the
    // engine's contract is quarantine-don't-die (PERMISSIVE + corrupt
    // column), with FAILFAST as the strict-validation mode
    val dir = tmpDir("corrupt_json")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/feed.json"),
      ("""{"doc_id": 1, "text": "good row"}""" + "\n" +
        """{"doc_id": 2, "text": "also good"}""" + "\n" +
        """{"doc_id": 3, "text": "truncated""" + "\n" +
        """not json at all""" + "\n").getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("_corrupt_record", StringType)))
    val parsed = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir)
      .cache() // corrupt-column queries need the full row materialized
    try {
      val good = parsed.filter(col("_corrupt_record").isNull)
      val bad = parsed.filter(col("_corrupt_record").isNotNull)
      assert(good.count() === 2)
      assert(good.select("doc_id").collect().map(_.getLong(0)).toSet === Set(1L, 2L))
      // the quarantine keeps the raw line for later repair/audit
      assert(bad.count() === 2)
      assert(bad.select("_corrupt_record").collect().map(_.getString(0))
        .exists(_.contains("not json at all")))
    } finally parsed.unpersist()
    val strict = spark.read
      .schema(StructType(schema.fields.take(2)))
      .option("mode", "FAILFAST").json(dir)
    intercept[org.apache.spark.SparkException] { strict.collect() }
  }

  test("text sink writes the formatted word-count lines distributedly") {
    import spark.implicits._
    val out = tmpDir("text")
    val counts = graft.operators.WordCount.counts(
      graft.operators.WordCount.tokenize(Tables.documents(spark, sf), "text"))
    counts.select(concat($"word", lit(": "), $"cnt").as("value"))
      .write.mode("overwrite").text(out)
    val back = spark.read.text(out)
    assert(back.count() === counts.count())
  }
}
