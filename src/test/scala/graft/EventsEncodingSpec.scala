package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Encoding-drift canary for the events loader.
  *
  * The driver's testdata generator has shipped `ts` under two different
  * physical parquet encodings across rounds — INT64 TIMESTAMP(NANOS)
  * (rounds ≤8) and INT64 TIMESTAMP(MICROS, isAdjustedToUTC=false) i.e.
  * TIMESTAMP_NTZ (round 9+) — and the round-9 loader, which hard-assumed
  * NANOS, lost 14 green queries to the switch. This spec pins
  * [[Tables.events]] against EVERY encoding it claims to handle:
  *
  *  - a genuine INT64-NANOS file written via parquet-mr (Spark cannot
  *    write this encoding itself, which is why it needs a direct writer),
  *  - an NTZ-MICROS file (what the driver generates today),
  *  - an LTZ file (plain Spark TimestampType write),
  *  - and whatever `/root/testdata/sf0.001` currently contains,
  *
  * asserting the three synthetic variants load to byte-identical rows
  * with `ts: TimestampType`, so the next silent regeneration cannot
  * break the loader without turning this spec red first.
  */
class EventsEncodingSpec extends AnyFunSuite {
  val spark = SparkTestSession.spark
  import spark.implicits._

  // (event_id, ts in µs since epoch, user_id, event_type, value, props)
  private val rowsMicros: Seq[(Long, Long, Long, String, Double, String)] = Seq(
    (1L, 1700000000000001L, 10L, "click", 1.5, """{"k":1}"""),
    (2L, 1700000000123456L, 11L, "view", 2.5, """{"k":2}"""),
    (3L, 1700003600999999L, 10L, "purchase", 9.0, """{"k":3}"""))

  private def tmpSfDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"events_enc_$tag").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  /** Write `$sfDir/events.parquet` with `ts` as INT64 TIMESTAMP(NANOS)
    * via parquet-mr's example writer. Sub-µs residues (+250 ns, +999 ns)
    * are added so the loader's `ts div 1000` truncation (not rounding)
    * is what the equality check exercises. */
  private def writeNanosEvents(sfDir: String): Unit = {
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.hadoop.fs.Path

    val schema = Types.buildMessage()
      .required(INT64).named("event_id")
      .required(INT64)
      .as(LogicalTypeAnnotation.timestampType(true, TimeUnit.NANOS))
      .named("ts")
      .required(INT64).named("user_id")
      .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("event_type")
      .required(DOUBLE).named("value")
      .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("props")
      .named("events")

    val tableDir = new java.io.File(sfDir, "events.parquet")
    assert(tableDir.mkdirs(), s"mkdir $tableDir")
    val writer = ExampleParquetWriter
      .builder(new Path(new java.io.File(tableDir, "part-00000.parquet").getAbsolutePath))
      .withType(schema)
      .build()
    val factory = new SimpleGroupFactory(schema)
    val subMicroResidues = Seq(250L, 999L, 0L)
    try rowsMicros.zip(subMicroResidues).foreach { case ((id, us, uid, et, v, p), res) =>
      val g = factory.newGroup()
      g.add("event_id", id)
      g.add("ts", us * 1000L + res)
      g.add("user_id", uid)
      g.add("event_type", et)
      g.add("value", v)
      g.add("props", p)
      writer.write(g)
    } finally writer.close()
  }

  /** Write `$sfDir/events.parquet` with `ts` cast to the given Spark SQL
    * timestamp type (TimestampType → TIMESTAMP(MICROS, UTC-adjusted);
    * TimestampNTZType → TIMESTAMP(MICROS, isAdjustedToUTC=false), the
    * driver's current footer). */
  private def writeSparkEvents(sfDir: String, tsType: DataType): Unit =
    rowsMicros.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros($"us").cast(tsType))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1)
      .write.parquet(s"$sfDir/events.parquet")

  private def loadNormalized(sfDir: String): Seq[(Long, Long, Long, String, Double, String)] = {
    val ev = Tables.events(spark, sfDir)
    assert(ev.schema("ts").dataType === TimestampType,
      s"loader must normalize ts to TimestampType, got ${ev.schema("ts").dataType}")
    ev.select($"event_id", unix_micros($"ts").as("us"), $"user_id",
        $"event_type", $"value", $"props")
      .as[(Long, Long, Long, String, Double, String)]
      .collect().sortBy(_._1).toSeq
  }

  test("Tables.events loads INT64-NANOS, NTZ-MICROS, and LTZ encodings identically") {
    val nanosDir = tmpSfDir("nanos")
    val ntzDir = tmpSfDir("ntz")
    val ltzDir = tmpSfDir("ltz")
    writeNanosEvents(nanosDir)
    writeSparkEvents(ntzDir, TimestampNTZType)
    writeSparkEvents(ltzDir, TimestampType)

    // footer sanity: the synthetic files really are distinct encodings
    // (NANOS surfaces as LongType only under the legacy flag; NTZ infers
    // as TimestampNTZType) — otherwise this spec would pin nothing.
    assert(spark.read.parquet(s"$ntzDir/events.parquet")
      .schema("ts").dataType === TimestampNTZType, "ntz fixture lost its encoding")

    val fromNanos = loadNormalized(nanosDir)
    val fromNtz = loadNormalized(ntzDir)
    val fromLtz = loadNormalized(ltzDir)
    assert(fromNanos === fromNtz,
      s"NANOS vs NTZ divergence:\n$fromNanos\n$fromNtz")
    assert(fromNtz === fromLtz,
      s"NTZ vs LTZ divergence:\n$fromNtz\n$fromLtz")
    assert(fromNtz.map(_._2) === rowsMicros.map(_._2),
      "normalized µs values drifted from the fixture (NANOS residues must truncate, not round)")
  }

  test("Tables.events handles whatever encoding the driver testdata currently uses") {
    val ev = Tables.events(spark, SparkTestSession.sf0001)
    assert(ev.schema("ts").dataType === TimestampType)
    val r = ev.agg(count(lit(1)), min($"ts"), max($"ts")).collect()(0)
    assert(r.getLong(0) > 0, "events table is empty")
    assert(r.getTimestamp(1).before(r.getTimestamp(2)))
  }
}
