package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}

/** Pins the Verify failure contract: a query that throws must leave an
  * explicit marker in `failed_queries.json`, never just a missing output
  * directory (round 9's loader break hid 14 regressions as absent keys). */
class VerifySpec extends AnyFunSuite {
  val spark = SparkTestSession.spark

  test("a throwing query lands in failed_queries.json; healthy ones still dump") {
    import spark.implicits._
    val outDir = Files.createTempDirectory("verify_spec").toFile.getAbsolutePath
    val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
      "ok_query" -> ((s, _) => { import s.implicits._; Seq((1L, "a")).toDF("id", "v") }),
      "boom_query" -> ((_, _) => throw new IllegalStateException("deliberate spec failure")))
    val failed = Verify.run(spark, SparkTestSession.sf0001, outDir, queries,
      Map("ok_query" -> "SELECT 1 AS id, 'a' AS v"))

    assert(failed.keySet === Set("boom_query"))
    assert(failed("boom_query").contains("deliberate spec failure"))

    val marker = Files.readString(Paths.get(s"$outDir/failed_queries.json"))
    assert(marker.contains("\"boom_query\""), s"marker file missing the key: $marker")
    assert(marker.contains("deliberate spec failure"), marker)
    assert(new java.io.File(s"$outDir/ok_query").exists(),
      "healthy query output must still be written")
    assert(spark.read.parquet(s"$outDir/ok_query").count() === 1L)
    val oracle = Files.readString(Paths.get(s"$outDir/oracle_sql.json"))
    assert(oracle.contains("\"ok_query\""), oracle)
  }

  test("with no failures the marker file is an empty JSON object") {
    import spark.implicits._
    val outDir = Files.createTempDirectory("verify_spec_ok").toFile.getAbsolutePath
    val failed = Verify.run(spark, SparkTestSession.sf0001, outDir,
      Map("only" -> ((s, _) => { import s.implicits._; Seq(1).toDF("x") })),
      Map.empty)
    assert(failed.isEmpty)
    assert(Files.readString(Paths.get(s"$outDir/failed_queries.json")) === "{}")
  }
}
