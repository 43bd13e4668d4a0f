package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.WordNorm

/** Probe table from FIXTURES.md §2 — every expectation verified against a
  * recompiled committed-source reference binary (`sequential.cpp:12-37`). */
class NormalizeWordSpec extends AnyFunSuite {

  private def norm(bytes: Array[Byte]): Array[Byte] =
    WordNorm.normalize(UTF8String.fromBytes(bytes)).getBytes

  private def normS(s: String): String =
    new String(norm(s.getBytes("UTF-8")), "UTF-8")

  val probes: Seq[(String, String)] = Seq(
    "Hello," -> "hello",
    "WORLD!!" -> "world",
    "don't" -> "don't",
    "re-use" -> "re-use",
    "1.e.1" -> "1.e.1",
    "--dash--" -> "dash",
    "..." -> "",
    "ça" -> "a",
    "café" -> "caf",
    "﻿the" -> "the", // UTF-8 BOM bytes EF BB BF stripped as negative
    "karamazov</title>" -> "karamazov</title",
    "É" -> "",
  )

  probes.foreach { case (in, expected) =>
    test(s"normalize '${in.take(30)}' -> '$expected'") {
      assert(normS(in) === expected)
    }
  }

  test("mid-sequence UTF-8 truncation is byte-wise, not codepoint-wise") {
    // "café" = 63 61 66 C3 A9; strip trailing C3/A9 -> "caf"
    assert(norm("café".getBytes("UTF-8")).toSeq === "caf".getBytes("UTF-8").toSeq)
  }

  test("control characters are kept (not punct, not negative)") {
    assert(normS("ab") === "ab")
  }

  test("normalize is idempotent and output has clean edges (property)") {
    val token = Gen.listOf(Gen.choose(0, 255)).map(_.map(_.toByte).toArray)
    val prop = Prop.forAll(token) { bytes: Array[Byte] =>
      val once = norm(bytes)
      val twice = norm(once)
      val idempotent = once.toSeq == twice.toSeq
      val cleanEdges = once.isEmpty ||
        (!WordNorm.isStrip(once.head) && !WordNorm.isStrip(once.last))
      val noUpper = once.forall(b => !(b >= 'A' && b <= 'Z'))
      idempotent && cleanEdges && noUpper
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("Scala UDF fallback agrees with the catalyst expression") {
    val spark = SparkTestSession.spark
    import org.apache.spark.sql.functions.col
    // the §7.4 "Scala UDF first" fallback: same byte semantics via the
    // String surface (valid-UTF-8 inputs only — the expression is the
    // byte-exact path; this pins the two in agreement where both apply)
    val normUdf = org.apache.spark.sql.functions.udf { (s: String) =>
      new String(WordNorm.normalize(
        UTF8String.fromString(s)).getBytes, "UTF-8")
    }
    import spark.implicits._
    val in = probes.map(_._1).toDF("raw")
    val viaUdf = in.select(normUdf(col("raw"))).collect().map(_.getString(0))
    val viaExpr = in.select(graft.functions.NormalizeWord(col("raw")))
      .collect().map(_.getString(0))
    assert(viaUdf.toSeq === viaExpr.toSeq)
  }

  test("codegen path (DataFrame select) agrees with direct eval") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val in = probes.map(_._1).toDF("raw")
    val got = in.select(graft.functions.NormalizeWord(col("raw")).as("w"))
      .collect().map(_.getString(0)).toSeq
    assert(got === probes.map(_._2))
  }
}
