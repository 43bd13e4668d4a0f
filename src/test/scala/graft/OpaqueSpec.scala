package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{CodebookRef, Opaque, PqEncode}

/** The r21 optimizer-barrier expression and the O(1)-equality codebook
  * payload — the two expression-level internals this optimization
  * round changed. */
class OpaqueSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("Opaque is a value-identity wrapper (codegen and interpreted)") {
    val df = Seq(("a b c", 1L), (null.asInstanceOf[String], 2L), ("", 3L))
      .toDF("t", "id")
    val plain = df.select($"id", upper($"t").as("u")).orderBy($"id").collect()
    val opaque = df.select($"id", Opaque(upper($"t")).as("u")).orderBy($"id").collect()
    assert(plain.toSeq == opaque.toSeq)
  }

  test("Opaque blocks filter pushdown into the defining projection") {
    val docs = spark.read.parquet(s"${SparkTestSession.sf0001}/documents.parquet")
    val heavy = regexp_replace($"text", "[0-9]+", "<N>")
    def scanFilterMentionsRegex(plan: String): Boolean =
      plan.linesIterator.exists(l => l.contains("FileScan") && l.contains("regexp_replace"))
    // plain: the filter on the derived column is substituted + pushed
    // into the scan node's data filters (the behavior the barrier exists
    // to stop — assert it so the spec fails loudly if Spark changes)
    val plain = docs.select($"doc_id", heavy.as("t"))
      .filter(length($"t") > 3)
    assert(scanFilterMentionsRegex(plain.queryExecution.executedPlan.toString) ||
      plain.queryExecution.optimizedPlan.toString.indexOf("regexp_replace") !=
        plain.queryExecution.optimizedPlan.toString.lastIndexOf("regexp_replace"),
      "expected the un-wrapped projection to be substituted into the pushed filter")
    // opaque: exactly ONE occurrence of the regex in the optimized plan
    // (the projection), and none inside the scan's filters
    val barred = docs.select($"doc_id", Opaque(heavy).as("t"))
      .filter(length($"t") > 3)
    val opt = barred.queryExecution.optimizedPlan.toString
    assert(opt.indexOf("regexp_replace") == opt.lastIndexOf("regexp_replace"),
      s"opaque projection was duplicated:\n$opt")
    assert(!scanFilterMentionsRegex(barred.queryExecution.executedPlan.toString),
      "heavy expression leaked into the scan filters despite the barrier")
    // and the rows are identical
    assert(plain.orderBy($"doc_id").collect().toSeq ==
      barred.orderBy($"doc_id").collect().toSeq)
  }

  test("CodebookRef: structural equality without an O(model) walk per call") {
    val cb1 = Seq(Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)), Seq(Seq(5.0, 6.0), Seq(7.0, 8.0)))
    val cb2 = Seq(Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)), Seq(Seq(5.0, 6.0), Seq(7.0, 8.0)))
    val cb3 = Seq(Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)), Seq(Seq(5.0, 6.0), Seq(7.0, 9.0)))
    val r1 = new CodebookRef(cb1, 10.0)
    val r2 = new CodebookRef(cb2, 10.0)
    val r3 = new CodebookRef(cb3, 10.0)
    val r4 = new CodebookRef(cb1, 11.0)
    assert(r1 == r2 && r1.hashCode == r2.hashCode)
    assert(r1 != r3 && r1 != r4)
    // expression-level: separately-constructed equal refs still make the
    // two PqEncode subtrees semantically equal — the property exchange
    // reuse between identical branches rides on
    val df = Seq(Seq(1.0, 2.0, 3.0, 4.0)).toDF("v")
    val v = df.col("v")
    val e1 = df.select(PqEncode(v, cb1, 10.0)).queryExecution
      .analyzed.expressions.head
    val e2 = df.select(PqEncode(v, cb2, 10.0)).queryExecution
      .analyzed.expressions.head
    assert(e1.children.head.semanticEquals(e2.children.head))
  }
}
