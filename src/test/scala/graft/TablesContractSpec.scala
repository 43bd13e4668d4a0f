package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._
import graft.sources.Tables

/** The engine's column contract against the driver-regenerated testdata —
  * a drift LOCALIZER: when the generator changes a table (round 9 it
  * switched events.ts INT64-NANOS → TIMESTAMP_NTZ and took 14 queries
  * down), this spec names the exact table/column instead of leaving a
  * pile of failed queries to diff. Deliberately tolerant: it pins the
  * type FAMILY the engine's expressions require (integral / fractional /
  * string / timestamp / float array), not exact physical widths, so a
  * benign int32→int64 regeneration does not cry wolf. */
class TablesContractSpec extends AnyFunSuite {
  val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf0001

  private def integral(d: DataType) = d match {
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType => true
    case _ => false
  }
  private def fractional(d: DataType) = d match {
    case _: FloatType | _: DoubleType | _: DecimalType => true
    case _ => false
  }
  private def string(d: DataType) = d.isInstanceOf[StringType]
  private def timestampish(d: DataType) = d match {
    case _: TimestampType | _: TimestampNTZType => true
    case _ => false
  }
  private def floatArray(d: DataType) = d match {
    case ArrayType(e, _) => fractional(e)
    case _ => false
  }

  private def check(name: String, df: DataFrame,
      contract: (String, DataType => Boolean, String)*): Unit = {
    val schema = df.schema
    contract.foreach { case (col, pred, family) =>
      assert(schema.fieldNames.contains(col),
        s"$name.$col MISSING — generator drift; present: ${schema.fieldNames.mkString(",")}")
      assert(pred(schema(col).dataType),
        s"$name.$col is ${schema(col).dataType} but the engine needs a $family — generator drift")
    }
    assert(df.limit(1).count() === 1L, s"$name is empty at $sf")
  }

  test("documents carries the text-pipeline contract") {
    check("documents", Tables.documents(spark, sf),
      ("doc_id", integral, "integral id"),
      ("text", string, "string"),
      ("lang", string, "string"),
      ("source", string, "string"))
  }

  test("documents text is pure ASCII — the oracle byte==char indexing precondition") {
    // The mm_features / mm_features_real / winnow DuckDB oracles index
    // text with character-positional `text[i:i]` while the engine hashes
    // UTF-8 BYTES; the two agree only while every document is ASCII
    // (octet_length == char length). If the generator ever ships
    // non-ASCII text, this names the precondition loudly instead of
    // leaving an opaque histogram hash mismatch to localize.
    import org.apache.spark.sql.functions.{col, length, octet_length}
    val nonAscii = Tables.documents(spark, sf)
      .where(octet_length(col("text")) =!= length(col("text")))
      .count()
    assert(nonAscii === 0L,
      s"$nonAscii documents contain non-ASCII text — byte vs char indexing diverges in the DuckDB oracles")
  }

  test("embeddings carries the ANN contract") {
    check("embeddings", Tables.embeddings(spark, sf),
      ("vec_id", integral, "integral id"),
      ("embedding", floatArray, "fractional array"),
      ("label", integral, "integral label"))
  }

  test("events normalizes to the temporal contract regardless of footer encoding") {
    val ev = Tables.events(spark, sf)
    check("events", ev,
      ("event_id", integral, "integral id"),
      ("user_id", integral, "integral id"),
      ("event_type", string, "string"),
      ("value", fractional, "fractional"),
      ("props", string, "string (json)"))
    // exact, not timestampish: the loader's whole job is normalizing
    // every footer encoding to the session TimestampType
    assert(ev.schema("ts").dataType === TimestampType,
      s"events.ts must be NORMALIZED TimestampType, got ${ev.schema("ts").dataType}")
  }

  test("TPC-H-ish tables carry the relational contract") {
    check("lineitem", Tables.lineitem(spark, sf),
      ("l_orderkey", integral, "integral key"),
      ("l_partkey", integral, "integral key"),
      ("l_suppkey", integral, "integral key"),
      ("l_quantity", fractional, "fractional"),
      ("l_extendedprice", fractional, "fractional"),
      ("l_discount", fractional, "fractional"),
      ("l_tax", fractional, "fractional"),
      ("l_returnflag", string, "string"),
      ("l_linestatus", string, "string"),
      ("l_shipdate", timestampish, "timestamp"))
    check("orders", Tables.orders(spark, sf),
      ("o_orderkey", integral, "integral key"),
      ("o_custkey", integral, "integral key"),
      ("o_orderstatus", string, "string"),
      ("o_totalprice", fractional, "fractional"),
      ("o_orderdate", timestampish, "timestamp"),
      ("o_orderpriority", string, "string"))
    check("customer", Tables.customer(spark, sf),
      ("c_custkey", integral, "integral key"),
      ("c_nationkey", integral, "integral key"),
      ("c_acctbal", fractional, "fractional"),
      ("c_mktsegment", string, "string"),
      ("c_name", string, "string"))
    check("supplier", Tables.supplier(spark, sf),
      ("s_suppkey", integral, "integral key"),
      ("s_nationkey", integral, "integral key"),
      ("s_acctbal", fractional, "fractional"),
      ("s_name", string, "string"))
    check("part", Tables.part(spark, sf),
      ("p_partkey", integral, "integral key"),
      ("p_size", integral, "integral"),
      ("p_retailprice", fractional, "fractional"),
      ("p_name", string, "string"),
      ("p_brand", string, "string"),
      ("p_type", string, "string"))
    check("nation", Tables.nation(spark, sf),
      ("n_nationkey", integral, "integral key"),
      ("n_regionkey", integral, "integral key"),
      ("n_name", string, "string"))
    check("region", Tables.region(spark, sf),
      ("r_regionkey", integral, "integral key"),
      ("r_name", string, "string"))
  }
}
