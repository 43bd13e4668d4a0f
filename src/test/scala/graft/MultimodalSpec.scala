package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf0001

  test("decode stub: histogram is length-normalized and deterministic") {
    val f1 = Multimodal.decodeStub("hello world".getBytes("UTF-8"))
    val f2 = Multimodal.decodeStub("hello world".getBytes("UTF-8"))
    assert(f1.toSeq === f2.toSeq)
    assert(math.abs(f1.sum - 1.0f) < 1e-5)
    assert(Multimodal.decodeStub(Array.emptyByteArray).toSeq ===
      Seq.fill(Multimodal.FeatureDim)(0f))
  }

  test("media features frame has the contracted schema and row count") {
    val df = Multimodal.mediaFeatures(spark, sf)
    assert(df.schema("features").dataType === ArrayType(FloatType, containsNull = false))
    assert(df.schema("doc_id").dataType === LongType)
    val rows = df.collect()
    assert(rows.length === graft.sources.Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val feats = r.getAs[scala.collection.Seq[Float]]("features")
      assert(feats.length === Multimodal.FeatureDim)
      assert(math.abs(feats.sum - 1.0f) < 1e-4)
    }
  }

  test("manifest payload round-trips the document bytes") {
    import spark.implicits._
    val m = Multimodal.mediaManifest(spark, sf)
      .select($"doc_id", $"payload").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text").collect()
    docs.foreach { r =>
      assert(m(r.getLong(0)).toSeq === r.getString(1).getBytes("UTF-8").toSeq)
    }
  }

  test("frame sampling covers every 4th frame with full frames except the tail") {
    val rows = Multimodal.mediaFrameSample(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("frame_idx") % 4 === 0)
      assert(r.getAs[Int]("frame_bytes") > 0 &&
        r.getAs[Int]("frame_bytes") <= Multimodal.FrameSize)
    }
  }
}
