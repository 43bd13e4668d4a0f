package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Differential pins for the fused centroid-scoring expressions (r22):
  * [[graft.functions.CentroidCosines]] / [[graft.functions.CentroidQuantScores]]
  * must be BIT-IDENTICAL to the literal cosine-vs-typedLit trees they
  * replaced — the whole IVF/semantic oracle family rides on the scores'
  * exact IEEE bits (the simAnnIvfOn BIT-PARITY note). */
class CentroidOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.01"

  test("fused centroid cosines ≡ literal tree, bit-for-bit, on the real embeddings") {
    import spark.implicits._
    val e = Similarity.embeddings(spark, sf)
    val cents = Similarity.seedCentroids(e)
    val rows = e.select($"vec_id",
        Similarity.cosineScores(cents).as("fused"),
        Similarity.cosineScoresUnfused(cents).as("lit"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val f = r.getSeq[Double](1)
      val l = r.getSeq[Double](2)
      assert(f.size == l.size, s"vec ${r.getLong(0)}: size ${f.size} != ${l.size}")
      f.zip(l).zipWithIndex.foreach { case ((a, b), i) =>
        assert(java.lang.Double.doubleToRawLongBits(a) ==
          java.lang.Double.doubleToRawLongBits(b),
          s"vec ${r.getLong(0)} cell $i: $a != $b (bit divergence)")
      }
    }
  }

  test("fused quantized scores ≡ literal floor(cos*scale) tree on the real embeddings") {
    import spark.implicits._
    val e = Similarity.embeddings(spark, sf)
    // the Lloyd-FITTED centroids (non-trivial values, the actual
    // consumer of the quant form) — shared fit, both score forms on it
    val cents = Similarity.seedCentroids(e)
    val fitted = Similarity.fitCentroids(e, cents, Similarity.KMeansIters)
    val rows = e.select($"vec_id",
        graft.functions.CentroidQuantScores(col("v"), fitted, Similarity.ScoreScale).as("fused"),
        Similarity.quantScoresUnfused(fitted).as("lit"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"vec ${r.getLong(0)}: ${r.getSeq[Long](1)} != ${r.getSeq[Long](2)}")
    }
  }

  test("CentroidsRef: structural equality without an O(model) walk; short vector nulls whole result") {
    import spark.implicits._
    val c1 = Seq(Seq(1.0, 2.0), Seq(3.0, 4.0))
    val r1 = new graft.functions.CentroidsRef(c1)
    val r2 = new graft.functions.CentroidsRef(Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)))
    val r3 = new graft.functions.CentroidsRef(Seq(Seq(1.0, 2.0), Seq(3.0, 5.0)))
    assert(r1 == r2 && r1.hashCode == r2.hashCode)
    assert(r1 != r3)
    val df = Seq((1L, Seq(1.0, 1.0)), (2L, Seq(1.0))).toDF("id", "v")
      .select($"id", graft.functions.CentroidCosines($"v", c1).as("cos"))
      .orderBy($"id").collect()
    assert(!df(0).isNullAt(1))
    assert(df(1).isNullAt(1), "short vector must null the whole score array")
  }
}
