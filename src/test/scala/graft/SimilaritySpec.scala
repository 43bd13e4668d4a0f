package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf0001

  private def topkMap(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
    df.select("query_id", "rk", "vec_id").collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq).toMap

  test("ANN recall@5 vs brute force is usable on weakly-similar data") {
    val brute = topkMap(Similarity.simTopKBrute(spark, sf))
    val ann = topkMap(Similarity.simAnnLsh(spark, sf))
    assert(brute.size === Similarity.NumQueries)
    val recalls = brute.map { case (q, trueTop) =>
      val got = ann.getOrElse(q, Nil).toSet
      trueTop.count(got.contains).toDouble / trueTop.size
    }
    val mean = recalls.sum / recalls.size
    info(s"mean recall@5 = $mean")
    // Uniform random 64-dim data is ANN's worst case; 16×4-bit tables
    // should still recover most true neighbors.
    assert(mean >= 0.7, s"mean recall@5 = $mean below floor")
  }

  test("ANN result never contains a self-match or a rank outside 1..k") {
    val rows = Similarity.simAnnLsh(spark, sf)
      .select("query_id", "rk", "vec_id").collect()
    assert(rows.forall(r => r.getLong(2) != r.getLong(0)))
    assert(rows.forall(r => r.getInt(1) >= 1 && r.getInt(1) <= Similarity.TopK))
  }

  test("hyperplanes are deterministic across invocations") {
    assert(Similarity.hyperplane(3, 2) === Similarity.hyperplane(3, 2))
    assert(Similarity.hyperplane(3, 2) !== Similarity.hyperplane(3, 3))
  }
}
