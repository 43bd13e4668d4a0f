package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{PqAdcTable, PqEncode}
import graft.operators.Similarity

/** The fused PQ encode/table expressions vs the literal per-codeword
  * tree they replace — the bit-parity contract every hash-green PQ
  * oracle rides on (see PqOps.scala's BIT-PARITY note). */
class PqOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf0001

  import Similarity.{NumQueries, ScoreScale}

  /** Deterministic k-codeword codebooks from the corpus itself: the
    * first k vectors' subspace slices (any fixed vectors do — the
    * differential only needs identical models on both sides). */
  private def codebooksOf(k: Int): Seq[Seq[Seq[Double]]] = {
    val e = Similarity.embeddings(spark, sf)
    val seeds = e.filter(col("vec_id") < k).orderBy("vec_id")
      .select("v").collect().map(_.getSeq[Double](0).toSeq).toSeq
    val subDim = Similarity.PqSubDim
    (0 until Similarity.PqSubspaces).map(m =>
      seeds.map(_.slice(m * subDim, (m + 1) * subDim)))
  }

  private def encodeParityAt(k: Int): Unit = {
    val cb = codebooksOf(k)
    val e = Similarity.embeddings(spark, sf)
    val fused = e.select(col("vec_id"),
      Similarity.pqCodesCol(cb, col("v")).as("codes"))
    val literal = e.select(col("vec_id"),
      array((0 until Similarity.PqSubspaces).map(m =>
        Similarity.pqCodeCol(cb, col("v"), m)): _*).as("codes"))
    val f = fused.orderBy("vec_id").collect().map(r =>
      (r.getLong(0), r.getSeq[Int](1)))
    val l = literal.orderBy("vec_id").collect().map(r =>
      (r.getLong(0), r.getSeq[Int](1)))
    assert(f === l, s"fused encode diverged from literal tree at k=$k")
    // sanity: at k > 16 the finer codebooks are actually exercised
    if (k > 16) assert(f.exists(_._2.exists(_ >= 16)),
      "no vector used a codeword beyond the 4-bit range — k not exercised")
  }

  test("PqEncode ≡ literal per-subspace argmin tree (k = 16)") {
    encodeParityAt(16)
  }

  test("null array elements null the result instead of reading 0.0") {
    // a parquet round-trip flips containsNull=true; a null slot read
    // through getDouble would silently contribute 0.0 — the expression
    // must null out instead (whole vector for encode, the subspace
    // span for the table)
    import spark.implicits._
    val cb = codebooksOf(4)
    val dims = graft.functions.LshImpl.Dims
    val subDim = Similarity.PqSubDim
    val whole: Seq[Option[Double]] = Seq.fill(dims)(Some(0.5))
    val lastSubNull = whole.updated(dims - 1, Option.empty[Double])
    val df = Seq((0L, whole), (1L, lastSubNull)).toDF("id", "v")
    val enc = df.select($"id", PqEncode($"v", cb, ScoreScale).as("c"))
      .orderBy($"id").collect()
    assert(enc(0).getSeq[Int](1) != null)
    assert(enc(1).isNullAt(1), "null element must null pq_encode")
    // table: only the subspace containing the null slot nulls out
    val lastSub = Similarity.PqSubspaces - 1
    val tabs = df.select($"id",
        PqAdcTable($"v", cb, ScoreScale, 0).as("t0"),
        PqAdcTable($"v", cb, ScoreScale, lastSub).as("tl"))
      .orderBy($"id").collect()
    assert(!tabs(0).isNullAt(1) && !tabs(0).isNullAt(2))
    assert(!tabs(1).isNullAt(1),
      "null outside the read span must not null the table")
    assert(tabs(1).isNullAt(2), "null inside the span must null the table")
    assert(subDim * Similarity.PqSubspaces === dims)
  }

  test("PqEncode ≡ literal per-subspace argmin tree (k = 256)") {
    encodeParityAt(256)
  }

  test("PqAdcTable ≡ literal floor(dot·scale) table (k = 16 and 256)") {
    val e = Similarity.embeddings(spark, sf)
    for (k <- Seq(16, 256)) {
      val cb = codebooksOf(k)
      val q = e.filter(col("vec_id") < NumQueries)
      val fused = q.select(col("vec_id") +:
        (0 until Similarity.PqSubspaces).map(m =>
          PqAdcTable(col("v"), cb, ScoreScale, m).as(s"t$m")): _*)
      def litTab(m: Int) = array(cb(m).map(cv =>
        floor(graft.functions.VectorOps.dotLit(col("v"), cv,
          m * Similarity.PqSubDim) * lit(ScoreScale)).cast("long")): _*)
      val literal = q.select(col("vec_id") +:
        (0 until Similarity.PqSubspaces).map(m => litTab(m).as(s"t$m")): _*)
      assert(fused.orderBy("vec_id").collect().map(_.toSeq).toSeq ===
        literal.orderBy("vec_id").collect().map(_.toSeq).toSeq,
        s"fused ADC table diverged from literal tree at k=$k")
    }
  }

  test("PqEncode null contract: too-short vector ⇒ null, null ⇒ null") {
    import spark.implicits._
    val cb = codebooksOf(16)
    val rows = Seq(
      (1L, Some(Seq.fill(graft.functions.LshImpl.Dims)(0.25))),
      (2L, Some(Seq(1.0, 2.0))), // shorter than the subspace span
      (3L, None)
    ).toDF("id", "v")
    val out = rows.select($"id", PqEncode($"v", cb, ScoreScale).as("c"))
      .orderBy("id").collect()
    assert(!out(0).isNullAt(1))
    assert(out(1).isNullAt(1) && out(2).isNullAt(1))
  }

  private def meanRecall(ann: org.apache.spark.sql.DataFrame): Double = {
    def topkMap(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
      df.select("query_id", "rk", "vec_id").collect()
        .groupBy(_.getLong(0))
        .view.mapValues(_.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq).toMap
    val brute = topkMap(Similarity.simTopKBrute(spark, sf))
    val got = topkMap(ann)
    val rs = brute.map { case (q, trueTop) =>
      trueTop.count(got.getOrElse(q, Nil).toSet.contains).toDouble / trueTop.size
    }
    rs.sum / rs.size
  }

  test("8-bit IVF-PQ recall@5 beats the 4-bit tier (regression canary)") {
    // 8×8-bit codes double the 4-bit tier's raw recall (sf0.1 sweep:
    // 0.30 vs 0.14, flat in nprobe — 64-bit codes are quantization-
    // capped on isotropic data) and cut the exact-rerank pool needed
    // for 0.82 from 600 to 100. This floor is the per-round canary at
    // sf0.001 (measured 0.62 there — fewer candidates per cell).
    val mean = meanRecall(Similarity.simAnnIvfPq8b(spark, sf))
    info(s"8-bit IVF-PQ mean recall@5 = $mean")
    assert(mean >= 0.5, s"8-bit IVF-PQ mean recall@5 = $mean below floor")
  }

  test("32×8-bit IVF-PQ clears the STANDALONE un-reranked floor") {
    // the r15 VERDICT #1 'done' bar, landed at the measured geometry:
    // the full-probe un-reranked sweep at sf0.1 reads 0.14 / 0.30 /
    // 0.52 / 0.90 for 4 / 8 / 16 / 32-byte codes, so 32×8-bit is the
    // first standalone-usable compressed scan on this corpus
    val mean = meanRecall(Similarity.simAnnIvfPq32x8(spark, sf))
    info(s"32×8-bit IVF-PQ mean recall@5 = $mean")
    assert(mean >= 0.6, s"32×8-bit IVF-PQ mean recall@5 = $mean below floor")
  }
}
