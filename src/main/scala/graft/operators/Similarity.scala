package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorOps
import graft.sources.Tables

/** Similarity search over the `embeddings` table (`vec_id`,
  * `embedding: array<float>[64]`, `label`).
  *
  * Two paths, per the standard ANN playbook:
  *  - brute-force cosine top-k — the exactness baseline. Queries are a
  *    small broadcast side against a full scan of the corpus; per-query
  *    ranking is a partitioned window (parallel across queries). This is
  *    the O(Q·N) plan you actually want when Q is small, even at scale.
  *  - random-hyperplane LSH (Charikar) with L hash tables of k bits —
  *    the sublinear scale path. Signatures are computed per vector once
  *    (map-side), candidates come from equi-joins on (table, signature)
  *    — a shuffle key, never an all-pairs product. Hyperplanes are
  *    pseudo-random but fully deterministic: component (t,bit,dim) is
  *    derived from a hash of the indices, so plans are reproducible with
  *    no driver-side randomness or fitted model state.
  */
object Similarity {

  final val TopK = 5
  final val NumQueries = 10 // vec_id < 10 are the query vectors
  // 16 tables × 4 bits: on this data's neighbor cosines (~0.45) the
  // per-table bucket-match probability is ~0.18, so candidate recall is
  // 1-(1-0.18)^16 ≈ 0.96. Fewer, wider tables trade candidate volume for
  // recall — the right trade on weakly-similar (worst-case) data; on real
  // corpora with tight clusters, more bits per table re-sharpens buckets.
  // (Values live in LshImpl so the one-pass expression and this module
  // can never drift apart.)
  final val LshTables: Int = graft.functions.LshImpl.Tables
  final val LshBits: Int = graft.functions.LshImpl.Bits

  private def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"), VectorOps.toDouble(col("embedding")).as("v"))

  /** Deterministic pseudo-random hyperplane for (table, bit): components
    * in [-1, 1) derived from FNV-1a of the index triple — the same values
    * the one-pass LshSignatures expression bakes in (delegated so spec
    * assertions pin them equal). No RNG state, no fitted model. */
  private[graft] def hyperplane(table: Int, bit: Int): Seq[Double] =
    (0 until 64).map(d => graft.functions.LshImpl.component(table, bit, d))

  /** Exact brute-force cosine top-k for the query set (vec_id < NumQueries),
    * excluding self-matches. */
  def simTopKBrute(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = embeddings(spark, sfDir)
    val q = e.filter($"vec_id" < NumQueries)
      .select($"vec_id".as("query_id"), $"v".as("qv"))
    val scored = broadcast(q).join(e, $"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id",
        VectorOps.cosine($"qv", $"v").as("cos"))
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"vec_id".asc)
    scored.withColumn("rk", row_number().over(w))
      .filter($"rk" <= TopK)
      .select($"query_id", $"rk", $"vec_id", round($"cos", 4).as("cosine"))
      .orderBy($"query_id", $"rk")
  }

  /** Per-vector LSH signatures, exploded to (vec_id, table, sig) — all
    * tables from one pass over the vector (custom LshSignatures
    * expression), then posexplode for the band join. */
  private[graft] def signatures(e: DataFrame): DataFrame =
    e.withColumn("sigs", graft.functions.LshSignatures(col("v")))
      .select(col("vec_id"), col("v"), posexplode(col("sigs")).as(Seq("t", "sig")))

  /** ANN top-k: candidates = vectors sharing any (table, signature) bucket
    * with the query, then exact cosine re-rank within candidates. Sublinear
    * when buckets are selective; degrades gracefully toward scan on
    * uniformly weakly-similar data (which this synthetic set is). */
  def simAnnLsh(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = embeddings(spark, sfDir)
    val sigs = signatures(e)
    val qsigs = sigs.filter($"vec_id" < NumQueries)
      .select($"vec_id".as("query_id"), $"t", $"sig")
    val candidateIds = broadcast(qsigs).join(sigs.select($"vec_id", $"t", $"sig"),
        Seq("t", "sig"))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id")
      .distinct()
    val q = e.filter($"vec_id" < NumQueries)
      .select($"vec_id".as("query_id"), $"v".as("qv"))
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"vec_id".asc)
    candidateIds
      .join(e.select($"vec_id", $"v"), "vec_id")
      .join(broadcast(q), "query_id")
      .select($"query_id", $"vec_id", VectorOps.cosine($"qv", $"v").as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= TopK)
      .select($"query_id", $"rk", $"vec_id", round($"cos", 4).as("cosine"))
      .orderBy($"query_id", $"rk")
  }

  /** Aggregate similarity statistics per label block (exercises vector
    * math inside a shuffle agg): pair count, mean and max cosine. */
  def simLabelStats(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = embeddings(spark, sfDir)
    e.as("a").join(e.as("b"),
        $"a.label" === $"b.label" && $"a.vec_id" < $"b.vec_id")
      .select($"a.label".as("label"),
        VectorOps.cosine($"a.v", $"b.v").as("cos"))
      .groupBy($"label")
      .agg(count(lit(1)).as("n_pairs"),
        round(avg($"cos"), 4).as("avg_cos"),
        round(max($"cos"), 4).as("max_cos"))
      .orderBy($"label")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_topk_brute" -> simTopKBrute,
    "sim_ann_lsh" -> simAnnLsh,
    "sim_label_stats" -> simLabelStats,
  )

  private def cosSql(a: String, b: String): String =
    s"""list_dot_product($a.embedding::DOUBLE[], $b.embedding::DOUBLE[]) /
       |    (sqrt(list_dot_product($a.embedding::DOUBLE[], $a.embedding::DOUBLE[])) *
       |     sqrt(list_dot_product($b.embedding::DOUBLE[], $b.embedding::DOUBLE[])))""".stripMargin

  val oracles: Map[String, String] = Map(
    "sim_topk_brute" ->
      s"""SELECT query_id, rk, vec_id, round(cos, 4) AS cosine FROM (
         |  SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
         |    ${cosSql("q", "e")} AS cos,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY ${cosSql("q", "e")} DESC, e.vec_id ASC) AS rk
         |  FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
         |  WHERE q.vec_id < $NumQueries
         |) t WHERE rk <= $TopK
         |ORDER BY query_id, rk""".stripMargin,
    "sim_label_stats" ->
      s"""SELECT a.label AS label, count(*) AS n_pairs,
         |  round(avg(${cosSql("a", "b")}), 4) AS avg_cos,
         |  round(max(${cosSql("a", "b")}), 4) AS max_cos
         |FROM embeddings a JOIN embeddings b
         |  ON a.label = b.label AND a.vec_id < b.vec_id
         |GROUP BY a.label ORDER BY a.label""".stripMargin,
    // sim_ann_lsh: approximate by construction — no SQL oracle; recall
    // vs the brute-force baseline is asserted in SimilaritySpec.
  )
}
