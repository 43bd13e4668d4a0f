package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.SimHash64
import graft.sources.Tables

/** Deduplication suite over the `documents` table — the operators a
  * large-scale training-data pipeline needs, each in its Spark-native
  * shuffle-friendly form:
  *
  *  - exact dedup: hash-groupBy (one shuffle on the content hash);
  *  - near-dup: MinHash+LSH banding (candidates from equi-join on band
  *    hashes — no O(n²) pair scan), verified with exact Jaccard;
  *  - exact n-gram Jaccard via an inverted shingle index (equi-join on
  *    shingle, pair-count aggregation — the scalable formulation);
  *  - SimHash fingerprints (custom codegen expression);
  *  - embedding-cosine similarity pairs (blocked self-join).
  *
  * At 100 TB: every join here is an equi-join on a hash/band/shingle key
  * that Spark shuffles by key; no operator enumerates all pairs, and the
  * inverted-index path caps shingle document frequency (MaxShingleDF) so
  * a boilerplate shingle cannot make the self-join quadratic on one key.
  * The oracle applies the identical cap, keeping parity exact.
  */
object Dedup {

  // pinned to the expression's constant so the element_at indices below
  // can never run past the produced signature array
  final val NumHashes: Int = graft.functions.MinHashImpl.NumHashes
  final val NumBands = 16 // 4 rows per band; P(miss | j>=0.8) < 3e-4, ~0 at the planted j>=0.95
  final val JaccardThreshold = 0.8

  /** Max document frequency a shingle may have and still enter the
    * inverted index. A shingle shared by d documents contributes d·(d−1)/2
    * candidate pairs through one shuffle key — a boilerplate shingle at
    * 100 TB makes the self-join quadratic on that key. Shingles this
    * common carry no near-dup signal (they can only dilute Jaccard toward
    * the corpus average), so both the engine and the oracle drop them
    * BEFORE pairing; Jaccard is computed over the capped shingle space on
    * both sides, keeping oracle parity exact. */
  final val MaxShingleDF = 128

  /** Distinct 3-token shingles per doc: (doc_id, shingles array<string>).
    *
    * The repartition spreads the expensive per-row expansion (split +
    * shingle transform + distinct, ~26x output growth) across the
    * cluster BEFORE it runs — a small documents file scans as one split,
    * and without the exchange every shingle-derived plan computes its
    * hottest expression nearly single-threaded. */
  private[graft] def shingles(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      // explicit width: AQE leaves a user-sized repartition alone; the
      // bare-column form gets coalesced back to ~1 partition at this data
      // size, re-serializing the transform
      .repartition(spark.sparkContext.defaultParallelism, $"doc_id")
      .select($"doc_id", split($"text", " ").as("toks"))
      .filter(size($"toks") >= 3) // guard: sequence(0, n-3) needs n >= 3
      .select($"doc_id", array_distinct(
        transform(sequence(lit(0), size($"toks") - 3),
          i => concat_ws(" ", element_at($"toks", i + 1),
            element_at($"toks", i + 2), element_at($"toks", i + 3)))).as("sh"))
  }

  private[graft] def shingles(spark: SparkSession, sfDir: String): DataFrame =
    shingles(Tables.documents(spark, sfDir))

  /** Exact dedup by content hash: one group per distinct text, keeping the
    * lowest doc_id as representative. */
  def dedupExact(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .groupBy(md5($"text").as("h"))
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_dups"))
      .orderBy($"h")
  }

  /** Exact dedup on the bag-of-words canonical form (sorted token list) —
    * catches reordered-but-identical-content docs. */
  def dedupExactBow(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .groupBy(md5(concat_ws(" ", sort_array(split($"text", " ")))).as("h"))
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_dups"))
      .orderBy($"h")
  }

  /** Pairwise 3-gram Jaccard ≥ 0.8 via inverted shingle index:
    * explode → DF-cap prune → self-equi-join on shingle → per-pair common
    * count → |A∩B| / (|A| + |B| - |A∩B|). No all-pairs enumeration, and
    * no shingle key fans out to more than MaxShingleDF index entries. */
  def dedupNgramJaccard(spark: SparkSession, sfDir: String): DataFrame =
    dedupNgramJaccardOn(shingles(spark, sfDir))

  private[graft] def dedupNgramJaccardOn(sh: DataFrame,
      maxDf: Long = MaxShingleDF): DataFrame = {
    val spark = sh.sparkSession
    import spark.implicits._
    // ONE explicit shuffle keyed on the shingle, shared by everything
    // downstream: the DF count aggregates in place, and both self-join
    // sides are already co-partitioned, so Catalyst plans a single
    // exchange and reuses it. Without this, the post-aggregation size
    // estimates let AQE turn the self-join into a broadcast join whose
    // probe side runs at the (single-file) scan parallelism — measured
    // 6x slower at sf0.1 than the repartitioned form.
    // explode_outer + null filter instead of plain explode: the optimizer
    // infers a `size(sh) > 0 AND isnotnull(sh)` guard for a non-outer
    // Generate and pushes it below the projection, re-evaluating the
    // whole shingle transform per row; the outer variant generates no
    // guard and the null row is dropped on the exploded string instead.
    val exploded = sh.select($"doc_id", explode_outer($"sh").as("s"))
      .filter($"s".isNotNull)
      .repartition($"s")
    // Max-DF cap as a broadcast ANTI-join: the HOT side (shingles with
    // DF > maxDf) is tiny by definition — boilerplate keys — so pruning
    // costs one keyed count plus a broadcast, and the big exploded frame
    // is never re-shuffled for it. `pruned` is the only subtree the rest
    // of the query reads — sizes and both self-join sides all replay the
    // one materialized exchange.
    val hot = exploded.groupBy($"s").agg(count(lit(1)).as("df"))
      .filter($"df" > maxDf).select($"s")
    val pruned = exploded.join(broadcast(hot), Seq("s"), "left_anti")
    val sizes = pruned.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val common = pruned.as("a").join(pruned.as("b"),
        $"a.s" === $"b.s" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .agg(count(lit(1)).as("c"))
    common
      .join(sizes.as("na"), $"doc_a" === $"na.doc_id")
      .join(sizes.as("nb"), $"doc_b" === $"nb.doc_id")
      .select($"doc_a", $"doc_b",
        ($"c".cast("double") / ($"na.n" + $"nb.n" - $"c")).as("jacc"))
      .filter($"jacc" >= JaccardThreshold)
      .select($"doc_a", $"doc_b", round($"jacc", 3).as("jaccard"))
      .orderBy($"doc_a", $"doc_b")
  }

  /** MinHash signatures: sig[i] = min over shingles of hash_i(shingle).
    * One strong hash per variable-length shingle string (xxhash64,
    * computed once into `hv`), then ALL 64 minima in a single array
    * traversal via the custom MinHashSignatures expression (wrapping
    * multiplicative mixes inside JVM code — where ANSI overflow checking
    * doesn't apply — instead of 64 separate array_min∘transform
    * projections). */
  private def withSignature(sh: DataFrame): DataFrame = {
    val hashed = sh
      .withColumn("hv", transform(col("sh"), s => xxhash64(s)))
      .withColumn("sigs", graft.functions.MinHashSignatures(col("hv")))
    val sigCols = (0 until NumHashes).map(i =>
      element_at(col("sigs"), i + 1).as(s"sig$i"))
    hashed.select(col("doc_id") +: col("sh") +: sigCols: _*)
  }

  /** MinHash + LSH banded near-dup detection, exact-Jaccard verified.
    * Candidate generation is an equi-join on (band index, band hash) —
    * the shuffle key that makes this linear-ish at scale. Output equals
    * the exact-Jaccard pairs whenever LSH recall is 1 (certain at the
    * planted similarity levels; see NumBands). */
  def dedupMinHashLsh(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // No cache: shingles() ends in an explicit exchange, and both the
    // signature branch and the exact-verify branch hang off the same
    // subtree, so the shuffle files are materialized once and replayed —
    // reuse without a session-lifetime memory footprint (a .cache() here
    // would outlive the query and tax everything that runs after it).
    val sh = shingles(spark, sfDir)
    val sig = withSignature(sh)
    val rowsPerBand = NumHashes / NumBands
    val bandCols = (0 until NumBands).map { b =>
      val cols = (0 until rowsPerBand).map(r => col(s"sig${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), xxhash64(cols: _*).as("bh"))
    }
    val banded = sig.select($"doc_id", explode(array(bandCols: _*)).as("band_key"))
      .select($"doc_id", $"band_key.band".as("band"), $"band_key.bh".as("bh"))
    val candidates = banded.as("a").join(banded.as("b"),
        $"a.band" === $"b.band" && $"a.bh" === $"b.bh" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .distinct()
    val verified = candidates
      .join(sh.select($"doc_id".as("doc_a"), $"sh".as("sh_a")), "doc_a")
      .join(sh.select($"doc_id".as("doc_b"), $"sh".as("sh_b")), "doc_b")
      .select($"doc_a", $"doc_b",
        (size(array_intersect($"sh_a", $"sh_b")).cast("double") /
          size(array_union($"sh_a", $"sh_b"))).as("jacc"))
      .filter($"jacc" >= JaccardThreshold)
    verified.select($"doc_a", $"doc_b", round($"jacc", 3).as("jaccard"))
      .orderBy($"doc_a", $"doc_b")
  }

  /** The dedup *result*: documents kept after dropping the higher doc_id
    * of every confirmed near-duplicate pair. */
  def dedupKept(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir).select($"doc_id", $"lang", $"source")
    val drop = dedupNgramJaccard(spark, sfDir).select($"doc_b".as("doc_id")).distinct()
    docs.join(drop, Seq("doc_id"), "left_anti").orderBy($"doc_id")
  }

  /** Per-document 64-bit SimHash fingerprint (custom codegen expression).
    * Hamming-adjacent fingerprints = near-dups; the banding join for
    * Hamming search is exercised in the unit suite. */
  def dedupSimHash(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select($"doc_id", SimHash64(split($"text", " ")).as("simhash"))
      .orderBy($"doc_id")
  }

  /** Chunks per fingerprint for the Hamming-banded search: 8 chunks of
    * 8 bits. Pigeonhole guarantees every pair within Hamming ≤ 7 shares a
    * chunk; beyond that capture is probabilistic (measured 0 misses
    * across all true near-dup pairs at sf0.001/0.01/0.1, max observed
    * h=12 on shingle fingerprints). 8-bit chunks keep bucket fan-in at
    * n/256 per chunk value — the shuffle-key bound that makes this
    * linear-ish. */
  final val SimHashChunks = 8
  final val SimHashChunkBits = 8

  /** Exact-Hamming cut applied to banded candidates BEFORE the Jaccard
    * verify, on the full 64-bit distance (a cheap long XOR + popcount of
    * two joined longs). The pairs query fingerprints over 3-gram SHINGLES,
    * not unigram tokens: over a small vocabulary every document contains
    * nearly every token, so token-level fingerprints are correlated and
    * banding admits half of all pairs (measured 6.7M candidates at sf0.1,
    * 3.4M within h≤16); shingle features are near-orthogonal between
    * unrelated documents, so the background concentrates at h≈32 and the
    * cut passes only ~635 pairs at sf0.1. True near-dup pairs measure
    * h ≤ 12 across all SFs; 16 leaves margin. */
  final val MaxVerifyHamming = 16

  /** SimHash near-dup SEARCH: pigeonhole chunk banding over the 64-bit
    * fingerprint generates candidates (equi-join on (chunk index, chunk
    * value) — same shape as the MinHash band join), then candidates are
    * verified with exact 3-gram Jaccard over the DF-capped shingle space.
    * Output and oracle are identical to dedup_ngram_jaccard — this is the
    * fingerprint-driven way to arrive at the same pairs without an
    * inverted shingle index. */
  def dedupSimHashPairs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    // ONE shingle expansion feeds everything: exploded rows shuffle to
    // the shingle key (shared with the DF-count agg), the capped per-doc
    // sets come back from one groupBy, and the FINGERPRINT hashes those
    // same capped sets. Fingerprinting the capped space (a) halves the
    // heavy transform work vs a separate full-set branch, and (b) makes
    // search and verify operate on the identical feature space the
    // oracle uses. The DF cap drops zero shingles at sf0.001/0.01/0.1
    // (boilerplate keys only appear beyond these corpora), so the banding
    // capture measurements below apply verbatim.
    val ex = shingles(docs).select($"doc_id", explode_outer($"sh").as("s"))
      .filter($"s".isNotNull)
      .repartition($"s")
    // cap as a broadcast ANTI-join on the tiny hot set (the rare set is
    // nearly the whole index — joining it would shuffle and sort millions
    // of strings for nothing)
    val hot = ex.groupBy($"s").agg(count(lit(1)).as("df"))
      .filter($"df" > MaxShingleDF).select($"s")
    val cappedSets = ex.join(broadcast(hot), Seq("s"), "left_anti")
      .groupBy($"doc_id").agg(collect_list($"s").as("shc"))
    val fp = cappedSets.select($"doc_id", SimHash64($"shc").as("f"))
    val mask = (1L << SimHashChunkBits) - 1
    val chunkCols = (0 until SimHashChunks).map { c =>
      struct(lit(c).as("c"),
        (shiftrightunsigned($"f", c * SimHashChunkBits).bitwiseAND(lit(mask))).as("v"))
    }
    // carry the full fingerprint through the band join: the exact-Hamming
    // cut (long XOR + popcount) then runs INSIDE the join, so the distinct
    // dedupes only the ~few-hundred surviving pairs, not every chunk
    // collision
    val banded = fp.select($"doc_id", $"f", explode(array(chunkCols: _*)).as("k"))
      .select($"doc_id", $"f", $"k.c".as("c"), $"k.v".as("v"))
      .repartition($"c", $"v")
    val candidates = banded.as("a").join(banded.as("b"),
        $"a.c" === $"b.c" && $"a.v" === $"b.v" && $"a.doc_id" < $"b.doc_id" &&
          expr("bit_count(a.f ^ b.f)") <= MaxVerifyHamming)
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .distinct()
    candidates
      .join(cappedSets.select($"doc_id".as("doc_a"), $"shc".as("sh_a")), "doc_a")
      .join(cappedSets.select($"doc_id".as("doc_b"), $"shc".as("sh_b")), "doc_b")
      .select($"doc_a", $"doc_b",
        (size(array_intersect($"sh_a", $"sh_b")).cast("double") /
          size(array_union($"sh_a", $"sh_b"))).as("jacc"))
      .filter($"jacc" >= JaccardThreshold)
      .select($"doc_a", $"doc_b", round($"jacc", 3).as("jaccard"))
      .orderBy($"doc_a", $"doc_b")
  }

  /** Embedding-space near-dup/similarity pairs: same-label blocked
    * self-join, cosine in double precision, top-20 most similar pairs.
    * (The data's max cosine is ~0.51, so a fixed high threshold would be
    * vacuous; top-k is the non-degenerate formulation here.) */
  def dedupEmbedCosine(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.VectorOps
    val e = Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"label", VectorOps.toDouble($"embedding").as("v"))
    val pairs = e.as("a").join(e.as("b"),
        $"a.label" === $"b.label" && $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("vec_a"), $"b.vec_id".as("vec_b"), $"a.label".as("label"),
        VectorOps.cosine($"a.v", $"b.v").as("cos"))
    pairs.orderBy($"cos".desc, $"vec_a".asc, $"vec_b".asc)
      .limit(20)
      .select($"vec_a", $"vec_b", $"label", round($"cos", 4).as("cosine"))
  }

  /** Quantizer-cell blocking for the embedding self-join: 8 bands of 8
    * coordinate-sign bits each (64 dims, disjoint). Two vectors are
    * candidates iff they share a label AND any band cell — the join key
    * is (label, band, cell), so the pair space is bounded by cell
    * occupancy (~n/256 per band under a sign-balanced distribution), not
    * label cardinality. In the operator's target regime (near-dup
    * embeddings, cos ≥ 0.9, sign-agreement ≥ 0.9/bit) a pair collides in
    * a band w.p. ≥ 0.43, in ≥1 of 8 w.p. ≥ 0.99; moderate-cosine pairs
    * (~0.5, the max this synthetic corpus contains) are deliberately NOT
    * guaranteed — that regime needs the brute-force path above. The
    * DuckDB oracle mirrors the banding bit-for-bit, so the hash check
    * pins the approximation's exact semantics at every SF. */
  final val EmbedBands = 8
  final val EmbedBandBits = 8

  /** Blocked variant of [[dedupEmbedCosine]]: same output shape (top-20
    * most-similar same-label pairs), candidates restricted to quantizer-
    * cell collisions instead of an all-pairs product within the label. */
  def dedupEmbedCosineBlocked(spark: SparkSession, sfDir: String): DataFrame =
    dedupEmbedCosineBlockedOn(Tables.embeddings(spark, sfDir))

  private[graft] def dedupEmbedCosineBlockedOn(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    import graft.functions.VectorOps
    val e = emb.select($"vec_id", $"label", $"embedding",
      VectorOps.toDouble($"embedding").as("v"))
    val bandCols = (0 until EmbedBands).map { b =>
      val cell = (0 until EmbedBandBits).map { j =>
        (element_at($"embedding", b * EmbedBandBits + j + 1) >= lit(0f))
          .cast("int") * lit(1 << (EmbedBandBits - 1 - j))
      }.reduce(_ + _)
      struct(lit(b).as("c"), cell.as("cell"))
    }
    // one explicit exchange on the full join key, shared by both self-join
    // sides (same AQE-broadcast-collapse guard as the shingle joins above)
    val banded = e.select($"vec_id", $"label", explode(array(bandCols: _*)).as("k"))
      .select($"vec_id", $"label", $"k.c".as("c"), $"k.cell".as("cell"))
      .repartition($"label", $"c", $"cell")
    val candidates = banded.as("a").join(banded.as("b"),
        $"a.label" === $"b.label" && $"a.c" === $"b.c" &&
          $"a.cell" === $"b.cell" && $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("vec_a"), $"b.vec_id".as("vec_b"),
        $"a.label".as("label"))
      .distinct()
    val vecs = e.select($"vec_id", $"v")
    candidates
      .join(vecs.select($"vec_id".as("vec_a"), $"v".as("va")), "vec_a")
      .join(vecs.select($"vec_id".as("vec_b"), $"v".as("vb")), "vec_b")
      .select($"vec_a", $"vec_b", $"label",
        VectorOps.cosine($"va", $"vb").as("cos"))
      .orderBy($"cos".desc, $"vec_a".asc, $"vec_b".asc)
      .limit(20)
      .select($"vec_a", $"vec_b", $"label", round($"cos", 4).as("cosine"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> dedupExact,
    "dedup_exact_bow" -> dedupExactBow,
    "dedup_ngram_jaccard" -> dedupNgramJaccard,
    "dedup_minhash_lsh" -> dedupMinHashLsh,
    "dedup_kept" -> dedupKept,
    "dedup_simhash" -> dedupSimHash,
    "dedup_simhash_pairs" -> dedupSimHashPairs,
    "dedup_embed_cosine" -> dedupEmbedCosine,
    "dedup_embed_cosine_blocked" -> dedupEmbedCosineBlocked,
  )

  private val exactJaccardSql =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') t FROM documents),
      |sh AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    [t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t) - 1)])) s
      |  FROM toks WHERE len(t) >= 3
      |),
      |sizes AS (SELECT doc_id, count(*) n FROM sh GROUP BY doc_id),
      |common AS (
      |  SELECT a.doc_id ai, b.doc_id bi, count(*) c
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id
      |)
      |SELECT ai AS doc_a, bi AS doc_b,
      |  round(c::DOUBLE / (na.n + nb.n - c), 3) AS jaccard
      |FROM common
      |JOIN sizes na ON ai = na.doc_id
      |JOIN sizes nb ON bi = nb.doc_id
      |WHERE c::DOUBLE / (na.n + nb.n - c) >= 0.8
      |ORDER BY doc_a, doc_b""".stripMargin

  /** exactJaccardSql with the engine's MaxShingleDF prune mirrored —
    * Jaccard over the capped shingle space on both sides. */
  private val cappedJaccardSql =
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') t FROM documents),
      |sh AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    [t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t) - 1)])) s
      |  FROM toks WHERE len(t) >= 3
      |),
      |rare AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= $MaxShingleDF),
      |pr AS (SELECT sh.doc_id, sh.s FROM sh JOIN rare USING (s)),
      |sizes AS (SELECT doc_id, count(*) n FROM pr GROUP BY doc_id),
      |common AS (
      |  SELECT a.doc_id ai, b.doc_id bi, count(*) c
      |  FROM pr a JOIN pr b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id
      |)
      |SELECT ai AS doc_a, bi AS doc_b,
      |  round(c::DOUBLE / (na.n + nb.n - c), 3) AS jaccard
      |FROM common
      |JOIN sizes na ON ai = na.doc_id
      |JOIN sizes nb ON bi = nb.doc_id
      |WHERE c::DOUBLE / (na.n + nb.n - c) >= 0.8
      |ORDER BY doc_a, doc_b""".stripMargin

  /** The engine's sign-bit band cells, mirrored bit-for-bit in SQL
    * (generated from the same constants so they cannot drift). */
  private val embedBandSelect: String = (0 until EmbedBands).map { b =>
    val bits = (0 until EmbedBandBits).map(j =>
      s"((embedding[${b * EmbedBandBits + j + 1}] >= 0)::INT * ${1 << (EmbedBandBits - 1 - j)})")
      .mkString(" + ")
    s"($bits) AS b$b"
  }.mkString(", ")

  private val embedBandMatch: String =
    (0 until EmbedBands).map(b => s"a.b$b = b.b$b").mkString(" OR ")

  val oracles: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n_dups
        |FROM documents GROUP BY md5(text) ORDER BY h""".stripMargin,
    "dedup_exact_bow" ->
      """SELECT md5(array_to_string(list_sort(string_split(text, ' ')), ' ')) AS h,
        |  min(doc_id) AS keep_id, count(*) AS n_dups
        |FROM documents
        |GROUP BY md5(array_to_string(list_sort(string_split(text, ' ')), ' '))
        |ORDER BY h""".stripMargin,
    "dedup_ngram_jaccard" -> cappedJaccardSql,
    // SimHash banded search must land on the same capped-Jaccard pairs —
    // a genuine recall check on the fingerprint search path (see
    // SimHashChunks for the capture argument).
    "dedup_simhash_pairs" -> cappedJaccardSql,
    // MinHash LSH output must equal the exact pairs at these similarity
    // levels (recall ≈ 1 − 3e-4 at j = 0.8, ≈ 1 at the planted j ≥ 0.95),
    // so it shares the UNCAPPED exact-Jaccard oracle — a genuine recall
    // check, independent of the inverted-index DF cap.
    "dedup_minhash_lsh" -> exactJaccardSql,
    "dedup_kept" ->
      s"""WITH pairs AS ($cappedJaccardSql)
         |SELECT doc_id, lang, source FROM documents
         |WHERE doc_id NOT IN (SELECT doc_b FROM pairs)
         |ORDER BY doc_id""".stripMargin,
    "dedup_embed_cosine" ->
      """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
        |  round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
        |    (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
        |     sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 4) AS cosine
        |FROM embeddings a JOIN embeddings b
        |  ON a.label = b.label AND a.vec_id < b.vec_id
        |ORDER BY list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
        |    (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
        |     sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) DESC,
        |  a.vec_id ASC, b.vec_id ASC
        |LIMIT 20""".stripMargin,
    "dedup_embed_cosine_blocked" ->
      s"""WITH v AS (SELECT vec_id, label, embedding, $embedBandSelect
        |  FROM embeddings),
        |cand AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
        |    list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
        |      (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
        |       sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) AS cos
        |  FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
        |    AND ($embedBandMatch)
        |)
        |SELECT vec_a, vec_b, label, round(cos, 4) AS cosine
        |FROM cand ORDER BY cos DESC, vec_a ASC, vec_b ASC
        |LIMIT 20""".stripMargin,
    // dedup_simhash intentionally has no SQL oracle (FNV-based fingerprint
    // not expressible in DuckDB) — rows-only check + unit-suite coverage.
  )
}
