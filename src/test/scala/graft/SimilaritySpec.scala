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

  test("IVF with nprobe = NumCentroids is exactly brute force (full probe)") {
    // probing every cell makes the candidate set the whole corpus minus
    // the query itself — the IVF plumbing (assignment, probe, cell join,
    // re-rank) must then reproduce the brute-force top-k bit-for-bit
    val brute = Similarity.simTopKBrute(spark, sf).collect().map(_.toSeq).toSeq
    val full = Similarity.simAnnIvfOn(spark, sf, Similarity.NumCentroids)
      .collect().map(_.toSeq).toSeq
    assert(full === brute)
  }

  test("IVF recall@5 vs brute force is usable on weakly-similar data") {
    val brute = topkMap(Similarity.simTopKBrute(spark, sf))
    val ivf = topkMap(Similarity.simAnnIvf(spark, sf))
    val recalls = brute.map { case (q, trueTop) =>
      val got = ivf.getOrElse(q, Nil).toSet
      trueTop.count(got.contains).toDouble / trueTop.size
    }
    val mean = recalls.sum / recalls.size
    info(s"IVF mean recall@5 = $mean")
    // seeded (unfitted) centroids over weakly-similar data probing the
    // NProbe = 10 default (r15 — recall 0.88 at sf0.1): the floor pins
    // the production ≥ 0.8 bar; the full-probe test above pins "correct"
    assert(mean >= 0.8, s"IVF mean recall@5 = $mean below floor")
  }

  test("k-means IVF with nprobe = NumCentroids is exactly brute force (full probe)") {
    // fitted or not, probing every cell must reproduce brute force —
    // the search plumbing is independent of centroid quality
    val brute = Similarity.simTopKBrute(spark, sf).collect().map(_.toSeq).toSeq
    val full = Similarity.simAnnIvfKmeansOn(spark, sf,
        Similarity.NumCentroids, Similarity.KMeansIters)
      .collect().map(_.toSeq).toSeq
    assert(full === brute)
  }

  test("seeded and k-means IVF recall@5 each clear their measured floor") {
    val brute = topkMap(Similarity.simTopKBrute(spark, sf))
    def meanRecall(ann: Map[Long, Seq[Long]]): Double = {
      val rs = brute.map { case (q, trueTop) =>
        val got = ann.getOrElse(q, Nil).toSet
        trueTop.count(got.contains).toDouble / trueTop.size
      }
      rs.sum / rs.size
    }
    val seeded = meanRecall(topkMap(Similarity.simAnnIvf(spark, sf)))
    val fitted = meanRecall(topkMap(Similarity.simAnnIvfKmeans(spark, sf)))
    // info-only comparison: "fitted >= seeded" is NOT a guaranteed
    // property of Lloyd iterations (it held on this data but any seed/
    // data/iteration change could flake it). The SEEDED floor (0.8) is
    // pinned by the nprobe=10 measurement on deterministic centroids;
    // fitted centroids can legitimately distribute cells differently,
    // so the fitted variant gets a looser 0.6 floor rather than riding
    // an 0.08 margin on someone else's measurement (ADVICE r15).
    info(s"IVF recall@5: seeded = $seeded, k-means = $fitted")
    assert(seeded >= 0.8, s"seeded IVF mean recall@5 = $seeded below floor")
    assert(fitted >= 0.6, s"k-means IVF mean recall@5 = $fitted below floor")
  }

  test("IVF-PQ candidate pool ≡ seeded IVF's (same quantizer, same probes)") {
    // the composition claim: IVFPQ changes the SCORING inside probed
    // cells (residual ADC vs exact cosine), never the candidate
    // routing. Top-k outputs can't pin this (both always emit TopK rows
    // per query regardless of routing, and the two scorings rank the
    // pool differently), so compare the PRE-scoring candidate pairs
    // themselves: probes × cell-membership at the production nprobe,
    // where a routing divergence (e.g. the materialized residual frame
    // drifting from the direct assignment) would change the pair set.
    val ivf = Similarity.ivfCandidatePairsOn(spark, sf, Similarity.NProbe)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.ivfPqCandidatePairsOn(spark, sf, Similarity.NProbe)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf.nonEmpty)
    // strictly-reduced probe sanity: the pool at nprobe=1 must be a
    // PROPER subset — proves nprobe actually narrows routing (a pool
    // accessor that ignored nprobe would pass the equality alone)
    val ivf1 = Similarity.ivfCandidatePairsOn(spark, sf, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf1.subsetOf(ivf) && ivf1.size < ivf.size)
    assert(ivf === pq)
  }

  test("IVF-PQ recall@5 vs exact-DOT truth: ADC comparable to raw PQ at equal pools") {
    // ADC scores approximate the DOT product (both PQ queries rank by
    // score_q ≈ q·x̂), so the right recall reference is the exact-dot
    // top-k, not the cosine brute force — on unnormalized data the two
    // orderings differ by the candidates' norms.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val e = graft.sources.Tables.embeddings(spark, sf)
      .select($"vec_id", graft.functions.VectorOps.toDouble($"embedding").as("v"))
    val q = e.filter($"vec_id" < Similarity.NumQueries)
      .select($"vec_id".as("query_id"), $"v".as("qv"))
    val w = Window.partitionBy($"query_id").orderBy($"d".desc, $"vec_id".asc)
    val dotTruth = topkMap(
      e.join(broadcast(q), $"vec_id" =!= $"query_id")
        .select($"query_id", $"vec_id",
          graft.functions.VectorOps.dot($"qv", $"v").as("d"))
        .withColumn("rk", row_number().over(w)).filter($"rk" <= Similarity.TopK)
        .select($"query_id", $"rk", $"vec_id"))
    def meanRecall(ann: Map[Long, Seq[Long]]): Double = {
      val rs = dotTruth.map { case (qid, top) =>
        top.count(ann.getOrElse(qid, Nil).toSet).toDouble / top.size
      }
      rs.sum / rs.size
    }
    val ivfpq = topkMap(Similarity.simAnnIvfPq(spark, sf))
    assert(ivfpq.size === Similarity.NumQueries)
    ivfpq.values.foreach(t => assert(t.size === Similarity.TopK))
    val pqRecall = meanRecall(topkMap(Similarity.simAnnPq(spark, sf)))
    // full probe isolates QUANTIZATION quality: both paths then rank
    // the whole corpus, so the only difference is residual codes +
    // coarse term vs raw-vector codes
    val fullRecall = meanRecall(topkMap(
      Similarity.simAnnIvfPqOn(spark, sf, Similarity.NumCentroids)))
    val ivfpqRecall = meanRecall(ivfpq)
    info(s"vs exact-dot truth: raw-vector PQ recall@5 = $pqRecall, " +
      s"IVF-PQ full-probe = $fullRecall, IVF-PQ nprobe=4 = $ivfpqRecall")
    // compared at equal candidate pools, the residual decomposition
    // (exact coarse term + fitted residual codes) must stay in the
    // same quality class as raw-vector codes of the same 8×16 budget.
    // On UNIFORM data it does not win: the coarse cells carry no
    // cluster structure, so residuals keep most of each vector's
    // energy and the decomposition buys nothing (measured: 0.10 vs
    // 0.14 here) — IVFADC's advertised gains (Jégou et al. 2011 §V)
    // come from clustered corpora, where within-cell spread is small.
    // The spec pins comparable-not-collapsed; the candidate-set spec
    // above pins the routing, the oracle pins exact scoring.
    assert(fullRecall >= pqRecall / 2,
      s"residual ADC ($fullRecall) collapsed vs raw-vector ADC ($pqRecall)")
    // the composed index additionally pays the 4/16-cell probe — a
    // loose usable-floor pin on worst-case uniform data
    assert(ivfpqRecall >= 0.05, s"IVF-PQ recall@5 = $ivfpqRecall below floor")

    // REFINE: the exact re-rank can only help — any dot-truth member
    // that reaches the ADC pool survives an exact-score re-rank (if 5
    // pool vectors beat it exactly, they beat it in the full exact
    // ranking too, contradicting its top-5 membership), and the pool ⊇
    // the plain ADC top-k. So refine recall ≥ plain recall is a
    // THEOREM given shared routing, not a tuning observation.
    val rerankRecall = meanRecall(topkMap(Similarity.simAnnIvfPqRerank(spark, sf)))
    info(s"IVF-PQ + exact re-rank recall@5 = $rerankRecall")
    assert(rerankRecall >= ivfpqRecall,
      s"refine ($rerankRecall) below plain ADC ($ivfpqRecall) — re-rank broke routing")
    // the r14 production floor: full probe + the 600-pool exact re-rank
    // must deliver ≥ 0.8 (measured 0.86 at sf0.1; here the pool covers
    // the corpus, so anything below is a routing/scoring bug, not a
    // quantization artifact)
    assert(rerankRecall >= 0.8,
      s"refine recall@5 = $rerankRecall below the 0.8 production floor")
  }

  test("incremental IVF-PQ: sliced delta encode ≡ whole-corpus encode (frozen models)") {
    // encoding is a deterministic per-row function of (v, frozen
    // quantizer, frozen codebooks), so encoding prior and delta as
    // separate slices and unioning must equal encoding everything at
    // once — the maintenance-invisibility claim for the compressed
    // index (the sim_ann_ivf_incremental argument applied to codes)
    val sliced = Similarity.simAnnIvfPqIncrementalOn(spark, sf, sliced = true)
      .collect().map(_.toSeq).toSeq
    val whole = Similarity.simAnnIvfPqIncrementalOn(spark, sf, sliced = false)
      .collect().map(_.toSeq).toSeq
    assert(sliced === whole)
    assert(sliced.nonEmpty)
  }

  test("ANN result never contains a self-match or a rank outside 1..k") {
    val rows = Similarity.simAnnLsh(spark, sf)
      .select("query_id", "rk", "vec_id").collect()
    assert(rows.forall(r => r.getLong(2) != r.getLong(0)))
    assert(rows.forall(r => r.getInt(1) >= 1 && r.getInt(1) <= Similarity.TopK))
  }

  test("incremental IVF ≡ full IVF (frozen-quantizer delta append is output-invisible)") {
    // assignment is a deterministic per-row function of (v, centroids),
    // so assigning prior and delta slices separately and unioning must
    // reproduce the whole-corpus assignment — and therefore the search
    // output — row for row. This is the claim that lets the query share
    // sim_ann_ivf's oracle.
    val full = Similarity.simAnnIvf(spark, sf).collect().map(_.toSeq).toSeq
    val inc = Similarity.simAnnIvfIncremental(spark, sf).collect().map(_.toSeq).toSeq
    assert(inc === full)
  }

  test("incremental IVF searches against a WRITTEN prior-index artifact unchanged") {
    // the production shape end-to-end: the prior corpus's (vec_id, v,
    // cell) assignment index is written once, the delta is assigned
    // fresh against the frozen quantizer, and search over artifact ∪
    // delta equals the full from-scratch search — proving the index
    // survives a parquet round-trip (schema, nullability), not just an
    // in-plan union of two filters. (At scale the artifact would be
    // laid out BY cell — bucketed or partitioned — so an append is
    // partition-local and the probe join prunes unprobed cells; written
    // plain here because a cell-partitioned read turns the broadcast
    // probe join into a dynamic-partition-pruning subquery whose
    // InSubqueryExec Spark won't prepare under this plan shape, an
    // execution detail orthogonal to what this spec pins.)
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup
    val e = Similarity.embeddings(spark, sf)
    val cents = Similarity.seedCentroids(e)
    val scoreArr = array(cents.map(cv =>
      graft.functions.VectorOps.cosine(col("v"), typedlit(cv))): _*)
    val dir = java.nio.file.Files.createTempDirectory("ivf_index_").toString
    Similarity.assignedCells(
        e.filter(pmod(col("vec_id"), lit(Dedup.SnapshotMod)) < Dedup.SnapshotNewMin),
        scoreArr)
      .write.parquet(s"$dir/prior_index")
    val prior = spark.read.parquet(s"$dir/prior_index")
      .select(col("vec_id"), col("v"), col("cell"))
    val delta = Similarity.assignedCells(
      e.filter(pmod(col("vec_id"), lit(Dedup.SnapshotMod)) >= Dedup.SnapshotNewMin),
      scoreArr)
    val got = Similarity.ivfSearchOverAssigned(
        e, prior.unionByName(delta), scoreArr, Similarity.NProbe)
      .collect().map(_.toSeq).toSeq
    val full = Similarity.simAnnIvf(spark, sf).collect().map(_.toSeq).toSeq
    assert(got === full)
  }

  test("stored IVF-PQ index round-trips: build run ≡ read-back run ≡ inline") {
    // the FAISS-add() steady state: first call fits the frozen models +
    // writes (models, prior codes) artifacts, second call runs NO Lloyd
    // fit — both must equal the inline incremental query exactly, and
    // the codes artifact is cell-partitioned on disk
    val dir = java.nio.file.Files.createTempDirectory("graft_idx_").toString
    val prev = spark.conf.getOption(graft.sources.IndexStore.DirKey)
    try {
      spark.conf.set(graft.sources.IndexStore.DirKey, dir)
      val inline = Similarity.simAnnIvfPqIncremental(spark, sf)
        .collect().map(_.toSeq).toSeq
      val buildRun = Similarity.simAnnIvfPqStored(spark, sf)
        .collect().map(_.toSeq).toSeq
      // the artifact landed under <root>/ivfpq_codes/<corpus-fp>-<params-fp>
      // (params-keying itself is IndexStoreSpec's contract)
      val codesDir = new java.io.File(s"$dir/ivfpq_codes").listFiles()
        .find(v => new java.io.File(v, "_SUCCESS").exists())
        .getOrElse(fail("no completed ivfpq_codes artifact"))
      assert(codesDir.listFiles().exists(_.getName.startsWith("cell=")))
      val readRun = Similarity.simAnnIvfPqStored(spark, sf)
        .collect().map(_.toSeq).toSeq
      assert(inline.nonEmpty)
      assert(buildRun === inline)
      assert(readRun === inline)
    } finally prev match {
      case Some(v) => spark.conf.set(graft.sources.IndexStore.DirKey, v)
      case None => spark.conf.unset(graft.sources.IndexStore.DirKey)
    }
  }

  test("hyperplanes are deterministic across invocations") {
    assert(Similarity.hyperplane(3, 2) === Similarity.hyperplane(3, 2))
    assert(Similarity.hyperplane(3, 2) !== Similarity.hyperplane(3, 3))
  }

  test("LshSignatures ≡ independent column formulation of the same planes") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // independent reimplementation (FNV formula spelled out here, NOT
    // delegated to LshImpl) — pins the expression's baked-in constants
    def planeComponent(t: Int, b: Int, d: Int): Double = {
      val bytes = s"graft-lsh-$t-$b-$d".getBytes("UTF-8")
      var h = 0xcbf29ce484222325L
      bytes.foreach { byte => h ^= (byte & 0xffL); h *= 0x100000001b3L }
      (java.lang.Math.floorMod(h, 2000000L).toDouble / 1000000.0) - 1.0
    }
    def columnSignature(t: Int): org.apache.spark.sql.Column =
      (0 until Similarity.LshBits).map { b =>
        val plane = (0 until 64).map(d => planeComponent(t, b, d))
        val proj = aggregate(
          zip_with($"v", typedlit(plane), (x, r) => x * r),
          lit(0.0), (acc, x) => acc + x)
        when(proj >= 0, lit(1L << b)).otherwise(lit(0L))
      }.reduce(_ + _)
    val e = graft.sources.Tables.embeddings(spark, sf)
      .select($"vec_id",
        graft.functions.VectorOps.toDouble($"embedding").as("v"))
      .limit(50)
    val viaExpr = e.select($"vec_id", graft.functions.LshSignatures($"v").as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    (0 until Similarity.LshTables).foreach { t =>
      val viaCols = e.select($"vec_id", columnSignature(t).as("s"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      viaCols.foreach { case (id, sig) =>
        assert(viaExpr(id)(t) === sig, s"table $t vec $id")
      }
    }
  }

  test("sampled label stats ≡ exact form when the cap exceeds every label") {
    // differential pin: the ONLY difference between the benched sampled
    // variant and the exact baseline is the per-label rank filter — with
    // the cap above the largest label the two plans must agree row-for-row
    val exact = Similarity.simLabelStats(spark, sf).collect().map(_.toSeq)
    val wide = Similarity.simLabelStatsSampledOn(spark, sf, Int.MaxValue)
      .collect().map(_.toSeq)
    assert(wide.toSeq === exact.toSeq)
  }

  test("sampled label stats bounds pairs per label by C(cap, 2)") {
    val cap = Similarity.SampleCap
    val rows = Similarity.simLabelStatsSampled(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_pairs")
      assert(n <= cap.toLong * (cap - 1) / 2,
        s"label ${r.get(0)}: $n pairs exceeds the sample bound")
    }
  }

  test("sign-threshold margin dwarfs summation-order rounding error") {
    // The DuckDB oracle for sim_ann_lsh recomputes v·r with
    // list_dot_product, whose summation order is not guaranteed to match
    // the engine's sequential loop. The sign compare is still exact
    // because the smallest |projection| across every (vector, table, bit)
    // is ~9 orders of magnitude above the worst-case reassociation error
    // of a 64-term double sum (~64·eps·Σ|terms| ≈ 1e-13).
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val e = graft.sources.Tables.embeddings(spark, sf)
      .select(graft.functions.VectorOps.toDouble($"embedding").as("v"))
    val projCols = (0 until Similarity.LshTables).flatMap { t =>
      (0 until Similarity.LshBits).map { b =>
        val plane = (0 until 64).map(d => graft.functions.LshImpl.component(t, b, d))
        abs(aggregate(zip_with($"v", typedlit(plane), (x, r) => x * r),
          lit(0.0), (acc, x) => acc + x))
      }
    }
    val minAbs = e.select(least(projCols: _*).as("m")).agg(min($"m")).head.getDouble(0)
    info(s"min |proj| = $minAbs")
    assert(minAbs > 1e-7, s"projection margin $minAbs too small for " +
      "summation-order-robust sign parity with the oracle")
  }

  test("SemDeDup keeps the lowest-centroid-similarity member of a duplicate group") {
    import spark.implicits._
    def axis(d: Int): Seq[Double] = Seq.tabulate(64)(i => if (i == d) 1.0 else 0.0)
    // seeds (ids 10..25) sit on axes e_0..e_15, so the fitted cells are
    // the axes; the planted duplicate group in cell 3 is {13 (= e_3),
    // 26 (= e_3 again), 27 (tilted toward e_4)} — the cell centroid
    // leans toward e_3, so 13/26 are the near-center (redundant)
    // members and 27 the farthest-from-centroid one the paper keeps
    val rows: Seq[(Long, Seq[Double])] =
      (0 until 10).map(i => (i.toLong, axis(20 + i))) ++
        (0 until 16).map(i => ((10 + i).toLong, axis(i))) ++
        Seq(
          (26L, axis(3)),
          (27L, Seq.tabulate(64)(i =>
            if (i == 3) 0.99 else if (i == 4) 0.1 else 0.0)),
          (28L, axis(30)))
    val e = rows.toDF("vec_id", "v")
    val kept = Similarity.dedupSemanticOn(e, 950000000000L)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(27L), "farthest-from-centroid member must survive")
    assert(kept === (0 until 29).map(_.toLong).toSet -- Set(13L, 26L),
      "exactly the two near-center copies are dropped")
  }

  test("PQ codebook fit bites: fitted codewords move off their seed slices") {
    // the distributed per-subspace Lloyd fit (round 11) must actually
    // refit — if every codeword came back identical to its seed slice
    // the executor-side aggregation would be dead plumbing and
    // sim_ann_pq would silently degrade to the old seeded search
    val e = Similarity.embeddings(spark, sf)
    val seeds = Similarity.seedCentroids(e)
    val seeded = (0 until Similarity.PqSubspaces).map(m =>
      seeds.map(_.slice(m * Similarity.PqSubDim, (m + 1) * Similarity.PqSubDim)))
    val fitted = Similarity.fitPqCodebooks(e, seeds, Similarity.KMeansIters)
    assert(fitted.size === Similarity.PqSubspaces)
    assert(fitted.forall(_.forall(_.size === Similarity.PqSubDim)))
    assert(fitted != seeded, "fit must move at least one codeword")
    // determinism: same fit twice, bit-identical (the oracle's premise)
    val again = Similarity.fitPqCodebooks(e, seeds, Similarity.KMeansIters)
    assert(again === fitted)
  }

  test("LshSignatures null-propagates on wrong dims and null elements") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq(
      (1L, Seq.fill(64)(Option(0.5))),
      (2L, Seq.fill(63)(Option(0.5))),                       // wrong dims
      (3L, Option(0.5) +: Seq.fill(62)(Option(0.5)) :+ None) // null element
    ).toDF("id", "v")
    val got = df.select($"id", graft.functions.LshSignatures($"v").as("s"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(1L).isDefined)
    assert(got(2L).isEmpty)
    assert(got(3L).isEmpty)
  }

  test("SQ8 recall@5 vs exact-dot truth: 8-bit reconstruction barely loses") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorOps
    val e = Similarity.embeddings(spark, sf)
    val q = e.filter($"vec_id" < Similarity.NumQueries)
      .select($"vec_id".as("query_id"), $"v".as("qv"))
    val w = Window.partitionBy($"query_id").orderBy($"d".desc, $"vec_id".asc)
    val truth = topkMap(
      e.join(broadcast(q), $"vec_id" =!= $"query_id")
        .select($"query_id", $"vec_id", VectorOps.dot($"qv", $"v").as("d"))
        .withColumn("rk", row_number().over(w)).filter($"rk" <= Similarity.TopK)
        .select($"query_id", $"rk", $"vec_id"))
    val sq8 = topkMap(Similarity.simAnnSq8(spark, sf))
    val rs = truth.map { case (qid, top) =>
      top.count(sq8.getOrElse(qid, Nil).toSet).toDouble / top.size
    }
    val recall = rs.sum / rs.size
    info(s"SQ8 recall@5 vs exact dot = $recall")
    // 8-bit per-dim quantization keeps ~99% of the signal on this data;
    // the floor is far above PQ's (~0.14) because SQ8 stores 64 codes
    // per vector where PQ stores 8 — the memory/recall trade both
    // artifacts exist to span
    assert(recall >= 0.7, s"SQ8 recall@5 = $recall below floor")
  }

  test("native dot product ≡ the HOF fold, bit-for-bit, on every corpus pair") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.VectorOps
    // the round-12 swap's whole claim: identical IEEE sequence. Compare
    // raw doubles with ===, no tolerance — a one-ulp drift here flips
    // IVF cells (see simAnnIvfOn's BIT-PARITY note), so the test must
    // be exact. Query block × corpus = every pair shape the ANN family
    // evaluates.
    val e = Similarity.embeddings(spark, sf)
    val q = e.filter($"vec_id" < Similarity.NumQueries)
      .select($"vec_id".as("qid"), $"v".as("qv"))
    val both = e.join(broadcast(q), $"vec_id" =!= $"qid")
      .select(
        VectorOps.dot($"qv", $"v").as("native"),
        VectorOps.dotUnfused($"qv", $"v").as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
    // the fused-slice literal form against its unfused composition
    val cv = Similarity.seedCentroids(e).head
    val lits = e.select(
        VectorOps.dotLit($"v", cv.slice(8, 16), 8).as("native"),
        VectorOps.dotUnfused(slice($"v", 9, 8), typedlit(cv.slice(8, 16))).as("hof"))
      .collect()
    lits.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
    // edge cases: empty ≡ 0.0 on both; a length MISMATCH is null on
    // both (zip_with pads the shorter array with nulls — the native
    // form preserves that contract rather than silently truncating)
    val edge = Seq((Seq.empty[Double], Seq.empty[Double]),
      (Seq(1.5, 2.5), Seq(3.5))).toDF("a", "b")
    val eg = edge.select(VectorOps.dot($"a", $"b"), VectorOps.dotUnfused($"a", $"b"))
      .collect()
    eg.foreach(r => assert(Option(r.get(0)) === Option(r.get(1))))
    assert(eg(0).getDouble(0) === 0.0 && eg(1).isNullAt(0))
  }
}
