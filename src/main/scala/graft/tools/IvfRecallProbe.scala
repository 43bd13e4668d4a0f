package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev probe: recall@TopK of the seeded-IVF search vs brute force at
  * each nprobe — the curve behind the benched default. */
object IvfRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("ivf-recall-probe").config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val brute = graft.operators.Similarity.simTopKBrute(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    Seq(4, 6, 8, 10, 12, 14).foreach { np =>
      val t0 = System.nanoTime()
      val got = graft.operators.Similarity.simAnnIvfOn(spark, sfDir, np)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[ivf] nprobe=$np%2d recall=${(brute & got).size.toDouble / brute.size}%.3f wall=$wall%.2f s")
    }
    // the raw 8-bit ADC tier at the default and full probe
    Seq(10, 16).foreach { np =>
      val t0 = System.nanoTime()
      val got = graft.operators.Similarity.simAnnIvfPq8bOn(spark, sfDir, np)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[ivfpq8b] nprobe=$np%2d recall=${(brute & got).size.toDouble / brute.size}%.3f wall=$wall%.2f s")
    }
    // the 32-byte-code standalone tier (32 subspaces × 8-bit)
    Seq(10, 16).foreach { np =>
      val t0 = System.nanoTime()
      val got = graft.operators.Similarity
        .simAnnIvfPqAtOn(spark, sfDir, np,
          graft.operators.Similarity.Pq8Codewords,
          graft.operators.Similarity.Pq32Subspaces)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[ivfpq32x8] nprobe=$np%2d recall=${(brute & got).size.toDouble / brute.size}%.3f wall=$wall%.2f s")
    }
    // 8-bit + exact rerank at small pools (vs the 4-bit tier's 600)
    Seq(20, 40, 100).foreach { pool =>
      val t0 = System.nanoTime()
      val got = graft.operators.Similarity
        .simAnnIvfPqRerankAtK(spark, sfDir, 16, pool,
          graft.operators.Similarity.Pq8Codewords)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[ivfpq8b+rr] pool=$pool%3d recall=${(brute & got).size.toDouble / brute.size}%.3f wall=$wall%.2f s")
    }
    spark.stop()
  }
}
