package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: time individual sub-stages of the shingle pipeline. */
object StageProbe {
  def t(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]").appName("probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val sh = graft.operators.Dedup.shingles(spark, sfDir)
    noop(sh); println("shingles     " + math.min(t(noop(sh)), t(noop(sh))))
    val shNoDistinct = graft.sources.Tables.documents(spark, sfDir)
      .repartition(32, $"doc_id")
      .select($"doc_id", split($"text", " ").as("toks"))
      .filter(size($"toks") >= 3)
      .select($"doc_id", transform(sequence(lit(0), size($"toks") - 3),
        i => concat_ws(" ", element_at($"toks", i + 1),
          element_at($"toks", i + 2), element_at($"toks", i + 3))).as("sh"))
    noop(shNoDistinct); println("no_distinct  " + math.min(t(noop(shNoDistinct)), t(noop(shNoDistinct))))
    val ex = sh.select($"doc_id", explode_outer($"sh").as("s")).filter($"s".isNotNull)
    noop(ex); println("exploded     " + math.min(t(noop(ex)), t(noop(ex))))
    val rep = ex.repartition($"s")
    noop(rep); println("repart_s     " + math.min(t(noop(rep)), t(noop(rep))))
    val selfJoin = rep.as("a").join(rep.as("b"),
      $"a.s" === $"b.s" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id", $"b.doc_id").agg(count(lit(1)))
    noop(selfJoin); println("self_join    " + math.min(t(noop(selfJoin)), t(noop(selfJoin))))
    spark.stop()
  }
}
