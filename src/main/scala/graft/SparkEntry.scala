package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import graft.streaming.Streaming

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` are assembled from the per-domain operator
  * modules; keys are unique across modules (asserted at class-init by the
  * test suite). Every oracle key must exist in `queries`.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's own query — tokenize/normalize/count — through the
    * fused byte-exact pipeline. */
  def entry(spark: SparkSession): DataFrame =
    WordCount.wcWordCounts(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ WordCount.queries ++ Dedup.queries ++
      Similarity.queries ++ TextAnalysis.queries ++ Multimodal.queries ++
      Streaming.queries ++ Temporal.queries ++ Sessions.queries ++
      Curation.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver records a weaker
    * rows-only check (used for ops whose exact semantics aren't
    * SQL-expressible, e.g. byte-exact normalize, LSH bucketing). */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ WordCount.oracles ++ Dedup.oracles ++
      Similarity.oracles ++ TextAnalysis.oracles ++ Multimodal.oracles ++
      Streaming.oracles ++ Temporal.oracles ++ Sessions.oracles ++
      Curation.oracles
}
