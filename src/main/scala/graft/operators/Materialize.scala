package graft.operators

import org.apache.spark.sql.DataFrame

/** Materialization point for iterative / multi-consumer frames (the CC
  * loop's per-round labels, the checkpointed pair graphs): cuts lineage
  * and pins the rows so every later consumer reads blocks instead of
  * re-running the producing plan.
  *
  * Two durability tiers, selected by the session's checkpoint dir:
  *
  *   - no checkpoint dir (default, and the local[32] test/bench
  *     config): `localCheckpoint()` — blocks live on executors, zero
  *     extra IO. On a real cluster a LOST EXECUTOR loses its blocks
  *     and kills any job still reading them — acceptable only when the
  *     whole job restarts anyway (single-node, or short interactive
  *     runs).
  *   - checkpoint dir set (`SparkContext.setCheckpointDir`, which any
  *     production submit does once against HDFS/S3): reliable
  *     `checkpoint()` — blocks are written to the fault-tolerant store
  *     and survive executor loss, the durability an hours-long 100 TB
  *     CC loop needs. The extra write is pair-count-sized here (bytes
  *     per row, NOT corpus-sized), so the premium is noise at scale.
  *
  * Both forms are eager and both preserve the plan's physical
  * partitioning in the resulting scan, so plan shapes (and the
  * exchange-elision the CC loop relies on) are identical across tiers.
  */
object Materialize {
  def frame(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()
}
