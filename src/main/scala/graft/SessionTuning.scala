package graft

import org.apache.spark.sql.SparkSession

/** Session-level I/O latency configuration shared by every graft main
  * (Bench, Verify, Smoke, Scratch, BenchStream, tools) — the r21
  * optimization round's fix for the measured per-shuffle fixed cost.
  *
  * Measured on the bench host (32-core local mode, warm JVM, 300-iter
  * loop of a tiny 32-map × 32-reduce shuffle + noop sink,
  * `graft.tools.ShuffleLoop`):
  *
  *   default                                      0.363 s/shuffle
  *   spark.local.dir=tmpfs                        0.173 s/shuffle
  *   spark.file.transferTo=false                  0.214 s/shuffle
  *   BOTH                                         0.072 s/shuffle  (5.0×)
  *
  * Mechanism, not magic (guide §2.1/§6 — know where the time goes):
  *
  *   - `spark.file.transferTo=false`: the bypass-merge shuffle writer
  *     concatenates its per-reduce-partition files with
  *     `FileChannel.transferTo`, whose file→file path in the JDK maps
  *     and unmaps the source region PER SEGMENT (`FileChannelImpl.
  *     transferToTrustedChannel` → `unmap0` — jstack'd hot during the
  *     loop). Every `munmap` takes the process-wide mmap lock and
  *     broadcasts TLB-shootdown IPIs to all 32 cores, so concurrent map
  *     tasks serialize against each other — a cost that scales with
  *     cores × segments, not bytes. The streamed copy moves the same
  *     bytes through a buffer with zero mmap traffic. At this engine's
  *     shuffle sizes (the bypass writer only handles ≤ 200-partition
  *     shuffles) the streamed copy is never measurably slower; hosts
  *     that want zero-copy back can override via
  *     SPARK_GRAFT_TRANSFERTO=true.
  *
  *   - `spark.local.dir` on tmpfs: shuffle/spill files of this
  *     workload are KB–MB sized and read back milliseconds later;
  *     putting them on the root disk pays file-create + write latency
  *     per map task per stage. tmpfs turns that into memory writes.
  *     Scale posture: this is MACHINE configuration, not plan shape —
  *     on YARN/K8s the cluster manager overrides local dirs with the
  *     container's NVMe volumes and this default is inert; in local
  *     mode the default only engages when /dev/shm exists and is
  *     writable, and SPARK_GRAFT_LOCAL_DIR overrides it (set it to a
  *     disk path when shuffle bytes could approach RAM).
  *
  * Neither knob changes any query result: both govern how shuffle
  * bytes are copied/stored between stages. The driver's bench runs the
  * same queries, same scale, same methodology — just without paying an
  * OS pathology per stage boundary.
  */
object SessionTuning {
  /** Apply the low-latency shuffle I/O configs to a session builder.
    * Env overrides: SPARK_GRAFT_LOCAL_DIR (shuffle dir; "default"
    * leaves Spark's), SPARK_GRAFT_TRANSFERTO ("true" restores the NIO
    * transferTo copy path). */
  def tuned(b: SparkSession.Builder): SparkSession.Builder = {
    val transferTo = sys.env.getOrElse("SPARK_GRAFT_TRANSFERTO", "false")
    b.config("spark.file.transferTo", transferTo)
    localDir.foreach(d => b.config("spark.local.dir", d))
    // AQE sizes stages by BYTES; this engine's text stages are regex-
    // CPU-dense at tiny byte sizes, and the bench corpus is a single-
    // row-group file (scans are structurally one task), so the two
    // byte-blind AQE demotions measurably serialize CPU work (r21,
    // full-battery A/B on a quiet host, 106 queries):
    //   - the LOCAL shuffle reader rewrites an explicit doc_id spread
    //     feeding a broadcast join into map-local reads — 1 map task ⇒
    //     1 reduce task, 31 cores idle through the redact stack
    //     (battery 97.1 → 89.8 s with it off);
    //   - partition coalescing's 1 MB floor packs a CPU-dense 4 MB
    //     frame into 4 tasks (89.8 → 84.3 s with a 16 KB floor —
    //     dedup_simhash_pairs 1.59 → 0.97 s, dedup_ngram_jaccard
    //     1.13 → 0.86 s).
    // Both knobs only bind when post-shuffle partitions are tiny; at
    // cluster scale partitions sit at the advisory size and neither
    // engages. Env-overridable for hosts that want the stock behavior.
    b.config("spark.sql.adaptive.localShuffleReader.enabled",
      sys.env.getOrElse("SPARK_GRAFT_LOCAL_SHUFFLE_READER", "false"))
    b.config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
      sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION_SIZE", "16k"))
    // experiment passthrough (dev A/B runs): SPARK_GRAFT_CONF_EXTRA="k=v;k=v"
    applyExtra(b, "SPARK_GRAFT_CONF_EXTRA")
    b
  }

  /** Parse an env var of the form "k=v;k=v" into session configs,
    * failing with a message that NAMES the variable on a malformed
    * entry (ADVICE r21: the bare `val Array(k, v) = …` pattern threw an
    * opaque MatchError). Shared by Bench/Verify (via [[tuned]]) and the
    * dev probes (SCRATCH_EXTRA / PROBE_EXTRA). */
  def applyExtra(b: SparkSession.Builder, envVar: String): Unit =
    sys.env.get(envVar).foreach(_.split(";").filter(_.nonEmpty).foreach { kv =>
      val i = kv.indexOf('=')
      require(i > 0, s"$envVar: malformed entry '$kv' (expected key=value)")
      b.config(kv.substring(0, i), kv.substring(i + 1))
    })

  /** Require this much free tmpfs headroom before defaulting shuffle
    * files onto /dev/shm (ADVICE r21: an unconditional tmpfs default
    * could let a large shuffle exhaust RAM mid-job — and a killed JVM
    * leaves its files resident at the shared path). 16 GiB is ~3 orders
    * of magnitude above this engine's measured per-query shuffle bytes
    * at sf0.1 (KB–MB), so the default engages on the bench hosts
    * (126 GiB free) and stays off on small-tmpfs machines, where
    * Spark's disk default is the safe choice. SPARK_GRAFT_LOCAL_DIR
    * still overrides in both directions. */
  private final val TmpfsMinFreeBytes: Long = 16L << 30

  private def localDir: Option[String] =
    sys.env.get("SPARK_GRAFT_LOCAL_DIR") match {
      case Some("default") => None
      case Some(d) => Some(d)
      case None =>
        val shm = new java.io.File("/dev/shm")
        if (shm.isDirectory && shm.canWrite &&
            shm.getUsableSpace >= TmpfsMinFreeBytes)
          Some("/dev/shm/graft-spark-local")
        else None
    }
}
