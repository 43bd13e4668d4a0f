package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Temporal operators Spark lacks as built-ins, composed Spark-first.
  *
  * As-of join (point-in-time lookup): for each left row, the most recent
  * right row with key equality and right.time <= left.time. Implemented
  * with the union-marker technique: stack both sides, one window sorted
  * by (key, time, side) carrying `last(right value, ignoreNulls)` — a
  * single shuffle on the key, no range-join blowup, no per-row probe.
  * This is the standard scalable formulation (one exchange + one sort,
  * same cost class as a sort-merge join). DuckDB's native ASOF JOIN is
  * the oracle. */
object Temporal {

  /** Generic as-of join on (keyCol, timeCol): returns left rows enriched
    * with the as-of right columns (null when no prior right row).
    * `tieBreak` (one of rightCols) makes ties at equal right-time
    * deterministic: the row with the greatest tieBreak value wins. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, time: String,
      rightCols: Seq[String], tieBreak: String): DataFrame = {
    val leftTagged = left
      .withColumn("__side", lit(1))
      .select(Seq(col(key), col(time), col("__side")) ++
        left.columns.filterNot(c => c == key || c == time).map(c => col(c)) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)
    val rightTagged = right
      .withColumn("__side", lit(0))
      .select(Seq(col(key), col(time), col("__side")) ++
        left.columns.filterNot(c => c == key || c == time)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightCols.map(c => col(c).as(s"__r_$c")): _*)
    // right rows sort before left rows at equal time (side 0 < 1) —
    // matching ASOF's t_right <= t_left inclusive semantics; among right
    // rows at equal time, ascending tieBreak puts the winner last so
    // last() selects it, and both filled columns come from the same row
    val w = Window.partitionBy(col(key))
      .orderBy(col(time).asc, col("__side").asc, col(s"__r_$tieBreak").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = rightCols.foldLeft(leftTagged.unionByName(rightTagged)) {
      case (df, c) => df.withColumn(s"__r_$c",
        last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1)
      .select(Seq(col(key), col(time)) ++
        left.columns.filterNot(c => c == key || c == time).map(c => col(c)) ++
        rightCols.map(c => col(s"__r_$c").as(s"asof_$c")): _*)
  }

  /** Events enriched with each user's most recent order at event time
    * (user_id ≡ o_custkey in the synthetic schema). */
  def q17AsofEventOrder(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, sfDir)
      .select($"user_id".as("k"), $"ts".as("t"), $"event_id", $"event_type")
    val o = Tables.orders(spark, sfDir)
      .select($"o_custkey".as("k"), $"o_orderdate".as("t"), $"o_orderkey", $"o_totalprice")
    asofJoin(e, o, "k", "t", Seq("o_orderkey", "o_totalprice"), tieBreak = "o_orderkey")
      .select($"event_id", $"k".as("user_id"),
        $"asof_o_orderkey".as("last_orderkey"),
        round($"asof_o_totalprice", 2).as("last_order_price"))
      .orderBy($"event_id")
  }

  /** Analytic-function battery: lead/lag deltas, dense_rank, ntile over
    * per-user event sequences. */
  def q18Analytics(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    Tables.events(spark, sfDir)
      .withColumn("prev_value", lag($"value", 1).over(w))
      .withColumn("next_type", lead($"event_type", 1).over(w))
      .withColumn("seq", dense_rank().over(w))
      .withColumn("quartile", ntile(4).over(Window.partitionBy($"user_id")
        .orderBy($"value".asc, $"event_id".asc)))
      .filter($"seq" <= 4)
      .select($"user_id", $"seq", $"event_id",
        round($"value" - coalesce($"prev_value", lit(0.0)), 4).as("value_delta"),
        coalesce($"next_type", lit("none")).as("next_type"),
        $"quartile")
      .orderBy($"user_id", $"seq")
  }

  /** Bucketized range join — the scalable form of a time-range join:
    * instead of a nested-loop range predicate, both sides land on coarse
    * time buckets and equi-join on (key, bucket); the exact range
    * predicate then filters the bucket-matched candidates. Probe side
    * spans at most 2 buckets (bucket size = window size), so fan-out is
    * bounded at any scale. Query: for each event, how many OTHER events
    * the same user produced in the preceding hour. (The obvious
    * events×orders formulation is vacuous here — the synthetic tables'
    * time ranges don't overlap.) */
  def q25RangeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val bucketMs = 3600L * 1000 // bucket size = window size (1h)
    val e = Tables.events(spark, sfDir)
      .select($"event_id", $"user_id", unix_millis($"ts").as("t_ms"))
    // array_distinct collapses the duplicate bucket (t_ms < bucketMs →
    // both divs give 0) per-row, with no shuffle — a full .distinct()
    // here would add an exchange just for first-bucket events
    val probe = e.select($"event_id", $"user_id", $"t_ms",
      explode(array_distinct(array(expr(s"t_ms div $bucketMs"),
        expr(s"(t_ms - $bucketMs) div $bucketMs")))).as("bucket"))
    val build = e.select($"event_id".as("other_id"), $"user_id".as("uid"),
      $"t_ms".as("other_ms"), expr(s"t_ms div $bucketMs").as("bucket"))
    probe.join(build, $"user_id" === $"uid" && probe("bucket") === build("bucket"))
      .filter($"other_id" =!= $"event_id" &&
        $"other_ms" > $"t_ms" - bucketMs && $"other_ms" <= $"t_ms")
      .groupBy($"event_id")
      .agg(count(lit(1)).as("n_recent_events"))
      .orderBy($"event_id")
  }

  /** Rolling 1-hour window aggregate via a native RANGE frame — the
    * sliding-metric query (per event: that user's event count and
    * value total over the trailing hour) expressed as ONE window over
    * one (user_id) exchange, no self-join: the frame boundary is an
    * ORDER-BY-value range, so Spark's WindowExec slides two pointers
    * over each sorted partition — O(partition) total work regardless
    * of frame width, where the q25 bucketized-join form pays candidate
    * fan-in. RANGE (not ROWS) also makes tied timestamps
    * deterministic: peers are always in-frame on both engines.
    *
    * Parity: the summed value is integer CENTS — floor(value·100 + .5)
    * as LONG on both engines (floor, not round: Spark HALF_UP vs
    * DuckDB banker's diverge at exact midpoints) — so window sums are
    * exact integer arithmetic, immune to the add/retract float drift a
    * sliding double-sum accumulates. */
  def q29RollingWindow(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    rollingWindowOn(Tables.events(spark, sfDir)
      .select($"event_id", $"user_id", unix_millis($"ts").as("t_ms"),
        floor($"value" * 100 + 0.5).cast("long").as("cents")))
  }

  /** The RANGE-frame aggregation over any (event_id, user_id, t_ms,
    * cents) frame (spec entry point: hand-computable feeds). */
  private[graft] def rollingWindowOn(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val hourMs = 3600L * 1000
    val w = Window.partitionBy($"user_id").orderBy($"t_ms")
      .rangeBetween(-hourMs, 0)
    e.withColumn("n_1h", count(lit(1)).over(w))
      .withColumn("cents_1h", sum($"cents").over(w))
      .select($"event_id", $"user_id", $"t_ms", $"n_1h", $"cents_1h")
      .orderBy($"event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q17_asof_event_order" -> q17AsofEventOrder,
    "q18_analytics" -> q18Analytics,
    "q25_range_join" -> q25RangeJoin,
    "q29_rolling_window" -> q29RollingWindow,
  )

  val oracles: Map[String, String] = Map(
    // correlated-subquery form instead of native ASOF JOIN: the data has
    // duplicate (custkey, orderdate) pairs, and ASOF's tie choice is
    // unspecified — this form pins the same max-orderkey tiebreak as the
    // engine's window formulation
    "q17_asof_event_order" ->
      """SELECT e.event_id, e.user_id,
        |  (SELECT o.o_orderkey FROM orders o
        |   WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        |   ORDER BY o.o_orderdate DESC, o.o_orderkey DESC LIMIT 1) AS last_orderkey,
        |  (SELECT round(o.o_totalprice, 2) FROM orders o
        |   WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        |   ORDER BY o.o_orderdate DESC, o.o_orderkey DESC LIMIT 1) AS last_order_price
        |FROM events e
        |ORDER BY e.event_id""".stripMargin,
    "q25_range_join" ->
      """SELECT e.event_id, count(*) AS n_recent_events
        |FROM events e JOIN events o ON e.user_id = o.user_id
        |  AND o.event_id <> e.event_id
        |  AND epoch_ms(o.ts) > epoch_ms(e.ts) - 3600000
        |  AND epoch_ms(o.ts) <= epoch_ms(e.ts)
        |GROUP BY e.event_id ORDER BY e.event_id""".stripMargin,
    // RANGE frame over epoch-ms with integer-cent sums — every windowed
    // value an exact integer on both engines (see the engine scaladoc)
    "q29_rolling_window" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_ms(ts) AS t_ms,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events
        |)
        |SELECT event_id, user_id, t_ms,
        |  count(*) OVER w AS n_1h,
        |  CAST(sum(cents) OVER w AS BIGINT) AS cents_1h
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY t_ms
        |  RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "q18_analytics" ->
      """SELECT user_id, seq, event_id,
        |  round(value - coalesce(prev_value, 0.0), 4) AS value_delta,
        |  coalesce(next_type, 'none') AS next_type, quartile
        |FROM (
        |  SELECT user_id, event_id, value, event_type, ts,
        |    lag(value, 1) OVER w AS prev_value,
        |    lead(event_type, 1) OVER w AS next_type,
        |    dense_rank() OVER w AS seq,
        |    ntile(4) OVER (PARTITION BY user_id ORDER BY value ASC, event_id ASC) AS quartile
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        |) t WHERE seq <= 4
        |ORDER BY user_id, seq""".stripMargin,
  )
}
