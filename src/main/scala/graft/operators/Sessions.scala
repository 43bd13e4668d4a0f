package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Sessionization — the classic event-pipeline operator: a new session
  * starts when the gap to the previous event of the same user exceeds
  * the threshold. Pure window formulation (lag → boundary flag →
  * running sum = session id), one shuffle on user_id; identical SQL
  * runs in DuckDB as the oracle. The streaming analogue
  * (`Streaming.streamSessions`, per-user keyed state) checks against
  * this same SQL. */
object Sessions {

  final val GapMinutes = 30

  def q19Sessions(spark: SparkSession, sfDir: String): DataFrame =
    sessionsOn(Tables.events(spark, sfDir))

  /** The window formulation on any (user_id, event_id, ts) frame —
    * spec entry point (the buffered streaming fold compares against it
    * on plantable out-of-order feeds). */
  private[graft] def sessionsOn(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    val sessions = events
      .withColumn("prev_ts", lag($"ts", 1).over(w))
      .withColumn("new_session",
        // integer-millisecond comparison on both engines (DuckDB's
        // epoch() is a fractional DOUBLE — a boundary hazard)
        when($"prev_ts".isNull ||
          unix_millis($"ts") - unix_millis($"prev_ts") > GapMinutes * 60000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum($"new_session").over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
    sessions
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_sessions"),
        max($"n_events").as("max_session_events"),
        round(avg($"n_events"), 4).as("avg_session_events"))
      .orderBy($"user_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q19_sessions" -> q19Sessions)

  val oracles: Map[String, String] = Map(
    "q19_sessions" ->
      s"""WITH flagged AS (
         |  SELECT user_id, event_id, value, ts,
         |    CASE WHEN lag(ts) OVER w IS NULL
         |           OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > ${GapMinutes * 60000} THEN 1 ELSE 0 END AS new_session
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
         |), sess AS (
         |  SELECT user_id, event_id, value,
         |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
         |  FROM flagged
         |), per_session AS (
         |  SELECT user_id, session_id, count(*) AS n_events
         |  FROM sess GROUP BY user_id, session_id
         |)
         |SELECT user_id, count(*) AS n_sessions,
         |  max(n_events) AS max_session_events,
         |  round(avg(n_events), 4) AS avg_session_events
         |FROM per_session GROUP BY user_id ORDER BY user_id""".stripMargin)
}
