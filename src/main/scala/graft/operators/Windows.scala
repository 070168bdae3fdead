package graft.operators

import org.apache.spark.sql.functions._

import graft.Queries.Q
import graft.Tables._

/** Event-time window aggregations over `events` — the Spark-idiom
  * capability upgrade claimed in SURVEY §2.10 (the reference is batch
  * with file-existence checkpoints; tumbling/sliding/session windows are
  * what its time-series data model calls for on Spark).
  *
  * All three are single hash-aggregate plans: `window()` /
  * `session_window()` are projections (each row maps to its window(s)
  * before the shuffle), so the shuffle is keyed by (window, keys) and
  * map-side partial aggregation applies — the right shape at 100 TB.
  * The same expressions run under Structured Streaming with a watermark
  * (see graft.streaming.StreamingJobs + its spec).
  */
object Windows {

  // W1: tumbling 5-minute windows — count + decimal-accumulated sum
  // (double sums are partition-order dependent; decimal is not).
  val w1Tumbling = Q(
    "w1_window_tumbling",
    (s, d) =>
      events(s, d)
        .groupBy(window(col("ts"), "5 minutes"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("sum_value"))
        .select(col("window.start").as("w_start"), col("n"),
          col("sum_value")),
    Some("""SELECT time_bucket(INTERVAL 5 MINUTE, CAST(ts AS TIMESTAMP))
        AS w_start,
      count(*) AS n,
      CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1"""))

  // W2: sliding windows, 10-minute width / 5-minute slide — every event
  // belongs to exactly width/slide = 2 windows; the oracle replays that
  // expansion with an explicit 2-row offset cross join.
  val w2Sliding = Q(
    "w2_window_sliding",
    (s, d) =>
      events(s, d)
        .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("w_start"), col("n")),
    Some("""SELECT time_bucket(INTERVAL 5 MINUTE, CAST(ts AS TIMESTAMP))
          - to_minutes(5 * k) AS w_start,
      count(*) AS n
      FROM events CROSS JOIN (VALUES (0), (1)) t(k)
      GROUP BY 1"""))

  // W3: session windows per user, 10-minute inactivity gap. Spark's
  // session_window end = last event + gap, and an event landing EXACTLY
  // at last+gap still merges (verified by WindowsAndSinkSpec) — so the
  // oracle's gaps-and-islands break condition is strictly `> gap`.
  val w3Session = Q(
    "w3_window_session",
    (s, d) =>
      events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "10 minutes"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"),
          col("session_window.start").as("s_start"),
          col("session_window.end").as("s_end"), col("n")),
    Some("""WITH e AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
      m AS (
        SELECT user_id, ts,
          CASE WHEN lag(ts) OVER w IS NULL
                 OR ts - lag(ts) OVER w > INTERVAL 10 MINUTE
               THEN 1 ELSE 0 END AS brk
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      sess AS (
        SELECT user_id, ts,
          sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                         ROWS UNBOUNDED PRECEDING) AS sid
        FROM m)
      SELECT user_id, min(ts) AS s_start,
        max(ts) + INTERVAL 10 MINUTE AS s_end, count(*) AS n
      FROM sess GROUP BY user_id, sid"""))

  /** All event-time window queries, registration order. */
  def all: Seq[Q] = Seq(w1Tumbling, w2Sliding, w3Session)
}
