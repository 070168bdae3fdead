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

  // ---------------------------------------------------------------------
  // W4: time-series gap fill — the reference-flavored capability with no
  // representative until r16 (VERDICT r15 #7): the fitness lake's 1-min
  // intraday series (ref: fitbit_utils.py:420's per-day minute files)
  // has missing minutes BY NATURE, and every downstream aggregate was
  // silently treating gaps as zeros. Per (resource=event_type, observed
  // day): generate the full 1440-minute grid (S7's date-sequence
  // discipline one grain down), left-join the per-minute observations,
  // and fill by last-observation-carried-forward. Every minute reports
  // its provenance (`status`: observed / locf_same_day / locf_prev_day
  // / unfilled) plus the day's missing-minute count — the d13 rule:
  // how much was imputed is first-class output, not a silent repair.
  //
  // Scale shape: the LOCF window partitions by (event_type, DAY) —
  // bounded 1440 rows per partition at ANY corpus size — never by
  // event_type alone (the classic LOCF skew trap: one hot resource =
  // one giant sorted partition at 100 TB). The cross-day carry rides a
  // DAY-level frame (#resources × #days rows — planner-sized, the c10
  // discipline) joined back broadcast-style; grid generation is an
  // explode over that same planner-sized frame, so no stage ever keys
  // on less than (resource, day). Every observed day has ≥1 obs, so
  // lag(close) needs no nested LOCF; only minutes before a resource's
  // first-ever observation stay honestly `unfilled`.
  // ---------------------------------------------------------------------
  val w4GapFill = Q(
    "w4_gap_fill",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val obs = events(s, d)
        .select(col("event_type"),
          date_trunc("minute", col("ts")).as("m"),
          col("value"))
        .groupBy(col("event_type"), col("m"))
        .agg(sum(col("value").cast("decimal(18,6)")).cast("double")
          .as("val"))
      // day-level frame: one row per (resource, observed day) with the
      // day's closing value — planner-sized, carries the cross-day LOCF
      val closes = obs
        .groupBy(col("event_type"), col("m").cast("date").as("day"))
        .agg(expr("max_by(val, m)").as("close_val"))
        .withColumn("carry", lag(col("close_val"), 1).over(
          Window.partitionBy(col("event_type")).orderBy(col("day"))))
      val grid = closes
        .select(col("event_type"), col("day"), col("carry"),
          explode(expr(
            "sequence(cast(day as timestamp), " +
              "cast(day as timestamp) + interval 23 hours 59 minutes, " +
              "interval 1 minute)")).as("m"))
      val dayW = Window.partitionBy(col("event_type"), col("day"))
      grid
        .join(obs, Seq("event_type", "m"), "left")
        .withColumn("fday", last(col("val"), ignoreNulls = true)
          .over(dayW.orderBy(col("m")).rowsBetween(
            Window.unboundedPreceding, Window.currentRow)))
        .withColumn("n_missing_day",
          count(when(col("val").isNull, 1)).over(dayW))
        .select(col("event_type"), col("m").as("minute_ts"),
          coalesce(col("fday"), col("carry")).as("value"),
          when(col("val").isNotNull, "observed")
            .when(col("fday").isNotNull, "locf_same_day")
            .when(col("carry").isNotNull, "locf_prev_day")
            .otherwise("unfilled").as("status"),
          col("n_missing_day"))
    },
    Some("""WITH obs AS (
        SELECT event_type, date_trunc('minute', CAST(ts AS TIMESTAMP)) AS m,
          CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS val
        FROM events GROUP BY 1, 2),
      closes AS (
        SELECT event_type, CAST(m AS DATE) AS day,
          max_by(val, m) AS close_val
        FROM obs GROUP BY 1, 2),
      carry AS (
        SELECT event_type, day, close_val,
          lag(close_val) OVER (PARTITION BY event_type ORDER BY day)
            AS carry
        FROM closes),
      grid AS (
        SELECT event_type, day, carry,
          unnest(generate_series(CAST(day AS TIMESTAMP),
            CAST(day AS TIMESTAMP) + INTERVAL 23 HOUR + INTERVAL 59 MINUTE,
            INTERVAL 1 MINUTE)) AS m
        FROM carry),
      joined AS (
        SELECT g.event_type, g.day, g.carry, g.m, o.val
        FROM grid g LEFT JOIN obs o
          ON o.event_type = g.event_type AND o.m = g.m),
      filled AS (
        SELECT event_type, day, carry, m, val,
          last_value(val IGNORE NULLS) OVER (
            PARTITION BY event_type, day ORDER BY m
            ROWS UNBOUNDED PRECEDING) AS fday,
          CAST(count(CASE WHEN val IS NULL THEN 1 END) OVER (
            PARTITION BY event_type, day) AS BIGINT) AS n_missing_day
        FROM joined)
      SELECT event_type, m AS minute_ts,
        coalesce(fday, carry) AS value,
        CASE WHEN val IS NOT NULL THEN 'observed'
             WHEN fday IS NOT NULL THEN 'locf_same_day'
             WHEN carry IS NOT NULL THEN 'locf_prev_day'
             ELSE 'unfilled' END AS status,
        n_missing_day
      FROM filled"""))

  /** All event-time window queries, registration order. */
  def all: Seq[Q] = Seq(w1Tumbling, w2Sliding, w3Session, w4GapFill)
}
