package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.util.Exact._

/** Event-time windowing in batch mode (SURVEY.md §2.2 "Streaming" row, batch
  * halves): tumbling, sliding, and session windows over `events`, plus
  * keyed event-time dedup. The same `window()`/`session_window()` calls run
  * unchanged under `readStream` — see [[graft.streaming.StreamOps]] — which
  * is exactly how the reference's cron micro-batches (`git_etl.ts:353-355`)
  * generalize.
  *
  * Scale: windowed aggregation is a hash shuffle on (window, key) with
  * map-side partials; session windows shuffle once on user and sort locally.
  */
object TimeWindows {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_tumbling_window" -> ((s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy(window(col("ts"), "6 hours").getField("start").as("ws"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), sumFix(col("value"), 2).as("sum_value"))
        .orderBy(col("ws"), col("event_type"))),

    "q_sliding_window" -> ((s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy(window(col("ts"), "1 day", "6 hours").getField("start").as("ws"),
          col("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("ws"), col("event_type"))),

    "q_session_window" -> ((s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"), sumFix(col("value"), 2).as("sum_value"))
        .select(col("session_window.start").as("sess_start"),
          col("session_window.end").as("sess_end"),
          col("user_id"), col("n"), col("sum_value"))
        .orderBy(col("user_id"), col("sess_start"))),

    // Resample + forward-fill: daily per-type sums on a DENSE calendar —
    // missing days are generated (sequence+explode over each type's
    // min..max range) and filled with the last observed value. The gap-
    // filling shape time-series users need; generation is per-group and
    // the fill is one windowed pass.
    "q_resample_ffill" -> { (s, dir) =>
      val daily = Tables.load(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sumFix(col("value"), 2).as("day_value"))
      val calendar = daily.groupBy(col("event_type"))
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(col("event_type"),
          explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      calendar.join(daily, Seq("event_type", "day"), "left")
        .select(col("event_type"), col("day"),
          col("day_value").isNotNull.cast("int").as("observed"),
          last(col("day_value"), ignoreNulls = true).over(w).as("filled_value"))
        .orderBy(col("event_type"), col("day"))
    },

    // Resample + LINEAR interpolation: the ffill entry's numeric sibling —
    // gap days get the straight line between the surrounding observations
    // instead of a held value (the fill a metrics/finance series wants).
    // The backward window's last-observed (value, day) and the forward
    // window's first-observed pair bracket every gap; observed days take
    // the prev==next branch. Two windowed passes over the dense calendar,
    // per-type partitions — same scale shape as ffill. The day ratio is a
    // single int/int division and the inputs are 2-decimal-exact sums, so
    // the interpolated double is bit-identical cross-engine before the
    // final 4-decimal fix.
    "q_resample_interp" -> { (s, dir) =>
      val daily = Tables.load(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sumFix(col("value"), 2).as("day_value"))
      val calendar = daily.groupBy(col("event_type"))
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(col("event_type"),
          explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      val wb = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wf = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      calendar.join(daily, Seq("event_type", "day"), "left")
        .withColumn("prev_val", last(col("day_value"), ignoreNulls = true).over(wb))
        .withColumn("prev_day",
          last(when(col("day_value").isNotNull, col("day")), ignoreNulls = true).over(wb))
        .withColumn("next_val", first(col("day_value"), ignoreNulls = true).over(wf))
        .withColumn("next_day",
          first(when(col("day_value").isNotNull, col("day")), ignoreNulls = true).over(wf))
        .select(col("event_type"), col("day"),
          col("day_value").isNotNull.cast("int").as("observed"),
          graft.util.Exact.fix(expr(
            "CASE WHEN prev_day = next_day THEN prev_val " +
              "ELSE prev_val + (next_val - prev_val) * " +
              "(CAST(datediff(day, prev_day) AS DOUBLE) / datediff(next_day, prev_day)) END"), 4)
            .as("interp_value"))
        .orderBy(col("event_type"), col("day"))
    },

    // keyed event-time dedup: first event per (user, type), the batch twin of
    // streaming withWatermark+dropDuplicates (reference O8 semantics)
    "q_dedup_first_event" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      Tables.load(s, dir, "events")
        .withColumn("_rn", row_number().over(w)).where(col("_rn") === 1)
        .select(col("user_id"), col("event_type"), col("event_id"), col("ts"))
        .orderBy(col("user_id"), col("event_type"))
    })

  def oracleSql: Map[String, String] = Map(
    "q_tumbling_window" -> s"""
      SELECT time_bucket(INTERVAL '6 hours', ts) AS ws, event_type,
             count(*) AS n, ${sqlSumFix("value", 2)} AS sum_value
      FROM events GROUP BY ws, event_type ORDER BY ws, event_type""",

    "q_sliding_window" -> """
      SELECT ws, event_type, count(*) AS n FROM (
        SELECT time_bucket(INTERVAL '6 hours', ts) - to_hours(k * 6) AS ws,
               event_type
        FROM events, (SELECT unnest(range(4)) AS k))
      GROUP BY ws, event_type ORDER BY ws, event_type""",

    "q_session_window" -> s"""
      WITH marked AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         >= INTERVAL '30 minutes'
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS new_sess
        FROM events),
      islands AS (
        SELECT user_id, ts, value,
               sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        FROM marked)
      SELECT min(ts) AS sess_start, max(ts) + INTERVAL '30 minutes' AS sess_end,
             user_id, count(*) AS n, ${sqlSumFix("value", 2)} AS sum_value
      FROM islands GROUP BY user_id, sess_id ORDER BY user_id, sess_start""",

    "q_resample_ffill" -> s"""
      WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               ${sqlSumFix("value", 2)} AS day_value
        FROM events GROUP BY event_type, day),
      cal AS (
        SELECT event_type, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
        FROM (SELECT event_type, min(day) AS d0, max(day) AS d1
              FROM daily GROUP BY event_type)),
      joined AS (
        SELECT cal.event_type, cal.day, daily.day_value
        FROM cal LEFT JOIN daily
          ON cal.event_type = daily.event_type AND cal.day = daily.day)
      SELECT event_type, day,
             CAST(day_value IS NOT NULL AS INT) AS observed,
             last_value(day_value IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
      FROM joined ORDER BY event_type, day""",

    "q_resample_interp" -> s"""
      WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               ${sqlSumFix("value", 2)} AS day_value
        FROM events GROUP BY event_type, day),
      cal AS (
        SELECT event_type, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
        FROM (SELECT event_type, min(day) AS d0, max(day) AS d1
              FROM daily GROUP BY event_type)),
      joined AS (
        SELECT cal.event_type, cal.day, daily.day_value
        FROM cal LEFT JOIN daily
          ON cal.event_type = daily.event_type AND cal.day = daily.day),
      br AS (
        SELECT event_type, day, day_value,
               last_value(day_value IGNORE NULLS) OVER (
                 PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_val,
               last_value(CASE WHEN day_value IS NOT NULL THEN day END IGNORE NULLS) OVER (
                 PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_day,
               first_value(day_value IGNORE NULLS) OVER (
                 PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_val,
               first_value(CASE WHEN day_value IS NOT NULL THEN day END IGNORE NULLS) OVER (
                 PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_day
        FROM joined)
      SELECT event_type, day,
             CAST(day_value IS NOT NULL AS INT) AS observed,
             ${sqlFix(
               "CASE WHEN prev_day = next_day THEN prev_val " +
                 "ELSE prev_val + (next_val - prev_val) * " +
                 "(CAST(date_diff('day', prev_day, day) AS DOUBLE) / " +
                 "date_diff('day', prev_day, next_day)) END", 4)} AS interp_value
      FROM br ORDER BY event_type, day""",

    "q_dedup_first_event" -> """
      SELECT user_id, event_type, event_id, ts FROM (
        SELECT user_id, event_type, event_id, ts,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS rn
        FROM events) WHERE rn = 1
      ORDER BY user_id, event_type""")
}
