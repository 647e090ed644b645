package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.Tables
import graft.util.Exact._

/** Structured Streaming surface (SURVEY.md §2.2 "Streaming"): the reference's
  * cron-driven micro-batch loop (`git_etl.ts:353-355`) generalized to
  * `readStream → transform → writeStream`.
  *
  * Each entry runs a REAL streaming query (file source, AvailableNow
  * trigger, memory sink, synchronous drain) and returns the sink table, so
  * the driver's batch oracle can check it. Output modes are chosen for
  * determinism: `complete` for windowed aggs (emits final state regardless
  * of flush timing), `append` for keyed dedup (union of first-seen rows is
  * flush-order-independent).
  *
  * At scale the memory sink becomes a parquet/foreachBatch sink with a real
  * checkpoint dir; the transforms are unchanged — that is the point of the
  * unified batch/streaming Dataset API.
  */
object StreamOps {

  /** Streaming read of the events table (same ns→µs handling as batch). */
  private def eventsStream(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.readStream.schema(Tables.eventsRawNs)
      .parquet(s"$dir/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Run a streaming transform to a memory sink, drain it, return the table. */
  private def runToMemory(s: SparkSession, name: String, df: DataFrame,
                          mode: String): DataFrame = {
    s.catalog.dropTempView(name) // idempotent re-run within one session
    val q = df.writeStream.outputMode(mode).format("memory")
      .queryName(name).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    s.table(name)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // tumbling event-time window agg under a real stream; complete mode
    // emits final window state => equals the batch computation exactly
    "stream_tumbling_agg" -> { (s, dir) =>
      val agg = eventsStream(s, dir)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "12 hours"), col("event_type"))
        .agg(count(lit(1)).as("n"), sumFix(col("value"), 2).as("sum_value"))
      runToMemory(s, "mem_stream_tumbling", agg, "complete")
        .select(col("window.start").as("ws"), col("event_type"), col("n"), col("sum_value"))
        .orderBy(col("ws"), col("event_type"))
    },

    // streaming keyed dedup (reference O8: duplicate deliveries collapse);
    // event_id is the primary key, append emissions are replay-independent
    "stream_dedup" -> { (s, dir) =>
      val dd = eventsStream(s, dir)
        .select(col("event_id"), col("event_type"), col("value"))
        .dropDuplicates("event_id")
      runToMemory(s, "mem_stream_dedup", dd, "append")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sumFix(col("value"), 2).as("sum_value"))
        .orderBy(col("event_type"))
    })

  def oracleSql: Map[String, String] = Map(
    "stream_tumbling_agg" -> s"""
      SELECT time_bucket(INTERVAL '12 hours', ts) AS ws, event_type,
             count(*) AS n, ${sqlSumFix("value", 2)} AS sum_value
      FROM events GROUP BY ws, event_type ORDER BY ws, event_type""",

    "stream_dedup" -> s"""
      SELECT event_type, count(*) AS n, ${sqlSumFix("value", 2)} AS sum_value
      FROM (SELECT DISTINCT event_id, event_type, value FROM events)
      GROUP BY event_type ORDER BY event_type""")
}
