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
  * Each entry runs a REAL streaming query — file source, watermark,
  * AvailableNow trigger, checkpoint dir — into a DURABLE parquet sink
  * (append mode writes the parquet sink directly; complete-mode window aggs
  * go through `foreachBatch` + atomic overwrite). The driver's batch oracle
  * then checks the sink contents. Nothing materializes in the driver: at
  * 100 TB the sink is the same partitioned store, just with a real
  * checkpoint volume — the transforms are unchanged, which is the point of
  * the unified batch/streaming Dataset API.
  */
object StreamOps {

  /** Streaming read of the events table (same ns→µs handling as batch;
    * `nanosAsLong` comes from [[Tables.sessionConfs]] at session build). */
  private[graft] def eventsStream(s: SparkSession, dir: String): DataFrame = {
    // the streaming file source wants a directory to watch; the test table
    // is a single file, so watch the sf dir filtered down to it
    s.readStream.schema(Tables.eventsRawNs)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Drain a streaming transform into a parquet sink and read it back.
    * `complete=true` routes through foreachBatch + atomic overwrite (the
    * parquet sink itself only supports append). */
  private def runToParquet(s: SparkSession, name: String, df: DataFrame,
                           complete: Boolean): DataFrame = {
    val dest = s"${graft.sinks.Sinks.tmpBase}/stream_$name"
    val ckpt = dest + ".ckpt"
    graft.sinks.Sinks.truncate(dest); graft.sinks.Sinks.truncate(ckpt)
    val writer =
      if (complete)
        df.writeStream.outputMode("complete")
          .foreachBatch { (b: DataFrame, _: Long) =>
            graft.sinks.Sinks.writeAtomic(b, dest)
          }
      else
        df.writeStream.outputMode("append").format("parquet").option("path", dest)
    val q = writer.option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    s.read.parquet(dest)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // tumbling event-time window agg under a real stream; complete mode
    // emits final window state => equals the batch computation exactly
    "stream_tumbling_agg" -> { (s, dir) =>
      val agg = eventsStream(s, dir)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "12 hours"), col("event_type"))
        .agg(count(lit(1)).as("n"), sumFix(col("value"), 2).as("sum_value"))
        .select(col("window.start").as("ws"), col("event_type"), col("n"), col("sum_value"))
      runToParquet(s, "tumbling", agg, complete = true)
        .orderBy(col("ws"), col("event_type"))
    },

    // streaming keyed dedup (reference O8: duplicate deliveries collapse);
    // event_id is the primary key, append emissions are replay-independent
    "stream_dedup" -> { (s, dir) =>
      val dd = eventsStream(s, dir)
        .select(col("event_id"), col("event_type"), col("value"))
        .dropDuplicates("event_id")
      runToParquet(s, "dedup", dd, complete = false)
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
