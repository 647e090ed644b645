package graft

import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

import graft.sinks.Sinks

/** Checkpoint recovery: a stopped streaming query resumed with the same
  * checkpoint processes ONLY new files — each input row lands in the sink
  * exactly once. This is the property that makes the reference's
  * crash-and-rerun cron loop (`git_etl.ts:353-355`) safe in this engine
  * even without the keyed upsert's idempotence backstop. */
class StreamResumeSpec extends SparkSpec {

  test("file-sink streaming resumes from checkpoint exactly-once") {
    import spark.implicits._
    val base = Sinks.tmpBase + "/spec/resume"
    val src = s"$base/src"
    val dest = s"$base/dest"
    val ckpt = s"$base/ckpt"
    Seq(src, dest, ckpt).foreach(Sinks.truncate)

    def appendBatch(r: Range): Unit =
      r.toDF("v").coalesce(1).write.mode("append").parquet(src)
    def drain(): Unit = {
      val q = spark.readStream
        .schema(StructType(Seq(StructField("v", IntegerType))))
        .parquet(src)
        .writeStream.format("parquet")
        .option("path", dest).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    appendBatch(1 to 50)
    drain()
    assert(spark.read.parquet(dest).count() === 50)

    appendBatch(51 to 80)
    drain()
    val got = spark.read.parquet(dest).as[Int].collect().sorted
    assert(got === (1 to 80).toArray) // old file NOT reprocessed, new file once
  }
}
