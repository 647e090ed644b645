package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Scratch probe: what stats does a foreachBatch micro-batch DataFrame
  * report in this Spark build? Decides whether Tables.spread's
  * unknown-stats guard can still spread big single-file ticks (real
  * file-backed stats) or whether tick batches are statless LogicalRDDs. */
object Probe2 {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val base = "target/probe2"
    graft.sinks.Sinks.truncate(base)
    val d = s.range(0, 2000000).selectExpr("id AS doc_id",
      "repeat('x', 30) AS text")
    d.repartitionByRange(2, col("doc_id")).write.parquet(s"$base/src")
    val defaultSize = s.sessionState.conf.defaultSizeInBytes
    println(s"[probe2] defaultSizeInBytes = $defaultSize")
    val stream = s.readStream.schema(d.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$base/src")
    stream.writeStream.outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .foreachBatch { (b: DataFrame, id: Long) =>
        val bytes = b.queryExecution.optimizedPlan.stats.sizeInBytes
        val parts = b.rdd.getNumPartitions
        println(s"[probe2] batch $id: sizeInBytes=$bytes parts=$parts " +
          s"unknown=${bytes >= BigInt(defaultSize)} " +
          s"plan=${b.queryExecution.analyzed.getClass.getSimpleName}")
        ()
      }
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    // arity-guard check
    graft.functions.GraftFunctions.register(s)
    try {
      s.sql("SELECT graft_gramhashes('abc')").collect()
      println("[probe2] arity: NO ERROR (bad)")
    } catch {
      case e: Throwable =>
        println(s"[probe2] arity error class=${e.getClass.getSimpleName} msg=${e.getMessage.take(200)}")
    }
    s.stop()
  }
}
