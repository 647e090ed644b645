package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc phase profiler for the heavy sf1 entries (not part of the
  * engine surface): times each stage of a query's plan separately so
  * perf work targets the measured bottleneck, not the guessed one.
  * Usage: runjvm.sh graft.tools.Prof <profile> <sfDir>
  */
object Prof {
  private def time[A](tag: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[prof] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val profile = args(0)
    val dir = args(1)
    // SAME session confs as Bench — a profile under different confs
    // (AQE, codegen, partition sizing) measures a different engine
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
    graft.sources.Tables.sessionConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    import graft.sources.Tables

    profile match {
      case "substr" =>
        val SubK = graft.llm.Dedup.SubK
        val d = Tables.load(spark, dir, "documents").select(col("doc_id"), col("text"))
        val occ = time("gram gen + checkpoint") {
          d.where(length(col("text")) >= SubK)
            .selectExpr("doc_id", s"posexplode(graft_gramhashes(text, $SubK)) AS (i, h)")
            .selectExpr("doc_id", "CAST(i + 1 AS INT) AS p", "h")
            .localCheckpoint()
        }
        println(s"[prof] occ rows = ${occ.count()}")
        val rep = time("rep agg (count>1)") {
          occ.groupBy(col("h")).agg(count(lit(1)).as("c"))
            .where(col("c") > 1).select(col("h")).localCheckpoint()
        }
        println(s"[prof] rep rows = ${rep.count()}")
        val dup = time("semi-join dup positions") {
          occ.join(rep, Seq("h"), "left_semi").localCheckpoint()
        }
        println(s"[prof] dup rows = ${dup.count()}")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("p"))
        time("window+agg+final join") {
          val spans = dup
            .withColumn("brk", when(col("p") - lag(col("p"), 1).over(w) > SubK, 1).otherwise(0))
            .withColumn("isl", sum(col("brk")).over(w))
            .groupBy(col("doc_id"), col("isl"))
            .agg((max(col("p")) - min(col("p")) + lit(SubK)).as("span"))
            .groupBy(col("doc_id"))
            .agg(sum(col("span")).as("dup_chars"), count(lit(1)).as("n_spans"))
          d.select(col("doc_id"), length(col("text")).cast("long").as("n_chars"))
            .join(spans, Seq("doc_id"), "left")
            .write.format("noop").mode("overwrite").save()
        }
      case "famrecall" =>
        graft.llm.Dedup.profileFamilyRecall(spark, dir)
      case other => sys.error(s"unknown profile $other")
    }
    spark.stop()
  }
}
