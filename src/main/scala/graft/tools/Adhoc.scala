package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.XHash._
import graft.sources.Tables

/** Scratch timing probe for stage-level perf work (not part of the driver
  * contract; kept out of SparkEntry). */
object Adhoc {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32").config("spark.ui.enabled", "false")
    Tables.sessionConfs.foreach { case (k, v) => b.config(k, v) }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }
    val docs = Tables.load(s, dir, "documents")
    graft.functions.GraftFunctions.register(s)
    time("wh cold")(docs.selectExpr(s"${sparkWordHashes("text")} AS wh").count())
    time("wh kernel warm")(docs.selectExpr(s"${sparkWordHashes("text")} AS wh").count())
    time("wh HOF warm")(docs.selectExpr(s"${sparkWordHashesHof("text")} AS wh").count())
    val sh = docs
      .selectExpr("doc_id", "lang", "source", s"${sparkWordHashes("text")} AS wh")
      .where(expr("size(wh) >= 3"))
      .selectExpr("doc_id", "lang", "source", s"array_distinct(${sparkShingles("wh")}) AS shd")
    time("sh (shingled)")(sh.count())
    val exGen = docs
      .selectExpr("doc_id", "lang", "source", s"${sparkWordHashes("text")} AS wh")
      .where(expr("size(wh) >= 3"))
      .selectExpr("doc_id", "lang", "source", "graft_shingles(wh) AS sg")
    time("ex via UDTF")(exGen.count())
    time("sizes")(sh.selectExpr("doc_id", "size(shd) AS n").count())
    val ex = sh.selectExpr("doc_id", "lang", "source", "explode_outer(shd) AS sg")
    time("ex (exploded)")(ex.count())
    val co = ex.alias("a").join(ex.alias("b"),
        col("a.lang") === col("b.lang") && col("a.source") === col("b.source") &&
          col("a.sg") === col("b.sg") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.lang").as("lang"), col("a.source").as("source"),
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("i"))
    time("co (pair counts)")(co.count())
    val sizes = sh.selectExpr("doc_id", "size(shd) AS n")
    val j1 = co.join(broadcast(sizes.select(col("doc_id").as("doc_a"), col("n").as("na"))), "doc_a")
    time("co + sizes_a")(j1.count())
    val j2 = j1.join(broadcast(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb"))), "doc_b")
    time("co + both sizes")(j2.count())
    time("+ filter")(j2.where(expr("10 * i >= 3 * (na + nb - i)")).count())
    time("full query")(graft.llm.Dedup.queries("q_llm_dedup_ngram_jaccard")(s, dir).count())
    s.stop()
  }
}
