package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Scratch timing probe for stage-level perf work (not part of the driver
  * contract; kept out of SparkEntry). Currently: entity-resolution stage
  * decomposition. */
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
    val c = Tables.load(s, dir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"), col("c_mktsegment"))
    time("customer scan")(c.count())
    val pairs = c.alias("a").join(c.alias("b"),
        col("a.c_nationkey") === col("b.c_nationkey") &&
          col("a.c_mktsegment") === col("b.c_mktsegment") &&
          col("a.c_custkey") < col("b.c_custkey") &&
          levenshtein(col("a.c_name"), col("b.c_name")) <= 2)
      .select(col("a.c_custkey").as("doc_a"), col("b.c_custkey").as("doc_b"))
    time("lev block self-join")(pairs.count())
    val t0 = System.nanoTime()
    val cc = graft.llm.Dedup.connectedComponents(pairs)
    println(f"connectedComponents total     ${(System.nanoTime() - t0) / 1e9}%6.2f s (incl. internal ckpts)")
    time("cc labels count")(cc.count())

    // manual CC replica with per-round timing
    {
      val ckpt: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
        df => df.localCheckpoint(true)
      var t = System.nanoTime()
      def lap(name: String): Unit = {
        println(f"  cc stage $name%-20s ${(System.nanoTime() - t) / 1e9}%6.2f s")
        t = System.nanoTime()
      }
      val p0 = ckpt(pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")))
      lap("edges ckpt")
      val edges = p0.union(p0.select(col("dst").as("src"), col("src").as("dst")))
      var labels = ckpt(edges.select(col("src").as("doc")).distinct()
        .withColumn("label", col("doc")))
      lap("labels init")
      var changed = 1L
      var iters = 0
      while (changed > 0 && iters < 20) {
        val viaNeighbor = edges.join(labels, edges("src") === labels("doc"))
          .select(col("dst").as("doc"), col("label"))
        val next = ckpt(Seq(viaNeighbor).foldLeft(labels.select(col("doc"), col("label")))(_ union _)
          .groupBy(col("doc")).agg(min(col("label")).as("label")))
        lap(s"round $iters ckpt")
        changed = next.alias("n").join(labels.alias("o"), "doc")
          .where(col("n.label") =!= col("o.label")).count()
        lap(s"round $iters count")
        labels = next
        iters += 1
      }
    }
    val fin = c.select(col("c_custkey"))
      .join(cc, col("c_custkey") === col("doc_id"), "left")
      .select(col("c_custkey"),
        coalesce(col("canonical"), col("c_custkey")).as("entity"))
      .withColumn("n_members", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("entity"))))
      .orderBy(col("c_custkey"))
    time("final window+sort")(fin.count())
    time("full query")(graft.ops.Analytics.entityResolution(c).count())

    // does Observation fire under localCheckpoint(eager) / checkpoint()?
    {
      val obs = org.apache.spark.sql.Observation("probe_local")
      val df = s.range(100).observe(obs, sum(col("id")).as("s")).localCheckpoint(true)
      val got = new java.util.concurrent.atomic.AtomicReference[String]("TIMEOUT (listener never fired)")
      val th = new Thread(() => got.set(scala.util.Try(obs.get).toString))
      th.setDaemon(true); th.start(); th.join(5000)
      println(s"observe under localCheckpoint: ${got.get}")
      df.unpersist()
    }
    // 3-arg bounded levenshtein: value semantics + timing
    {
      val r = s.sql("SELECT levenshtein('abcdef', 'abcxyz', 2) AS d").collect()(0).getInt(0)
      println(s"bounded levenshtein over-threshold returns: $r")
      val pairs2 = c.alias("a").join(c.alias("b"),
          col("a.c_nationkey") === col("b.c_nationkey") &&
            col("a.c_mktsegment") === col("b.c_mktsegment") &&
            col("a.c_custkey") < col("b.c_custkey") &&
            expr("levenshtein(a.c_name, b.c_name, 2) IN (0, 1, 2)"))
        .select(col("a.c_custkey").as("doc_a"), col("b.c_custkey").as("doc_b"))
      time("lev bounded self-join")(pairs2.count())
      time("lev bounded again")(pairs2.count())
    }
    s.stop()
  }
}
