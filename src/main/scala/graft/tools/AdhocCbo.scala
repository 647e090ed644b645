package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Cbo

/** Evidence probe for the r15 ANALYZE narrowing: plans the CBO entry's
  * INNER join (the part the reorder rule rewrites) under (a) FOR ALL
  * COLUMNS stats and (b) the narrowed referenced-columns stats, dumping
  * both formatted plans so the claim "same reorder, fewer stats bytes"
  * is checkable. Usage: runjvm.sh graft.tools.AdhocCbo <sfDir> <outDir>
  */
object AdhocCbo {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val outDir = args(1)
    val builder = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
    graft.sources.Tables.sessionConfs.foreach { case (k, v) => builder.config(k, v) }
    val s = builder.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val tables = Seq("lineitem", "orders", "customer", "nation", "region")
    val narrowed = Map(
      "lineitem" -> Seq("l_orderkey", "l_extendedprice", "l_discount"),
      "orders" -> Seq("o_orderkey", "o_custkey", "o_orderstatus"),
      "customer" -> Seq("c_custkey", "c_nationkey"),
      "nation" -> Seq("n_nationkey", "n_regionkey", "n_name"),
      "region" -> Seq("r_regionkey", "r_name"))
    def innerPlan(): String = Cbo.withCbo(s) {
      val li = s.table(s"${Cbo.db}.lineitem")
      val or = s.table(s"${Cbo.db}.orders").where(col("o_orderstatus") === "F")
      val cu = s.table(s"${Cbo.db}.customer")
      val na = s.table(s"${Cbo.db}.nation")
      val re = s.table(s"${Cbo.db}.region").where(col("r_name").isin("ASIA", "EUROPE"))
      val df = li
        .join(or, col("l_orderkey") === col("o_orderkey"))
        .join(cu, col("o_custkey") === col("c_custkey"))
        .join(na, col("c_nationkey") === col("n_nationkey"))
        .join(re, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_lines"),
          graft.util.Exact.sumFix(
            col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"))
      df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    }
    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val (_, tAll) = t(Cbo.registerAnalyzed(s, dir, tables))
    val allPlan = innerPlan()
    val (_, tNarrow) = t(Cbo.registerAnalyzed(s, dir, tables, narrowed))
    val narrowPlan = innerPlan()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outDir,
      "q_cbo_join_reorder_before.txt"),
      f"== ANALYZE FOR ALL COLUMNS (register+analyze $tAll%.2f s) ==%n" + allPlan)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outDir,
      "q_cbo_join_reorder_after.txt"),
      f"== ANALYZE narrowed to referenced columns (register+analyze $tNarrow%.2f s) ==%n" + narrowPlan)
    println(f"[adhoccbo] analyze ALL=${tAll}%.2f s narrowed=${tNarrow}%.2f s; " +
      s"plans identical=${allPlan == narrowPlan}")
    s.stop()
  }
}
