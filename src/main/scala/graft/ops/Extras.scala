package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.util.Exact._

/** Gap-filling operator entries (VERDICT r1 §"What's missing" item 6):
  * shuffle-hash join, map functions, LIKE/IN predicate surface, and
  * csv/json source scans (round-tripped through real files so the non-
  * parquet readers are actually exercised).
  */
object Extras {
  private def t(s: SparkSession, dir: String, name: String) = Tables.load(s, dir, name)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Shuffle-hash join: both sides hinted so the planner builds a hash map
    // per partition instead of sorting — the right plan when one side is
    // moderately sized per key and sort-merge's sort would dominate.
    "q_shuffle_hash_join" -> { (s, dir) =>
      val li = t(s, dir, "lineitem").hint("shuffle_hash")
      val ord = t(s, dir, "orders").hint("shuffle_hash")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sumFix(col("l_extendedprice"), 2).as("revenue"))
        .orderBy(col("o_orderpriority"))
    },

    // Map functions: build a map column, then explode it and aggregate
    // keys — exercises map construction, explosion, and key-wise stats.
    "q_map_funcs" -> ((s, dir) =>
      t(s, dir, "events")
        .selectExpr("map('type', event_type, 'uid', CAST(user_id AS STRING)) AS m")
        .select(explode(col("m")).as(Seq("key", "value")))
        .groupBy(col("key"))
        .agg(count(lit(1)).as("n"), countDistinct(col("value")).as("n_distinct"))
        .orderBy(col("key"))),

    // LIKE / IN / BETWEEN predicate surface, all pushable to the scan.
    "q_like_in" -> ((s, dir) =>
      t(s, dir, "part")
        .where(col("p_brand").like("Brand#1%") &&
          col("p_size").isin(1, 5, 9, 13) &&
          col("p_retailprice").between(500, 1500))
        .select(col("p_partkey"), col("p_brand"), col("p_size"), col("p_retailprice"))
        .orderBy(col("p_partkey"))),

    // CSV source: write nation as csv, read it back through the csv reader
    // with an explicit schema, then a broadcast join to region.
    "q_csv_scan" -> { (s, dir) =>
      val dest = s"${graft.sinks.Sinks.tmpBase}/nation_csv"
      graft.sinks.Sinks.truncate(dest)
      t(s, dir, "nation").write.option("header", "true").csv(dest)
      val nation = s.read.schema(Tables.nation).option("header", "true").csv(dest)
      nation.join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_nations"))
        .orderBy(col("r_name"))
    },

    // JSON source: write supplier as json lines, read back with schema.
    "q_json_scan" -> { (s, dir) =>
      val dest = s"${graft.sinks.Sinks.tmpBase}/supplier_json"
      graft.sinks.Sinks.truncate(dest)
      t(s, dir, "supplier").write.json(dest)
      s.read.schema(Tables.supplier).json(dest)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n"), sumFix(col("s_acctbal"), 2).as("bal"))
        .orderBy(col("s_nationkey"))
    })

  def oracleSql: Map[String, String] = Map(
    "q_shuffle_hash_join" -> s"""
      SELECT o_orderpriority, count(*) AS n,
             ${sqlSumFix("l_extendedprice", 2)} AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q_map_funcs" -> """
      SELECT 'type' AS key, count(*) AS n, count(DISTINCT event_type) AS n_distinct FROM events
      UNION ALL
      SELECT 'uid' AS key, count(*) AS n, count(DISTINCT CAST(user_id AS VARCHAR)) AS n_distinct FROM events
      ORDER BY key""",

    "q_like_in" -> """
      SELECT p_partkey, p_brand, p_size, p_retailprice
      FROM part
      WHERE p_brand LIKE 'Brand#1%' AND p_size IN (1, 5, 9, 13)
        AND p_retailprice BETWEEN 500 AND 1500
      ORDER BY p_partkey""",

    "q_csv_scan" -> """
      SELECT r_name, count(*) AS n_nations
      FROM nation JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name ORDER BY r_name""",

    "q_json_scan" -> s"""
      SELECT s_nationkey, count(*) AS n, ${sqlSumFix("s_acctbal", 2)} AS bal
      FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""")
}
