package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Data-quality constraint suite (Deequ-style) — the validation stage the
  * reference runs on its CONFIG (`git_etl.ts:161-255`) applied to the DATA,
  * which is what a 100 TB ingest actually needs before training on it:
  * key uniqueness, accepted values, range bounds, completeness, and
  * referential integrity, each reported as an exact (checked, violations,
  * pass) row.
  *
  * Scale shape: all single-table constraints for a table fold into ONE
  * aggregate over ONE scan (conditional sums — adding a constraint adds a
  * column to the agg, not a pass over the data); referential integrity is
  * a left-anti join on the key (AQE broadcasts the dimension side when it
  * fits). Nothing here is quadratic and nothing collects to the driver —
  * the verdict table is O(#constraints) rows.
  */
object Quality {

  /** One row per constraint: (check, n_checked, n_violations, pass).
    * `orders`/`customer`/`lineitem` are injected so specs can feed
    * synthetic tables with known violations. */
  def checks(orders: DataFrame, customer: DataFrame,
             lineitem: DataFrame): DataFrame = {
    // every orders constraint in ONE scan: conditional integer sums
    val o = orders.agg(
      count(lit(1)).as("n"),
      countDistinct(col("o_orderkey")).as("n_keys"),
      sum(when(col("o_orderstatus").isin("O", "F"), 0L).otherwise(1L)).as("v_status"),
      sum(when(col("o_totalprice") > 0, 0L).otherwise(1L)).as("v_price"),
      sum(when(col("o_orderpriority").isNull, 1L).otherwise(0L)).as("v_prio"))
    val orderChecks = o.select(
      array(
        struct(lit("orders.pk_unique").as("check"), col("n").as("n_checked"),
          (col("n") - col("n_keys")).as("n_violations")),
        struct(lit("orders.status_accepted").as("check"), col("n").as("n_checked"),
          col("v_status").as("n_violations")),
        struct(lit("orders.totalprice_positive").as("check"), col("n").as("n_checked"),
          col("v_price").as("n_violations")),
        struct(lit("orders.priority_complete").as("check"), col("n").as("n_checked"),
          col("v_prio").as("n_violations"))).as("cs"))
      .select(explode(col("cs")).as("c")).select(col("c.*"))

    // referential integrity: orphaned foreign keys via left-anti join
    val orphans = orders.select(col("o_custkey"))
      .join(customer.select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left_anti")
    val riCheck = orders.agg(count(lit(1)).as("n_checked"))
      .crossJoin(broadcast(orphans.agg(count(lit(1)).as("n_violations"))))
      .select(lit("orders.custkey_ri").as("check"), col("n_checked"),
        col("n_violations"))

    // lineitem constraints: composite-key uniqueness + date bounds, one scan
    val l = lineitem.agg(
      count(lit(1)).as("n"),
      countDistinct(col("l_orderkey"), col("l_linenumber")).as("n_keys"),
      sum(when(col("l_shipdate").between(lit("1992-01-01").cast("timestamp"),
        lit("1999-12-31").cast("timestamp")), 0L).otherwise(1L)).as("v_date"))
    val lineChecks = l.select(
      array(
        struct(lit("lineitem.pk_unique").as("check"), col("n").as("n_checked"),
          (col("n") - col("n_keys")).as("n_violations")),
        struct(lit("lineitem.shipdate_bounds").as("check"), col("n").as("n_checked"),
          col("v_date").as("n_violations"))).as("cs"))
      .select(explode(col("cs")).as("c")).select(col("c.*"))

    orderChecks.unionByName(riCheck).unionByName(lineChecks)
      .withColumn("pass", col("n_violations") === 0L)
      .orderBy(col("check"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_data_quality" -> ((s, dir) => checks(
      Tables.load(s, dir, "orders"),
      Tables.load(s, dir, "customer"),
      Tables.load(s, dir, "lineitem"))))

  def oracleSql: Map[String, String] = Map(
    "q_data_quality" -> """
      WITH o AS (
        SELECT count(*) AS n,
               count(DISTINCT o_orderkey) AS n_keys,
               sum(CASE WHEN o_orderstatus IN ('O','F') THEN 0 ELSE 1 END) AS v_status,
               sum(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END) AS v_price,
               sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS v_prio
        FROM orders),
      ri AS (
        SELECT (SELECT count(*) FROM orders) AS n,
               count(*) AS v
        FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)),
      l AS (
        SELECT count(*) AS n,
               count(DISTINCT (l_orderkey, l_linenumber)) AS n_keys,
               sum(CASE WHEN l_shipdate BETWEEN TIMESTAMP '1992-01-01'
                        AND TIMESTAMP '1999-12-31' THEN 0 ELSE 1 END) AS v_date
        FROM lineitem),
      checks AS (
        SELECT 'orders.pk_unique' AS "check", n AS n_checked,
               n - n_keys AS n_violations FROM o
        UNION ALL SELECT 'orders.status_accepted', n, v_status FROM o
        UNION ALL SELECT 'orders.totalprice_positive', n, v_price FROM o
        UNION ALL SELECT 'orders.priority_complete', n, v_prio FROM o
        UNION ALL SELECT 'orders.custkey_ri', n, v FROM ri
        UNION ALL SELECT 'lineitem.pk_unique', n, n - n_keys FROM l
        UNION ALL SELECT 'lineitem.shipdate_bounds', n, v_date FROM l)
      SELECT "check", CAST(n_checked AS BIGINT) AS n_checked,
             CAST(n_violations AS BIGINT) AS n_violations,
             n_violations = 0 AS pass
      FROM checks ORDER BY "check"""")
}
