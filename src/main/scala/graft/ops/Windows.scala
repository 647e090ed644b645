package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.util.Exact._

/** Window-function surface (SURVEY.md §2.2 "Window functions"): ranking,
  * offsets, running/range frames, top-k per group, distribution functions.
  *
  * Every window partitions by a key before ordering, so at scale the sort is
  * per-partition after one hash shuffle — no global sort. Order specs always
  * carry a unique tie-breaker (orderkey/custkey) so results are total-ordered
  * and oracle-stable.
  */
object Windows {
  private def t(s: SparkSession, dir: String, name: String) = Tables.load(s, dir, name)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_window_rank" -> { (s, dir) =>
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, dir, "customer")
        .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"))
        .where(col("rn") <= 5)
        .orderBy(col("c_mktsegment"), col("rn"))
    },

    "q_window_running" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          (sum(scaled(col("o_totalprice"), 2))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            / lit(100.0)).as("running_spend"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // Bounded RANGE frames re-aggregate the frame buffer per row in Spark,
    // so frame size × partition size is the real cost driver: partition by
    // (status, year) to bound partitions and keep the price range tight —
    // the shape that stays linear-ish at 100× data.
    "q_window_range" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_orderstatus"), col("o_year"))
        .orderBy(col("o_totalprice"))
        .rangeBetween(-10000, 0)
      t(s, dir, "orders")
        .withColumn("o_year", year(col("o_orderdate")))
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_year"), col("o_totalprice"),
          count(lit(1)).over(w).as("n_within_10k"))
        .orderBy(col("o_orderkey"))
    },

    // Calendar-interval RANGE frame: rolling 3-day order count/revenue
    // per customer, the time-windowed running aggregate a numeric RANGE
    // frame (q_window_range) can't express — the frame boundary is a
    // CALENDAR offset on the ORDER BY timestamp, so peers at the same
    // date share one frame and gaps in the calendar shrink it. The DSL
    // has no interval rangeBetween, so the frame is declared in SQL —
    // same engine path (WindowExec with a RangeFrame bound). Revenue
    // sums scaled longs INSIDE the frame and divides once (the Exact
    // discipline applied to a window aggregate).
    "q_window_range_interval" -> { (s, dir) =>
      t(s, dir, "orders")
        .selectExpr("o_orderkey", "o_custkey", "o_orderdate",
          "count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate " +
            "RANGE BETWEEN INTERVAL 3 DAY PRECEDING AND CURRENT ROW) AS n_3d",
          "CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) OVER " +
            "(PARTITION BY o_custkey ORDER BY o_orderdate " +
            "RANGE BETWEEN INTERVAL 3 DAY PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0 " +
            "AS rev_3d")
        .orderBy(col("o_orderkey"))
    },

    "q_topk_per_group" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"), col("rn"))
    },

    "q_window_distribution" -> { (s, dir) =>
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      t(s, dir, "customer")
        .select(col("c_mktsegment"), col("c_custkey"),
          ntile(4).over(w).as("quartile"),
          fix(percent_rank().over(w), 6).as("pct_rank"),
          fix(cume_dist().over(w), 6).as("cume"))
        .orderBy(col("c_mktsegment"), col("c_custkey"))
    },

    "q_window_offsets2" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          nth_value(col("o_orderkey"), 2).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("second_order"),
          lag(col("o_totalprice"), 2, -1.0).over(w).as("lag2_price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    "q_window_firstlast" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          first(col("o_orderkey")).over(w).as("first_order"),
          last(col("o_orderkey")).over(w).as("last_order"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    })

  def oracleSql: Map[String, String] = Map(
    "q_window_rank" -> """
      SELECT * FROM (
        SELECT c_mktsegment, c_custkey, c_acctbal,
               row_number() OVER w AS rn, rank() OVER w AS rnk,
               dense_rank() OVER w AS drnk
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey))
      WHERE rn <= 5 ORDER BY c_mktsegment, rn""",

    "q_window_running" -> """
      SELECT o_custkey, o_orderkey, o_orderdate,
             sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
               OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0
               AS running_spend,
             lag(o_totalprice, 1) OVER w AS prev_price,
             lead(o_totalprice, 1) OVER w AS next_price
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_custkey, o_orderkey""",

    "q_window_range" -> """
      SELECT o_orderkey, o_orderstatus, CAST(year(o_orderdate) AS INT) AS o_year,
             o_totalprice,
             count(*) OVER (PARTITION BY o_orderstatus, year(o_orderdate)
                            ORDER BY o_totalprice
                            RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW)
               AS n_within_10k
      FROM orders ORDER BY o_orderkey""",

    "q_window_range_interval" -> """
      SELECT o_orderkey, o_custkey, o_orderdate,
             count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                            RANGE BETWEEN INTERVAL 3 DAY PRECEDING
                            AND CURRENT ROW) AS n_3d,
             sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate
                RANGE BETWEEN INTERVAL 3 DAY PRECEDING AND CURRENT ROW)
               / 100.0 AS rev_3d
      FROM orders ORDER BY o_orderkey""",

    "q_topk_per_group" -> """
      SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders)
      WHERE rn <= 3 ORDER BY o_custkey, rn""",

    "q_window_distribution" -> """
      SELECT c_mktsegment, c_custkey,
             ntile(4) OVER w AS quartile,
             CAST(floor(percent_rank() OVER w * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS pct_rank,
             CAST(floor(cume_dist() OVER w * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS cume
      FROM customer
      WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
      ORDER BY c_mktsegment, c_custkey""",

    "q_window_offsets2" -> """
      SELECT o_custkey, o_orderkey,
             nth_value(o_orderkey, 2) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_order,
             lag(o_totalprice, 2, -1.0) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS lag2_price
      FROM orders ORDER BY o_custkey, o_orderkey""",

    "q_window_firstlast" -> """
      SELECT o_custkey, o_orderkey,
             first_value(o_orderkey) OVER w AS first_order,
             last_value(o_orderkey) OVER w AS last_order
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY o_custkey, o_orderkey""")
}
