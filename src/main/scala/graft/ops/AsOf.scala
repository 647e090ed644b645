package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** As-of (point-in-time) join — an operator Spark lacks natively for batch
  * DataFrames (SURVEY.md §2.2 "Joins").
  *
  * Implemented by composing built-ins (preference order (a) from the build
  * brief): union both sides tagged, then a per-key last-observation-
  * carried-forward window. Cost = ONE hash shuffle on the key + a per-key
  * sort — identical asymptotics to a native sort-merge as-of join, with no
  * custom physical operator to maintain; whole-stage codegen covers the
  * projection, and AQE handles key skew. This scales to fact⨝fact: neither
  * side is collected or broadcast.
  */
object AsOf {

  /** For each left row, append `payloadCols` of the latest right row with
    * `right.tsCol <= left.tsCol` in the same key group (inclusive, matching
    * `ASOF JOIN ... ON l.ts >= r.ts`); nulls when no such row. Right side
    * must be unique per (key, ts) — pre-dedup if needed. Left columns are
    * preserved; payload columns arrive as `asof_<name>`. */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTs: String, rightTs: String,
               payloadCols: Seq[String]): DataFrame = {
    val payloadT = org.apache.spark.sql.types.StructType(
      payloadCols.map(c => right.schema(c)))
    val lNorm = left.select(
      col(leftKey).as("_asof_k"), col(leftTs).as("_asof_ts"),
      lit(1).as("_asof_src"),
      struct(left.columns.toIndexedSeq.map(col): _*).as("_asof_left"),
      lit(null).cast(payloadT).as("_asof_payload"))
    val rNorm = right.select(
      col(rightKey).as("_asof_k"), col(rightTs).as("_asof_ts"),
      lit(0).as("_asof_src"),
      lit(null).cast(lNorm.schema("_asof_left").dataType).as("_asof_left"),
      struct(payloadCols.map(col): _*).as("_asof_payload"))
    // right rows sort before left rows at equal ts => inclusive bound
    val w = Window.partitionBy(col("_asof_k"))
      .orderBy(col("_asof_ts"), col("_asof_src"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val leftCols = left.columns.toIndexedSeq.map(c => col("_asof_left." + c).as(c))
    val payCols = payloadCols.map(c => col("_asof_match." + c).as("asof_" + c))
    lNorm.unionByName(rNorm)
      .withColumn("_asof_match", last(col("_asof_payload"), ignoreNulls = true).over(w))
      .where(col("_asof_src") === 1)
      .select(leftCols ++ payCols: _*)
  }

  /** Forward as-of: for each left row, the EARLIEST right row with
    * `right.tsCol >= left.tsCol` in the key group (inclusive) — the
    * "next scheduled event" direction ([[asofJoin]] mirrored: ascending
    * ts with left-before-right at equal ts, and the carried value comes
    * from the FOLLOWING frame). Same cost: one hash shuffle + per-key
    * sort. */
  def asofJoinForward(left: DataFrame, right: DataFrame,
                      leftKey: String, rightKey: String,
                      leftTs: String, rightTs: String,
                      payloadCols: Seq[String]): DataFrame = {
    val payloadT = org.apache.spark.sql.types.StructType(
      payloadCols.map(c => right.schema(c)))
    val lNorm = left.select(
      col(leftKey).as("_asof_k"), col(leftTs).as("_asof_ts"),
      lit(0).as("_asof_src"),
      struct(left.columns.toIndexedSeq.map(col): _*).as("_asof_left"),
      lit(null).cast(payloadT).as("_asof_payload"))
    val rNorm = right.select(
      col(rightKey).as("_asof_k"), col(rightTs).as("_asof_ts"),
      lit(1).as("_asof_src"),
      lit(null).cast(lNorm.schema("_asof_left").dataType).as("_asof_left"),
      struct(payloadCols.map(col): _*).as("_asof_payload"))
    // left rows sort before right rows at equal ts => inclusive bound
    val w = Window.partitionBy(col("_asof_k"))
      .orderBy(col("_asof_ts"), col("_asof_src"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val leftCols = left.columns.toIndexedSeq.map(c => col("_asof_left." + c).as(c))
    val payCols = payloadCols.map(c => col("_asof_match." + c).as("asof_" + c))
    lNorm.unionByName(rNorm)
      .withColumn("_asof_match", first(col("_asof_payload"), ignoreNulls = true).over(w))
      .where(col("_asof_src") === 0)
      .select(leftCols ++ payCols: _*)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // the same query through the NATIVE custom operator
    // (graft.plans.AsOfJoinNative: LogicalPlan + Strategy + SparkPlan with
    // declared distribution/ordering requirements)
    "q_asof_join_native" -> { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"))
      val w = Window.partitionBy(col("o_custkey"), col("o_orderdate"))
        .orderBy(col("o_orderkey").desc)
      val ord = Tables.load(s, dir, "orders")
        .withColumn("_rn", row_number().over(w)).where(col("_rn") === 1)
        .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"), col("o_totalprice"))
      graft.plans.AsOfJoinNative.asofJoin(ev, ord,
          col("user_id"), col("o_custkey"), col("ts"), col("o_orderdate"))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("o_orderkey").as("asof_o_orderkey"),
          col("o_totalprice").as("asof_o_totalprice"))
        .orderBy(col("event_id"))
    },

    // each event picks up the customer's most recent order at event time
    "q_asof_join" -> { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      // dedup orders to one per (custkey, date): highest orderkey wins,
      // mirrored exactly in the oracle CTE
      val w = Window.partitionBy(col("o_custkey"), col("o_orderdate"))
        .orderBy(col("o_orderkey").desc)
      val ord = Tables.load(s, dir, "orders")
        .withColumn("_rn", row_number().over(w)).where(col("_rn") === 1).drop("_rn")
      asofJoin(ev, ord, "user_id", "o_custkey", "ts", "o_orderdate",
        Seq("o_orderkey", "o_totalprice"))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("asof_o_orderkey"), col("asof_o_totalprice"))
        .orderBy(col("event_id"))
    },

    // FORWARD direction: each event picks up the customer's NEXT order
    // at-or-after event time — "what did this touchpoint lead to", the
    // attribution-style direction the backward join can't ask.
    "q_asof_join_forward" -> { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val w = Window.partitionBy(col("o_custkey"), col("o_orderdate"))
        .orderBy(col("o_orderkey").desc)
      val ord = Tables.load(s, dir, "orders")
        .withColumn("_rn", row_number().over(w)).where(col("_rn") === 1).drop("_rn")
      asofJoinForward(ev, ord, "user_id", "o_custkey", "ts", "o_orderdate",
        Seq("o_orderkey", "o_totalprice"))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("asof_o_orderkey"), col("asof_o_totalprice"))
        .orderBy(col("event_id"))
    },

    // NEAREST: each event picks the temporally CLOSEST order in either
    // direction (ties -> the backward match, the convention pandas
    // merge_asof(direction='nearest') uses). Composed as backward ∘
    // forward over the SAME key — two window passes on one shuffle key
    // (the second reuses the first's hash partitioning), then a μs-exact
    // integer distance compare; no engine has this as a primitive, both
    // sides state it as the same two ASOF joins + CASE.
    "q_asof_join_nearest" -> { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val w = Window.partitionBy(col("o_custkey"), col("o_orderdate"))
        .orderBy(col("o_orderkey").desc)
      val ord = Tables.load(s, dir, "orders")
        .withColumn("_rn", row_number().over(w)).where(col("_rn") === 1).drop("_rn")
      val back = asofJoin(ev, ord, "user_id", "o_custkey", "ts", "o_orderdate",
          Seq("o_orderkey", "o_totalprice", "o_orderdate"))
        .withColumnRenamed("asof_o_orderkey", "bk")
        .withColumnRenamed("asof_o_totalprice", "bp")
        .withColumnRenamed("asof_o_orderdate", "bd")
      asofJoinForward(back, ord, "user_id", "o_custkey", "ts", "o_orderdate",
          Seq("o_orderkey", "o_totalprice", "o_orderdate"))
        .withColumn("_back_wins",
          col("bd").isNotNull && (col("asof_o_orderdate").isNull ||
            unix_micros(col("ts")) - unix_micros(col("bd")) <=
              unix_micros(col("asof_o_orderdate")) - unix_micros(col("ts"))))
        .select(col("event_id"), col("user_id"), col("ts"),
          when(col("_back_wins"), col("bk")).otherwise(col("asof_o_orderkey"))
            .as("asof_o_orderkey"),
          when(col("_back_wins"), col("bp")).otherwise(col("asof_o_totalprice"))
            .as("asof_o_totalprice"),
          when(col("bd").isNull && col("asof_o_orderdate").isNull, lit(null).cast("string"))
            .when(col("_back_wins"), lit("backward")).otherwise(lit("forward"))
            .as("direction"))
        .orderBy(col("event_id"))
    },

    // TOLERANCE: backward as-of, but a match older than 90 days is no
    // match (stale quotes must not propagate — the asof-with-tolerance
    // every market-data join uses). The matched ts rides along in the
    // payload so the bound is one CASE after the join; both engines
    // evaluate the identical interval test.
    "q_asof_join_tolerance" -> { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val w = Window.partitionBy(col("o_custkey"), col("o_orderdate"))
        .orderBy(col("o_orderkey").desc)
      val ord = Tables.load(s, dir, "orders")
        .withColumn("_rn", row_number().over(w)).where(col("_rn") === 1).drop("_rn")
      asofJoin(ev, ord, "user_id", "o_custkey", "ts", "o_orderdate",
        Seq("o_orderkey", "o_totalprice", "o_orderdate"))
        .selectExpr("event_id", "user_id", "ts",
          "asof_o_orderdate IS NOT NULL AND " +
            "asof_o_orderdate >= ts - INTERVAL 90 DAYS AS in_window",
          "CASE WHEN asof_o_orderdate >= ts - INTERVAL 90 DAYS " +
            "THEN asof_o_orderkey END AS asof_o_orderkey",
          "CASE WHEN asof_o_orderdate >= ts - INTERVAL 90 DAYS " +
            "THEN asof_o_totalprice END AS asof_o_totalprice")
        .orderBy(col("event_id"))
    })

  private val asofOracle = """
      WITH ord AS (
        SELECT * FROM (
          SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                    ORDER BY o_orderkey DESC) AS rn
          FROM orders) WHERE rn = 1)
      SELECT event_id, user_id, ts,
             o_orderkey AS asof_o_orderkey, o_totalprice AS asof_o_totalprice
      FROM events ASOF LEFT JOIN ord
        ON events.user_id = ord.o_custkey AND events.ts >= ord.o_orderdate
      ORDER BY event_id"""

  def oracleSql: Map[String, String] = Map(
    "q_asof_join_native" -> asofOracle,

    // nearest = backward ∘ forward ASOF + the identical μs distance CASE
    "q_asof_join_nearest" -> """
      WITH ord AS (
        SELECT * FROM (
          SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                    ORDER BY o_orderkey DESC) AS rn
          FROM orders) WHERE rn = 1),
      b AS (
        SELECT event_id, user_id, ts, o_orderkey AS bk, o_totalprice AS bp,
               o_orderdate AS bd
        FROM events ASOF LEFT JOIN ord
          ON events.user_id = ord.o_custkey AND events.ts >= ord.o_orderdate),
      f AS (
        SELECT event_id, o_orderkey AS fk, o_totalprice AS fp,
               o_orderdate AS fd
        FROM events ASOF LEFT JOIN ord
          ON events.user_id = ord.o_custkey AND events.ts <= ord.o_orderdate),
      j AS (
        SELECT b.*, f.fk, f.fp, f.fd,
               bd IS NOT NULL AND (fd IS NULL OR
                 epoch_us(ts) - epoch_us(bd) <= epoch_us(fd) - epoch_us(ts))
                 AS back_wins
        FROM b JOIN f USING (event_id))
      SELECT event_id, user_id, ts,
             CASE WHEN back_wins THEN bk ELSE fk END AS asof_o_orderkey,
             CASE WHEN back_wins THEN bp ELSE fp END AS asof_o_totalprice,
             CASE WHEN bd IS NULL AND fd IS NULL THEN NULL
                  WHEN back_wins THEN 'backward' ELSE 'forward' END AS direction
      FROM j ORDER BY event_id""",

    // DuckDB ASOF supports the forward inequality directly (<=)
    "q_asof_join_forward" -> """
      WITH ord AS (
        SELECT * FROM (
          SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                    ORDER BY o_orderkey DESC) AS rn
          FROM orders) WHERE rn = 1)
      SELECT event_id, user_id, ts,
             o_orderkey AS asof_o_orderkey, o_totalprice AS asof_o_totalprice
      FROM events ASOF LEFT JOIN ord
        ON events.user_id = ord.o_custkey AND events.ts <= ord.o_orderdate
      ORDER BY event_id""",

    "q_asof_join_tolerance" -> """
      WITH ord AS (
        SELECT * FROM (
          SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                    ORDER BY o_orderkey DESC) AS rn
          FROM orders) WHERE rn = 1)
      SELECT event_id, user_id, ts,
             o_orderdate IS NOT NULL
               AND o_orderdate >= ts - INTERVAL 90 DAY AS in_window,
             CASE WHEN o_orderdate >= ts - INTERVAL 90 DAY
                  THEN o_orderkey END AS asof_o_orderkey,
             CASE WHEN o_orderdate >= ts - INTERVAL 90 DAY
                  THEN o_totalprice END AS asof_o_totalprice
      FROM events ASOF LEFT JOIN ord
        ON events.user_id = ord.o_custkey AND events.ts >= ord.o_orderdate
      ORDER BY event_id""",
    "q_asof_join" -> """
      WITH ord AS (
        SELECT * FROM (
          SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                    ORDER BY o_orderkey DESC) AS rn
          FROM orders) WHERE rn = 1)
      SELECT event_id, user_id, ts,
             o_orderkey AS asof_o_orderkey, o_totalprice AS asof_o_totalprice
      FROM events ASOF LEFT JOIN ord
        ON events.user_id = ord.o_custkey AND events.ts >= ord.o_orderdate
      ORDER BY event_id""")
}
