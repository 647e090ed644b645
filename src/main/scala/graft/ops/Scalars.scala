package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables
import graft.util.Exact._

/** Scalar-function surface (SURVEY.md §2.2 "Scalar functions"): string, date,
  * math, array, JSON, conditional — all `org.apache.spark.sql.functions._`
  * built-ins (whole-stage-codegen'd; no UDFs in the hot path).
  *
  * The reference's only scalar work is ISO-8601 parsing and string key
  * interpolation (`git_etl.ts:95,103,130`); this generalizes to the full
  * surface an analytics user needs.
  */
object Scalars {
  private def t(s: SparkSession, dir: String, name: String) = Tables.load(s, dir, name)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_string_funcs" -> ((s, dir) =>
      t(s, dir, "part")
        .select(col("p_partkey"),
          upper(col("p_name")).as("uname"),
          substring(col("p_name"), 1, 5).as("prefix"),
          length(col("p_name")).as("name_len"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
          regexp_extract(col("p_brand"), "Brand#(\\d+)", 1).cast(IntegerType).as("brand_num"),
          split(col("p_name"), " ").getItem(1).as("noun"),
          lpad(col("p_partkey").cast(StringType), 8, "0").as("padded"),
          regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"))
        .orderBy(col("p_partkey"))),

    "q_date_funcs" -> ((s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"),
          quarter(col("o_orderdate")).as("qtr"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          datediff(lit("2002-01-01").cast(DateType), col("o_orderdate").cast(DateType)).as("days_to_2002"),
          date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
        .orderBy(col("o_orderkey"))),

    "q_math_funcs" -> ((s, dir) =>
      t(s, dir, "lineitem").where(col("l_orderkey") < 500)
        .select(col("l_orderkey"), col("l_linenumber"),
          abs(col("l_extendedprice") - 50000).as("abs_dev"),
          ceil(col("l_discount") * 100).as("disc_pct_ceil"),
          floor(col("l_tax") * 100).as("tax_pct_floor"),
          (col("l_orderkey") % 7).as("mod7"),
          greatest(col("l_quantity"), col("l_linenumber").cast(DoubleType)).as("gt"),
          least(col("l_discount"), col("l_tax")).as("lt"),
          fix(sqrt(col("l_extendedprice")), 6).as("sqrt_price"),
          signum(col("l_discount") - 0.05).cast(IntegerType).as("disc_sign"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    "q_array_funcs" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          size(split(col("text"), " ")).as("n_words"),
          size(array_distinct(split(col("text"), " "))).as("n_uniq_words"),
          array_contains(split(col("text"), " "), "spark").cast(IntegerType).as("has_spark"),
          array_join(slice(array_sort(array_distinct(split(col("text"), " "))), 1, 3), ",").as("first3"))
        .orderBy(col("doc_id"))),

    "q_explode" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("word"))
        .groupBy(col("word"))
        .agg(count(lit(1)).as("n"), countDistinct(col("source")).as("n_sources"))
        .orderBy(col("n").desc, col("word"))
        .limit(20)),

    "q_json_funcs" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type"))),

    "q_string_funcs2" -> ((s, dir) =>
      t(s, dir, "part").where(col("p_partkey") <= 500)
        .select(col("p_partkey"),
          translate(col("p_brand"), "Brand#", "brnd-0").as("translated"),
          expr("repeat(p_brand, 2)").as("doubled"),
          reverse(col("p_name")).as("reversed"),
          instr(col("p_name"), "a").cast(IntegerType).as("first_a"),
          expr("left(p_name, 4)").as("head4"),
          expr("right(p_type, 4)").as("tail4"),
          ltrim(rtrim(concat(lit("  "), col("p_type"), lit("  ")))).as("trimmed"))
        .orderBy(col("p_partkey"))),

    "q_date_funcs2" -> ((s, dir) =>
      t(s, dir, "orders").where(col("o_orderkey") <= 2000)
        .select(col("o_orderkey"),
          last_day(col("o_orderdate")).as("month_end"),
          dayofweek(col("o_orderdate")).as("dow"),
          weekofyear(col("o_orderdate")).as("iso_week"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"),
          add_months(col("o_orderdate").cast(DateType), 3).as("plus3m"))
        .orderBy(col("o_orderkey"))),

    // Higher-order array functions: filter / exists / forall / zip_with.
    "q_array_hof" -> ((s, dir) =>
      t(s, dir, "documents")
        .selectExpr("doc_id", "split(text, ' ') AS t")
        .selectExpr("doc_id",
          "size(filter(t, w -> length(w) >= 5)) AS n_long_words",
          "CAST(exists(t, w -> w = 'spark') AS INT) AS has_spark",
          "CAST(forall(t, w -> length(w) >= 1) AS INT) AS all_nonempty",
          // zip_with pads the shorter side with null — treat those as 0
          "aggregate(zip_with(t, slice(t, 2, size(t)), (a, b) -> IF(b IS NOT NULL AND a = b, 1, 0)), 0, (acc, x) -> acc + x) AS n_repeats")
        .orderBy(col("doc_id"))),

    "q_from_json" -> { (s, dir) =>
      val schema = StructType(Seq(StructField("k", IntegerType)))
      t(s, dir, "events")
        .select(col("event_id"), from_json(col("props"), schema).getField("k").as("k"))
        .where(col("k") > 90)
        .orderBy(col("event_id"))
    },

    "q_case_when" -> ((s, dir) =>
      t(s, dir, "orders")
        .select(
          when(col("o_totalprice") < 100000, "small")
            .when(col("o_totalprice") < 250000, "medium")
            .when(col("o_totalprice") < 400000, "large")
            .otherwise("jumbo").as("band"),
          col("o_orderstatus"))
        .groupBy(col("band"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("band"), col("o_orderstatus"))),

    "q_null_funcs" -> ((s, dir) =>
      t(s, dir, "events")
        .select(
          coalesce(nullif(col("event_type"), lit("error")), lit("(errored)")).as("etype"),
          when(col("value") > 150, col("value")).otherwise(lit(null).cast(DoubleType)).as("big_value"))
        .groupBy(col("etype")).agg(count(lit(1)).as("n"), count(col("big_value")).as("n_big"))
        .orderBy(col("etype"))),

    "q_pivot" -> { (s, dir) =>
      // empty (cohort, type) cells pivot to NULL in Spark but 0 under the
      // oracle's count(*) FILTER — coalesce so sparse fixtures still match
      val types = Seq("click", "error", "purchase", "signup", "view")
      t(s, dir, "events")
        .withColumn("cohort", col("user_id") % 10)
        .groupBy(col("cohort"))
        .pivot("event_type", types)
        .count()
        .select(col("cohort") +: types.map(c => coalesce(col(c), lit(0L)).as(c)): _*)
        .orderBy(col("cohort"))
    })

  def oracleSql: Map[String, String] = Map(
    "q_string_funcs" -> """
      SELECT p_partkey,
             upper(p_name) AS uname,
             substring(p_name, 1, 5) AS prefix,
             CAST(length(p_name) AS INT) AS name_len,
             p_brand || '|' || p_type AS brand_type,
             CAST(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS INT) AS brand_num,
             string_split(p_name, ' ')[2] AS noun,
             lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded,
             regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled
      FROM part ORDER BY p_partkey""",

    "q_date_funcs" -> """
      SELECT o_orderkey,
             CAST(year(o_orderdate) AS INT) AS yr,
             CAST(month(o_orderdate) AS INT) AS mo,
             CAST(day(o_orderdate) AS INT) AS dom,
             CAST(quarter(o_orderdate) AS INT) AS qtr,
             date_trunc('month', o_orderdate) AS month_start,
             CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT) AS days_to_2002,
             strftime(o_orderdate, '%Y-%m') AS ym
      FROM orders ORDER BY o_orderkey""",

    "q_math_funcs" -> s"""
      SELECT l_orderkey, l_linenumber,
             abs(l_extendedprice - 50000) AS abs_dev,
             CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
             CAST(floor(l_tax * 100) AS BIGINT) AS tax_pct_floor,
             l_orderkey % 7 AS mod7,
             greatest(l_quantity, CAST(l_linenumber AS DOUBLE)) AS gt,
             least(l_discount, l_tax) AS lt,
             ${sqlFix("sqrt(l_extendedprice)", 6)} AS sqrt_price,
             CAST(sign(l_discount - 0.05) AS INT) AS disc_sign
      FROM lineitem WHERE l_orderkey < 500
      ORDER BY l_orderkey, l_linenumber""",

    "q_array_funcs" -> """
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS INT) AS n_words,
             CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_uniq_words,
             CAST(list_contains(string_split(text, ' '), 'spark') AS INT) AS has_spark,
             array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:3], ',') AS first3
      FROM documents ORDER BY doc_id""",

    "q_explode" -> """
      SELECT word, count(*) AS n, count(DISTINCT source) AS n_sources
      FROM (SELECT source, unnest(string_split(text, ' ')) AS word FROM documents)
      GROUP BY word ORDER BY n DESC, word LIMIT 20""",

    "q_json_funcs" -> """
      SELECT event_type, count(*) AS n,
             CAST(sum(CAST(props->>'k' AS INT)) AS BIGINT) AS sum_k,
             min(CAST(props->>'k' AS INT)) AS min_k,
             max(CAST(props->>'k' AS INT)) AS max_k
      FROM events GROUP BY event_type ORDER BY event_type""",

    "q_string_funcs2" -> """
      SELECT p_partkey,
             translate(p_brand, 'Brand#', 'brnd-0') AS translated,
             repeat(p_brand, 2) AS doubled,
             reverse(p_name) AS reversed,
             CAST(strpos(p_name, 'a') AS INT) AS first_a,
             left(p_name, 4) AS head4,
             right(p_type, 4) AS tail4,
             ltrim(rtrim('  ' || p_type || '  ')) AS trimmed
      FROM part WHERE p_partkey <= 500 ORDER BY p_partkey""",

    "q_date_funcs2" -> """
      SELECT o_orderkey,
             last_day(o_orderdate) AS month_end,
             CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
             CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
             CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
             CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m
      FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey""",

    "q_array_hof" -> """
      WITH base AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
      SELECT doc_id,
             CAST(len(list_filter(t, w -> length(w) >= 5)) AS INT) AS n_long_words,
             CAST(len(list_filter(t, w -> w = 'spark')) > 0 AS INT) AS has_spark,
             CAST(list_bool_and(list_transform(t, w -> length(w) >= 1)) AS INT) AS all_nonempty,
             CAST(COALESCE(list_sum(list_transform(range(1, len(t)), i ->
               CAST(t[i] = t[i + 1] AS INT))), 0) AS INT) AS n_repeats
      FROM base ORDER BY doc_id""",

    "q_from_json" -> """
      SELECT event_id, CAST(props->>'k' AS INT) AS k
      FROM events WHERE CAST(props->>'k' AS INT) > 90
      ORDER BY event_id""",

    "q_case_when" -> """
      SELECT CASE WHEN o_totalprice < 100000 THEN 'small'
                  WHEN o_totalprice < 250000 THEN 'medium'
                  WHEN o_totalprice < 400000 THEN 'large'
                  ELSE 'jumbo' END AS band,
             o_orderstatus, count(*) AS n
      FROM orders GROUP BY band, o_orderstatus ORDER BY band, o_orderstatus""",

    "q_null_funcs" -> """
      SELECT coalesce(nullif(event_type, 'error'), '(errored)') AS etype,
             count(*) AS n,
             count(CASE WHEN value > 150 THEN value END) AS n_big
      FROM events GROUP BY etype ORDER BY etype""",

    "q_pivot" -> """
      SELECT user_id % 10 AS cohort,
             count(*) FILTER (WHERE event_type = 'click') AS click,
             count(*) FILTER (WHERE event_type = 'error') AS error,
             count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
             count(*) FILTER (WHERE event_type = 'signup') AS signup,
             count(*) FILTER (WHERE event_type = 'view') AS view
      FROM events GROUP BY cohort ORDER BY cohort""")
}
