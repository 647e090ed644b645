package graft

import java.sql.Timestamp

import graft.ops.{Analytics, Quality}

/** Data-quality constraint suite and exact-integer anomaly detection:
  * synthetic tables with one known violation per constraint, and an
  * outlier series whose z-score crosses the cross-multiplied 2-sigma
  * boundary exactly where the closed form says it should. */
class QualitySpec extends SparkSpec {

  test("constraint suite counts each planted violation exactly once") {
    import spark.implicits._
    val orders = Seq(
      (1L, 10L, "O", 5.0, Some("1-URGENT")),
      (1L, 10L, "F", 7.0, Some("2-HIGH")), // duplicate key
      (2L, 99L, "X", -1.0, None),          // bad status, bad price, null prio, orphan FK
      (3L, 11L, "F", 3.0, Some("3-MEDIUM")))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority")
    val customer = Seq(10L, 11L).toDF("c_custkey")
    val lineitem = Seq(
      (1L, 1, Timestamp.valueOf("1995-01-01 00:00:00")),
      (1L, 1, Timestamp.valueOf("2005-01-01 00:00:00")), // dup composite + out of range
      (2L, 1, Timestamp.valueOf("1993-06-01 00:00:00")))
      .toDF("l_orderkey", "l_linenumber", "l_shipdate")

    val got = Quality.checks(orders, customer, lineitem)
      .select($"check", $"n_checked", $"n_violations", $"pass")
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("orders.pk_unique") === ((4L, 1L, false)))
    assert(got("orders.status_accepted") === ((4L, 1L, false)))
    assert(got("orders.totalprice_positive") === ((4L, 1L, false)))
    assert(got("orders.priority_complete") === ((4L, 1L, false)))
    assert(got("orders.custkey_ri") === ((4L, 1L, false)))
    assert(got("lineitem.pk_unique") === ((3L, 1L, false)))
    assert(got("lineitem.shipdate_bounds") === ((3L, 1L, false)))
    assert(got.size === 7)
  }

  test("anomaly boundary: a lone outlier needs z > 2, which n=5 cannot reach") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def series(counts: Seq[Int]): org.apache.spark.sql.DataFrame =
      counts.zipWithIndex.flatMap { case (c, i) =>
        Seq.fill(c)(f"2024-01-${i + 1}%02d")
      }.toDF("d").select(to_timestamp($"d").as("ts"))

    // population z of a single outlier is bounded by sqrt(n-1): at n=5
    // it lands EXACTLY on 2 sigma, and the strict inequality must not fire
    val tight = Analytics.anomalies(series(Seq(10, 10, 10, 10, 110)))
      .select($"is_anomaly").as[Boolean].collect()
    assert(!tight.exists(identity),
      "z == 2 exactly must not flag (strict inequality)")

    // ten quiet days + one 11x day: z = 1000/sqrt(100000/11) ~ 3.3 > 2
    val got = Analytics.anomalies(
      series(Seq(10, 10, 10, 10, 10, 10, 10, 10, 10, 10, 110)))
      .select($"day".cast("string"), $"is_anomaly")
      .as[(String, Boolean)].collect().toMap
    assert(got("2024-01-11") === true)
    assert(got.count(_._2) === 1, "only the outlier day flags")
  }
}
