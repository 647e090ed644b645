package graft

import java.sql.Timestamp

import graft.ops.AsOf

/** As-of join semantics: inclusive bound, latest-right-wins, null padding. */
class AsOfSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof join picks latest right row at-or-before each left ts") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 00:00:00")), // before any right row -> nulls
      (1L, ts("2024-01-02 12:00:00")), // after r1 -> r1
      (1L, ts("2024-01-03 00:00:00")), // exactly at r2 -> r2 (inclusive)
      (2L, ts("2024-01-05 00:00:00"))) // other key, after its only row
      .toDF("k", "t")
    val right = Seq(
      (1L, ts("2024-01-02 00:00:00"), 100.0),
      (1L, ts("2024-01-03 00:00:00"), 200.0),
      (2L, ts("2024-01-04 00:00:00"), 300.0))
      .toDF("rk", "rt", "payload")
    val out = AsOf.asofJoin(left, right, "k", "rk", "t", "rt", Seq("payload"))
      .orderBy("k", "t")
      .select("k", "t", "asof_payload")
      .collect()
    assert(out(0).isNullAt(2))
    assert(out(1).getDouble(2) === 100.0)
    assert(out(2).getDouble(2) === 200.0)
    assert(out(3).getDouble(2) === 300.0)

    // the native custom-operator path agrees row-for-row
    import org.apache.spark.sql.functions.col
    val native = graft.plans.AsOfJoinNative.asofJoin(left, right,
        col("k"), col("rk"), col("t"), col("rt"))
      .orderBy("k", "t")
      .select("k", "t", "payload")
      .collect()
    assert(native.length === out.length)
    native.zip(out).foreach { case (n, o) =>
      assert(n.getLong(0) === o.getLong(0) && n.getTimestamp(1) === o.getTimestamp(1))
      assert(n.isNullAt(2) === o.isNullAt(2))
      if (!n.isNullAt(2)) assert(n.getDouble(2) === o.getDouble(2))
    }
  }

  test("native asof join widens integral keys and rejects unsupported types") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.plans.AsOfJoinNative.asofJoin
    // IntegerType keys: must be widened via Cast (the exec reads raw
    // longs; before validation an int key silently produced garbage)
    val left = Seq((1, ts("2024-01-02 12:00:00"))).toDF("k", "t")
    val right = Seq((1, ts("2024-01-02 00:00:00"), 100.0)).toDF("rk", "rt", "payload")
    val out = asofJoin(left, right, col("k"), col("rk"), col("t"), col("rt")).collect()
    assert(out.length === 1 && out(0).getDouble(4) === 100.0)
    // non-integral key fails loudly
    val badL = Seq(("a", ts("2024-01-01 00:00:00"))).toDF("k", "t")
    val badR = Seq(("a", ts("2024-01-01 00:00:00"), 1.0)).toDF("rk", "rt", "p")
    assertThrows[IllegalArgumentException](
      asofJoin(badL, badR, col("k"), col("rk"), col("t"), col("rt")))
    // mixing a timestamp ts with a plain-long ts would compare epoch
    // MICROS against raw longs — rejected
    val longTsR = Seq((1, 5L, 1.0)).toDF("rk", "rt", "p")
    assertThrows[IllegalArgumentException](
      asofJoin(left, longTsR, col("k"), col("rk"), col("t"), col("rt")))
  }

  test("forward asof picks earliest right row at-or-after each left ts") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 00:00:00")), // before r1 -> r1 (earliest following)
      (1L, ts("2024-01-02 00:00:00")), // exactly at r1 -> r1 (inclusive)
      (1L, ts("2024-01-02 12:00:00")), // between r1 and r2 -> r2
      (1L, ts("2024-01-04 00:00:00")), // after all right rows -> nulls
      (2L, ts("2024-01-01 00:00:00"))) // other key -> its only row
      .toDF("k", "t")
    val right = Seq(
      (1L, ts("2024-01-02 00:00:00"), 100.0),
      (1L, ts("2024-01-03 00:00:00"), 200.0),
      (2L, ts("2024-01-04 00:00:00"), 300.0))
      .toDF("rk", "rt", "payload")
    val out = AsOf.asofJoinForward(left, right, "k", "rk", "t", "rt", Seq("payload"))
      .orderBy("k", "t")
      .select("k", "t", "asof_payload")
      .collect()
    assert(out(0).getDouble(2) === 100.0)
    assert(out(1).getDouble(2) === 100.0) // inclusive at equal ts
    assert(out(2).getDouble(2) === 200.0)
    assert(out(3).isNullAt(2)) // nothing follows
    assert(out(4).getDouble(2) === 300.0)
  }
}
