package graft

import java.sql.Timestamp

import graft.ops.Analytics

/** Funnel ordering semantics and cohort retention arithmetic. */
class AnalyticsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def events(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.map { case (u, t, et) => (u, ts(t), et) }
      .toDF("user_id", "ts", "event_type")
  }

  test("funnel counts only in-order conversions (inclusive bound)") {
    val e = events(
      // u1: full in-order funnel
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 11:00:00", "click"),
      (1L, "2024-01-01 12:00:00", "purchase"),
      // u2: click BEFORE view -> stops at step 1; purchase without
      // an in-order click must NOT count either
      (2L, "2024-01-01 09:00:00", "click"),
      (2L, "2024-01-01 10:00:00", "view"),
      (2L, "2024-01-01 11:00:00", "purchase"),
      // u3: view+click simultaneous (inclusive >=) then purchase
      (3L, "2024-01-02 08:00:00", "view"),
      (3L, "2024-01-02 08:00:00", "click"),
      (3L, "2024-01-02 09:00:00", "purchase"),
      // u4: never views -> in no stage
      (4L, "2024-01-03 10:00:00", "click"),
      (4L, "2024-01-03 11:00:00", "purchase"))
    val out = Analytics.funnel(e, Seq("view", "click", "purchase"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq(
      (1, "view", 3L, 100.0),      // u1,u2,u3
      (2, "click", 2L, 66.67),     // u1,u3 (u2's click predates view)
      (3, "purchase", 2L, 66.67))) // u1,u3
  }

  test("entity resolution: blocks gate candidates, typos merge, singletons stay") {
    import spark.implicits._
    val c = Seq(
      // same block, 1-char typo -> one entity
      (1L, "Acme Corp", 7, "BUILDING"),
      (2L, "Acme Oorp", 7, "BUILDING"),
      // identical name but DIFFERENT block -> never compared
      (3L, "Acme Corp", 8, "BUILDING"),
      // same block, name too far -> singleton
      (4L, "Zenith Ltd", 7, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_mktsegment")
    val out = Analytics.entityResolution(c)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      (1L, 1L, 2L), (2L, 1L, 2L), (3L, 3L, 1L), (4L, 4L, 1L)))
  }

  test("entity resolution: candidate pairs grow sub-quadratically with N") {
    import spark.implicits._
    // fixture-format names over the same fixed-cardinality demographics:
    // a (nation, segment)-only blocking would grow pairs 4x on a doubled
    // table; sorted-neighborhood candidates are O(N * W) by construction
    def cust(n: Int) = (1 to n).map { k =>
      (k.toLong, f"Customer#$k%09d", k % 25, s"SEG${k % 5}")
    }.toDF("c_custkey", "c_name", "c_nationkey", "c_mktsegment")
    // block sizes must be >> the SNM window for the asymptotic regime
    // (blocks smaller than W are fully paired and grow quadratically
    // until they clear the window — the documented boundary effect)
    val small = Analytics.erCandidatePairs(cust(12500)).count()
    val big = Analytics.erCandidatePairs(cust(25000)).count()
    assert(small > 0)
    assert(big <= small * 5 / 2,
      s"doubling N must ~double candidates (got $small -> $big; quadratic would be 4x)")
  }

  test("drift PSI: identical windows score exactly zero") {
    import spark.implicits._
    val rows = for {
      day <- Seq("2024-01-10", "2024-01-20") // ref and cur windows
      v <- Seq.fill(10)(25.0) ++ Seq.fill(5)(75.0) // same shape both sides
    } yield (v, ts(s"$day 10:00:00"))
    val out = Analytics.driftPsi(rows.toDF("value", "ts")).collect()
    assert(out.forall(_.getDouble(4) === 0.0), "psi must be 0 for identical windows")
    assert(out.forall(_.getDouble(3) === 0.0), "every per-bin term must be 0")
  }

  test("drift PSI: a shifted bin yields positive terms and positive total") {
    import spark.implicits._
    val rows =
      Seq.fill(20)((25.0, ts("2024-01-10 10:00:00"))) ++ // ref: all bin 0
        Seq.fill(20)((480.0, ts("2024-01-20 10:00:00"))) // cur: all bin 9
    val out = Analytics.driftPsi(rows.toDF("value", "ts")).collect()
    assert(out.forall(_.getDouble(3) >= 0.0), "PSI terms are individually non-negative")
    assert(out.head.getDouble(4) > 1.0, "full bin shift is severe drift")
  }

  test("cohort retention: week offsets and percentages are exact") {
    val e = events(
      // cohort week of Mon 2024-01-01: u1 (weeks 0,1), u2 (week 0 only)
      (1L, "2024-01-02 10:00:00", "view"),
      (1L, "2024-01-09 10:00:00", "click"),
      (2L, "2024-01-03 10:00:00", "view"),
      // cohort week of Mon 2024-01-08: u3 (weeks 0 and 2)
      (3L, "2024-01-08 10:00:00", "view"),
      (3L, "2024-01-22 10:00:00", "purchase"))
    val out = Analytics.cohortRetention(e)
      .collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2), r.getDouble(4)))
    assert(out.toSeq === Seq(
      ("2024-01-01", 0, 2L, 100.0),
      ("2024-01-01", 1, 1L, 50.0),
      ("2024-01-08", 0, 1L, 100.0),
      ("2024-01-08", 2, 1L, 100.0)))
  }
}
