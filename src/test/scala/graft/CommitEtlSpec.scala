package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.ingest.CommitEtl

/** Reference-parity semantics (SURVEY §5.2 item 2): the O5 email/date
  * pairing matrix (`git_etl.ts:85-105`), O6 null-skipping watermark
  * (`git_etl.ts:141-153`), O8 last-writer-wins upsert (`git_etl.ts:127-132`),
  * O9 +1s exclusive bound (`git_etl.ts:319-324`). */
class CommitEtlSpec extends SparkSpec {

  private def raw(rows: Seq[Row]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), CommitEtl.rawCommitSchema)

  private def commit(sha: String, author: Row, committer: Row): Row =
    Row(sha, Row("msg", author, committer))

  private val aDate = "2024-01-01T10:00:00"
  private val cDate = "2024-01-01T11:00:00"

  test("O5 pairing matrix: email follows whichever branch supplied the date") {
    val rows = Seq(
      // 1. author has date -> author email + author date
      commit("c1", Row("a@x", aDate), Row("c@x", cDate)),
      // 2. author date null, committer has date -> committer email + date
      commit("c2", Row("a@x", null), Row("c@x", cDate)),
      // 3. author struct absent, committer has date -> committer email + date
      commit("c3", null, Row("c@x", cDate)),
      // 4. neither has a date -> author email kept, ts null
      commit("c4", Row("a@x", null), Row("c@x", null)),
      // 5. author absent, committer date null -> null email, null ts
      commit("c5", null, Row("c@x", null)),
      // 6. both absent -> null email, null ts
      commit("c6", null, null))
    val out = CommitEtl.parseCommits(raw(rows))
      .orderBy("commit_hash")
      .select("commit_hash", "commit_ts", "commit_email")
      .collect()
    def ts(s: String) = Timestamp.valueOf(s.replace('T', ' '))
    assert(out(0) === Row("c1", ts(aDate), "a@x"))
    assert(out(1) === Row("c2", ts(cDate), "c@x"))
    assert(out(2) === Row("c3", ts(cDate), "c@x"))
    assert(out(3) === Row("c4", null, "a@x"))
    assert(out(4) === Row("c5", null, null))
    assert(out(5) === Row("c6", null, null))
  }

  test("O6 watermark skips null timestamps and is null on empty input") {
    import spark.implicits._
    val df = Seq(
      (Some(Timestamp.valueOf("2024-01-02 00:00:00")), "a"),
      (None, "b"),
      (Some(Timestamp.valueOf("2024-01-05 00:00:00")), "c"))
      .toDF("ts", "k")
    val wm = CommitEtl.watermark(df, "ts").collect()(0)
    assert(wm.getTimestamp(0) === Timestamp.valueOf("2024-01-05 00:00:00"))
    val empty = CommitEtl.watermark(df.where(lit(false)), "ts").collect()(0)
    assert(empty.isNullAt(0))
  }

  test("O9 incremental slice: exclusive +1s bound; null watermark = full history") {
    import spark.implicits._
    val src = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00")),
      (2L, Timestamp.valueOf("2024-01-01 00:00:00.500")),
      (3L, Timestamp.valueOf("2024-01-01 00:00:01")),
      (4L, Timestamp.valueOf("2024-01-01 00:00:02")))
      .toDF("id", "ts")
    val wm = CommitEtl.watermark(src.where($"id" === 1), "ts")
    val got = CommitEtl.incrementalSlice(src, wm, "ts")
      .select("id").as[Long].collect().sorted
    // wm = 00:00:00, bound is ts >= 00:00:01 -> rows at .5s excluded, 1s included
    assert(got === Array(3L, 4L))
    val all = CommitEtl.incrementalSlice(src, CommitEtl.watermark(src.where(lit(false)), "ts"), "ts")
    assert(all.count() === 4)
  }

  test("O8 upsert: last-writer-wins, idempotent, and union-commutative") {
    import spark.implicits._
    val existing = Seq((1L, 10, "old"), (2L, 20, "old")).toDF("k", "v", "src")
    val incoming = Seq((2L, 21, "new"), (3L, 30, "new")).toDF("k", "v", "src")
    val merged = CommitEtl.upsert(existing, incoming, "k", Seq("v"))
    val got = merged.orderBy("k").as[(Long, Int, String)].collect()
    assert(got === Array((1L, 10, "old"), (2L, 21, "new"), (3L, 30, "new")))
    // idempotence: re-applying the same batch changes nothing
    val again = CommitEtl.upsert(merged, incoming, "k", Seq("v"))
    assert(again.orderBy("k").as[(Long, Int, String)].collect() === got)
    // duplicate delivery inside one batch collapses to one row per key
    val doubled = CommitEtl.upsert(existing, incoming.union(incoming), "k", Seq("v"))
    assert(doubled.count() === 3)
  }

  test("multi-tick incremental sync equals one-shot batch (SURVEY §5.2 item 4)") {
    import spark.implicits._
    val all = (1 to 100).map(i =>
      (i.toLong, Timestamp.valueOf(f"2024-01-${i % 28 + 1}%02d 00:00:00"), i % 7))
      .toDF("id", "ts", "grp")
    // one-shot: dedup by key over everything
    val oneShot = all.dropDuplicates("id")
    // ticked: 4 incremental batches by ts quartile, watermark + upsert loop
    val bounds = Seq("2024-01-08", "2024-01-15", "2024-01-22", "2024-12-31")
    var store = all.where(lit(false))
    var prev = "1970-01-01"
    for (b <- bounds) {
      val batch = all.where($"ts" >= lit(prev).cast("timestamp") &&
        $"ts" < lit(b).cast("timestamp"))
      store = CommitEtl.upsert(store, batch, "id", Seq("ts"))
      prev = b
    }
    assert(store.count() === oneShot.count())
    assert(store.select("id").except(oneShot.select("id")).count() === 0)
  }

  test("watermark monotonicity: adding rows never lowers the watermark") {
    import spark.implicits._
    val base = Seq(Timestamp.valueOf("2024-01-03 00:00:00")).toDF("ts")
    val wm1 = CommitEtl.watermark(base, "ts").collect()(0).getTimestamp(0)
    for (extra <- Seq("2024-01-01 00:00:00", "2024-01-05 00:00:00")) {
      val wm2 = CommitEtl.watermark(
        base.union(Seq(Timestamp.valueOf(extra)).toDF("ts")), "ts")
        .collect()(0).getTimestamp(0)
      assert(!wm2.before(wm1))
    }
  }
}
