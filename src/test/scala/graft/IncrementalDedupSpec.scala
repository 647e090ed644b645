package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llm.{Dedup, IncrementalDedup}
import graft.sinks.Sinks

/** Incremental LSH index maintenance: one-shot equivalence, crash-resume
  * from the checkpoint, and at-least-once replay idempotence (the three
  * properties that make the entry's oracle — the one-shot SQL — valid). */
class IncrementalDedupSpec extends SparkSpec {

  private val base = Sinks.tmpBase + "/spec_neardup"

  // 30 docs: 1..10 unique-ish, and (i, i+100) identical pairs for i in
  // 1..10 — so the expected verified pairs are exactly the 10 dup pairs
  // (distinct filler tokens keep unrelated docs below Jaccard 0.5)
  private def corpus: DataFrame = {
    import spark.implicits._
    val dups = (1 to 10).flatMap { i =>
      val text = s"shared template alpha beta gamma delta id$i unique$i tail$i words$i"
      Seq((i.toLong, text), (i + 100L, text))
    }
    val uniques = (31 to 40).map(i =>
      (i.toLong, s"totally different content z$i y$i x$i w$i v$i u$i t$i s$i"))
    (dups ++ uniques).toDF("doc_id", "text")
  }

  test("incremental index equals one-shot across crash-resume and replay") {
    import spark.implicits._
    IncrementalDedup.reset(base)
    val d = corpus.localCheckpoint()
    // one-shot truth on the full corpus
    val oneShot = Dedup.minhashVerifiedPairsOf(d)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().sorted

    // arrival in 3 files; only the FIRST is present before the "crash"
    def writeSlice(cond: org.apache.spark.sql.Column): Unit =
      d.where(cond).coalesce(1).write.mode("append").parquet(s"$base/src")
    writeSlice($"doc_id" <= 7)
    IncrementalDedup.runTicks(spark, base, d.schema) // tick 1, then "crash"
    // resume: remaining batches arrive, SAME checkpoint picks up only them
    writeSlice($"doc_id" > 7 && $"doc_id" <= 103)
    writeSlice($"doc_id" > 103)
    IncrementalDedup.runTicks(spark, base, d.schema)

    val inc = IncrementalDedup.verifyAccumulated(spark, base)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().sorted
    assert(inc === oneShot, "incremental final state must equal one-shot")
    assert(inc.length === 10, "exactly the 10 planted dup pairs")

    // at-least-once replay: re-running an already-folded batch against the
    // now-complete index must not change the final state (batchId-keyed
    // overwrite + keyed band upsert)
    IncrementalDedup.tick(spark, d.where($"doc_id" <= 7), 0L, base)
    val replayed = IncrementalDedup.verifyAccumulated(spark, base)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().sorted
    assert(replayed === oneShot, "replay must be idempotent")
  }

  test("re-crawled docs are verified on CURRENT content, not double-counted") {
    import spark.implicits._
    val rbase = base + "_recrawl"
    IncrementalDedup.reset(rbase)
    val textA = "original content alpha beta gamma delta one two three four"
    val textB = "replacement body epsilon zeta eta theta five six seven eight"
    // tick 0: doc 1 has textA, doc 2 has textB (no pair: disjoint text)
    IncrementalDedup.tick(spark,
      Seq((1L, textA), (2L, textB)).toDF("doc_id", "text"), 0L, rbase)
    assert(IncrementalDedup.verifyAccumulated(spark, rbase).count() === 0)
    // tick 1: doc 1 is RE-CRAWLED with textB — now an exact dup of doc 2
    IncrementalDedup.tick(spark,
      Seq((1L, textB)).toDF("doc_id", "text"), 1L, rbase)
    val out = IncrementalDedup.verifyAccumulated(spark, rbase)
      .select($"doc_a", $"doc_b", $"jaccard").as[(Long, Long, Double)].collect()
    // one pair, at EXACTLY 1.0 — a double-counted shingle store would
    // inflate sizes/co-counts and report jaccard 2.0 (or drop the pair)
    assert(out.toSeq === Seq((1L, 2L, 1.0)))
    // tick 2: doc 1 re-crawled BELOW the shingling floor (< 3 tokens) —
    // the doc manifest must still resolve doc 1 to this version, so its
    // stale pair with doc 2 vanishes (verification scores CURRENT
    // content; a shingle-store-based winner would keep serving tick 1)
    IncrementalDedup.tick(spark,
      Seq((1L, "hi")).toDF("doc_id", "text"), 2L, rbase)
    assert(IncrementalDedup.verifyAccumulated(spark, rbase).count() === 0)
  }
}
