package graft

import org.apache.spark.sql.functions._

import graft.llm.Retrieval

/** BM25 ranking semantics on a controlled corpus. */
class RetrievalSpec extends SparkSpec {

  test("bm25: more shared rare terms rank higher; half-corpus terms are dropped") {
    import spark.implicits._
    // 'common' appears in ALL 6 docs -> df = 6 > 6/2 -> capped out of
    // scoring entirely. Query doc 0 = "alpha beta common".
    val corpus = Seq(
      (0L, "alpha beta common"),
      (10L, "alpha beta common zz1"),   // shares alpha+beta -> best
      (11L, "alpha common zz2 zz3"),    // shares alpha only
      (12L, "common zz4 zz5 zz6"),      // shares only the capped term
      (13L, "common zz7 zz8"),
      (14L, "common zz9 zz10"))
      .toDF("doc_id", "text")
    val s6 = Retrieval.bm25ScoresOf(corpus)
      .where(col("q_id") === 0)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // doc 12-14 share only 'common', which the df cap removed -> absent
    assert(!s6.contains(12L) && !s6.contains(13L) && !s6.contains(14L))
    // two shared rare terms beat one
    assert(s6(10L) > s6(11L))
    assert(s6(10L) > 0L && s6(11L) > 0L)
  }

  test("bm25: length normalization favors the shorter doc at equal tf") {
    import spark.implicits._
    val filler = (1 to 40).map(i => s"w$i").mkString(" ")
    // padding docs keep needle's df (3) under the n_docs DIV 2 cap
    val corpus = (Seq(
      (0L, "needle"),
      (20L, "needle short doc"),
      (21L, s"needle $filler")) ++
      (30L to 34L).map(i => (i, s"pad$i a$i b$i")))
      .toDF("doc_id", "text")
    val s6 = Retrieval.bm25ScoresOf(corpus)
      .where(col("q_id") === 0)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(s6(20L) > s6(21L))
  }
}
