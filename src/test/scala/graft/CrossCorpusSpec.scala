package graft

import org.apache.spark.sql.functions._

/** Cross-corpus near-dup: bipartite candidates, one-shot-consistent verdicts. */
class CrossCorpusSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("every emitted pair crosses the corpus boundary") {
    val out = SparkEntry.queries("q_llm_dedup_crosscorpus")(spark, dir)
    val sameSide = out
      .where((length(col("src_a")) === 4) === (length(col("src_b")) === 4))
      .count()
    assert(sameSide === 0L)
  }

  test("cross-corpus pairs equal the one-shot pairs restricted to cross-side") {
    val cross = SparkEntry.queries("q_llm_dedup_crosscorpus")(spark, dir)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
    val d = graft.sources.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), (length(col("source")) === 4).as("in_a"))
    val oneShot = SparkEntry.queries("q_llm_dedup_minhash_lsh")(spark, dir)
      .join(d.select(col("doc_id").as("doc_a"), col("in_a").as("aa")), "doc_a")
      .join(d.select(col("doc_id").as("doc_b"), col("in_a").as("ab")), "doc_b")
      .where(col("aa") =!= col("ab"))
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
    assert(cross.exceptAll(oneShot).count() === 0L)
    assert(oneShot.exceptAll(cross).count() === 0L)
  }
}
