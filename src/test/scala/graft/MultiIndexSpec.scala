package graft

/** The shared-ingest tier (one checkpointed stream folding each arrival
  * batch into all four index families — [[graft.llm.MultiIndex]]) must
  * serve results identical to the four standalone incremental entries,
  * which each run their OWN stream over the same 3 range batches. The
  * oracle gate proves each side equals the one-shot SQL; this spec pins
  * the DIRECT equivalence (multi-store serve == standalone serve, row for
  * row) so a drift in either orchestration shows up as a named pair, not
  * as two unrelated oracle failures.
  */
class MultiIndexSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("shared-ingest stores serve identically to their standalone twins") {
    val pairs = Seq(
      "q_llm_multi_ingest_dedup" -> "q_llm_dedup_incremental",
      "q_llm_multi_ingest_simhash" -> "q_llm_dedup_simhash_incremental",
      "q_llm_multi_ingest_winnow" -> "q_llm_winnow_incremental",
      "q_llm_multi_ingest_bm25" -> "q_llm_bm25_incremental")
    pairs.foreach { case (multi, solo) =>
      val m = SparkEntry.queries(multi)(spark, dir).collect().toSeq
      val s = SparkEntry.queries(solo)(spark, dir).collect().toSeq
      assert(m.nonEmpty, s"$multi returned no rows")
      assert(m == s, s"$multi differs from $solo")
    }
  }

  test("the shared build runs once per (session, sf dir)") {
    val b1 = graft.llm.MultiIndex.ensureBuilt(spark, dir)
    val marker = new java.io.File(s"$b1/_spec_marker")
    assert(marker.createNewFile() || marker.exists())
    // a second ensureBuilt must return the SAME base without rebuilding
    // (a rebuild starts from truncate, which would remove the marker)
    val b2 = graft.llm.MultiIndex.ensureBuilt(spark, dir)
    assert(b1 == b2)
    assert(marker.exists(), "second ensureBuilt rebuilt the stores")
    marker.delete()
  }
}
