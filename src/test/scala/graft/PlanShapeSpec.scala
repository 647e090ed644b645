package graft

/** Plan-shape regression tests: the physical plans the 100 TB design
  * depends on, asserted so a refactor that silently degrades them fails
  * loudly. Note: pipelines that `localCheckpoint` internally expose only
  * their FINAL stage here — the checkpointed upstream stages are covered
  * by their own entries' assertions and by cost (Bench), not by this
  * string match. */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("filters and projection reach the parquet scan (pushdown + pruning)") {
    val p = plan("q_filter_project")
    assert(p.contains("PushedFilters: ["), "expected pushed filters in scan")
    assert(p.contains("ReadSchema"), "expected pruned read schema")
  }

  test("no CartesianProduct in any dedup/ANN final stage") {
    for (q <- Seq("q_llm_dedup_minhash_lsh", "q_llm_dedup_simhash_pairs",
        "q_llm_dedup_ngram_jaccard", "q_llm_dedup_embed", "q_llm_knn_lsh",
        "q_llm_dedup_semantic", "q_llm_decontaminate", "q_llm_knn_pq",
        "q_llm_lm_score")) {
      assert(!plan(q).contains("CartesianProduct"), s"cartesian in $q")
    }
  }

  test("brute-force kNN keeps the partial top-k (WindowGroupLimit)") {
    assert(plan("q_llm_knn_brute").contains("WindowGroupLimit"))
  }

  test("native as-of join plans as the custom operator with EnsureRequirements exchanges") {
    val p = plan("q_asof_join_native")
    assert(p.contains("AsOfJoin"), "expected the custom AsOfJoinExec node")
    assert(p.contains("Exchange hashpartitioning"),
      "expected EnsureRequirements-inserted hash exchanges")
  }

  test("multi-way join broadcasts the dimension tables") {
    val p = plan("q5_multi_join")
    assert(p.contains("BroadcastHashJoin"), "expected broadcast dims")
  }

  test("shingle streams use the custom Generator, not interpreted HOFs") {
    val p = plan("q_llm_minhash_sig")
    assert(p.contains("graft_shingles"), "expected the UDTF in the plan")
    assert(!p.contains("array_distinct"),
      "HOF shingle pipeline leaked back into the plan")
  }
}
