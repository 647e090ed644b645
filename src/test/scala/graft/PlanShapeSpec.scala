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

  test("NOT IN plans as the null-aware anti join (NAAJ), broadcast build side") {
    val df = SparkEntry.queries("q_null_aware_anti")(spark, dir)
    df.collect() // finalize the adaptive plan before inspecting it
    val s = df.queryExecution.executedPlan.toString
    // BroadcastHashJoinExec prints isNullAwareAntiJoin as the trailing
    // argument: "... LeftAnti, BuildRight, true"
    assert(s.contains("LeftAnti, BuildRight, true"),
      s"expected a null-aware anti join in:\n$s")
  }

  test("filters and projection reach the parquet scan (pushdown + pruning)") {
    val p = plan("q_filter_project")
    assert(p.contains("PushedFilters: ["), "expected pushed filters in scan")
    assert(p.contains("ReadSchema"), "expected pruned read schema")
  }

  test("no CartesianProduct in any dedup/ANN final stage") {
    for (q <- Seq("q_llm_dedup_minhash_lsh", "q_llm_dedup_simhash_pairs",
        "q_llm_dedup_ngram_jaccard", "q_llm_dedup_embed", "q_llm_knn_lsh",
        "q_llm_dedup_semantic", "q_llm_decontaminate", "q_llm_knn_pq",
        "q_llm_lm_score", "q_llm_decontaminate_embed", "q_llm_cluster_topics",
        "q_llm_media_neardup", "q_llm_bpe_train", "q_llm_bpe_encode",
        "q_llm_media_clip_dedup", "q_llm_mixture_reweight",
        "q_llm_dedup_containment", "q_llm_winnow_dedup", "q_llm_lm_trigram",
        "q_llm_memorization", "q_llm_soft_dedup", "q_llm_pmi_terms",
        "q_llm_repeat_plan", "q_llm_novelty_curve", "q_llm_graph_triangles",
        "q_llm_minhash_estimate", "q_llm_ccnet_buckets",
        "q_llm_late_interaction")) {
      assert(!plan(q).contains("CartesianProduct"), s"cartesian in $q")
    }
  }

  test("media near-dup fingerprints with the compiled kernel, pairs stay banded") {
    val p = plan("q_llm_media_neardup")
    // candidates come from the band equi-join of the checkpointed
    // fingerprint table — a hash join, never a nested-loop pair scan
    assert(!p.contains("BroadcastNestedLoopJoin"), "pair stage must be an equi-join")
  }


  test("bloom probe joins the broadcast filter; cluster topics keep the partial top-k") {
    assert(plan("q_llm_bloom").contains("BroadcastHashJoin"),
      "the 64-word filter table must broadcast to the probes")
    assert(plan("q_llm_cluster_topics").contains("WindowGroupLimit"),
      "rank<=3 must become a partial top-k before the per-cell shuffle")
  }

  test("brute-force kNN keeps the partial top-k (WindowGroupLimit)") {
    assert(plan("q_llm_knn_brute").contains("WindowGroupLimit"))
  }

  test("IVF assignment is the packed argmin scan, not a join-then-rank") {
    // the coarse-quantizer assignment must evaluate graft_nearest_cells
    // against the one-row packed centroid broadcast — the N·k-row
    // crossJoin + row_number window shape was the measured super-linear
    // term at sf1 (PERF.md round-11). The only Window left in the final
    // stage is the top-k rank over per-query candidates.
    val p = plan("q_llm_knn_ivf")
    assert(p.contains("graft_nearest_cells"),
      "assignment must use the packed argmin kernel")
  }

  test("DSv2 aggregate pushdown: the source answers the group-by, no aggregate operator") {
    val p = plan("q_dsv2_agg_pushdown")
    assert(p.contains("PushedAggregation"), "scan must carry the pushed aggregation")
    assert(!p.contains("HashAggregate") && !p.contains("SortAggregate"),
      "complete pushdown must eliminate the aggregate operator")
    // the sibling entry's countDistinct is NOT pushable — it must keep a
    // real aggregate over the row scan (the source declines what it
    // cannot answer exactly)
    val q = plan("q_dsv2_source")
    assert(q.contains("HashAggregate") || q.contains("ObjectHashAggregate"),
      "countDistinct must stay a Spark-side aggregate")
    assert(!q.contains("PushedAggregation"))
  }

  test("DSv2 top-N pushdown: the source serves ORDER BY ts DESC LIMIT k") {
    val p = plan("q_dsv2_topn_pushdown")
    assert(p.contains("PushedTopN"), "scan must carry the pushed top-N")
    assert(!p.contains("TakeOrderedAndProject") && !p.contains("Limit"),
      "complete top-N pushdown must eliminate Spark's sort+limit")
  }

  test("native as-of join plans as the custom operator with EnsureRequirements exchanges") {
    val p = plan("q_asof_join_native")
    assert(p.contains("AsOfJoin"), "expected the custom AsOfJoinExec node")
    assert(p.contains("Exchange hashpartitioning"),
      "expected EnsureRequirements-inserted hash exchanges")
  }

  test("dim-side filter dynamically prunes fact partitions (DPP)") {
    val p = plan("q_sink_dpp").toLowerCase
    assert(p.contains("dynamicpruning"),
      "expected a runtime partition-pruning subquery on the fact scan")
  }

  test("multi-way join broadcasts the dimension tables") {
    val p = plan("q5_multi_join")
    assert(p.contains("BroadcastHashJoin"), "expected broadcast dims")
  }

  test("q9 snowflake: broadcast dims, DPP on the fact's year partitions, one shuffle") {
    val df = SparkEntry.queries("q9_snowflake_profit")(spark, dir)
    df.collect() // finalize the adaptive plan before inspecting it
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), "dims must broadcast")
    assert(p.toLowerCase.contains("dynamicpruning"),
      "the fact scan must carry a runtime partition-pruning subquery")
    // the dim filter also lands STATICALLY on the partition column
    // (constraint propagation through the equi-join), so even the
    // planning-time file listing reads 4 of 7 year dirs
    assert(p.contains("PartitionFilters: [((l_shipyear"),
      "expected the inferred static year filter on the fact's partitions")
    // the pruned fact side must reach all joins shuffle-free. AQE's
    // toString prints Final AND Initial plans — count only the final
    // section: the aggregation exchange + the 7-row year-dim distinct's
    // (once for the DPP subquery, once for the broadcast build) are all
    // that's allowed; the fact itself never shuffles
    val finalSection = p.split("== Initial Plan ==")(0)
    val nEx = "Exchange hashpartitioning".r.findAllIn(finalSection).length
    assert(nEx <= 3, s"expected <= 3 hash exchanges in the final plan, got $nEx:\n$p")
  }

  test("q17: decorrelated scalar-agg probe — stats join reuses the partkey, no subquery exec") {
    val p = plan("q17_small_qty_parts")
    assert(!p.contains("Subquery") && !p.contains("CartesianProduct"),
      "the correlated avg must be a keyed aggregate + join, never a per-row subquery")
    assert(p.contains("BroadcastHashJoin"), "the filtered part dim must broadcast")
  }

  test("q18: grouped-HAVING membership is a distributed semi join, not a collected IN list") {
    val p = plan("q18_big_orders")
    assert(p.contains("LeftSemi"), "IN(grouped HAVING) must plan as a semi join")
    assert(p.contains("TakeOrderedAndProject"),
      "the top-100 must be a partial take-ordered, not a global sort")
  }

  test("q21: both correlated EXISTS probes contract to ONE order-level aggregate") {
    val p = plan("q21_sole_returner")
    // the order-stats aggregate (countDistinct ⇒ expand+two-phase agg) is
    // the only probe of the fact besides the filtered l1 scan — no
    // nested-loop or per-row subquery shape anywhere
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q22: the cohort mean is a 1-row broadcast, the urgent probe an anti join") {
    val df = SparkEntry.queries("q22_idle_rich")(spark, dir)
    df.collect() // finalize AQE so join strategies are the executed ones
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("LeftAnti"), "NOT EXISTS must plan as an anti join")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "the scalar cohort stats must reach rows via broadcast (1-row build side)")
  }

  test("Q4/Q6/Q10/Q16 probes keep their scale plans") {
    // Q4: the non-equi date conjunct must ride the hash semi join as a
    // residual — never degrade the EXISTS to a nested loop
    val p4 = plan("q4_order_priority")
    assert(p4.contains("LeftSemi") && !p4.contains("BroadcastNestedLoopJoin") &&
      !p4.contains("CartesianProduct"), s"Q4 semi join degraded:\n$p4")
    // Q6: the predicates reach the parquet scan
    val p6 = plan("q6_forecast_revenue")
    assert(p6.contains("PushedFilters") && p6.contains("l_discount"),
      s"Q6 filters must push into the scan:\n$p6")
    // Q10: top-20 is a TakeOrderedAndProject, never a global sort
    assert(plan("q10_returned_items").contains("TakeOrderedAndProject"),
      "Q10 must keep the partial top-k")
    // Q16: the NOT-IN exclusion plans as an anti join (non-null key)
    assert(plan("q16_supplier_variety").contains("LeftAnti"),
      "Q16 NOT IN must plan as an anti join")
  }

  test("AQE splits a skewed join partition at runtime (skew=true)") {
    import spark.implicits._
    val s = spark
    // thresholds lowered so test-scale partitions qualify as "skewed";
    // restored after — session-shared confs
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> s.conf.getOption(k))
    try {
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB")
      s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // 80% of fact rows collapse onto one hot key — the classic skew.
      // The payload is an md5 string so the hot partition's shuffle bytes
      // don't compress away (skew detection reads MapOutputStatistics).
      val fact = (0L until 60000L)
        .map(i => (if (i % 10 < 8) 0L else i, i)).toDF("jk", "v")
        .selectExpr("jk", "md5(CAST(v AS STRING)) AS payload")
      val dim = (0L until 60000L by 7L).map(i => (i, s"d$i")).toDF("jk", "name")
        .union(Seq((0L, "hot")).toDF("jk", "name"))
      // max(payload) keeps the wide column alive through the join (a bare
      // count would let Catalyst prune it back down to compressible longs)
      val joined = fact.join(dim, "jk").groupBy($"name")
        .agg(org.apache.spark.sql.functions.count($"*").as("n"),
          org.apache.spark.sql.functions.max($"payload").as("p"))
      joined.collect() // AQE decides skew handling at runtime
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected AQE to mark the skewed SMJ partition; got:\n$finalPlan")
    } finally saved.foreach { case (k, v) =>
      v.fold(s.conf.unset(k))(s.conf.set(k, _)) }
  }

  test("runtime bloom filter prunes the fact side of a selective join") {
    import spark.implicits._
    val s = spark
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> s.conf.getOption(k))
    try {
      s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // test-scale scans qualify as "large enough to be worth filtering"
      s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // shuffle join
      val fact = graft.sources.Tables.load(s, dir, "lineitem")
        .select($"l_orderkey", $"l_quantity")
      val dim = graft.sources.Tables.load(s, dir, "orders")
        .where($"o_orderpriority" === "1-URGENT") // selective creation side
        .select($"o_orderkey", $"o_orderpriority")
      val j = fact.join(dim, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority").count()
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("might_contain"),
        s"expected a runtime bloom filter (might_contain) on the fact scan; got:\n$p")
    } finally saved.foreach { case (k, v) =>
      v.fold(s.conf.unset(k))(s.conf.set(k, _)) }
  }

  test("Q11 global-scalar HAVING: the 1-row total broadcasts back over the groups") {
    val p = plan("q11_important_stock")
    assert(p.contains("BroadcastNestedLoopJoin") && p.contains("Cross"),
      s"expected the re-aggregated 1-row total as a broadcast over the per-part rows:\n$p")
    assert(!p.contains("SubqueryExec"),
      "the scalar threshold must be a broadcast, not a per-row subquery")
  }

  test("Q20 correlated IN chain decorrelates to semi joins on shared keys") {
    val p = plan("q20_dominant_suppliers")
    assert(p.contains("LeftSemi"),
      s"expected the outer IN as a left-semi join:\n$p")
    assert(!p.contains("SubqueryExec"),
      "both nesting levels must be keyed aggregates + joins, never per-row subqueries")
  }

  test("Q19 disjunction: equi-conjunct extracted to a hash join, ORs pushed to scans") {
    val p = plan("q19_disjunctive_predicates")
    assert(p.contains("BroadcastHashJoin"),
      s"expected the common l_partkey = p_partkey conjunct to keep a hash join:\n$p")
    assert(!p.contains("NestedLoop"),
      "a naive reading of the OR-of-ANDs degraded the join to a nested loop")
    assert(p.contains("Or(Or(And("),
      "expected the CNF-derived per-side disjunction pushed into the parquet scans")
  }

  test("shingle streams use the custom Generator, not interpreted HOFs") {
    val p = plan("q_llm_minhash_sig")
    assert(p.contains("graft_shingles"), "expected the UDTF in the plan")
    assert(!p.contains("array_distinct"),
      "HOF shingle pipeline leaked back into the plan")
  }
}
