package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan

/** Memory-pressure resilience: the suites normally run with GBs of
  * headroom, so nothing exercises the spill paths the 100 TB story leans
  * on (every executor WILL overflow its hash/sort/window buffers at real
  * shuffle sizes). Spark's spill thresholds for the buffering operators
  * are runtime SQLConfs, so this spec forces spills deliberately —
  * window buffer, sort-merge-join match buffer, and the hash-aggregate
  * sort fallback — and asserts BOTH halves of the contract: the
  * operator's `spillSize`/fallback metric is actually non-zero (the
  * constrained conf really did constrain), and the results are identical
  * to the unconstrained run (spilling changes cost, never answers).
  * AQE is disabled inside the measured runs only so the physical plan
  * tree is directly traversable for metrics; results are compared
  * against default-conf AQE-on runs. */
class SpillSpec extends SparkSpec {

  /** Sum of a named metric over the executed plan tree (post-collect). */
  private def metricSum(df: DataFrame, name: String): Long = {
    var tot = 0L
    def walk(p: SparkPlan): Unit = {
      p.metrics.foreach { case (k, m) => if (k == name) tot += m.value }
      p.children.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    tot
  }

  /** Run `mk` under `confs`, restoring previous values; returns the
    * collected rows and the final DataFrame for metric inspection. */
  private def withConfs[T](confs: (String, String)*)(f: => T): T = {
    val old = confs.map { case (k, _) =>
      k -> scala.util.Try(spark.conf.get(k)).toOption
    }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally old.foreach {
      case (k, Some(x)) => spark.conf.set(k, x)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("window operator spills under a tiny buffer and returns identical results") {
    import spark.implicits._
    def q: DataFrame = spark.range(100000)
      .select(($"id" % 4).as("g"), $"id", ($"id" % 997).cast("double").as("v"))
      .selectExpr("g", "id",
        "sum(v) OVER (PARTITION BY g ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run")
      .groupBy($"g").agg(org.apache.spark.sql.functions.sum($"run").as("s"))
      .orderBy($"g")
    val baseline = q.collect()
    // thresholds sized to force a handful of spills per partition, not
    // hundreds: every spill file holds open read-ahead buffers during the
    // merge phase, so a pathologically tiny threshold (64) OOMs the 8 GB
    // test JVM on buffer overhead alone — the opposite of the point
    val (constrained, spilled) = withConfs(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.windowExec.buffer.in.memory.threshold" -> "4096",
      "spark.sql.windowExec.buffer.spill.threshold" -> "4096") {
      val df = q
      val rows = df.collect()
      (rows, metricSum(df, "spillSize"))
    }
    assert(spilled > 0, "the 25k-row window partitions must spill past a 64-row buffer")
    assert(constrained === baseline, "spilling must not change window results")
  }

  test("sort-merge join spills its match buffer and returns identical results") {
    import spark.implicits._
    // 500 keys x 200 duplicate matches on the buffered side: every key's
    // match group blows past the 16-row spill threshold
    def left = spark.range(500).select($"id".as("k"), ($"id" * 3).as("lv"))
    def right = spark.range(100000)
      .select(($"id" % 500).as("k"), ($"id" % 13).cast("double").as("rv"))
    def q: DataFrame = left.join(right, "k")
      .groupBy($"k").agg(org.apache.spark.sql.functions.sum($"rv").as("s"))
      .orderBy($"k")
    val baseline = q.collect()
    val (constrained, spilled) = withConfs(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.sortMergeJoinExec.buffer.in.memory.threshold" -> "64",
      "spark.sql.sortMergeJoinExec.buffer.spill.threshold" -> "64") {
      val df = q
      val rows = df.collect()
      (rows, metricSum(df, "spillSize"))
    }
    assert(spilled > 0, "200-row match groups must spill past a 16-row buffer")
    assert(constrained === baseline, "spilling must not change join results")
  }

  test("q1-class hash aggregate survives the sort-based fallback with identical results") {
    // The real pricing-summary entry, forced through HashAggregateExec's
    // can't-grow-the-map path: testFallbackStartsAt = "1,3" makes every
    // task switch to sort-based aggregation (the code path a 100 TB
    // group-by takes when the Tungsten map exhausts executor memory).
    val dir = "/root/testdata/sf0.001"
    val baseline = SparkEntry.queries("q1_pricing_summary")(spark, dir).collect()
    val (constrained, fellBack) = withConfs(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.TungstenAggregate.testFallbackStartsAt" -> "1, 3") {
      val df = SparkEntry.queries("q1_pricing_summary")(spark, dir)
      val rows = df.collect()
      (rows, metricSum(df, "numTasksFallBacked"))
    }
    assert(fellBack > 0, "the forced fallback must actually engage")
    assert(constrained === baseline, "sort-based fallback must not change aggregates")
  }
}
