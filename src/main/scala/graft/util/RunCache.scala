package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Pin/sweep registry for block-manager hygiene in long single-JVM runs
  * (Bench, Verify: hundreds of queries share one SparkContext).
  *
  * Why it exists: every `localCheckpoint()` PERSISTS an RDD, and those
  * blocks are only reclaimed when the RDD object is garbage-collected and
  * the ContextCleaner notices — with a 100 GiB heap, full GCs are rare,
  * so a suite run accumulates every query's checkpoint blocks. Measured
  * at generated sf1: the 6th query of a suite ran 4.7× its standalone
  * time (147 s vs 31 s) purely from the storage pressure + GC churn the
  * first five left behind. The sweep makes query N's cost independent of
  * N again (an executor in a real cluster gets this isolation from the
  * scheduler; a single-JVM bench has to do it by hand).
  *
  * Why a PIN list: unpersisting a localCheckpointed RDD is destructive —
  * the checkpoint TRUNCATED its lineage, so the data cannot be
  * recomputed; any artifact deliberately shared across queries (the
  * verified-pairs cache, PERF.md #48) must survive the sweep. [[pin]]
  * records the checkpoint RDD id behind a cached DataFrame (the
  * `LogicalRDD` its analyzed plan wraps); [[sweep]] unpersists every
  * persistent RDD EXCEPT the pinned ones. */
object RunCache {

  private val pinned = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()

  /** Register the checkpoint RDD(s) behind `df` as sweep-survivors.
    * Returns `df` for call-site chaining. */
  def pin(df: DataFrame): DataFrame = {
    df.queryExecution.analyzed.foreach {
      case l: LogicalRDD => pinned.add(l.rdd.id)
      case _ =>
    }
    df
  }

  /** Unpersist every persistent RDD not pinned. Safe between queries:
    * per-query DataFrames are never reused across queries, and
    * everything shared is pinned at creation. BLOCKING on purpose: the
    * sweep runs untimed between queries, block removal is local and
    * fast, and fire-and-forget unpersist futures race the JVM's
    * shutdown pools — the rejected-execution stack traces they print
    * after the final sweep would land in the driver's stdout tail-grab
    * right behind the result JSON. */
  def sweep(s: SparkSession): Unit = {
    s.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
      if (!pinned.contains(id)) rdd.unpersist(blocking = true)
    }
    // Shuffle files and broadcasts are reclaimed only when the
    // ContextCleaner's weak references fire — i.e. after a GC — and a
    // 100 GiB-heap driver may not GC for dozens of queries, so their
    // disk/metadata footprint grows with suite POSITION. Measured even
    // with the RDD sweep alone: q_llm_dedup_family_recall 430 s as
    // suite entry #7 vs 65.6 s standalone. An explicit GC per sweep
    // (untimed, a few hundred ms) keeps the cleaner current — the
    // standard remedy for long-running Spark drivers.
    System.gc()
  }
}
