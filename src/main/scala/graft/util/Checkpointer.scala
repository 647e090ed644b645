package graft.util

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.DataFrame

/** Materialization strategy for iterative / self-referencing pipelines
  * (connected components, Lloyd rounds, the dedup verification tail) —
  * everywhere a DataFrame is referenced more than once or lineage must be
  * cut per round.
  *
  * The executor-loss tradeoff, explicitly:
  *
  *  - [[Checkpointer.Local]] (`localCheckpoint`): blocks live in executor
  *    storage with NO lineage to recompute them — the fastest option and
  *    the right default for bench/test scale, but a single executor loss
  *    at 100 TB kills the job unrecoverably mid-iteration.
  *  - [[Checkpointer.Reliable]] (`checkpoint` into a reliable dir): RDD
  *    blocks are written to the checkpoint directory (HDFS/object store on
  *    a cluster), so surviving executors re-read lost partitions instead
  *    of dying. Costs one write+read of each materialized table per round;
  *    this is what a 1000-executor production run should pass.
  *  - [[Checkpointer.Store]]: parquet round-trip through a store path —
  *    also restart-safe ACROSS DRIVER runs (a new job can resume from the
  *    last written step), at the cost of parquet encode/decode; the
  *    checkpoint becomes an inspectable table, which is how the reference
  *    persists every intermediate sync state (`git_etl.ts:127-132`).
  *
  * All three strategies return a DataFrame with identical contents; specs
  * run the same pipeline under each and assert equal results, so choosing
  * a strategy is purely an availability/cost decision, never a semantic
  * one.
  */
sealed trait Checkpointer {
  def apply(df: DataFrame): DataFrame
}

object Checkpointer {

  /** Executor-local blocks, lineage truncated. Fast; not loss-safe. */
  case object Local extends Checkpointer {
    def apply(df: DataFrame): DataFrame = df.localCheckpoint()
  }

  /** Reliable checkpoint into `dir` (HDFS/object store on a cluster):
    * survives executor loss. Sets the context checkpoint dir on first use
    * (idempotent — last setting wins, which is fine for a per-pipeline
    * strategy object). */
  final case class Reliable(dir: String) extends Checkpointer {
    def apply(df: DataFrame): DataFrame = {
      val sc = df.sparkSession.sparkContext
      if (!sc.getCheckpointDir.contains(dir)) sc.setCheckpointDir(dir)
      df.checkpoint()
    }
  }

  /** Parquet round-trip through `dir/step_N`: survives executor loss AND
    * driver restarts (steps are addressable tables a resumed job can
    * read). Overwrite mode keeps replays idempotent. */
  final case class Store(dir: String) extends Checkpointer {
    private val n = new AtomicInteger(0)
    def apply(df: DataFrame): DataFrame = {
      val p = s"$dir/step_${n.incrementAndGet()}"
      df.write.mode("overwrite").parquet(p)
      df.sparkSession.read.parquet(p)
    }
  }
}
