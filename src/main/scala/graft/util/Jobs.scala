package graft.util

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Bounded concurrent Spark-job submission for operators that decompose
  * into many small independent jobs (the sharded dedup's per-shard /
  * per-bucket loops). Running such jobs one-at-a-time leaves the
  * scheduler idle between stages; running them ALL at once multiplies
  * the in-flight shuffle footprint by the job count and voids the
  * per-stage resource bound the decomposition exists to provide. A
  * fixed-width pool keeps at most `width` jobs in flight, so the bound
  * is (per-job cost × width), independent of how many jobs the corpus
  * size fans out to.
  *
  * Jobs MUST target disjoint outputs: two Spark jobs appending into one
  * directory tree race on the default committer's `_temporary` cleanup.
  *
  * Cluster note: this is driver-side orchestration of `collect`-free
  * actions (each thread only calls a DataFrame terminal op), the same
  * idiom Spark's own scheduler docs give for concurrent job submission —
  * it works identically on a real cluster master. Failures propagate:
  * the first failed job's exception is rethrown after the pool drains.
  */
object Jobs {

  def inPool(width: Int)(work: Seq[() => Unit]): Unit = {
    require(width >= 1, s"pool width must be >= 1, got $width")
    val pool = Executors.newFixedThreadPool(width)
    implicit val ec: ExecutionContext =
      ExecutionContext.fromExecutorService(pool)
    try Await.result(Future.sequence(work.map(w => Future(w()))), Duration.Inf)
    catch { case e: Throwable =>
      // Fail-fast must not leave jobs running: the caller's `finally`
      // typically deletes the scratch tree these jobs write into, and a
      // still-running job would recreate directories after the delete
      // (leaked scratch) and surface confusing secondary errors. Drop
      // the queued work, interrupt in-flight jobs, and WAIT for the
      // pool to drain before letting the exception escape.
      pool.shutdownNow()
      pool.awaitTermination(10, java.util.concurrent.TimeUnit.MINUTES)
      throw e
    }
    finally pool.shutdown()
  }
}
