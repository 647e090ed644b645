package graft

import java.nio.file.{Files, Paths}

import graft.sinks.Sinks

/** Durable sink semantics: atomic overwrite visibility, truncate, and
  * partition-pruned reads of a partitionBy layout (O7/O11, SURVEY §7.4). */
class SinksSpec extends SparkSpec {

  private val base = Sinks.tmpBase + "/spec"

  test("writeAtomic: reader sees only the last complete snapshot; no stale sidecars") {
    import spark.implicits._
    val dest = s"$base/atomic"
    Sinks.truncate(dest)
    Sinks.writeAtomic(Seq((1, "v1"), (2, "v1")).toDF("k", "v"), dest)
    Sinks.writeAtomic(Seq((3, "v2")).toDF("k", "v"), dest)
    val got = spark.read.parquet(dest).as[(Int, String)].collect()
    assert(got === Array((3, "v2")))
    assert(!Files.exists(Paths.get(dest + ".inprogress")))
    assert(!Files.exists(Paths.get(dest + ".old")))
  }

  test("truncate removes the table (O11)") {
    import spark.implicits._
    val dest = s"$base/trunc"
    Sinks.writeAtomic(Seq(1, 2, 3).toDF("x"), dest)
    assert(Files.exists(Paths.get(dest)))
    Sinks.truncate(dest)
    assert(!Files.exists(Paths.get(dest)))
  }

  test("partitionBy layout prunes: partition filter appears in the scan (O7)") {
    import spark.implicits._
    val dest = s"$base/parts"
    Sinks.truncate(dest)
    val df = (1 to 100).map(i => (i, if (i % 2 == 0) "even" else "odd")).toDF("x", "par")
    Sinks.writeAtomic(df, dest, partitionCols = Seq("par"))
    // physical layout: one directory per partition value
    assert(Files.exists(Paths.get(s"$dest/par=even")))
    val pruned = spark.read.parquet(dest).where($"par" === "even")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("par"))
    assert(pruned.count() === 50)
  }
}
