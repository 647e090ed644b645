package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** DataSource V2 commit source: pushdown reaches the source (pages before
  * the bound are never planned), pruning drops columns, and the data
  * contract matches the generator formulas. */
class CommitSourceSpec extends SparkSpec {

  private def src(rows: Int) =
    spark.read.format("graft.sources.CommitSource").option("rows", rows.toString).load()

  test("row contract and full count") {
    val first = src(250).orderBy("ts").limit(1).collect()(0)
    assert(first.getString(0) === "c00000000")
    assert(first.getTimestamp(1).toInstant.toString === "2024-01-01T00:00:00Z")
    assert(first.getString(2) === "u0@x")
    assert(first.getString(3) === "m0")
    assert(src(250).count() === 250)
  }

  test("ts >= bound is pushed: scan plans only the matching tail") {
    // row i has ts = base + i*137s; bound at i=1000 exactly
    val bound = java.time.Instant.parse("2024-01-01T00:00:00Z")
      .plusSeconds(1000L * 137).toString.replace("T", " ").replace("Z", "")
    val df = src(5000).where(col("ts") >= lit(bound).cast(TimestampType))
    assert(df.count() === 4000)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("since="), s"pushed bound missing in:\n$scan")
    // partitions planned: pages 10..49 only (40 of 50)
    val parts = df.rdd.getNumPartitions
    assert(parts === 40, s"expected 40 planned pages, got $parts")
  }

  test("column pruning reaches the source") {
    val df = src(100).select(col("message"))
    val scan = df.queryExecution.executedPlan.toString
    assert(!scan.contains("sha#") || !scan.contains("Output [4]"),
      s"expected pruned scan in:\n$scan")
    assert(df.distinct().count() === 7)
  }
}
