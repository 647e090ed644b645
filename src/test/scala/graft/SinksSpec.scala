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

  test("writeAtomic heals a crash window between renames (.old present, dest gone)") {
    import spark.implicits._
    val dest = s"$base/recover"
    Sinks.truncate(dest)
    Sinks.writeAtomic(Seq((1, "v1")).toDF("k", "v"), dest)
    // simulate a crash AFTER dest->dest.old but BEFORE tmp->dest: the
    // table vanishes and only the .old copy remains
    Files.move(Paths.get(dest), Paths.get(dest + ".old"))
    assert(!Files.exists(Paths.get(dest)))
    Sinks.recover(dest)
    val healed = spark.read.parquet(dest).as[(Int, String)].collect()
    assert(healed === Array((1, "v1")), "recover must restore the previous snapshot")
    // and writeAtomic itself heals-then-overwrites if recover wasn't called
    Files.move(Paths.get(dest), Paths.get(dest + ".old"))
    Sinks.writeAtomic(Seq((2, "v2")).toDF("k", "v"), dest)
    assert(spark.read.parquet(dest).as[(Int, String)].collect() === Array((2, "v2")))
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

  test("mergeByKeyBucket heals a crash inside the bucket swap") {
    import spark.implicits._
    val dest = s"$base/bucketcrash"
    Sinks.truncate(dest)
    val initial = (0L to 15L).map(k => (k, 1, "v1")).toDF("k", "ord", "v")
    Sinks.mergeByKeyBucket(spark, dest, initial, "k", Seq("ord"), nBuckets = 4)
    // simulate a crash BETWEEN the two renames of bucket 2's swap: the
    // live dir is gone, only the .old copy remains (dot prefix keeps it
    // invisible to readers)
    Files.move(Paths.get(s"$dest/_bucket=2"), Paths.get(s"$dest/.old_bucket_2"))
    // a plain reader sees the healthy buckets only — never a torn dir
    assert(spark.read.parquet(dest).count() === 12)
    // the next merge heals first, then applies its batch
    val batch = Seq((1L, 2, "v2")).toDF("k", "ord", "v") // touches bucket 1 only
    Sinks.mergeByKeyBucket(spark, dest, batch, "k", Seq("ord"), nBuckets = 4)
    val got = spark.read.parquet(dest).as[(Long, Int, String, Int)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(got.size === 16, "healed store must have all 16 keys back")
    assert(got(1L) === "v2" && got(2L) === "v1" && got(6L) === "v1")
    assert(!Files.exists(Paths.get(s"$dest/.old_bucket_2")))
    assert(!Files.exists(Paths.get(s"$dest/_merge_staging")))
  }

  test("mergeByKeyBucket rewrites only touched buckets, preserves the rest") {
    import spark.implicits._
    val dest = s"$base/bucketmerge"
    Sinks.truncate(dest)
    // keys 0..15 spread over 4 buckets
    val initial = (0L to 15L).map(k => (k, 1, "v1")).toDF("k", "ord", "v")
    Sinks.mergeByKeyBucket(spark, dest, initial, "k", Seq("ord"), nBuckets = 4)
    // batch touches ONLY bucket 0 (keys 0, 4, 8)
    val batch = Seq((0L, 2, "v2"), (4L, 2, "v2"), (8L, 2, "v2")).toDF("k", "ord", "v")
    Sinks.mergeByKeyBucket(spark, dest, batch, "k", Seq("ord"), nBuckets = 4)
    val got = spark.read.parquet(dest).as[(Long, Int, String, Int)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(got.size === 16)
    assert(Seq(0L, 4L, 8L).forall(got(_) == "v2"))   // merged bucket updated
    assert((1L to 15L).filter(_ % 4 != 0).forall(got(_) == "v1")) // others intact
    assert(got(12L) === "v1") // bucket-0 key NOT in batch keeps old value
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
