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

  test("compactBuckets coalesces accumulated small files without changing contents") {
    import spark.implicits._
    val dest = s"$base/compact"
    Sinks.truncate(dest)
    // 4 merges, each fanning rows across many shuffle tasks -> multi-file
    // buckets (AQE partition coalescing is disabled for the fixture; at
    // real scale the merge stage has many non-empty tasks per bucket
    // without any help)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      (0 until 4).foreach { g =>
        val batch = (0 until 64).map(i => (i.toLong, s"v${g}_$i")).toDF("k", "v")
          .repartition(8)
        Sinks.mergeByKeyBucket(spark, dest, batch, "k", Seq("v"), nBuckets = 4)
      }
    } finally spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    def filesPerBucket: Map[Int, Int] = (0 until 4).map { b =>
      val d = new java.io.File(s"$dest/_bucket=$b")
      b -> Option(d.listFiles).map(_.count(_.getName.endsWith(".parquet"))).getOrElse(0)
    }.toMap
    assert(filesPerBucket.values.max > 1, "merges should have left multi-file buckets")
    val before = spark.read.parquet(dest).as[(Long, String, Int)].collect().sortBy(_._1)
    Sinks.compactBuckets(spark, dest)
    assert(filesPerBucket.values.forall(_ == 1),
      s"compaction must leave exactly 1 file per bucket, got $filesPerBucket")
    val after = spark.read.parquet(dest).as[(Long, String, Int)].collect().sortBy(_._1)
    assert(after === before, "compaction must not change contents")
    // second compaction is a no-op on an already-tight store
    Sinks.compactBuckets(spark, dest)
    assert(filesPerBucket.values.forall(_ == 1))
  }

  test("merges use the store's persisted bucket count, not the caller's") {
    import spark.implicits._
    val dest = s"$base/bucketmeta"
    Sinks.truncate(dest)
    Sinks.mergeByKeyBucket(spark, dest, Seq((1L, "a"), (2L, "b")).toDF("k", "v"),
      "k", Seq("v"), nBuckets = 4)
    assert(Sinks.storedBucketCount(dest) === Some(4))
    // caller passes a WRONG count on merge: key 5 would pmod to a
    // different bucket under 7 than under the store's 4 — detection must
    // keep the layout at 4 so the upsert still dedups correctly
    Sinks.mergeByKeyBucket(spark, dest, Seq((1L, "a2"), (5L, "c")).toDF("k", "v"),
      "k", Seq("v"), nBuckets = 7)
    val got = spark.read.parquet(dest).as[(Long, String, Int)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L)._1 === "a2", "upsert must replace the stored row")
    assert(got.size === 3)
    assert(got.values.forall { case (_, b) => b >= 0 && b < 4 },
      "every row must live in one of the store's 4 buckets")
    assert(got(5L)._2 === (5L % 4).toInt)
  }

  test("bucketCountFor: power-of-two sizing clamped to [16, 65536]") {
    assert(Sinks.bucketCountFor(0L) === 16)
    assert(Sinks.bucketCountFor(1000L) === 16)
    // 1B rows / 4M per bucket = ~239 -> next power of two = 256
    assert(Sinks.bucketCountFor(1000000000L) === 256)
    // 1T rows -> clamped at 65536
    assert(Sinks.bucketCountFor(1000000000000L) === 65536)
    // exact power boundary stays put
    assert(Sinks.bucketCountFor(64L * (4L << 20)) === 64)
  }

  test("versioned store: commit/snapshotAt/compactVersions with retention") {
    import spark.implicits._
    val store = s"$base/versioned"
    Sinks.deleteRec(store)
    assert(Sinks.latestVersion(store).isEmpty)
    assert(Sinks.commitVersion(spark, store,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), "k") === 0L)
    assert(Sinks.commitVersion(spark, store,
      Seq((2L, "b2")).toDF("k", "v"), "k") === 1L)
    assert(Sinks.commitVersion(spark, store,
      Seq((1L, "a3"), (4L, "d3")).toDF("k", "v"), "k") === 2L)

    def snap(v: Long): Map[Long, String] =
      Sinks.snapshotAt(spark, store, v, "k")
        .select($"k", $"v").as[(Long, String)].collect().toMap
    assert(snap(0) === Map(1L -> "a", 2L -> "b", 3L -> "c"))
    assert(snap(1) === Map(1L -> "a", 2L -> "b2", 3L -> "c"))
    assert(snap(2) === Map(1L -> "a3", 2L -> "b2", 3L -> "c", 4L -> "d3"))

    // compaction folds v0+v1 into a base; snapshots at and above the
    // horizon are unchanged, below it becomes an explicit error
    Sinks.compactVersions(spark, store, upTo = 1L, key = "k")
    assert(Files.exists(Paths.get(s"$store/base_v=1")))
    assert(!Files.exists(Paths.get(s"$store/delta_v=0")))
    assert(snap(1) === Map(1L -> "a", 2L -> "b2", 3L -> "c"))
    assert(snap(2) === Map(1L -> "a3", 2L -> "b2", 3L -> "c", 4L -> "d3"))
    intercept[IllegalArgumentException](snap(0))

    // commits continue past compaction; a lingering folded delta (the
    // compaction-crash window: base renamed, delete unfinished) is
    // harmless to reads — winner resolution already supersedes it
    assert(Sinks.commitVersion(spark, store,
      Seq((3L, "c3")).toDF("k", "v"), "k") === 3L)
    Seq((2L, "b0-stale")).toDF("k", "v")
      .withColumn("_v", org.apache.spark.sql.functions.lit(0L))
      .write.parquet(s"$store/delta_v=0")
    assert(snap(3) === Map(1L -> "a3", 2L -> "b2", 3L -> "c3", 4L -> "d3"))
    // the next compaction finishes the cleanup
    Sinks.compactVersions(spark, store, upTo = 2L, key = "k")
    assert(!Files.exists(Paths.get(s"$store/delta_v=0")))
    assert(!Files.exists(Paths.get(s"$store/base_v=1")))
    assert(snap(3) === Map(1L -> "a3", 2L -> "b2", 3L -> "c3", 4L -> "d3"))
  }

  test("versioned store: tombstone deletes, CDC feed, compaction keeps markers") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val store = s"$base/cdc"
    Sinks.deleteRec(store)
    Sinks.commitVersion(spark, store,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), "k")          // v0
    Sinks.commitVersion(spark, store,
      Seq((2L, "b1"), (4L, "d1")).toDF("k", "v"), "k")                   // v1
    // delete an original key (3), an in-window insert (4), and an
    // absent key (99) — the last must be a harmless no-op everywhere
    Sinks.commitDeletes(spark, store, Seq(3L, 4L, 99L).toDF("k"), "k")   // v2

    def snap(v: Long): Map[Long, String] =
      Sinks.snapshotAt(spark, store, v, "k")
        .select($"k", $"v").as[(Long, String)].collect().toMap
    assert(snap(1) === Map(1L -> "a", 2L -> "b1", 3L -> "c", 4L -> "d1"))
    assert(snap(2) === Map(1L -> "a", 2L -> "b1"))

    def feed(vFrom: Long, vTo: Long): Set[(String, Long, Option[String])] =
      Sinks.changesBetween(spark, store, vFrom, vTo, "k")
        .select($"change_type", $"k", $"v")
        .as[(String, Long, Option[String])].collect().toSet
    // over (0,2]: 2 updated; 4's insert+delete nets out to nothing; 99
    // never existed; 3 deleted with null payload
    assert(feed(0L, 2L) === Set(("update", 2L, Some("b1")), ("delete", 3L, None)))
    // over (1,2]: both 3 and 4 existed at v1, so both report as deletes
    assert(feed(1L, 2L) === Set(("delete", 3L, None), ("delete", 4L, None)))
    // over (0,1]: pure upsert window — 2 updates, 4 inserts
    assert(feed(0L, 1L) === Set(("update", 2L, Some("b1")), ("insert", 4L, Some("d1"))))

    // compaction folds the tombstones but KEEPS their markers in the base
    Sinks.compactVersions(spark, store, upTo = 2L, key = "k")
    assert(snap(2) === Map(1L -> "a", 2L -> "b1"))
    // resurrection guard: a folded delta lingering from a compaction
    // crash re-offers key 3's old row — the base's marker must win
    Seq((3L, "c-stale")).toDF("k", "v")
      .withColumn("_tombstone", lit(false)).withColumn("_v", lit(0L))
      .write.parquet(s"$store/delta_v=0")
    assert(snap(2) === Map(1L -> "a", 2L -> "b1"),
      "tombstone marker in the base must supersede a lingering folded delta")
    Sinks.deleteRec(s"$store/delta_v=0")

    // delete-then-reinsert: the key comes back and the feed calls it an
    // insert (it was absent in the vFrom snapshot)
    Sinks.commitVersion(spark, store, Seq((3L, "c-back")).toDF("k", "v"), "k") // v3
    assert(snap(3) === Map(1L -> "a", 2L -> "b1", 3L -> "c-back"))
    assert(feed(2L, 3L) === Set(("insert", 3L, Some("c-back"))))
  }

  test("SCD2 apply: one open row per key, closed rows end at the change date, history joins") {
    import spark.implicits._
    val dim = Sinks.queries("q_sink_scd2")(spark, "/root/testdata/sf0.001")
    // exactly one is_current row per key — the invariant every
    // point-in-time join depends on
    val dupCurrent = dim.where($"is_current")
      .groupBy($"c_custkey").count().where($"count" > 1).count()
    assert(dupCurrent === 0L)
    // changed keys carry exactly two versions: old closed at the change
    // date, new open from it — a contiguous validity chain
    val changed = dim.groupBy($"c_custkey").count().where($"count" === 2)
      .select($"c_custkey").collect().map(_.getLong(0))
    assert(changed.nonEmpty && changed.forall(_ % 10 == 3))
    val rows = dim.where($"c_custkey" === changed.head)
      .orderBy($"eff_from").collect()
    assert(rows(0).getDate(3).toString === "2024-06-01" && !rows(0).getBoolean(4))
    assert(rows(1).getDate(2).toString === "2024-06-01" && rows(1).getBoolean(4))
    // brand-new keys exist only as open rows
    val fresh = dim.where($"c_custkey" >= 10000000L)
    assert(fresh.count() > 0 && fresh.where(!$"is_current").count() === 0L)
  }

  test("SCD2 point-in-time join: validity intervals partition time — every order matches once") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val pit = Sinks.queries("q_sink_scd2_pit")(spark, dir)
    val joined = pit.agg(org.apache.spark.sql.functions.sum($"n_orders")).head.getLong(0)
    val total = graft.sources.Tables.load(spark, dir, "orders").count()
    // exactly-one-version semantics: the per-segment counts sum to the
    // full fact table — no order dropped, none double-matched
    assert(joined === total, s"PIT join matched $joined of $total orders")
    // history resolves: pre-change orders land in original segments,
    // post-change orders of moved keys in MOVED_* segments
    val segs = pit.select($"c_mktsegment").as[String].collect().toSet
    assert(segs.exists(_.startsWith("MOVED_")), s"no moved segments in $segs")
  }

  test("quarantine routing: no row lost, corrupt payloads preserved verbatim in the DLQ") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val rep = Sinks.queries("q_sink_quarantine")(spark, dir)
    val total = graft.sources.Tables.load(spark, dir, "events").count()
    val routed = rep.agg(org.apache.spark.sql.functions.sum($"n_clean" + $"n_quarantined"))
      .head.getLong(0)
    assert(routed === total, "clean + quarantined must reconcile to the source")
    assert(rep.agg(org.apache.spark.sql.functions.sum($"n_quarantined")).head.getLong(0) > 0)
    // the DLQ store keeps the ORIGINAL broken payload for replay
    val dlq = spark.read.parquet(s"${Sinks.tmpBase}/events_dlq")
    assert(dlq.columns.contains("props"))
    assert(dlq.where($"event_id" % 13 =!= 0).count() === 0L,
      "only the corrupted slice routes to the DLQ")
  }

  test("streaming SCD2: per-key validity chains are contiguous, one open row per key") {
    import spark.implicits._
    val dim = graft.streaming.StreamOps.queries("stream_scd2_ticks")(
      spark, "/root/testdata/sf0.001")
    val rows = dim.collect()
    // exactly one open row per key
    val open = rows.filter(_.getBoolean(4))
    assert(open.map(_.getLong(0)).distinct.length === open.length)
    assert(open.length === rows.map(_.getLong(0)).distinct.length)
    // intervals chain: each closed row's eff_to is the next row's eff_from
    rows.groupBy(_.getLong(0)).values.foreach { vs =>
      val chain = vs.sortBy(_.getDate(2).toString)
      chain.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getDate(3).toString === b.getDate(2).toString,
            s"gap in key ${a.getLong(0)}")
        case _ => ()
      }
      assert(chain.last.getDate(3).toString === "9999-12-31")
    }
    // multi-version keys exist (a key hit by all three change ticks has 4)
    assert(rows.groupBy(_.getLong(0)).values.map(_.length).max >= 3)
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

  test("appendBuckets: no-read append; replayed tick overwrites its own file, never duplicates") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val dest = s"$base/append_store"
    Sinks.truncate(dest)
    Sinks.initBucketStore(dest, 4)
    def batch(r: Range) = r.toDF("v")
      .withColumn("_bucket", pmod(col("v"), lit(4)).cast("int"))
    Sinks.appendBuckets(spark, dest, batch(1 to 40), "t0")
    Sinks.appendBuckets(spark, dest, batch(41 to 60), "t1")
    assert(spark.read.parquet(dest).select("v").as[Int].collect().sorted
      === (1 to 60).toArray)
    // replay of tick t1 (crash-recovery): same tag -> same per-bucket file
    // names -> overwrite, not duplicate
    Sinks.appendBuckets(spark, dest, batch(41 to 60), "t1")
    assert(spark.read.parquet(dest).select("v").as[Int].collect().sorted
      === (1 to 60).toArray)
    // each bucket dir holds exactly one file per tick (deterministic names)
    val b1 = Paths.get(s"$dest/_bucket=1")
    val files = Files.list(b1)
    val names = try {
      import scala.jdk.CollectionConverters._
      files.iterator().asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".parquet")).toList.sorted
    } finally files.close()
    assert(names === List("append_t0_0.parquet", "append_t1_0.parquet"),
      s"expected one deterministic file per tick, got $names")
  }

  test("publishSet: readers never see a cross-version mix; republish idempotent") {
    import spark.implicits._
    val dest = s"$base/multiset"
    Sinks.truncate(dest)
    def tbls(v: String) = Map(
      "a" -> Seq((1, v)).toDF("k", "v"),
      "b" -> Seq((2, v)).toDF("k", "v"))
    Sinks.publishSet(spark, dest, 1L, tbls("one"))
    // mid-publish crash: v2 data for BOTH tables is on disk, but the
    // manifest was never swapped — readers must stay on the complete v1
    tbls("two").foreach { case (n, df) =>
      df.write.mode("overwrite").parquet(s"$dest/tables/$n/v_2") }
    assert(Sinks.manifestVersion(dest) === 1L)
    assert(Sinks.readSet(spark, dest, "a").as[(Int, String)].head() === ((1, "one")))
    assert(Sinks.readSet(spark, dest, "b").as[(Int, String)].head() === ((2, "one")))
    // completed publish flips both at once; replaying it is a no-op
    Sinks.publishSet(spark, dest, 2L, tbls("two"))
    Sinks.publishSet(spark, dest, 2L, tbls("two"))
    assert(Sinks.manifestVersion(dest) === 2L)
    assert(Sinks.readSet(spark, dest, "a").as[(Int, String)].head() === ((1, "two")))
    assert(Sinks.readSet(spark, dest, "b").as[(Int, String)].head() === ((2, "two")))
    // a DELAYED replay of an OLDER committed version (at-least-once
    // redelivery) must not roll readers back to stale data
    Sinks.publishSet(spark, dest, 1L, tbls("stale"))
    assert(Sinks.manifestVersion(dest) === 2L)
    assert(Sinks.readSet(spark, dest, "a").as[(Int, String)].head() === ((1, "two")))
  }

  test("deleteByKeyBucket honors a bucketCol store's true layout") {
    import spark.implicits._
    val store = s"$base/fk_delete"
    Sinks.truncate(store)
    // keyed by k, physically bucketed by the FK — the join-MV layout
    val rows = Seq((1L, 10L, "a"), (2L, 10L, "b"), (3L, 20L, "c"), (4L, 30L, "d"))
      .toDF("k", "fk", "v")
    Sinks.mergeByKeyBucket(spark, store, rows, "k", Seq("v"),
      nBuckets = 8, bucketCol = "fk")
    // delete list carries the bucketing column -> pruned path finds the row
    Sinks.deleteByKeyBucket(spark, store, Seq((2L, 10L)).toDF("k", "fk"), "k")
    assert(spark.read.parquet(store).select("k").as[Long].collect().sorted
      === Seq(1L, 3L, 4L))
    // delete list WITHOUT fk -> unpruned fallback must still delete (a
    // pmod(k) bucket guess would read the wrong buckets and drop nothing)
    Sinks.deleteByKeyBucket(spark, store, Seq(3L).toDF("k"), "k")
    assert(spark.read.parquet(store).select("k").as[Long].collect().sorted
      === Seq(1L, 4L))
    // a later merge that OMITS bucketCol must still bucket by the store's
    // persisted layout column — an update to k=1 (fk=10) lands beside its
    // stored twin and upserts it, never strands a stale copy
    Sinks.mergeByKeyBucket(spark, store,
      Seq((1L, 10L, "a2")).toDF("k", "fk", "v"), "k", Seq("v"))
    val after = spark.read.parquet(store)
      .select("k", "v").as[(Long, String)].collect().sortBy(_._1)
    assert(after.toSeq === Seq((1L, "a2"), (4L, "d")),
      "update must replace the twin in the fk bucket, not duplicate k=1")
  }

  test("deleteByKeyMoR: zero data-bucket rewrites; compaction converges to the CoW result") {
    import spark.implicits._
    val mor = s"$base/mor_store"
    val cow = s"$base/cow_store"
    Sinks.truncate(mor); Sinks.truncate(cow)
    val rows = (0L until 64L).map(k => (k, s"v$k")).toDF("k", "v")
    Sinks.mergeByKeyBucket(spark, mor, rows, "k", Seq("v"), nBuckets = 8)
    Sinks.mergeByKeyBucket(spark, cow, rows, "k", Seq("v"), nBuckets = 8)
    def dataFiles(dest: String): Map[String, (Long, Long)] = {
      val d = new java.io.File(dest)
      Option(d.listFiles).getOrElse(Array.empty)
        .filter(_.getName.startsWith("_bucket="))
        .flatMap(b => Option(b.listFiles).getOrElse(Array.empty).toSeq
          .filter(_.getName.endsWith(".parquet"))
          .map(f => s"${b.getName}/${f.getName}" -> (f.length, f.lastModified)))
        .toMap
    }
    val before = dataFiles(mor)
    val delKeys = (0L until 64L).filter(_ % 10 == 3)
    Sinks.deleteByKeyMoR(spark, mor, delKeys.toDF("k"), "k", tag = "d1")
    assert(dataFiles(mor) === before,
      "a MoR delete must not touch any data bucket file")
    // raw read still carries the rows; the MoR read masks them
    assert(spark.read.parquet(mor).count() === 64)
    val masked = Sinks.readWithDeletes(spark, mor, "k").select("k").as[Long]
      .collect().sorted.toSeq
    assert(masked === (0L until 64L).filterNot(_ % 10 == 3))
    // replayed delete (same tag, fewer keys): sidecar reflects the replay,
    // still zero data rewrites
    Sinks.deleteByKeyMoR(spark, mor, delKeys.take(2).toDF("k"), "k", tag = "d1")
    assert(dataFiles(mor) === before)
    Sinks.deleteByKeyMoR(spark, mor, delKeys.toDF("k"), "k", tag = "d1")
    assert(Sinks.readWithDeletes(spark, mor, "k").count() === masked.size.toLong)
    // fold in; compare against the direct CoW delete of the twin store
    Sinks.compactDeletes(spark, mor, "k")
    assert(!Files.exists(Paths.get(s"$mor/_deletes")), "sidecar must be cleared")
    Sinks.deleteByKeyBucket(spark, cow, delKeys.toDF("k"), "k")
    def snap(dest: String) = spark.read.parquet(dest)
      .select("k", "v", "_bucket").as[(Long, String, Int)].collect().sortBy(_._1).toSeq
    assert(snap(mor) === snap(cow),
      "compacted MoR store must be row-identical to the CoW path")
    // replayed compaction on a clean store is a no-op
    Sinks.compactDeletes(spark, mor, "k")
    assert(snap(mor) === snap(cow))
    // post-compaction MoR read has no sidecar join at all
    assert(Sinks.readWithDeletes(spark, mor, "k").count() === masked.size.toLong)
  }
}
