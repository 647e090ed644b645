package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.GraftKernels
import graft.ingest.EtlConfig

/** Pure-JVM property tests (SURVEY §5.2 item 3). Spark-job-backed
  * properties live in [[SparkProperties]] with a reduced case count. */
object KernelProperties extends Properties("kernels") {

  val asciiText: Gen[String] = Gen.listOf(Gen.choose(32.toChar, 126.toChar)).map(_.mkString)

  property("charPolyHash == reference fold for arbitrary ASCII strings") =
    forAll(asciiText) { s =>
      val model = s.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % GraftKernels.P)
      GraftKernels.charPolyHash(s) == model
    }

  property("charPolyHash is prefix-sensitive: h(s+c) derived from h(s)") =
    forAll(asciiText, Gen.choose(32.toChar, 126.toChar)) { (s, c) =>
      val h = GraftKernels.charPolyHash(s)
      GraftKernels.charPolyHash(s + c) == (h * 31 + c.toInt) % GraftKernels.P
    }

  property("valid 5-field crons validate; 4-field never do") = {
    val field = Gen.oneOf(Gen.const("*"), Gen.choose(0, 59).map(_.toString),
      Gen.choose(1, 30).map(n => s"*/$n"),
      Gen.choose(0, 20).flatMap(a => Gen.choose(21, 59).map(b => s"$a-$b")))
    forAll(Gen.listOfN(5, field)) { fs =>
      EtlConfig.cronValid(fs.mkString(" ")) &&
        !EtlConfig.cronValid(fs.take(4).mkString(" "))
    }
  }
}

/** Spark-backed properties: smaller case counts (each case is a job). */
object SparkProperties extends Properties("spark-ops") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSession.spark

  val batch: Gen[List[(Long, Int)]] =
    Gen.listOfN(30, Gen.zip(Gen.choose(0L, 9L), Gen.choose(0, 1000)))

  property("upsert is idempotent: applying a batch twice == once") =
    forAll(batch, batch) { (existRows, inRows) =>
      import spark.implicits._
      val existing = existRows.toDF("k", "v")
      val incoming = inRows.toDF("k", "v")
      val once = graft.ingest.CommitEtl.upsert(existing, incoming, "k", Seq("v"))
      val twice = graft.ingest.CommitEtl.upsert(once, incoming, "k", Seq("v"))
      val a = once.orderBy("k", "v").collect().toSeq
      val b = twice.orderBy("k", "v").collect().toSeq
      a == b
    }

  property("upsert keeps exactly one row per key, preferring incoming") =
    forAll(batch, batch) { (existRows, inRows) =>
      import spark.implicits._
      val out = graft.ingest.CommitEtl.upsert(
        existRows.toDF("k", "v"), inRows.toDF("k", "v"), "k", Seq("v"))
        .as[(Long, Int)].collect()
      val keys = (existRows ++ inRows).map(_._1).toSet
      val inKeys = inRows.groupBy(_._1)
      out.length == keys.size && out.forall { case (k, v) =>
        inKeys.get(k) match {
          case Some(rows) => v == rows.map(_._2).max // incoming wins; max v tie-break
          case None       => existRows.filter(_._1 == k).map(_._2).max == v
        }
      }
    }
}
