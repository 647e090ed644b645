package graft

import org.apache.spark.sql.functions._

/** The deterministic integer-ln kernel ([[graft.llm.Dln]]) — accuracy
  * against libm, exact rounding semantics, and the multi-kernel frame
  * case. Cross-engine identity is proven by the oracle gate itself (the
  * DuckDB chain evaluates the same integer steps); these tests pin the
  * Spark side's numeric contract. */
class DlnSpec extends SparkSpec {
  import graft.llm.Dln

  private def dln6(xs: Seq[Double]): Map[Double, Long] = {
    import spark.implicits._
    Dln.withDln(xs.toDF("x"), "x", "l6")
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
  }

  test("dln6 tracks Math.log within 1e-7 relative-to-scale across 24 decades") {
    val xs = (-31 to 31).map(e => math.pow(10, e / 2.6)) ++
      Seq(1.0, 2.0, 0.5, math.E, 1.0 / 3.0, 123456789.0, 1e-12, 7.7e11)
    val got = dln6(xs)
    xs.foreach { x =>
      val want = math.floor(math.log(x) * 1e6 + 0.5)
      assert(math.abs(got(x) - want) <= 1,
        s"dln6($x) = ${got(x)}, libm rounds to $want")
    }
  }

  test("exact anchors: ln 1 = 0; ln 2^±k = ±k·Ln2 with floor(+0.5) rounding") {
    val got = dln6(Seq(1.0, 2.0, 0.5, 1024.0, 1.0 / 1024))
    assert(got(1.0) === 0L)
    // k·Ln2_9 = ±693147181 → floor((x+500)/1000) under floor semantics
    assert(got(2.0) === 693147L)
    assert(got(0.5) === -693147L) // floor(-693147181/1000 + 0.5) = -693147
    assert(got(1024.0) === 6931472L) // 10·ln2·1e6 = 6931471.8 → 6931472
    assert(got(1.0 / 1024) === -6931472L) // floor(-6931471.8 + 0.5) = -6931472
  }

  test("two kernels on one frame (the DSIR shape) stay independent") {
    import spark.implicits._
    val df = Seq((4.0, 0.25), (1.0, 1.0)).toDF("a", "b")
    val out = Dln.withDln(Dln.withDln(df, "a", "la", prefix = "_p_"),
        "b", "lb", prefix = "_q_")
      .withColumn("d", col("la") - col("lb"))
      .collect().map(r => (r.getDouble(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    val m = out.map(t => t._1 -> t).toMap
    assert(m(4.0)._2 === 1386294L) // 2·ln2
    assert(m(4.0)._3 === -1386294L)
    assert(m(4.0)._4 === 2 * 1386294L)
    assert(m(1.0) === ((1.0, 0L, 0L, 0L)))
  }

  test("intermediates are dropped; only the output column is added") {
    import spark.implicits._
    val df = Dln.withDln(Seq(3.0).toDF("x"), "x", "l6")
    assert(df.columns.toSeq === Seq("x", "l6"))
  }
}
