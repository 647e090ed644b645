package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Deterministic scaled natural log — the cross-engine fix for the one
  * residual float divergence class the sf1 gate caught (round 13):
  * `Exact.scaled(ln(x), s)` rounds a LIBM result, and JVM `Math.log` vs
  * DuckDB's libm `log` may differ by 1 ulp, so a term whose ln lands
  * within ~1 ulp of the 0.5·10⁻ˢ rounding boundary flips the scaled long
  * between engines (observed: `q_llm_lm_trigram` at generated sf1 —
  * 7.5e7 trigram terms × P[boundary] ≈ 1.8e-9 ≈ one flipped term per
  * run; avg_nll differed at the 8th decimal). No output scale choice
  * fixes that — at 100 TB term counts the hit probability approaches 1 —
  * so the log itself must be computed identically.
  *
  * The kernel never calls a transcendental:
  *
  *  1. **Range reduction in exact double ops.** Comparisons and
  *     multiplication/division by powers of two are IEEE-exact and
  *     hardware-defined, hence bit-identical cross-engine: x < 1 is
  *     pre-scaled by 2⁶², then a 64/32/16/8/4/2/1 binary ladder brings
  *     the mantissa m into [1, 2) while accumulating the exponent k.
  *  2. **Quantize.** m9 = floor(m·1e9 + 0.5) — one exact multiply-round
  *     — makes all further state a BIGINT.
  *  3. **Integer-only atanh series.** t = (m9−1e9)·1e9 // (m9+1e9) ≤
  *     1/3·1e9; ln m ≈ 2·(t + t³/3 + … + t¹⁷/17) with every power and
  *     division a truncating 64-bit integer op (max intermediate
  *     3.4e8·1.1e17/1e9 < 2⁶³). ln x·1e9 ≈ k·[[Ln2_9]] + ln m·1e9.
  *  4. **Deterministic rounding** to the caller's output scale
  *     (floor(x·10ˢ + 0.5), the [[graft.util.Exact]] convention, spelled
  *     in integer floor-division so negatives round identically).
  *
  * Accuracy vs true ln: ≤ ~5e-8 absolute (quantization 5e-10, series
  * truncation ≤ 1e-8, Ln2 constant ≤ 62·4.4e-10) — irrelevant to
  * correctness, because BOTH engines now evaluate this same integer
  * definition: the kernel IS the scoring function. Domain: x ∈ (2⁻⁶²,
  * 2⁶²) — all smoothed-probability and count arguments by construction.
  *
  * The step list is shared text: Spark applies it as a `withColumn`
  * chain (each step a named column, so Catalyst sees a DAG — no
  * expression blow-up, everything stays in whole-stage codegen), the
  * oracle as a chain of single-reference CTEs (which DuckDB inlines
  * linearly). Only the integer-division spelling differs (`DIV` vs
  * `//`).
  */
object Dln {

  /** round(ln 2 · 1e9) — the quantized constant both engines multiply
    * the binary exponent by. */
  val Ln2_9 = 693147181L

  private val SparkDiv: (String, String) => String = (a, b) => s"(($a) DIV ($b))"
  private val DuckDiv: (String, String) => String = (a, b) => s"(($a) // ($b))"

  /** The shared step list: `(name, expression)` pairs where expressions
    * reference the caller-provided `argCol` and earlier step names, plus
    * the final output expression. All step names carry `prefix`. */
  private def steps(argCol: String, prefix: String,
                    idiv: (String, String) => String,
                    outScale: Int): (Seq[(String, String)], String) = {
    // The kernel computes at a fixed internal scale of 9; a caller asking
    // for more precision than the kernel carries would silently get a
    // scale-9 long mislabeled as scale-10+ (ADVICE r13). Fail loudly.
    require(outScale >= 0 && outScale <= 9,
      s"Dln supports outScale in [0, 9] (internal scale is 9); got $outScale")
    def n(s: String) = s"$prefix$s"
    val b = Seq.newBuilder[(String, String)]
    // 0. normalize to DOUBLE before ANY use. The caller must already
    //    hand a double-typed expression (literals spelled 1.0E0-style:
    //    Spark parses bare `1.0` as DECIMAL, so `(c+1.0)/(d+v)` runs in
    //    DECIMAL arithmetic Spark-side while DuckDB runs DOUBLE — ~500
    //    ulp quotient drift, the round-13 sf1 trigram divergence's true
    //    root cause). The cast makes the kernel's own comparisons
    //    double-typed even if a caller regresses.
    b += n("xd") -> s"CAST(($argCol) AS DOUBLE)"
    // 1. pre-scale sub-1 inputs by 2^62 (exact), remember the bias
    b += n("m0") -> (s"CASE WHEN ${n("xd")} < 1.0E0 THEN ${n("xd")} * " +
      s"4611686018427387904.0 ELSE ${n("xd")} END")
    b += n("k0") -> (s"CASE WHEN ${n("xd")} < 1.0E0 THEN CAST(-62 AS BIGINT) " +
      "ELSE CAST(0 AS BIGINT) END")
    // 2. binary ladder: divide out 2^64..2^1 (all exact) into [1, 2)
    val ladder = Seq(
      64 -> "18446744073709551616.0", 32 -> "4294967296.0", 16 -> "65536.0",
      8 -> "256.0", 4 -> "16.0", 2 -> "4.0", 1 -> "2.0")
    var (pm, pk) = (n("m0"), n("k0"))
    ladder.foreach { case (j, c) =>
      b += n(s"m$j") -> s"CASE WHEN $pm >= $c THEN $pm / $c ELSE $pm END"
      b += n(s"k$j") -> s"$pk + CASE WHEN $pm >= $c THEN $j ELSE 0 END"
      pm = n(s"m$j"); pk = n(s"k$j")
    }
    // 3. quantize the mantissa; integer atanh series
    b += n("q9") -> s"CAST(floor($pm * 1000000000.0 + 0.5) AS BIGINT)"
    b += n("t9") -> idiv(s"(${n("q9")} - 1000000000) * 1000000000",
      s"${n("q9")} + 1000000000")
    b += n("t2") -> idiv(s"${n("t9")} * ${n("t9")}", "1000000000")
    var prevP = n("t9")
    (3 to 17 by 2).foreach { o =>
      b += n(s"p$o") -> idiv(s"$prevP * ${n("t2")}", "1000000000")
      prevP = n(s"p$o")
    }
    val series = (Seq(n("t9")) ++ (3 to 17 by 2).map(o => idiv(n(s"p$o"), o.toString)))
      .mkString(" + ")
    b += n("s9") -> s"$pk * $Ln2_9 + 2 * ($series)"
    // 4. half-up rounding at the output scale, floor semantics for
    //    negatives (matches Exact.scaled's floor(x·10^s + 0.5))
    val out =
      if (outScale >= 9) n("s9")
      else {
        val d = math.pow(10, 9 - outScale).toLong
        val a = s"${n("s9")} + ${d / 2}"
        s"CASE WHEN ($a) >= 0 THEN ${idiv(a, d.toString)} " +
          s"ELSE -(${idiv(s"-($a) + ${d - 1}", d.toString)}) END"
      }
    (b.result(), out)
  }

  /** Spark side: append `outCol` = dln(argExpr) to `df` via a named-step
    * column chain (intermediates dropped). `prefix` must be unique per
    * call when a frame carries two kernels (DSIR's weight difference). */
  def withDln(df: DataFrame, argExpr: String, outCol: String,
              prefix: String = "_dl_", outScale: Int = 6): DataFrame = {
    val argCol = s"${prefix}arg"
    val (ss, out) = steps(argCol, prefix, SparkDiv, outScale)
    val withSteps = ss.foldLeft(df.withColumn(argCol, expr(argExpr))) {
      case (d, (nm, ex)) => d.withColumn(nm, expr(ex))
    }
    withSteps.withColumn(outCol, expr(out))
      .drop(argCol +: ss.map(_._1): _*)
  }

  /** Oracle side: CTE-chain text. `baseSelect` is a full SELECT that
    * must expose the kernel argument as column `<prefix>arg` alongside
    * the columns to keep; the chain ends in CTE `outCte` = keepCols +
    * `outCol`. Splice as `"..., ${duckChain(...)}, next AS (...)"`. */
  def duckChain(baseSelect: String, outCte: String, outCol: String,
                keepCols: Seq[String], prefix: String = "_dl_",
                outScale: Int = 6): String = {
    val argCol = s"${prefix}arg"
    val (ss, out) = steps(argCol, prefix, DuckDiv, outScale)
    val sb = new StringBuilder
    sb ++= s"${prefix}base AS (\n        $baseSelect)"
    var prev = s"${prefix}base"
    ss.foreach { case (nm, ex) =>
      sb ++= s",\n      ${nm}c AS (SELECT *, $ex AS $nm FROM $prev)"
      prev = s"${nm}c"
    }
    sb ++= s",\n      $outCte AS (SELECT ${keepCols.mkString(", ")}, " +
      s"$out AS $outCol FROM $prev)"
    sb.toString
  }
}
