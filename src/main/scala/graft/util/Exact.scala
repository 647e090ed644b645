package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-exact numeric helpers for oracle-compared results.
  *
  * `round()` on doubles is NOT portable: Spark rounds the shortest decimal
  * representation (BigDecimal.valueOf, HALF_UP) while DuckDB rounds the
  * binary value, so every product of "nice" 2-decimal inputs that lands on a
  * .xx5 boundary diverges. Instead:
  *
  *  - per-row: `floor(x*10^s + 0.5)` — identical IEEE ops on identical input
  *    bits in both engines → identical longs;
  *  - aggregates: sum the scaled longs (exact, order-independent) and divide
  *    once at the end → identical doubles.
  *
  * This also makes double-sum aggregation order-independent, which matters at
  * 100 TB: a float sum's value would otherwise depend on partition count.
  * Oracle-side SQL uses the same formula (`CAST(floor(x*100+0.5) AS BIGINT)`).
  */
object Exact {
  /** Scaled-long of a double: floor(c * 10^s + 0.5). Spark floor → LongType. */
  def scaled(c: Column, s: Int): Column = floor(c * lit(math.pow(10, s)) + lit(0.5))

  /** Per-row value rounded to `s` decimals, bit-identical across engines. */
  def fix(c: Column, s: Int): Column = scaled(c, s) / lit(math.pow(10, s))

  /** Exact sum at `s` decimals (sum of scaled longs, divided once). */
  def sumFix(c: Column, s: Int): Column = sum(scaled(c, s)) / lit(math.pow(10, s))

  /** Exact mean at `s` decimals: long/long → identical double division. */
  def avgFix(c: Column, s: Int): Column =
    sum(scaled(c, s)) / count(lit(1)) / lit(math.pow(10, s))

  /** Oracle-side SQL fragments mirroring the Spark expressions above. */
  def sqlScaled(x: String, s: Int): String =
    s"CAST(floor(($x) * ${math.pow(10, s).toLong} + 0.5) AS BIGINT)"
  def sqlFix(x: String, s: Int): String =
    s"${sqlScaled(x, s)} / ${math.pow(10, s).toLong}.0"
  def sqlSumFix(x: String, s: Int): String =
    s"sum(${sqlScaled(x, s)}) / ${math.pow(10, s).toLong}.0"
  def sqlAvgFix(x: String, s: Int): String =
    s"sum(${sqlScaled(x, s)}) / count(*) / ${math.pow(10, s).toLong}.0"
}
