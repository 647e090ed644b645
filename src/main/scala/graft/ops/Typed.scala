package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Tables

/** Typed `Dataset[T]` surface (SURVEY §1.3: case-class Encoders where type
  * safety helps). `groupByKey` + `mapGroups` is the JVM-native custom-
  * aggregation escape hatch — the group fold below is order-independent
  * (count/sum/max), so results are deterministic under any partitioning,
  * which is the property that makes it safe at 100 TB.
  */
object Typed {

  final case class Ev(event_id: Long, user_id: Long, event_type: String, value: Double)
  final case class CohortStats(cohort: Long, n: Long, sum_cents: Long, max_value: Double)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_typed_groups" -> { (s, dir) =>
      import s.implicits._
      val ds = Tables.load(s, dir, "events")
        .selectExpr("event_id", "user_id", "event_type", "value")
        // SQL `<>` semantics (NULL event_type drops); a JVM `_ != "error"`
        // lambda would keep NULLs and diverge on the first nullable corpus.
        .filter($"event_type" =!= "error")
        .as[Ev]
      ds.groupByKey(_.user_id % 50)
        .mapGroups { (cohort, it) =>
          var n = 0L; var cents = 0L; var mx = Double.MinValue
          it.foreach { e =>
            n += 1
            cents += math.floor(e.value * 100 + 0.5).toLong
            if (e.value > mx) mx = e.value
          }
          CohortStats(cohort, n, cents, mx)
        }
        .toDF()
        // CAST to DOUBLE first: Spark parses `100.0` as DECIMAL, and
        // BIGINT/DECIMAL division is decimal math while the oracle is double.
        .selectExpr("cohort", "n", "CAST(sum_cents AS DOUBLE) / 100.0 AS sum_value", "max_value")
        .orderBy("cohort")
    })

  def oracleSql: Map[String, String] = Map(
    "q_typed_groups" -> """
      SELECT user_id % 50 AS cohort, count(*) AS n,
             sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_value,
             max(value) AS max_value
      FROM events WHERE event_type <> 'error'
      GROUP BY cohort ORDER BY cohort""")
}
