package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.llm.XHash._
import graft.util.Exact

/** Similarity search over the `embeddings` table (north-star operator).
  *
  * Two paths, same output shape, so a user can trade recall for cost:
  *  - `q_llm_knn_brute`: exact cosine top-k. The query set is small and
  *    BROADCAST; the corpus streams past it — one scan, no shuffle of the
  *    corpus, embarrassingly parallel. This is the right "brute force" at
  *    100 TB when the query side fits in memory (it's the corpus that's
  *    huge, and it is never self-joined).
  *  - `q_llm_knn_lsh`: hyperplane-LSH bucketed ANN. Corpus and queries are
  *    bucketed by 4 sign bits (16 buckets); candidates come from a bucket
  *    equi-join (hash shuffle on bucket), then exact cosine re-ranks within
  *    the bucket. Recall < 1 by design; the plan is O(N/buckets) per query.
  *
  * Dot products use scaled-long embeddings (exact, order-independent — see
  * [[XHash.sparkScaledEmb]]) and are UNROLLED 64-term integer expressions,
  * which keeps them inside whole-stage codegen (no higher-order functions
  * in the hot pair loop).
  */
object Similarity {

  /** vec_id, scaled-long embedding, precomputed norm. Norms are computed
    * ONCE per vector before any join (O(N), not O(pairs)); dot products go
    * through the native codegen kernel [[graft.functions.LongDot]]. */
  private[llm] def scaledEmb(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.load(s, dir, "embeddings")
      .selectExpr("vec_id", s"${sparkScaledEmb("embedding")} AS se")
      .selectExpr("vec_id", "se",
        "sqrt(CAST(graft_dot(se, se) AS DOUBLE)) AS nrm")
  }

  private def cosExpr(a: String, b: String, na: String, nb: String): String =
    s"CAST(graft_dot($a, $b) AS DOUBLE) / ($na * $nb)"

  private def duckCosExpr(a: String, b: String, na: String, nb: String): String =
    s"CAST(${duckPairDot(a, b)} AS DOUBLE) / ($na * $nb)"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact top-5 neighbors for each query vector (vec_id < 10): corpus
    // scan x broadcast queries, per-query window top-k.
    "q_llm_knn_brute" -> { (s, dir) =>
      val se = scaledEmb(s, dir)
      val qs = se.where(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("se").as("qse"), col("nrm").as("qnrm"))
      val scored = se.crossJoin(broadcast(qs))
        .where(col("vec_id") =!= col("q_id"))
        .selectExpr("q_id", "vec_id AS neighbor_id",
          s"${cosExpr("qse", "se", "qnrm", "nrm")} AS cos_raw")
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("cos_raw").desc, col("neighbor_id"))
      scored.withColumn("rank", row_number().over(w))
        .where(col("rank") <= 5)
        .withColumn("cos", Exact.fix(col("cos_raw"), 6))
        .select(col("q_id"), col("rank"), col("neighbor_id"), col("cos"))
        .orderBy(col("q_id"), col("rank"))
    },

    // IVF-style ANN: deterministic coarse quantizer (centroids = the first
    // 16 vectors), one assignment pass (corpus x broadcast centroids,
    // argmax cosine), queries probe their nprobe=2 nearest cells, exact
    // re-rank inside the probed cells. The scale path: the corpus is
    // scanned once for assignment, and each query touches ~2/16ths of it.
    "q_llm_knn_ivf" -> { (s, dir) =>
      val se = scaledEmb(s, dir)
      val cents = se.where(col("vec_id") < 16)
        .select(col("vec_id").as("cent_id"), col("se").as("cse"), col("nrm").as("cnrm"))
      val wAssign = Window.partitionBy(col("vec_id"))
        .orderBy(col("ccos").desc, col("cent_id"))
      val assigned = se.crossJoin(broadcast(cents))
        .selectExpr("vec_id", "se", "nrm", "cent_id",
          s"${cosExpr("se", "cse", "nrm", "cnrm")} AS ccos")
        .withColumn("rn", row_number().over(wAssign))
        .where(col("rn") === 1)
        .select(col("vec_id"), col("se"), col("nrm"), col("cent_id").as("cell"))
      val probes = se.where(col("vec_id") < 10).crossJoin(broadcast(cents))
        .selectExpr("vec_id AS q_id", "se AS qse", "nrm AS qnrm", "cent_id",
          s"${cosExpr("se", "cse", "nrm", "cnrm")} AS ccos")
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("q_id")).orderBy(col("ccos").desc, col("cent_id"))))
        .where(col("rn") <= 2)
        .select(col("q_id"), col("qse"), col("qnrm"), col("cent_id").as("cell"))
      val scored = assigned.join(probes, Seq("cell"))
        .where(col("vec_id") =!= col("q_id"))
        .selectExpr("q_id", "vec_id AS neighbor_id",
          s"${cosExpr("qse", "se", "qnrm", "nrm")} AS cos_raw")
      scored.withColumn("rank", row_number().over(
          Window.partitionBy(col("q_id")).orderBy(col("cos_raw").desc, col("neighbor_id"))))
        .where(col("rank") <= 3)
        .withColumn("cos", Exact.fix(col("cos_raw"), 6))
        .select(col("q_id"), col("rank"), col("neighbor_id"), col("cos"))
        .orderBy(col("q_id"), col("rank"))
    },

    "q_llm_knn_recall" -> recallEntry,

    // LSH-bucketed ANN: candidates restricted to the query's sign-bit
    // bucket (planes 0..3), exact cosine re-rank, top-3.
    "q_llm_knn_lsh" -> { (s, dir) =>
      val bucketed = scaledEmb(s, dir)
        .selectExpr(Seq("vec_id", "se", "nrm") ++
          (0 until 4).map(p => s"IF(${sparkPlaneDot("se", p)} > 0L, 1, 0) AS bit$p"): _*)
        .selectExpr("vec_id", "se", "nrm", "concat_ws('', bit0, bit1, bit2, bit3) AS bucket")
      val qs = bucketed.where(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("se").as("qse"), col("nrm").as("qnrm"), col("bucket"))
      val scored = bucketed.join(broadcast(qs), Seq("bucket"))
        .where(col("vec_id") =!= col("q_id"))
        .selectExpr("q_id", "vec_id AS neighbor_id",
          s"${cosExpr("qse", "se", "qnrm", "nrm")} AS cos_raw")
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("cos_raw").desc, col("neighbor_id"))
      scored.withColumn("rank", row_number().over(w))
        .where(col("rank") <= 3)
        .withColumn("cos", Exact.fix(col("cos_raw"), 6))
        .select(col("q_id"), col("rank"), col("neighbor_id"), col("cos"))
        .orderBy(col("q_id"), col("rank"))
    })

  /** Recall evaluation: how many of each query's exact top-5 neighbors the
    * LSH-bucketed index surfaces. The evaluation harness every ANN
    * deployment needs — both sides are deterministic, so the oracle
    * reproduces the exact same recall table. */
  private val recallEntry: (SparkSession, String) => DataFrame = { (s, dir) =>
    val brute = queries("q_llm_knn_brute")(s, dir)
      .select(col("q_id"), col("neighbor_id"))
    val lsh = queries("q_llm_knn_lsh")(s, dir)
      .select(col("q_id"), col("neighbor_id")).withColumn("_hit", lit(1))
    brute.join(lsh, Seq("q_id", "neighbor_id"), "left")
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("n_true"), sum(coalesce(col("_hit"), lit(0))).as("n_found"))
      .selectExpr("q_id", "n_true", "n_found",
        "CAST(n_found AS DOUBLE) / n_true AS recall")
      .orderBy(col("q_id"))
  }

  def oracleSql: Map[String, String] = {
    val duckBits = (0 until 4)
      .map(p => s"CASE WHEN ${duckPlaneDot("se", p)} > 0 THEN 1 ELSE 0 END AS bit$p")
      .mkString(",\n               ")
    val base = Map(
      "q_llm_knn_brute" -> s"""
      WITH e0 AS (
        SELECT vec_id, ${duckScaledEmb("embedding")} AS se FROM embeddings),
      e AS (
        SELECT vec_id, se, sqrt(CAST(${duckPairDot("se", "se")} AS DOUBLE)) AS nrm FROM e0),
      q AS (SELECT vec_id AS q_id, se AS qse, nrm AS qnrm FROM e WHERE vec_id < 10),
      scored AS (
        SELECT q_id, e.vec_id AS neighbor_id,
               ${duckCosExpr("qse", "se", "qnrm", "nrm")} AS cos_raw
        FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id),
      r AS (
        SELECT q_id, neighbor_id, cos_raw,
               CAST(row_number() OVER (PARTITION BY q_id
                 ORDER BY cos_raw DESC, neighbor_id) AS INT) AS rank
        FROM scored)
      SELECT q_id, rank, neighbor_id, ${Exact.sqlFix("cos_raw", 6)} AS cos
      FROM r WHERE rank <= 5 ORDER BY q_id, rank""",

      "q_llm_knn_ivf" -> s"""
      WITH e0 AS (
        SELECT vec_id, ${duckScaledEmb("embedding")} AS se FROM embeddings),
      e AS (
        SELECT vec_id, se, sqrt(CAST(${duckPairDot("se", "se")} AS DOUBLE)) AS nrm FROM e0),
      cents AS (SELECT vec_id AS cent_id, se AS cse, nrm AS cnrm FROM e WHERE vec_id < 16),
      assign0 AS (
        SELECT e.vec_id, e.se, e.nrm, cent_id,
               ${duckCosExpr("se", "cse", "nrm", "cnrm")} AS ccos,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY ${duckCosExpr("se", "cse", "nrm", "cnrm")} DESC, cent_id) AS rn
        FROM e CROSS JOIN cents),
      assigned AS (
        SELECT vec_id, se, nrm, cent_id AS cell FROM assign0 WHERE rn = 1),
      probe0 AS (
        SELECT e.vec_id AS q_id, e.se AS qse, e.nrm AS qnrm, cent_id,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY ${duckCosExpr("se", "cse", "nrm", "cnrm")} DESC, cent_id) AS rn
        FROM e CROSS JOIN cents WHERE e.vec_id < 10),
      probes AS (
        SELECT q_id, qse, qnrm, cent_id AS cell FROM probe0 WHERE rn <= 2),
      scored AS (
        SELECT q_id, a.vec_id AS neighbor_id,
               ${duckCosExpr("qse", "se", "qnrm", "nrm")} AS cos_raw
        FROM assigned a JOIN probes p ON a.cell = p.cell
        WHERE a.vec_id <> p.q_id),
      r AS (
        SELECT q_id, neighbor_id, cos_raw,
               CAST(row_number() OVER (PARTITION BY q_id
                 ORDER BY cos_raw DESC, neighbor_id) AS INT) AS rank
        FROM scored)
      SELECT q_id, rank, neighbor_id, ${Exact.sqlFix("cos_raw", 6)} AS cos
      FROM r WHERE rank <= 3 ORDER BY q_id, rank""",

      "q_llm_knn_lsh" -> s"""
      WITH e0 AS (
        SELECT vec_id, ${duckScaledEmb("embedding")} AS se FROM embeddings),
      e AS (
        SELECT vec_id, se, sqrt(CAST(${duckPairDot("se", "se")} AS DOUBLE)) AS nrm FROM e0),
      bits AS (
        SELECT vec_id, se, nrm,
               $duckBits
        FROM e),
      bucketed AS (
        SELECT vec_id, se, nrm, concat_ws('', bit0, bit1, bit2, bit3) AS bucket FROM bits),
      q AS (SELECT vec_id AS q_id, se AS qse, nrm AS qnrm, bucket FROM bucketed WHERE vec_id < 10),
      scored AS (
        SELECT q.q_id, c.vec_id AS neighbor_id,
               ${duckCosExpr("qse", "se", "qnrm", "nrm")} AS cos_raw
        FROM bucketed c JOIN q ON c.bucket = q.bucket
        WHERE c.vec_id <> q.q_id),
      r AS (
        SELECT q_id, neighbor_id, cos_raw,
               CAST(row_number() OVER (PARTITION BY q_id
                 ORDER BY cos_raw DESC, neighbor_id) AS INT) AS rank
        FROM scored)
      SELECT q_id, rank, neighbor_id, ${Exact.sqlFix("cos_raw", 6)} AS cos
      FROM r WHERE rank <= 3 ORDER BY q_id, rank""")

    base + ("q_llm_knn_recall" -> s"""
      SELECT b.q_id, count(*) AS n_true,
             CAST(sum(CASE WHEN l.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_found,
             CAST(sum(CASE WHEN l.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS recall
      FROM (${base("q_llm_knn_brute")}) b
      LEFT JOIN (${base("q_llm_knn_lsh")}) l
        ON b.q_id = l.q_id AND b.neighbor_id = l.neighbor_id
      GROUP BY b.q_id ORDER BY b.q_id""")
  }
}
