package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.llm.XHash._
import graft.util.Exact

/** Corpus curation operators (north-star suite): the bookkeeping every
  * large-scale training-data pipeline runs between dedup and training —
  * deterministic split assignment, sequence packing, and mixture
  * weighting. All three are narrow projections/aggregations (no joins of
  * O(N) tables), and all arithmetic is integer/exact so the DuckDB oracle
  * matches bit-for-bit.
  */
object Curation {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Context length for concat-and-chop packing (whitespace tokens). */
  val CtxLen = 512L

  /** Per-source mixture weights (a config literal in a real pipeline;
    * here a deterministic ramp over the test corpus's src0..src19 that
    * sums to 1). Both engines consume the same Scala Doubles — Spark via
    * `toDF`, the oracle via exact plain-decimal literals (see the
    * formatting note in [[oracleSql]]). */
  val mixtureWeights: Seq[(String, Double)] =
    (0 until 20).map(i => (s"src$i", (i + 1) / 210.0))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Deterministic train/val/test split: hash the (salted) doc id, not a
    // RNG — reproducible across runs/engines/cluster sizes, stable under
    // re-partitioning, and new docs don't reshuffle old assignments (the
    // property a 100 TB pipeline needs; a random() split has none of
    // these). 80/10/10 by hash mod 100. Output: per (source, split)
    // counts + exact token mass, the table a data-mixture audit reads.
    "q_llm_split_assign" -> { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      docs(s, dir)
        .selectExpr("source", "size(split(text, ' ')) AS n_tok",
          s"graft_charhash(concat('split-v1:', CAST(doc_id AS STRING))) % 100 AS bucket")
        .selectExpr("source", "n_tok",
          "CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split")
        .groupBy(col("source"), col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tokens"))
        .orderBy(col("source"), col("split"))
    },

    // Sequence packing (concat-and-chop): documents are concatenated in a
    // deterministic order and chopped into CtxLen-token training
    // sequences; each doc spans chunks [floor(start/L), floor((end-1)/L)].
    // Packing is PER SOURCE (partitionBy(source) + orderBy(doc_id)): the
    // running sum is a partitioned window, so no single-task global
    // cumsum — the shape that scales is shard-local packing, which is
    // what real pipelines do anyway. Output: per-source chunk counts,
    // boundary-crossing docs, and exact fill of the last (ragged) chunk.
    "q_llm_pack_sequences" -> { (s, dir) =>
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docs(s, dir)
        .selectExpr("source", "doc_id", "size(split(text, ' ')) AS n_tok")
        .withColumn("cum", sum(col("n_tok")).over(w))
        .selectExpr("source", "n_tok", "cum",
          s"(cum - n_tok) DIV $CtxLen AS first_chunk",
          s"(cum - 1) DIV $CtxLen AS last_chunk")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("tokens"),
          (max(col("last_chunk")) + 1).as("n_chunks"),
          sum(expr("IF(last_chunk > first_chunk, 1, 0)")).as("n_boundary_docs"),
          max(col("cum")).as("cum_max"))
        .selectExpr("source", "n_docs", "tokens", "n_chunks", "n_boundary_docs",
          s"CAST(cum_max - (n_chunks - 1) * $CtxLen AS BIGINT) AS last_chunk_fill")
        .orderBy(col("source"))
    },

    // Mixture weighting: per-source token mass vs target mixture weights →
    // the effective per-epoch sampling factor (how many times each
    // source's tokens repeat to hit its share of a fixed token budget
    // equal to the corpus size). Broadcast constant-row literal weights
    // table (one row per source); exact fixed-point output.
    "q_llm_mixture_stats" -> { (s, dir) =>
      import s.implicits._
      val weights = mixtureWeights.toDF("source", "weight")
      val perSource = docs(s, dir)
        .selectExpr("source", "size(split(text, ' ')) AS n_tok")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tokens"))
      val total = perSource.agg(sum(col("tokens")).as("total_tokens"))
      perSource.join(broadcast(weights), Seq("source"))
        .crossJoin(broadcast(total))
        .selectExpr("source", "n_docs", "tokens",
          "CAST(tokens AS DOUBLE) / total_tokens AS nat_raw",
          "weight",
          "weight * total_tokens / tokens AS rep_raw")
        .select(col("source"), col("n_docs"), col("tokens"),
          Exact.fix(col("nat_raw"), 6).as("natural_share"),
          col("weight"),
          Exact.fix(col("rep_raw"), 6).as("repetition_factor"))
        .orderBy(col("source"))
    })

  def oracleSql: Map[String, String] = {
    // Two literal-formatting traps: (a) DuckDB parses a bare decimal
    // literal as DECIMAL (even under CAST), which rounds differently from
    // the Spark Double at the last ulp — the trailing e0 forces DOUBLE
    // parsing; (b) Scala's Double.toString uses E-notation for small/huge
    // values, which would corrupt the suffix — BigDecimal.toPlainString
    // prints the double's exact decimal expansion, digit-for-digit
    // parseable and round-tripping to the identical double.
    val weightValues = mixtureWeights
      .map { case (s, w) =>
        s"('$s', ${new java.math.BigDecimal(w).toPlainString}e0)" }
      .mkString(", ")
    Map(
      "q_llm_split_assign" -> s"""
      WITH b AS (
        SELECT source, len(string_split(text, ' ')) AS n_tok,
               ${duckCharHash("concat('split-v1:', CAST(doc_id AS VARCHAR))")} % 100 AS bucket
        FROM documents)
      SELECT source,
             CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
             count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS tokens
      FROM b GROUP BY 1, 2 ORDER BY source, split""",

      "q_llm_pack_sequences" -> s"""
      WITH t AS (
        SELECT source, doc_id, len(string_split(text, ' ')) AS n_tok
        FROM documents),
      c AS (
        SELECT source, n_tok,
               sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM t),
      ch AS (
        SELECT source, n_tok, cum,
               (cum - n_tok) // $CtxLen AS first_chunk,
               (cum - 1) // $CtxLen AS last_chunk
        FROM c),
      agg AS (
        SELECT source, count(*) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS tokens,
               CAST(max(last_chunk) + 1 AS BIGINT) AS n_chunks,
               CAST(sum(CASE WHEN last_chunk > first_chunk THEN 1 ELSE 0 END) AS BIGINT) AS n_boundary_docs,
               max(cum) AS cum_max
        FROM ch GROUP BY source)
      SELECT source, n_docs, tokens, n_chunks, n_boundary_docs,
             CAST(cum_max - (n_chunks - 1) * $CtxLen AS BIGINT) AS last_chunk_fill
      FROM agg ORDER BY source""",

      "q_llm_mixture_stats" -> s"""
      WITH w(source, weight) AS (VALUES $weightValues),
      per AS (
        SELECT source, count(*) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
        FROM documents GROUP BY source),
      tot AS (SELECT sum(tokens) AS total_tokens FROM per)
      SELECT per.source, per.n_docs, per.tokens,
             ${Exact.sqlFix("CAST(per.tokens AS DOUBLE) / total_tokens", 6)} AS natural_share,
             w.weight,
             ${Exact.sqlFix("w.weight * total_tokens / per.tokens", 6)} AS repetition_factor
      FROM per JOIN w USING (source) CROSS JOIN tot
      ORDER BY per.source""")
  }
}
