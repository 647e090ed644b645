package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import XHash._

/** Graph centrality over the verified near-dup pair graph: a fixed number
  * of degree-normalized PageRank iterations picks each duplicate
  * cluster's MEDOID — the doc most linked into its cluster — as the
  * representative to keep. Min-id canonical picks (the
  * [[Dedup.connectedComponents]] label) keep an arbitrary member;
  * centrality keeps the member most similar to the rest, which is what a
  * curation pipeline actually wants to retain when a template family has
  * drifted.
  *
  * All arithmetic is scaled-long INTEGER (rank mass [[Scale]] = 1e12,
  * damping 85/100, truncating division on non-negative operands — Spark
  * `DIV` and DuckDB `//` agree bit-for-bit), so the iteration is
  * cross-engine exact with no float accumulation anywhere — which is
  * also what makes it partition-order-independent at 100 TB.
  *
  * Scale shape: each iteration is one equi-join of the edge list against
  * the current rank table (both keyed by doc id — the shuffle key never
  * changes, so the exchange is reused) plus a per-node sum; rounds are
  * materialized through the [[graft.util.Checkpointer]] knob so lineage
  * stays flat (Local for bench, Reliable/Store on a cluster). The
  * iteration count is FIXED ([[Iters]]) — centrality ordering inside a
  * cluster stabilizes in a few rounds on near-dup graphs (shallow,
  * clique-ish; see the adaptive-jump cost model on
  * [[Dedup.connectedComponents]]) — so the oracle unrolls the same
  * rounds as chained CTEs. Reference anchor: upgrades the keyed
  * one-winner-per-key dedup of `git_etl.ts:127-132` to a
  * similarity-weighted winner.
  */
object Graph {

  /** Total rank mass (scaled long). */
  val Scale = 1000000000000L
  /** Damping numerator/denominator: d = 85/100. */
  val DampNum = 85L
  /** Fixed PageRank rounds (unrolled identically in the oracle). */
  val Iters = 3

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Integer PageRank over an undirected `(doc_a, doc_b)` pair graph.
    * Returns `(doc_id, deg, pr12)` — pr12 is the scaled-long rank. Every
    * node of the pair graph has degree >= 1, so there are no dangling
    * nodes and the incoming-sum join is inner on both engines. */
  private[graft] def pagerank(pairs: DataFrame, iters: Int = Iters,
                              ckpt: graft.util.Checkpointer =
                                graft.util.Checkpointer.Local): DataFrame = {
    val edges = ckpt(
      pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst"))))
    val deg = edges.groupBy(col("src").as("doc")).agg(count(lit(1)).as("deg"))
    val nn = deg.agg(count(lit(1)).as("n_nodes"))
    // init: every node starts at Scale DIV n (deg and n ride along so the
    // loop never re-joins the degree table)
    var r = ckpt(deg.crossJoin(broadcast(nn))
      .selectExpr("doc", "deg", "n_nodes", s"$Scale DIV n_nodes AS pr12"))
    for (_ <- 1 to iters) {
      val incoming = edges
        .join(r.selectExpr("doc AS src", "pr12 DIV deg AS c"), "src")
        .groupBy(col("dst").as("doc")).agg(sum(col("c")).as("inc"))
      r = ckpt(r.select(col("doc"), col("deg"), col("n_nodes"))
        .join(incoming, "doc")
        .selectExpr("doc", "deg", "n_nodes",
          s"((($Scale DIV n_nodes) * ${100 - DampNum}) DIV 100) + " +
            s"((inc * $DampNum) DIV 100) AS pr12"))
    }
    r.select(col("doc").as("doc_id"), col("deg"), col("pr12"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Near-dup medoid election: PageRank over the MinHash-verified pair
    // graph, components from the shared CC fixpoint, medoid = the
    // component's max-rank member (ties -> min id). Both the pair
    // generation and the iteration are banded/keyed — no all-pairs work.
    "q_llm_centrality" -> { (s, dir) =>
      val pairs = Dedup.verifiedPairsCached(s, dir)
      val pr = pagerank(pairs)
      val cc = Dedup.connectedComponents(pairs)
      val w = Window.partitionBy(col("canonical"))
        .orderBy(col("pr12").desc, col("doc_id"))
      pr.join(cc, "doc_id")
        .withColumn("medoid", first(col("doc_id")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .select(col("doc_id"), col("canonical"), col("deg"), col("pr12"),
          col("medoid"))
        .orderBy(col("doc_id"))
    },

    // Triangle count + clustering coefficient over the verified near-dup
    // pair graph — the cluster-cohesion audit: a template family whose
    // members all match each other (cc ≈ 1) is one asset and safe to
    // collapse to a single canonical; a low-cc hub is CHAINED near-dups
    // (A≈B≈C but A≉C — the transitive-closure overreach case), where
    // min-id collapse would merge genuinely different docs. Algorithm:
    // the degree-oriented wedge join — each edge is oriented from its
    // lower (deg, id) endpoint, wedges form only at each vertex's
    // oriented out-edges, and a wedge closes iff its (id-ordered)
    // endpoint pair is an edge. Exactly one wedge per triangle (the
    // min-(deg, id) vertex owns it), and orienting by DEGREE bounds the
    // wedge count by Σ out-deg² — the standard distributed-triangle
    // trick that keeps a power-law hub from generating deg² wedges.
    // Three keyed equi-joins + two hash aggs; never an all-pairs join.
    "q_llm_graph_triangles" -> { (s, dir) =>
      trianglesOf(Dedup.verifiedPairsCached(s, dir))
    },

    // Cluster-cohesion audit: per near-dup component — member count,
    // verified-edge count, mean pairwise Jaccard (per-pair fixed-point
    // floor(1e6·J + .5), the portable Exact form; summed as longs and
    // divided once), and edge density vs the complete graph. High
    // density + high J = one template family, safe to collapse to one
    // canonical; a sparse low-J component is CHAINED near-dups where
    // min-id collapse would merge genuinely different docs. Consumes
    // the run-cached pairs artifact at full width (i/na/nb ride along).
    "q_llm_cluster_cohesion" -> { (s, dir) =>
      val vp = Dedup.verifiedPairsFullCached(s, dir)
      val cc = Dedup.connectedComponents(vp.select(col("doc_a"), col("doc_b")))
      val sizes = cc.groupBy(col("canonical"))
        .agg(count(lit(1)).as("cluster_size"))
      val edges = vp
        .withColumn("j6",
          floor(lit(1e6) * col("i") / (col("na") + col("nb") - col("i")) + lit(0.5)))
        .join(cc.select(col("doc_id").as("doc_a"), col("canonical")), "doc_a")
        .groupBy(col("canonical"))
        .agg(count(lit(1)).as("n_edges"), sum(col("j6")).as("sj6"))
      sizes.join(edges, "canonical")
        .select(col("canonical"), col("cluster_size"), col("n_edges"),
          (col("sj6") / col("n_edges") / lit(1e6)).as("mean_jaccard"),
          ((col("n_edges") * lit(2L)).cast("double") /
            (col("cluster_size") * (col("cluster_size") - lit(1L)))).as("density"))
        .orderBy(col("canonical"))
    })

  /** Triangle/clustering-coefficient pipeline over an id-canonical
    * `(doc_a < doc_b)` pair graph (q_llm_graph_triangles body; factored
    * so specs drive it over fixture graphs). */
  private[graft] def trianglesOf(pairs: DataFrame): DataFrame = {
    val deg = pairs.selectExpr("doc_a AS doc").union(pairs.selectExpr("doc_b"))
      .groupBy(col("doc")).agg(count(lit(1)).as("deg")).localCheckpoint()
    val or = pairs
      .join(deg.selectExpr("doc AS doc_a", "deg AS da"), "doc_a")
      .join(deg.selectExpr("doc AS doc_b", "deg AS db"), "doc_b")
      .selectExpr(
        "IF(da < db OR (da = db AND doc_a < doc_b), doc_a, doc_b) AS src",
        "IF(da < db OR (da = db AND doc_a < doc_b), doc_b, doc_a) AS dst")
    val wed = or.alias("x").join(or.alias("y"),
        col("x.src") === col("y.src") && col("x.dst") < col("y.dst"))
      .select(col("x.src").as("s"), col("x.dst").as("u"), col("y.dst").as("v"))
    val tri = wed.join(
        pairs.selectExpr("doc_a AS u", "doc_b AS v"), Seq("u", "v"), "left_semi")
    val perNode = tri.selectExpr("explode(array(s, u, v)) AS doc_id")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_tri"))
    deg.selectExpr("doc AS doc_id", "deg")
      .join(perNode, Seq("doc_id"), "left")
      .selectExpr("doc_id", "deg", "coalesce(n_tri, 0L) AS n_tri",
        "IF(deg >= 2, coalesce(n_tri, 0L) * 2000000 DIV (deg * (deg - 1)), 0L)" +
          " AS cc_ppm")
      .orderBy(col("doc_id"))
  }

  def oracleSql: Map[String, String] = {
    // unrolled PageRank rounds: pr0 -> pr1 -> ... -> prIters
    val rounds = (1 to Iters).map { k =>
      s"""pr$k AS (
        SELECT p.doc, p.deg, p.n_nodes,
               ((($Scale // p.n_nodes) * ${100 - DampNum}) // 100) +
                 ((i.inc * $DampNum) // 100) AS pr12
        FROM (SELECT doc, deg, n_nodes FROM pr${k - 1}) p
        JOIN (SELECT e.dst AS doc, CAST(sum(q.pr12 // q.deg) AS BIGINT) AS inc
              FROM edges e JOIN pr${k - 1} q ON e.src = q.doc
              GROUP BY e.dst) i ON i.doc = p.doc)"""
    }.mkString(",\n      ")
    Map(
      "q_llm_centrality" -> s"""
      WITH RECURSIVE ${Dedup.verifiedPairCtes("documents")},
      pairs AS (SELECT doc_a, doc_b FROM vpairs),
      edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION ALL SELECT doc_b, doc_a FROM pairs),
      degt AS (SELECT src AS doc, count(*) AS deg FROM edges GROUP BY src),
      pr0 AS (
        SELECT doc, deg, (SELECT count(*) FROM degt) AS n_nodes,
               $Scale // (SELECT count(*) FROM degt) AS pr12
        FROM degt),
      $rounds,
      ue AS (SELECT src AS a, dst AS b FROM edges),
      reach(a, b) AS (
        SELECT a, b FROM ue
        UNION
        SELECT r.a, e.b FROM reach r JOIN ue e ON r.b = e.a),
      canon AS (
        SELECT a AS doc_id, least(a, min(b)) AS canonical
        FROM reach GROUP BY a),
      scored AS (
        SELECT p.doc AS doc_id, c.canonical, p.deg, p.pr12
        FROM pr$Iters p JOIN canon c ON c.doc_id = p.doc),
      med AS (
        SELECT canonical, doc_id AS medoid FROM (
          SELECT canonical, doc_id,
                 row_number() OVER (PARTITION BY canonical
                   ORDER BY pr12 DESC, doc_id) AS rn
          FROM scored) WHERE rn = 1)
      SELECT s.doc_id, s.canonical, s.deg, s.pr12, m.medoid
      FROM scored s JOIN med m ON m.canonical = s.canonical
      ORDER BY s.doc_id""",

      "q_llm_cluster_cohesion" -> s"""
      WITH RECURSIVE ${Dedup.verifiedPairCtes("documents")},
      edges AS (
        SELECT doc_a AS a, doc_b AS b FROM vpairs
        UNION SELECT doc_b, doc_a FROM vpairs),
      reach(a, b) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
      canon AS (
        SELECT a AS doc_id, least(a, min(b)) AS canonical
        FROM reach GROUP BY a),
      sizes AS (
        SELECT canonical, count(*) AS cluster_size FROM canon GROUP BY canonical),
      ea AS (
        SELECT c.canonical, count(*) AS n_edges,
               sum(CAST(floor(1000000.0 * v.i / (v.na + v.nb - v.i) + 0.5)
                        AS BIGINT)) AS sj6
        FROM vpairs v JOIN canon c ON v.doc_a = c.doc_id
        GROUP BY c.canonical)
      SELECT s.canonical, s.cluster_size, e.n_edges,
             e.sj6 / e.n_edges / 1000000.0 AS mean_jaccard,
             CAST(2 * e.n_edges AS DOUBLE)
               / (s.cluster_size * (s.cluster_size - 1)) AS density
      FROM sizes s JOIN ea e ON e.canonical = s.canonical
      ORDER BY s.canonical""",

      "q_llm_graph_triangles" -> s"""
      WITH ${Dedup.verifiedPairCtes("documents")},
      pairs AS (SELECT doc_a, doc_b FROM vpairs),
      degt AS (
        SELECT doc, count(*) AS deg FROM (
          SELECT doc_a AS doc FROM pairs
          UNION ALL SELECT doc_b FROM pairs)
        GROUP BY doc),
      ort AS (
        SELECT CASE WHEN da < db OR (da = db AND doc_a < doc_b)
                    THEN doc_a ELSE doc_b END AS src,
               CASE WHEN da < db OR (da = db AND doc_a < doc_b)
                    THEN doc_b ELSE doc_a END AS dst
        FROM pairs
        JOIN (SELECT doc AS doc_a, deg AS da FROM degt) USING (doc_a)
        JOIN (SELECT doc AS doc_b, deg AS db FROM degt) USING (doc_b)),
      wed AS (
        SELECT x.src AS s, x.dst AS u, y.dst AS v
        FROM ort x JOIN ort y ON x.src = y.src AND x.dst < y.dst),
      tri AS (
        SELECT s, u, v FROM wed
        WHERE EXISTS (SELECT 1 FROM pairs p
                      WHERE p.doc_a = wed.u AND p.doc_b = wed.v)),
      pernode AS (
        SELECT doc_id, count(*) AS n_tri FROM (
          SELECT s AS doc_id FROM tri
          UNION ALL SELECT u FROM tri
          UNION ALL SELECT v FROM tri)
        GROUP BY doc_id)
      SELECT d.doc AS doc_id, d.deg,
             CAST(coalesce(p.n_tri, 0) AS BIGINT) AS n_tri,
             CASE WHEN d.deg >= 2
                  THEN CAST(coalesce(p.n_tri, 0) AS BIGINT) * 2000000
                       // (d.deg * (d.deg - 1))
                  ELSE CAST(0 AS BIGINT) END AS cc_ppm
      FROM degt d LEFT JOIN pernode p ON p.doc_id = d.doc
      ORDER BY doc_id""")
  }
}
