package graft

import org.apache.spark.sql.functions._

import graft.llm.Graph

/** Integer PageRank: mass conservation-ish sanity and medoid ordering. */
class GraphSpec extends SparkSpec {

  test("star graph: the hub out-ranks every leaf") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))
      .toDF("doc_a", "doc_b")
    val pr = Graph.pagerank(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(pr.keySet === Set(1L, 2L, 3L, 4L, 5L))
    val leaves = Set(2L, 3L, 4L, 5L).map(pr)
    assert(leaves.forall(pr(1L) > _))
    // symmetric leaves get identical integer ranks
    assert(leaves.size === 1)
  }

  test("path graph: interior nodes out-rank endpoints") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("doc_a", "doc_b")
    val pr = Graph.pagerank(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(pr(2L) > pr(1L) && pr(3L) > pr(4L))
    // symmetry of the path: 2~3 and 1~4 pair up exactly
    assert(pr(2L) === pr(3L) && pr(1L) === pr(4L))
  }

  test("triangles: K4 has 4 triangles, cc=1; a pendant edge stays cc=0") {
    import spark.implicits._
    // K4 on {1,2,3,4} (every vertex in 3 of the 4 triangles, cc = 1)
    // plus pendant 4-5 (node 5: deg 1, no triangle; node 4's cc drops:
    // deg 4 → 3 triangles of C(4,2)=6 wedges = 500000 ppm)
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L)).toDF("doc_a", "doc_b")
    val rows = Graph.trianglesOf(pairs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows(1L) === ((3L, 3L, 1000000L)))
    assert(rows(2L) === ((3L, 3L, 1000000L)))
    assert(rows(3L) === ((3L, 3L, 1000000L)))
    assert(rows(4L) === ((4L, 3L, 500000L)))
    assert(rows(5L) === ((1L, 0L, 0L)))
    // global count: sum of per-node participation = 3 * n_triangles
    assert(rows.values.map(_._2).sum === 12L)
  }

  test("triangles: a 4-cycle (chained near-dups) has zero triangles") {
    import spark.implicits._
    // A≈B≈C≈D≈A without the diagonals — the transitive-closure overreach
    // case the cohesion audit exists to flag: every node deg 2, cc 0
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("doc_a", "doc_b")
    val rows = Graph.trianglesOf(pairs).collect()
    assert(rows.forall(r => r.getLong(2) === 0L && r.getLong(3) === 0L))
    assert(rows.forall(r => r.getLong(1) === 2L))
  }
}
