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
}
