package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Closed-form tests for the rank-propagation operator. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graph
      .pageRank(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap

  test("pageRank: a symmetric 2-cycle is a fixed point at rank 1.0") {
    // contribution = 1000000 div 1; new = 150000 + (85 * 1000000) div 100
    assert(ranks(Seq((1L, 2L), (2L, 1L)), 3) == Map(1L -> 1000000L, 2L -> 1000000L))
  }

  test("pageRank: star sink accumulates, leaves get teleport only") {
    // a,b,c -> hub; hub dangles (its mass drops — documented variant).
    // iter1: hub = 150000 + (85 * 3000000) div 100 = 2700000; leaves = 150000.
    // iter2: hub = 150000 + (85 * 450000) div 100 = 532500.
    val r1 = ranks(Seq((1L, 9L), (2L, 9L), (3L, 9L)), 1)
    assert(r1 == Map(1L -> 150000L, 2L -> 150000L, 3L -> 150000L, 9L -> 2700000L))
    val r2 = ranks(Seq((1L, 9L), (2L, 9L), (3L, 9L)), 2)
    assert(r2(9L) == 532500L && r2(1L) == 150000L)
  }

  test("pageRank: out-degree splits contribution with truncating div") {
    // 1 -> {2, 3}: each gets 1000000 div 2 = 500000.
    // iter1: node2 = node3 = 150000 + (85 * 500000) div 100 = 575000.
    val r = ranks(Seq((1L, 2L), (1L, 3L)), 1)
    assert(r(2L) == 575000L && r(3L) == 575000L && r(1L) == 150000L)
  }

  test("pageRank: duplicate edges collapse (edge set, not multiset)") {
    val r = ranks(Seq((1L, 2L), (1L, 2L), (2L, 1L)), 3)
    assert(r == Map(1L -> 1000000L, 2L -> 1000000L))
  }

  test("pageRank: rejects out-of-range iteration counts") {
    intercept[IllegalArgumentException] {
      Graph.pageRank(Seq((1L, 2L)).toDF("src", "dst"), "src", "dst", 0)
    }
  }

  test("triangleCounts: single triangle + pendant; K4 gives C(3,1)=3 per node") {
    val tri = Graph
      .triangleCounts(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("src", "dst"), "src", "dst")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(tri == Map(1L -> 1L, 2L -> 1L, 3L -> 1L)) // node 4 in no triangle -> absent
    val k4edges = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    val k4 = Graph
      .triangleCounts(k4edges.toDF("src", "dst"), "src", "dst")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(k4 == (1L to 4L).map(_ -> 3L).toMap) // 4 triangles, each node in 3
  }

  test("clusteringCoefficient: closed forms on triangle+pendant") {
    val got = Graph
      .clusteringCoefficient(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("src", "dst"), "src", "dst")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(1L) == ((2L, 1L, 1000000L))) // deg 2, closed neighborhood
    assert(got(2L) == ((2L, 1L, 1000000L)))
    assert(got(3L) == ((3L, 1L, 333333L))) // 2*1*1e6 div (3*2)
    assert(got(4L) == ((1L, 0L, 0L))) // pendant: degree < 2
  }

  test("labelPropagation: path-graph rounds and star tie-break match hand simulation") {
    def lpa(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
      Graph
        .labelPropagation(edges.toDF("src", "dst"), "src", "dst", iters)
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .toMap
    val path = Seq((1L, 2L), (2L, 3L))
    // round 1: 1<-{2}, 2<-tie{1,3}->min 1, 3<-{2}
    assert(lpa(path, 1) == Map(1L -> 2L, 2L -> 1L, 3L -> 2L))
    // round 2 from that state: 1<-label(2)=1, 2<-{2,2}->2, 3<-1
    assert(lpa(path, 2) == Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
    // star: center 0 ties across {1,2,3} -> min 1; leaves adopt 0
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L))
    assert(lpa(star, 1) == Map(0L -> 1L, 1L -> 0L, 2L -> 0L, 3L -> 0L))
  }
}
