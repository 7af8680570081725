package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph operators over an edge relation. Connected components (the
  * near-dup clustering primitive) live in [[Dedup]]; this hosts the
  * rank-propagation family.
  */
object Graph {

  /** Fixed-iteration PageRank with damping 0.85, integer-exact across
    * engines: ranks are scaled longs (1e6 = rank 1.0) and one iteration is
    * {{{ rank'(v) = 150000 + (85 * sum_{u->v} (rank(u) div outdeg(u))) div 100 }}}
    * — per-edge contributions and the damping factor use truncating integer
    * division, so every iteration is an order-independent integer sum (no
    * double accumulation to mirror; the cost is ≤1e-6 rank units of floor
    * truncation per edge, irrelevant for ranking). Mass through dangling
    * nodes (no out-edges) is dropped, the common simplification; a fixed
    * iteration count (not convergence detection) keeps the oracle
    * expressible as a plain chained-CTE SQL query.
    *
    * Scale design: each iteration is the canonical two-shuffle plan — join
    * ranks (|V| rows, fixed-width) to edges on src, then re-aggregate by
    * dst; the edge list itself never mutates, so at cluster scale you
    * pre-partition BOTH edge tables by key once (bucketing) and every
    * iteration's join is co-located. Lineage is truncated per iteration
    * ([[Lineage.truncate]] — the `spark.graft.reliableCheckpoints` knob
    * applies), so the plan doesn't grow with the iteration count.
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int,
  ): DataFrame = {
    require(iters >= 1 && iters <= 100, s"pageRank: iters must be in [1, 100]: $iters")
    // Edge set, node list, and out-degrees are reused by EVERY iteration's
    // joins — materialize each once (off the materialized edge set, not the
    // raw plan, or each iteration re-runs the caller's edge-building query).
    val ej = Lineage.truncate(edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct())
    val nodes = Lineage.truncate(
      ej.select(col("src").as("node")).union(ej.select(col("dst").as("node"))).distinct()
    )
    val oj = Lineage.truncate(ej.groupBy(col("src")).agg(count(lit(1)).as("outdeg")).withColumnRenamed("src", "node"))
    var ranks = nodes.withColumn("rank_s", lit(1000000L))
    for (i <- 1 to iters) {
      // Inner join: nodes without out-edges contribute nothing by definition.
      val withDeg = ranks.join(oj, "node")
      val contrib = ej
        .join(withDeg, ej("src") === withDeg("node"))
        .select(ej("dst").as("dst"), expr("rank_s div outdeg").as("c"))
      val next = nodes
        .join(contrib.groupBy(col("dst")).agg(sum(col("c")).as("in_s")), col("node") === col("dst"), "left_outer")
        .select(
          col("node"),
          (lit(150000L) + expr("85 * coalesce(in_s, CAST(0 AS BIGINT)) div 100")).as("rank_s"),
        )
      ranks = if (i == iters) next else Lineage.truncate(next)
    }
    ranks
  }

  /** Per-node triangle participation counts over an undirected graph given
    * as canonical `src < dst` edges — the numerator of the local clustering
    * coefficient (community-density / bot-ring signal). Each triangle
    * `{a < b < c}` is enumerated exactly once as wedge `(a,b)+(b,c)` closed
    * by `(a,c)`, then credits all three corners.
    *
    * Scale design: two equi-joins on node keys over fixed-width id pairs —
    * the canonical distributed triangle plan. Fan-out is bounded by wedge
    * count Σ deg²; for skew-heavy graphs the standard hardening is
    * degree-ordered orientation (point each edge at the higher-degree
    * endpoint) which this id-ordered variant deliberately keeps simple —
    * the edge relation is caller-built, so a caller with hub nodes applies
    * [[SkewJoin]] salting or a degree cap upstream. The edge set feeds
    * three join sides and is materialized once ([[Lineage.truncate]]).
    */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    triangleCountsOf(canonicalEdges(edges, srcCol, dstCol))

  /** Local clustering coefficient per node: `2·triangles·1e6 div
    * (deg·(deg−1))` as an exact scaled long (1e6 = fully clustered
    * neighborhood); degree-<2 nodes report 0. Composes [[triangleCounts]]
    * and the degree table off ONE materialized canonical edge set.
    */
  def clusteringCoefficient(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = canonicalEdges(edges, srcCol, dstCol)
    val deg = e
      .select(col("a").as("node"))
      .unionAll(e.select(col("b").as("node")))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("degree"))
    deg
      .join(triangleCountsOf(e), Seq("node"), "left_outer")
      .select(
        col("node"),
        col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        when(
          col("degree") >= 2,
          expr("2 * coalesce(triangles, CAST(0 AS BIGINT)) * 1000000 div (degree * (degree - 1))"),
        ).otherwise(lit(0L)).as("coef_scaled"),
      )
  }

  /** Synchronous label propagation (LPA community detection), fully
    * deterministic: labels seed as the node's own id; each of `iters`
    * rounds every node adopts its neighbors' MOST FREQUENT label, ties to
    * the SMALLEST label (`max_by` over `(count, -label)` — no RNG, no
    * update-order dependence, so a fixed-iteration chained-CTE oracle can
    * mirror it exactly). Fixed iterations rather than convergence detection:
    * synchronous LPA can 2-cycle on bipartite-ish structure, and a bounded
    * round count is the standard production guard.
    *
    * Scale design: per round one join of the label table (|V| fixed-width
    * rows) onto the undirected edge list + two partial-aggregated groupBys
    * keyed by node — the PageRank plan shape; the edge set is materialized
    * once and never mutates (bucket both sides on a cluster and every
    * round's join is co-located). Lineage truncated per round.
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String, iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 50, s"labelPropagation: iters must be in [1, 50]: $iters")
    val e = canonicalEdges(edges, srcCol, dstCol)
    val und = Lineage.truncate(
      e.unionAll(e.select(col("b").as("a"), col("a").as("b")))
    )
    var labels = und.select(col("a").as("node")).distinct().withColumn("label", col("node"))
    for (i <- 1 to iters) {
      val next = und
        .join(labels, col("b") === col("node"))
        .groupBy(col("a"), col("label"))
        .agg(count(lit(1)).as("__c"))
        .groupBy(col("a"))
        .agg(expr("max_by(label, named_struct('c', __c, 'nl', -label))").as("label"))
        .select(col("a").as("node"), col("label"))
      labels = if (i == iters) next else Lineage.truncate(next)
    }
    labels
  }

  private def canonicalEdges(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    Lineage.truncate(
      edges
        .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
        .filter(col("a") < col("b"))
        .distinct()
    )

  private def triangleCountsOf(e: DataFrame): DataFrame = {
    val triangles = e
      .as("e1")
      .join(e.as("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("ta"), col("e1.b").as("tb"), col("e2.b").as("tc"))
      .join(e.as("e3"), col("ta") === col("e3.a") && col("tc") === col("e3.b"))
      .select(col("ta"), col("tb"), col("tc"))
    triangles
      .select(explode(array(col("ta"), col("tb"), col("tc"))).as("node"))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("triangles"))
  }
}
