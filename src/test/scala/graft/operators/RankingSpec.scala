package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Integer fixed-point PageRank invariants on known graphs: symmetry
  * gives equal ranks, hubs outrank leaves, and the arithmetic matches a
  * hand-computed iteration exactly (the property the cross-engine
  * oracle depends on).
  */
class RankingSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int = 3)
      : Map[Long, Long] =
    Ranking.pageRank(edges.toDF("a", "b"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("cycle symmetry: every vertex of a 4-cycle has the same rank") {
    val r = ranks(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)))
    assert(r.values.toSet.size == 1, r)
    // Degree-regular graph with uniform init is a fixpoint:
    // 0.15e9 + 0.85e9 = 1e9 exactly at every round.
    assert(r(1L) == 1000000000L, r)
  }

  test("star: the hub outranks every leaf") {
    val r = ranks(Seq((10L, 1L), (10L, 2L), (10L, 3L), (10L, 4L)))
    val hub = r(10L)
    (1L to 4L).foreach(l => assert(hub > r(l), r))
    assert((1L to 4L).map(r).toSet.size == 1, r) // leaves symmetric
  }

  test("one iteration matches hand-computed integer arithmetic") {
    // Path 1-2: both degree 1. After one round:
    // r(v) = 150000000 + (1000000000*85 div 100 div 1) = 1000000000.
    val r1 = ranks(Seq((1L, 2L)), iters = 1)
    assert(r1 == Map(1L -> 1000000000L, 2L -> 1000000000L), r1)
    // Path 1-2-3: deg(2)=2. Round 1:
    //   r(1) = 150e6 + 850e6/2 = 575000000 (from 2's split mass)
    //   r(2) = 150e6 + 850e6 + 850e6 = wrong — each end sends 850e6.
    //   r(2) = 150e6 + 850e6*2 = 1850000000
    val r2 = ranks(Seq((1L, 2L), (2L, 3L)), iters = 1)
    assert(r2(1L) == 575000000L, r2)
    assert(r2(2L) == 1850000000L, r2)
    assert(r2(3L) == 575000000L, r2)
  }

  test("disconnected components do not leak rank into each other") {
    val r = ranks(Seq((1L, 2L), (5L, 6L), (6L, 7L)))
    // The isolated edge's pair is self-symmetric at the fixpoint.
    assert(r(1L) == r(2L))
    // The path's hub (6) dominates its leaves; the pair is unaffected.
    assert(r(6L) > r(5L) && r(6L) > r(7L), r)
  }

  test("labelPropagation: a barbell is ONE component but TWO " +
      "communities — split at the bridge") {
    import spark.implicits._
    // K4 on {0..3}, K4 on {10..13}, bridge 3–10.
    def clique(vs: Seq[Long]) =
      for (a <- vs; b <- vs if a < b) yield (a, b)
    val edges = (clique(Seq(0L, 1L, 2L, 3L)) ++
      clique(Seq(10L, 11L, 12L, 13L)) :+ ((3L, 10L)))
      .toDF("a", "b")
    val verts = (Seq(0L, 1L, 2L, 3L) ++ Seq(10L, 11L, 12L, 13L))
      .toDF("id")
    // CC: everything reachable → one component.
    val cc = Dedup.connectedComponents(edges, verts)
      .select("component").distinct().count()
    assert(cc == 1L)
    // LPA: two communities, each clique keeps its own min label.
    val out = Ranking.labelPropagation(edges, verts, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(0L, 1L, 2L, 3L).map(out).distinct.length == 1)
    assert(Seq(10L, 11L, 12L, 13L).map(out).distinct.length == 1)
    assert(out(0L) != out(10L), out)
  }

  test("labelPropagation: isolated vertices keep their own label; " +
      "community_size counts members") {
    import spark.implicits._
    // A triangle (odd cycle) converges under synchronous LPA; a PATH
    // would oscillate on its bipartition — the documented reason the
    // operator runs a FIXED round count.
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    val verts = Seq(1L, 2L, 3L, 99L).toDF("id")
    val rows = Ranking.labelPropagation(edges, verts, rounds = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Long]("community_size"))).toSeq.sortBy(_._1)
    val iso = rows.find(_._1 == 99L).get
    assert(iso._2 == 99L && iso._3 == 1L, rows)
    // the triangle converges to one community of 3
    assert(rows.filter(_._1 != 99L).map(_._2).distinct.length == 1)
    assert(rows.filter(_._1 != 99L).forall(_._3 == 3L), rows)
  }
}
