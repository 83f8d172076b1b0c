package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** r22: [[Dedup.connectedComponentsFast]] must be row-identical to the
  * calibration-frozen [[Dedup.connectedComponents]] on every input
  * class — the min-label fixpoint is unique, so any divergence is a
  * bug in the restructured loop (pre-hopped initial labels, dst-
  * partitioned edge checkpoint), not a legitimate difference.
  */
class CcFastSpec extends SparkSpec {
  import spark.implicits._

  private def both(edges: DataFrame, verts: DataFrame)
      : (Map[Long, Long], Map[Long, Long]) = {
    def m(df: DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (m(Dedup.connectedComponents(edges, verts)),
      m(Dedup.connectedComponentsFast(edges, verts)))
  }

  test("chain + clique + isolated vertices: identical labels") {
    // 0-1-2-3-4 chain, {10,11,12} clique, 20/21 isolated
    val edges = Seq(0L -> 1L, 1L -> 2L, 2L -> 3L, 3L -> 4L,
      10L -> 11L, 11L -> 12L, 10L -> 12L).toDF("a", "b")
    val verts = (Seq(0L, 1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L, 21L))
      .toDF("id")
    val (slow, fast) = both(edges, verts)
    assert(fast == slow)
    assert(fast(4L) == 0L && fast(12L) == 10L && fast(20L) == 20L)
  }

  test("long chain exercises pointer doubling: identical labels") {
    val n = 300L
    val edges = (0L until n).map(i => i -> (i + 1)).toDF("a", "b")
    val verts = (0L to n).toDF("id")
    val (slow, fast) = both(edges, verts)
    assert(fast == slow)
    assert(fast.values.forall(_ == 0L))
  }

  test("duplicate + self-loop edges and edge ids absent from vertices") {
    val edges = Seq(5L -> 6L, 6L -> 5L, 5L -> 5L, 7L -> 8L)
      .toDF("a", "b")
    // 7/8 touched but NOT in vertices — both impls keep them labeled
    val verts = Seq(5L, 6L, 9L).toDF("id")
    val (slow, fast) = both(edges, verts)
    assert(fast == slow)
  }

  test("seeded random graphs: identical labels") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val nV = 40 + trial * 10
      val es = (1 to 60).map(_ =>
        (rnd.nextInt(nV).toLong, rnd.nextInt(nV).toLong))
      val edges = es.toDF("a", "b")
      val verts = (0L until nV.toLong).toDF("id")
      val (slow, fast) = both(edges, verts)
      assert(fast == slow, s"trial $trial diverged")
    }
  }

  test("empty edge list: every vertex is its own component") {
    val edges = Seq.empty[(Long, Long)].toDF("a", "b")
    val verts = Seq(1L, 2L, 3L).toDF("id")
    val (slow, fast) = both(edges, verts)
    assert(fast == slow && fast == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }
}
