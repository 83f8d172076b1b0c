package graft.operators

import graft.SparkSpec

/** k-core peeling semantics (q135's operator) on graphs whose cores
  * are known by hand: cliques survive, chains dissolve, and the
  * n_unstable certificate fires when the round budget is too small.
  */
class KCoreSpec extends SparkSpec {
  import spark.implicits._

  private def edges(pairs: (Long, Long)*) = pairs.toDF("a", "b")

  private def run(df: org.apache.spark.sql.DataFrame, k: Int,
      rounds: Int = 4) =
    Dedup.kCore(df, k, rounds).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4)))).toMap

  test("triangle survives 2-core peeling; the attached chain dissolves") {
    val out = run(edges(1L -> 2L, 2L -> 3L, 1L -> 3L, 3L -> 4L,
      4L -> 5L), k = 2)
    // 1,2,3: degree-2 triangle (3 also touches the chain: degree 3)
    assert(out(1L) == ((2L, 1, 2L, 0L)))
    assert(out(2L) == ((2L, 1, 2L, 0L)))
    assert(out(3L) == ((3L, 1, 2L, 0L)))
    // chain nodes peel away but keep their original degree in the report
    assert(out(4L) == ((2L, 0, 0L, 0L)))
    assert(out(5L) == ((1L, 0, 0L, 0L)))
  }

  test("4-clique is a 3-core; k=4 empties it") {
    val clique = edges(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L,
      2L -> 4L, 3L -> 4L)
    val c3 = run(clique, k = 3)
    assert(c3.values.forall(v => v._2 == 1 && v._3 == 3L && v._4 == 0L))
    val c4 = run(clique, k = 4)
    assert(c4.values.forall(v => v._2 == 0 && v._4 == 0L))
  }

  test("insufficient rounds trip the n_unstable certificate") {
    // 5-chain needs 2 peel rounds; with rounds=1 the middle survivors
    // still carry degree < k and the certificate must be nonzero.
    val chain = edges(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L)
    val out = run(chain, k = 2, rounds = 1)
    assert(out.values.exists(_._4 > 0L))
    // with enough rounds the same graph converges to an empty core
    val ok = run(chain, k = 2, rounds = 4)
    assert(ok.values.forall(v => v._2 == 0 && v._4 == 0L))
  }

  test("triangleCensus: hand-checked triangle, wedges, and cc") {
    // Triangle {1,2,3} + pendant 4: degrees 2/2/3/1 → wedges
    // 1+1+3+0 = 5, one triangle, C = 3/5. Duplicate and reversed
    // edges must not double-count.
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (2L, 1L),
      (1L, 2L)).toDF("a", "b")
    val r = graft.operators.Dedup.triangleCensus(e).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((4L, 4L, 5L, 1L)))
    assert(r.getDouble(4) == 0.6)
  }

  test("triangleCensus: triangle-free path reports cc 0") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val r = graft.operators.Dedup.triangleCensus(e).head()
    assert(r.getLong(3) == 0L && r.getDouble(4) == 0.0)
    assert(r.getLong(2) == 2L) // two wedges on the path
  }
}
