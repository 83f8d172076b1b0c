package graft.operators

import graft.SparkSpec

/** PMI collocation semantics (q160 surface): hand-computed association
  * scores, the skip-gram distance window, and the min-count floor.
  */
class CollocationsSpec extends SparkSpec {
  import spark.implicits._

  test("pmiTopK: hand-computed PMI and total-ordered ranking") {
    // Pairs (all distance 1): (x,y)=4, (x,z)=1, (w,z)=1 → N=6,
    // M1(x)=5, M1(w)=1, M2(y)=4, M2(z)=2.
    //   PMI(w,z) = ln(6/2)  = 1.0986 → 10986
    //   PMI(x,y) = ln(24/20)= 0.1823 → 1823
    //   PMI(x,z) = ln(6/10) = −0.5108 → −5108
    val df = ((1 to 4).map(i => (i.toLong, "x y")) ++
      Seq((5L, "x z"), (6L, "w z"))).toDF("doc_id", "text")
    val out = Collocations.pmiTopK(df, "text", maxDist = 3,
      minCount = 1, topK = 10).collect()
    val got = out.map(r => (r.getString(0), r.getString(1),
      r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(("w", "z", 1L, 10986L), ("x", "y", 4L, 1823L),
      ("x", "z", 1L, -5108L)))
  }

  test("pmiTopK: skip-gram window emits every pair within maxDist") {
    val df = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val out = Collocations.pmiTopK(df, "text", maxDist = 3,
      minCount = 1, topK = 10).collect()
    val pairs = out.map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs == Set(("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"),
      ("b", "d"), ("a", "d")))
    // maxDist=1 drops the skip pairs
    val adj = Collocations.pmiTopK(df, "text", maxDist = 1,
      minCount = 1, topK = 10).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(adj == Set(("a", "b"), ("b", "c"), ("c", "d")))
  }

  test("textRank: hand-computed 3-iteration integer ranks on a star") {
    // Star graph: hub z — x, y, w. Exact e9 integer replay:
    //   r1(z) = 15e7 + 3·(1e9//100//1·85)        = 2_700_000_000
    //   r3(z) = 2_483_250_000, r3(leaf) = 505_583_305 (see q118 math)
    val df = Seq((1L, "z x"), (2L, "z y"), (3L, "z w"))
      .toDF("doc_id", "text")
    val out = Collocations.textRank(df, "text", maxDist = 3,
      minCount = 1, iterations = 3, topK = 10).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.head == ("z", 2483250000L))
    assert(out.tail.toSeq == Seq(("w", 505583305L), ("x", 505583305L),
      ("y", 505583305L)))
  }

  test("pmiTopK: min-count floor kills hapax pairs but keeps marginals") {
    val df = ((1 to 5).map(i => (i.toLong, "p q")) :+ (6L, "p r"))
      .toDF("doc_id", "text")
    val out = Collocations.pmiTopK(df, "text", maxDist = 1,
      minCount = 2, topK = 10).collect()
    assert(out.length == 1)
    // (p,q): N=6, M1(p)=6, M2(q)=5 → ln(30/30) = 0 — the marginal
    // still counts the filtered (p,r) pair.
    assert((out(0).getString(0), out(0).getString(1),
      out(0).getLong(2), out(0).getLong(3)) == ("p", "q", 5L, 0L))
  }
}
