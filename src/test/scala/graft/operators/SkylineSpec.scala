package graft.operators

import graft.SparkSpec

/** Pareto-frontier semantics (q159 surface): hand-checked dominance on
  * a fixed fixture, tie survival, and a randomized equivalence against
  * a brute-force O(n²) frontier — including a forced multi-partition
  * layout so the local-skyline/global-anti-join two-phase is what runs.
  */
class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def brute(pts: Seq[(Long, Array[Long])]): Set[Long] = {
    def dom(a: Array[Long], b: Array[Long]) =
      a.zip(b).forall { case (x, y) => x >= y } &&
        a.zip(b).exists { case (x, y) => x > y }
    pts.filter(p => !pts.exists(q => dom(q._2, p._2))).map(_._1).toSet
  }

  test("frontier: hand-checked 2-D dominance") {
    // (5,1) and (1,5) are the frontier corners; (3,3) survives (beats
    // neither corner, beaten by neither); (2,2) dies to (3,3); (5,0)
    // dies to (5,1) on the strict second axis.
    val df = Seq((1L, 5L, 1L), (2L, 1L, 5L), (3L, 3L, 3L), (4L, 2L, 2L),
        (5L, 5L, 0L)).toDF("id", "m1", "m2")
    val out = Skyline.frontier(df, "id", Seq("m1", "m2"))
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 2L, 3L))
  }

  test("frontier: duplicated metric vectors all survive") {
    val df = Seq((1L, 4L, 4L), (2L, 4L, 4L), (3L, 1L, 1L))
      .toDF("id", "m1", "m2")
    val out = Skyline.frontier(df, "id", Seq("m1", "m2"))
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 2L))
  }

  test("frontier == brute force on random 3-D points across partitions") {
    val rnd = new scala.util.Random(42)
    val pts = (1L to 400L).map(i =>
      (i, Array(rnd.nextInt(20).toLong, rnd.nextInt(20).toLong,
        rnd.nextInt(20).toLong)))
    val df = pts.map { case (i, m) => (i, m(0), m(1), m(2)) }
      .toDF("id", "m1", "m2", "m3").repartition(13)
    val out = Skyline.frontier(df, "id", Seq("m1", "m2", "m3"))
      .collect()
    assert(out.map(_.getLong(0)).toSet == brute(pts))
    // output carries the metric values through unchanged
    val byId = pts.toMap
    out.foreach { r =>
      assert(Seq(r.getLong(1), r.getLong(2), r.getLong(3)) ==
        byId(r.getLong(0)).toSeq)
    }
  }
}
