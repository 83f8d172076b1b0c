package graft.operators

import graft.SparkSpec

/** Farthest-first k-center semantics (q168 surface): hand-computed
  * trajectory on a 1-D layout, cover-radius row, and determinism under
  * repartitioning.
  */
class CoresetSpec extends SparkSpec {
  import spark.implicits._

  private val pts = Seq(
    (0L, Array(0f, 0f)), (1L, Array(1f, 0f)), (2L, Array(10f, 0f)),
    (3L, Array(21f, 0f)), (4L, Array(2f, 0f)))

  test("farthestFirst: hand-computed picks, radii, and cover row") {
    // Seed 0 → pick 3 (441), then 2 (100), then 4 (4); remaining {1}
    // sits 1.0 from its nearest center → cover radius 1e8.
    val out = Coreset.farthestFirst(pts.toDF("vec_id", "embedding"),
      "vec_id", "embedding", k = 4).collect()
    val got = out.map(r => (r.getLong(0),
      if (r.isNullAt(1)) -1L else r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 0L, 0L), (2L, 3L, 44100000000L),
      (3L, 2L, 10000000000L), (4L, 4L, 400000000L),
      (5L, -1L, 100000000L)))
  }

  test("farthestFirst: k > n and empty input fail loudly") {
    val df = pts.toDF("vec_id", "embedding")
    val eK = intercept[IllegalArgumentException] {
      Coreset.farthestFirst(df, "vec_id", "embedding", k = 6)
    }
    assert(eK.getMessage.contains("k=6 exceeds"))
    val eE = intercept[IllegalArgumentException] {
      Coreset.farthestFirst(df.filter("vec_id < 0"),
        "vec_id", "embedding", k = 2)
    }
    assert(eE.getMessage.contains("empty input"))
  }

  test("farthestFirst: k == n selects every row, cover radius 0") {
    val out = Coreset.farthestFirst(pts.toDF("vec_id", "embedding"),
      "vec_id", "embedding", k = 5).collect()
    assert(out.length == 6)
    assert(out.map(r => if (r.isNullAt(1)) -1L else r.getLong(1)).toSet ==
      Set(-1L, 0L, 1L, 2L, 3L, 4L))
    assert(out.last.getLong(2) == 0L)
  }

  test("farthestFirst: partition-layout invariant") {
    val a = Coreset.farthestFirst(pts.toDF("vec_id", "embedding"),
      "vec_id", "embedding", k = 3).collect().toSeq
    val b = Coreset.farthestFirst(
      pts.toDF("vec_id", "embedding").repartition(5),
      "vec_id", "embedding", k = 3).collect().toSeq
    assert(a == b)
  }
}
