package graft.operators

import graft.SparkSpec

/** All-integer power-iteration PCA (q178 surface): a planted rank-1
  * direction is recovered exactly, the sign pivot is deterministic,
  * and mean-centering removes a constant offset.
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("topComponent recovers a planted rank-1 direction exactly") {
    // Every vector is a multiple of (1, 2, 0, 0): the centered moment
    // matrix is exactly rank 1, so the e6 iterate is (500000, 1000000,
    // 0, 0) after one step and stays there.
    val df = Seq(10f, -14f, 6f, 22f, -2f)
      .map(a => Tuple1(Array(a, 2 * a, 0f, 0f)))
      .toDF("embedding")
    val v = Pca.topComponent(df, "embedding", dim = 4)
      .orderBy("pos").collect().map(_.getLong(1))
    // e6-ish scale (the trunc-div renorm lands the max slightly above
    // 10⁶); the 1:2 ratio holds to the A-matrix pre-scale truncation
    // budget (~1e-3 relative on this small fixture; cells at corpus
    // scale are ~1e3× larger and the error shrinks with them); zero
    // off-direction mass exactly.
    assert(v(1) >= 1000000L && v(1) <= 1001000L, v.toSeq)
    assert(math.abs(2 * v(0) - v(1)) <= 1000, v.toSeq)
    assert(v(2) == 0L && v(3) == 0L, v.toSeq)
  }

  test("sign pivot: dominant component is made non-negative") {
    // Same direction planted negatively — the pivot flips the vector.
    val df = Seq(10f, -14f, 6f, 22f, -2f)
      .map(a => Tuple1(Array(-a, -2 * a, 0f, 0f)))
      .toDF("embedding")
    val v = Pca.topComponent(df, "embedding", dim = 4)
      .orderBy("pos").collect().map(_.getLong(1))
    assert(v(1) >= 1000000L, v.toSeq)
  }

  test("centering: a constant offset does not create a fake component") {
    // (a, 0, 0, c) with constant c: after centering, dim 4 carries no
    // variance — the component must live entirely on dim 1.
    val df = Seq(10f, -14f, 6f, 22f, -2f)
      .map(a => Tuple1(Array(a, 0f, 0f, 30f)))
      .toDF("embedding")
    val v = Pca.topComponent(df, "embedding", dim = 4)
      .orderBy("pos").collect().map(_.getLong(1))
    assert(v(0) >= 1000000L && v(1) == 0L && v(2) == 0L && v(3) == 0L,
      v.toSeq)
  }

  test("overflow cap: binding constraint is the iterate bound at real " +
      "dims, the centering bound at tiny dims") {
    // Centering: 2n²·10⁶ <= Long.Max → n <= 2 147 483. Iterate:
    // d·(n²/5)·10⁶ <= Long.Max → n <= √(4.61e13/d).
    assert(Pca.overflowCap(2) == 2147483L, Pca.overflowCap(2))
    assert(Pca.overflowCap(64) == 848867L, Pca.overflowCap(64))
    assert(Pca.overflowCap(384) == 346548L, Pca.overflowCap(384))
    // Monotone in dim — more terms in the dot product, tighter cap.
    assert(Pca.overflowCap(384) < Pca.overflowCap(64))
  }

  test("empty input fails loudly") {
    val df = Seq(Tuple1(Array(1f, 2f))).toDF("embedding").filter("false")
    val e = intercept[IllegalArgumentException] {
      Pca.topComponent(df, "embedding", dim = 2)
    }
    assert(e.getMessage.contains("empty input"), e.getMessage)
  }
}
