package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CalibrationSpec extends SparkSpec {
  import spark.implicits._

  test("isotonicFit pools exactly the violating adjacent pair and " +
      "leaves the monotone ends alone") {
    // bins 0..3, 10 rows each, positives [1, 7, 3, 9]: the (7, 3)
    // violation pools to (7+3)/20 = 0.5; PAVA fit = [.1, .5, .5, .9].
    val rows = for {
      (pos, bin) <- Seq(1, 7, 3, 9).zipWithIndex
      i <- 0 until 10
    } yield (bin.toLong, if (i < pos) 1L else 0L)
    val out = Calibration.isotonicFit(rows.toDF("bin", "y"), "bin", "y")
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq((0L, 1000L, 1000L), (1L, 7000L, 5000L),
      (2L, 3000L, 5000L), (3L, 9000L, 9000L)))
  }

  test("isotonicFit on already-monotone rates is the identity, and the " +
      "fit is always monotone") {
    val rows = for {
      (pos, bin) <- Seq(2, 4, 4, 8).zipWithIndex
      i <- 0 until 10
    } yield (bin.toLong, if (i < pos) 1L else 0L)
    val out = Calibration.isotonicFit(rows.toDF("bin", "y"), "bin", "y")
      .collect().map(r => (r.getLong(3), r.getLong(4)))
    assert(out.forall { case (raw, iso) => raw == iso })
    assert(out.map(_._2).sliding(2).forall(p =>
      p.length < 2 || p(0) <= p(1)))
  }

  test("isotonicFit on an anti-monotone staircase pools everything to " +
      "the base rate") {
    val rows = for {
      (pos, bin) <- Seq(9, 6, 3, 0).zipWithIndex
      i <- 0 until 10
    } yield (bin.toLong, if (i < pos) 1L else 0L)
    val out = Calibration.isotonicFit(rows.toDF("bin", "y"), "bin", "y")
      .collect().map(_.getLong(4))
    assert(out.forall(_ == 4500L)) // 18/40
  }

  test("brierDecomposition: perfectly calibrated cells read zero " +
      "reliability and Murphy's identity holds within truncation ulps") {
    // Cells p = 0.2 (1/5 positive) and p = 0.8 (4/5 positive), exactly
    // calibrated; 10 rows each.
    val rows =
      (0 until 10).map(i => ("g", 2000L, if (i < 2) 1L else 0L)) ++
        (0 until 10).map(i => ("g", 8000L, if (i < 8) 1L else 0L))
    val r = Calibration.brierDecomposition(
      rows.toDF("source", "p", "y"), "source", "p", "y").head()
    val (n, brier, rel, res, unc) = (r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5))
    assert(n == 20L)
    assert(rel == 0L)
    // ybar = .5 → unc = .25 e8; res = (.3)² = .09 e8; brier = .16 e8
    assert(unc == 25000000L && res == 9000000L && brier == 16000000L)
    assert(math.abs(brier - (rel - res + unc)) <= 3)
  }

  test("brierDecomposition: a constant prediction has zero resolution " +
      "and reliability equal to its squared miscalibration") {
    val rows = (0 until 10).map(i => ("g", 9000L, if (i < 5) 1L else 0L))
    val r = Calibration.brierDecomposition(
      rows.toDF("source", "p", "y"), "source", "p", "y").head()
    // ybar = .5; rel = (.9 − .5)² = .16 e8; res = 0; unc = .25 e8
    assert(r.getLong(3) == 16000000L && r.getLong(4) == 0L &&
      r.getLong(5) == 25000000L)
    assert(math.abs(r.getLong(2) - (r.getLong(3) - r.getLong(4) +
      r.getLong(5))) <= 3)
  }

  test("brierDecomposition groups independently") {
    val rows = (0 until 4).map(i => ("a", 5000L, (i % 2).toLong)) ++
      (0 until 4).map(_ => ("b", 10000L, 1L))
    val out = Calibration.brierDecomposition(
      rows.toDF("source", "p", "y"), "source", "p", "y")
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(("a", 25000000L, 0L), ("b", 0L, 0L)))
  }
}
