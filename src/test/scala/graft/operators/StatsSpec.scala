package graft.operators

import graft.SparkSpec

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("profile: nulls, distincts, min/max per column in one pass") {
    val df = Seq(
      (Some(1), Some("a")), (Some(2), None),
      (None, Some("c")), (Some(2), Some("a"))
    ).toDF("x", "s")
    val p = Stats.profile(df, Seq("x", "s")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4))).toMap
    assert(p("x") == (1L, 2L, "1", "2"))
    assert(p("s") == (1L, 2L, "a", "c"))
  }

  test("profile: all-null column yields null min/max, zero distincts") {
    val df = Seq((1, Option.empty[String]), (2, None)).toDF("x", "s")
    val p = Stats.profile(df, Seq("s")).collect().head
    assert(p.getLong(1) == 2L && p.getLong(2) == 0L)
    assert(p.isNullAt(3) && p.isNullAt(4))
  }

  // Reference quantile_cont: pos = p·(n−1), v_lo·(1−frac) + v_hi·frac.
  private def bruteQuantile(vs: Seq[Double], p: Double): Double = {
    val s = vs.sorted
    val pos = (s.length - 1).toDouble * p
    val lo = math.floor(pos).toInt
    val hi = math.min(lo + 1, s.length - 1)
    val frac = pos - math.floor(pos)
    s(lo) * (1.0 - frac) + s(hi) * frac
  }

  test("quantilesByGroup matches brute-force sort across group shapes") {
    val rnd = new scala.util.Random(7)
    val data = (for {
      g <- Seq("a", "b", "c")
      _ <- 1 to (if (g == "a") 101 else if (g == "b") 40 else 1)
    } yield (g, math.rint(rnd.nextDouble() * 1e6) / 100.0))
    // many partitions vs few rows: rank bookkeeping must survive empty
    // and single-row partitions
    val df = data.toDF("g", "v").repartition(13)
    val out = Stats.quantilesByGroup(df, "g", "v",
        Seq("p25" -> 0.25, "p50" -> 0.5, "p90" -> 0.9))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val byG = data.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    for (g <- Seq("a", "b", "c")) {
      assert(out(g)._1 == bruteQuantile(byG(g), 0.25), s"$g p25")
      assert(out(g)._2 == bruteQuantile(byG(g), 0.5), s"$g p50")
      assert(out(g)._3 == bruteQuantile(byG(g), 0.9), s"$g p90")
    }
    // single-element group: every quantile IS the element
    assert(out("c")._1 == out("c")._2 && out("c")._2 == out("c")._3)
  }

  test("quantilesByGroup: high-cardinality fallback matches the driver path") {
    // A many-group input (every row its own near-group) through the
    // distributed rank-join fallback (forced via maxDriverStateRows=0:
    // NOTHING may reach the driver) must agree value-for-value with the
    // bounded driver path on the same data. Integer-valued doubles keep
    // the mean away from mid-cent rounding ties, the one documented
    // divergence between the two paths.
    val rnd = new scala.util.Random(11)
    val data = (1 to 500).map(i =>
      (s"g${i % 97}", (rnd.nextInt(1000) + 1).toDouble))
    val df = data.toDF("g", "v").repartition(7)
    val ps = Seq("p25" -> 0.25, "p50" -> 0.5, "p90" -> 0.9)
    val driver = Stats.quantilesByGroup(df, "g", "v", ps)
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    val dist = Stats.quantilesByGroup(df, "g", "v", ps,
        maxDriverStateRows = 0L)
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(dist.keySet == driver.keySet)
    for ((g, vals) <- driver) assert(dist(g) == vals, s"group $g")
    // ...and the fallback's plan is genuinely distributed: no
    // LocalTableScan leaf (the driver path's signature).
    val p = Stats.quantilesByGroup(df, "g", "v", ps,
      maxDriverStateRows = 0L).queryExecution.executedPlan.toString
    assert(!p.contains("LocalTableScan"), p.take(1000))
  }

  test("quantilesByGroup: nulls ignored, mean rounded to 2dp") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(2.0)),
      ("a", Some(4.0))).toDF("g", "v")
    val r = Stats.quantilesByGroup(df, "g", "v", Seq("p50" -> 0.5))
      .collect().head
    assert(r.getDouble(1) == 2.0) // median of (1,2,4), null dropped
    assert(r.getDouble(2) == 2.33) // mean 7/3 rounded HALF_UP
  }

  test("robustZByGroup: hand-checked medians, MAD, trunc-div, mad=0") {
    // a: [1,3,5,7,100] → med 5 (rank 3), adev [4,2,0,2,95] → mad 2;
    //    the outlier's z is huge but the scale is untouched by it.
    // c: [0,3,10] → med 3, mad 3 → z(10) = 70000 div 3 = 23333 (trunc).
    // d: [5,5] → mad 0 → z pinned to 0.
    val df = (Seq(1L, 3L, 5L, 7L, 100L).map(("a", _)) ++
      Seq(0L, 3L, 10L).map(("c", _)) ++ Seq(5L, 5L).map(("d", _)))
      .toDF("g", "v")
    val out = Stats.robustZByGroup(df, "g", "v")
      .select("g", "v", "med", "mad", "z_e4")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(("a", 1L)) == ((5L, 2L, -20000L)))
    assert(out(("a", 100L)) == ((5L, 2L, 475000L)))
    assert(out(("c", 10L)) == ((3L, 3L, 23333L)))
    assert(out(("d", 5L)) == ((5L, 0L, 0L)))
  }

  test("olsByGroup: exact fit on a line, r2 < 1 under noise") {
    // group "a": y = 3 + 2x exactly -> slope 2, intercept 3, r2 = 1.
    val a = Seq((1L, 5L), (2L, 7L), (3L, 9L), (4L, 11L))
      .map { case (x, y) => ("a", x, y) }
    // group "b": same line with one bent point.
    val b = Seq((1L, 5L), (2L, 7L), (3L, 9L), (4L, 20L))
      .map { case (x, y) => ("b", x, y) }
    val out = Stats.olsByGroup((a ++ b).toDF("g", "x", "y"), "g", "x", "y")
      .orderBy("g").collect()
    assert(out(0).getDouble(2) == 2.0 && out(0).getDouble(3) == 3.0)
    assert(out(0).getDouble(4) == 1.0)
    assert(out(1).getDouble(2) > 2.0) // the bent point pulls the slope up
    assert(out(1).getDouble(4) < 1.0 && out(1).getDouble(4) > 0.5)
  }

  test("jackknifeMean: hand-checked loo means, influence, and SE") {
    // A: (3 docs, Σ6)  B: (1, 4)  C: (2, 10) → N=6, S=20, mean=10/3.
    // loo: A 14/3, B 16/5, C 10/4 → e4: 46667, 32000, 25000; m_e4=33333.
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 4L), ("c", 5L),
      ("c", 5L)).toDF("g", "v")
    val out = Stats.jackknifeMean(df, "g", "v").orderBy("g").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(4))).toSeq ==
      Seq(("a", 3L, 6L, 46667L - 33333L), ("b", 1L, 4L, 32000L - 33333L),
        ("c", 2L, 10L, 25000L - 33333L)))
    assert(math.abs(out(0).getDouble(3) - 14.0 / 3) < 1e-12)
    // SE via the integer identity: (G−1)(G·Σl² − T²) under sqrt.
    val ls = Seq(46667L, 32000L, 25000L)
    val (g, t4, ssq) = (3L, ls.sum, ls.map(l => l * l).sum)
    val se = math.sqrt(((g - 1) * (g * ssq - t4 * t4)).toDouble) / g / 10000.0
    assert(out.forall(r => r.getDouble(5) == se))
  }

  test("robustTrendByGroup: hand-computed terciles/medians; a wild " +
      "outlier cannot move the slope") {
    import spark.implicits._
    // x = 1..9, y = 10x, except a wild y at x = 9 — maximum OLS
    // leverage, INSIDE the hi tercile, where the median absorbs it:
    // lo = {1,2,3} (xl = x@rank3), hi = {7,8,9} (xu = x@rank7);
    // medians 2/20 and 8/80 (the 9999 ranks last) -> slope exactly 10.
    val rows = (1L to 9L).map(x => ("g", x, if (x == 9) 9999L else 10 * x))
    val out = Stats.robustTrendByGroup(rows.toDF("grp", "x", "y"),
      "grp", "x", "y").collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n") == 9L)
    assert(r.getAs[Long]("mx_lo") == 2L && r.getAs[Long]("my_lo") == 20L)
    assert(r.getAs[Long]("mx_hi") == 8L && r.getAs[Long]("my_hi") == 80L)
    assert(r.getAs[Long]("slope_e4") == 100000L)
    // intercept anchored at overall medians (5, 50): 50e4 - 10e4*5 = 0.
    assert(r.getAs[Long]("intercept_e4") == 0L)
    // OLS on the same data is destroyed by the outlier — the contrast
    // that motivates the operator.
    val ols = Stats.olsByGroup(rows.toDF("grp", "x", "y"), "grp", "x", "y")
      .collect().head.getAs[Double]("slope")
    assert(math.abs(ols - 10.0) > 50.0, s"OLS slope $ols")
  }

  test("robustTrendByGroup: zero x-spread emits NULL slope, not an " +
      "error; groups independent") {
    import spark.implicits._
    val rows = Seq(("a", 5L, 1L), ("a", 5L, 2L), ("a", 5L, 3L),
      ("b", 1L, 1L), ("b", 2L, 2L), ("b", 3L, 3L))
    val out = Stats.robustTrendByGroup(rows.toDF("grp", "x", "y"),
      "grp", "x", "y").orderBy("grp").collect()
    assert(out.length == 2)
    assert(out.head.isNullAt(out.head.fieldIndex("slope_e4")))
    assert(out(1).getAs[Long]("slope_e4") == 10000L)
  }

  test("trimmedMeanByGroup drops exactly k rows per end, counting a " +
      "tie class that straddles the cut with PARTIAL multiplicity") {
    // n=20, k=2: values 0×3, 10×14, 99×3 — the trim removes two of the
    // three 0s and two of the three 99s: sum = 0 + 10·14 + 99 = 239
    // over 16 rows → floor mean 14.
    val rows = Seq.fill(3)(0L) ++ Seq.fill(14)(10L) ++ Seq.fill(3)(99L)
    val out = Stats.trimmedMeanByGroup(
      rows.map(("g", _)).toDF("grp", "v"), "grp", "v").head()
    assert(out.getLong(1) == 20L && out.getLong(2) == 2L)
    assert(out.getLong(3) == 239L && out.getLong(4) == 14L)
  }

  test("trimmedMeanByGroup: an outlier that a plain mean absorbs is " +
      "fully trimmed; k=0 on tiny groups is the plain mean") {
    val rows = (1L to 8L) ++ Seq(0L, 100000L)
    val r = Stats.trimmedMeanByGroup(
      rows.map(("g", _)).toDF("grp", "v"), "grp", "v").head()
    // n=10, k=1: drops 0 and 100000 → mean(1..8) = 4 (floor of 4.5)
    assert(r.getLong(2) == 1L && r.getLong(3) == 36L &&
      r.getLong(4) == 4L)
    val tiny = Stats.trimmedMeanByGroup(
      Seq(("g", 7L), ("g", 9L)).toDF("grp", "v"), "grp", "v").head()
    assert(tiny.getLong(2) == 0L && tiny.getLong(4) == 8L)
  }
}
