package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed PCA, top principal component — the embedding-space
  * diagnostic behind anisotropy checks ("is one direction eating the
  * cosine geometry"), whitening decisions, and q93-style projection
  * choices: the corpus crosses ONE combinable aggregate producing the
  * d×d second-moment cells, and everything after is d²-sized driver
  * math (d=64 → 4 KB of state — index-metadata scale, same legitimacy
  * as IVF centroids).
  *
  * ALL-INTEGER pipeline (SURVEY §5.4 pushed through an iterative
  * algorithm): components quantize to e3 longs (`floor(x·1000)`), the
  * moment cells S[i,j] = Σ xq_i·xq_j and sums Sm[i] are exact integer
  * aggregates (order-free), the centered matrix A = S·n − Sm·Sm is
  * exact, and POWER ITERATION runs in integers too — per step
  * y = (A div 10⁷)·v with v an e6 vector, renormalized v' =
  * y·10⁶ div max|y| (trunc-toward-zero division, the Spark `div` ==
  * Java `/` == DuckDB `//` convention) — so every iterate, and the
  * final eigenvector, replays bit-for-bit in SQL with unrolled
  * per-iteration CTEs. No float enters any multi-row reduction.
  *
  * Overflow budget (documented AND enforced): xq ≤ ~10³ per
  * component, so |S| ≤ n·10⁶, |Sm_i·Sm_j| ≤ n²·10⁶ and
  * |A| = |S·n − Sm·Sm| ≤ 2n²·10⁶ — that alone caps n at
  * √(Long.Max/2·10⁶) ≈ 2.1·10⁶ rows. The iterate is tighter:
  * |y_i| ≤ d·(A div 10⁷)·10⁶ ≤ d·(n²/5)·10⁶, so n must also satisfy
  * n ≤ √(Long.Max·5 / (d·10⁶)) — ≈ 8.5·10⁵ rows at d = 64. Rather
  * than silently wrapping past that, `topComponent` computes the
  * binding cap from `dim` and `require`s n under it, so a
  * corpus-scale caller gets a loud error telling them to sample
  * (the moment matrix of a uniform sample estimates the same PC1) —
  * never silently wrong eigenvectors.
  *
  * Sign convention: the returned vector's largest-|component| entry is
  * made non-negative (eigenvectors are sign-ambiguous; the tie rule
  * pins one representative in both engines).
  *
  * Output: one row per dimension — (pos 1..d, pc1_e6).
  */
object Pca {

  /** Largest row count the exact-integer pipeline can take without
    * wrapping (see the overflow budget above): the binding constraint
    * is the smaller of the centering cap √(Long.Max / 2·10⁶) ≈ 2.1·10⁶
    * and the iterate cap √(Long.Max·5 / (d·10⁶)) — ≈ 8.5·10⁵ at d=64.
    */
  def overflowCap(dim: Int): Long = {
    val capCenter = math.sqrt(Long.MaxValue / 2e6).toLong
    val capIter = math.sqrt(Long.MaxValue * 5.0 / (dim * 1e6)).toLong
    math.min(capCenter, capIter)
  }

  def topComponent(df: DataFrame, vecCol: String, dim: Int,
      iterations: Int = 8): DataFrame = {
    require(iterations >= 1 && dim >= 2)
    val s = df.sparkSession
    import s.implicits._
    val xq = transform(col(vecCol),
      x => floor(x.cast("double") * 1000).cast("long"))
    // ONE corpus pass: d² product cells + d sums + n, all from a
    // single per-row struct explode into a combinable aggregate.
    val idx = sequence(lit(0), lit(dim - 1))
    val cells = graft.SparkUtil.ensureParallelism(df)
      .select(xq.as("__q"))
      .select(explode(flatten(transform(idx, i => transform(idx, j =>
        struct(i.as("i"), j.as("j"),
          (element_at(col("__q"), i + 1) *
            element_at(col("__q"), j + 1)).as("p"),
          when(j === 0, element_at(col("__q"), i + 1)).otherwise(0L)
            .as("m")))))).as("c"))
      .groupBy(col("c.i").as("i"), col("c.j").as("j"))
      .agg(sum(col("c.p")).as("s"), sum(col("c.m")).as("sm"),
        count(lit(1)).as("n"))
      .collect()
    require(cells.nonEmpty, "Pca.topComponent: empty input")
    val n = cells.head.getAs[Long]("n")
    val nCap = overflowCap(dim)
    require(n <= nCap,
      s"Pca.topComponent: n=$n exceeds the exact-integer overflow cap " +
        s"$nCap for dim=$dim; uniformly sample the input below the " +
        "cap — the sample's moment matrix estimates the same top " +
        "component")
    val S = Array.ofDim[Long](dim, dim)
    val sm = new Array[Long](dim)
    cells.foreach { r =>
      val (i, j) = (r.getAs[Int]("i"), r.getAs[Int]("j"))
      S(i)(j) = r.getAs[Long]("s")
      if (j == 0) sm(i) = r.getAs[Long]("sm")
    }
    // Centered (×n²-scaled) moment matrix, pre-scaled for the
    // iteration: exact integers.
    val a = Array.tabulate(dim, dim)((i, j) =>
      (S(i)(j) * n - sm(i) * sm(j)) / 10000000L)
    var v = Array.fill(dim)(1000000L)
    for (_ <- 1 to iterations) {
      val y = Array.tabulate(dim)(i =>
        (0 until dim).map(j => a(i)(j) * v(j)).sum)
      val mx = y.map(math.abs).max
      require(mx > 0, "degenerate covariance: zero iterate")
      // Renormalize to an e6 vector without overflowing: y·10⁶ can
      // exceed Long when y ~ 10¹⁴, so divide the SCALE through first
      // when mx is large; both branches are exact trunc-div integer
      // rules the oracle replays verbatim.
      v =
        if (mx >= 1000000L) y.map(_ / (mx / 1000000L))
        else y.map(_ * 1000000L / mx)
    }
    // sign: largest-|component| entry non-negative
    val piv = v.indices.maxBy(i => (math.abs(v(i)), -i))
    val out = if (v(piv) < 0) v.map(-_) else v
    out.zipWithIndex.map { case (c, i) => ((i + 1).toLong, c) }
      .toSeq.toDF("pos", "pc1_e6")
  }
}
