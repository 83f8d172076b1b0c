package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (north-star surface).
  *
  * Three tiers, trading recall for scan cost:
  *   1. [[bruteForceKnn]] — exact cosine top-k, full scan. The baseline, and
  *      the DuckDB-oracle-checked path (q21).
  *   2. [[RandomHyperplaneLsh]] — sign-random-projection buckets; at query
  *      time only matching buckets (± multiprobe neighbors) are re-scored
  *      exactly. Sub-linear candidate sets, tunable recall.
  *   3. [[Ivf]] — k-means coarse quantizer (MLlib); vectors are indexed by
  *      nearest centroid, queries probe the `nprobe` nearest centroid lists.
  *
  * 100 TB design: both index tiers write a small per-row index column
  * (bucket / centroid id) that parquet can partition or cluster on, so a
  * query reads only its probe lists (partition pruning), never the full
  * corpus. Scoring is expression-level (`zip_with`/`aggregate`) or a tight
  * JVM loop in `mapPartitions` — no Python, no per-row allocation storms.
  */
object Ann {

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** Squared-L2 distance of a vector column to a literal centroid. */
  private[operators] def sqDistCol(v: Column, c: Array[Double]): Column = {
    val cLit = array(c.toIndexedSeq.map(lit): _*)
    aggregate(zip_with(asDouble(v), cLit, (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x)
  }

  /** The `sampleCap` lowest-hash vectors as driver-side arrays — the
    * bounded deterministic training sample shared by the IVF and PQ fits
    * (stable across runs and partitionings).
    */
  private[operators] def sampleVectors(df: DataFrame, vecCol: String,
      seed: Long, sampleCap: Int): Array[Array[Double]] = {
    val s = df.select(transform(col(vecCol), _.cast("double")).as("__v"))
      .withColumn("__h", xxhash64(col("__v").cast("array<string>"), lit(seed)))
      .orderBy(col("__h"), col("__v"))
      .limit(sampleCap)
      .collect()
      .map(_.getSeq[Double](0).toArray)
    require(s.nonEmpty, "vector fit: empty training input")
    s
  }

  /** Cosine vs a literal query vector — the native codegen'd expression
    * ([[graft.functions.CosineSimilarity]]); same numeric semantics
    * (sequential double accumulation, 0.0 on zero norm) as the
    * higher-order-function formulation it replaces, but stays inside
    * WholeStageCodegen.
    */
  def cosineCol(v: Column, q: Array[Float]): Column =
    graft.functions.CosineSimilarity(v, typedlit(q))

  /** Exact cosine top-k: one scan + TakeOrderedAndProject. */
  def bruteForceKnn(df: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], k: Int): DataFrame =
    df.select(col(idCol), round(cosineCol(col(vecCol), query), 6).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)

  /** Deterministic Rademacher (±1) hyperplane matrix: nBits × dim. */
  def hyperplanes(nBits: Int, dim: Int, seed: Long = 42L): Array[Array[Float]] = {
    Array.tabulate(nBits) { b =>
      Array.tabulate(dim) { i =>
        // splitmix64-style mix of (seed, b, i) — stable across runs/JVMs.
        var z = seed + 0x9e3779b97f4a7c15L * (b.toLong * 1048573L + i + 1)
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        if (((z ^ (z >>> 31)) & 1L) == 0L) 1f else -1f
      }
    }
  }

  /** Sign-random-projection bucket id (0..2^nBits-1) as an int column:
    * bit b = [dot(v, plane_b) > 0]. Expression-level: the planes are ±1
    * literals folded into codegen.
    */
  def lshBucketCol(vecCol: Column, planes: Array[Array[Float]]): Column = {
    val v = asDouble(vecCol)
    planes.zipWithIndex.map { case (p, b) =>
      val pLit = array(p.toIndexedSeq.map(x => lit(x.toDouble)): _*)
      val dot = aggregate(zip_with(v, pLit, (a, x) => a * x), lit(0.0),
        (acc, x) => acc + x)
      when(dot > 0, lit(1 << b)).otherwise(lit(0))
    }.reduce(_ + _)
  }

  final class RandomHyperplaneLsh(nBits: Int = 12, dim: Int, seed: Long = 42L)
      extends Serializable {
    val planes: Array[Array[Float]] = hyperplanes(nBits, dim, seed)

    /** Add the `bucket` index column (persist/partition this at scale).
      * The index parameters ride along as column metadata so the
      * [[graft.plans.AnnTopKRewrite]] optimizer rule can recognize the
      * index and prune buckets — including after a parquet round-trip
      * (Spark persists field metadata in the footer schema).
      */
    def index(df: DataFrame, vecCol: String): DataFrame = {
      val meta = new org.apache.spark.sql.types.MetadataBuilder()
        .putLong("graft.lsh.nbits", nBits.toLong)
        .putLong("graft.lsh.seed", seed)
        .putLong("graft.lsh.dim", dim.toLong)
        .putString("graft.lsh.veccol", vecCol)
        .build()
      df.withColumn("bucket",
        lshBucketCol(col(vecCol), planes).as("bucket", meta))
    }

    def bucketOf(q: Array[Float]): Int =
      planes.zipWithIndex.map { case (p, b) =>
        val dot = p.zip(q).map { case (x, y) => x.toDouble * y }.sum
        if (dot > 0) 1 << b else 0
      }.sum

    /** Buckets within Hamming distance `probes` of the query bucket —
      * multiprobe: recover neighbors that fell across up to `probes`
      * hyperplanes. The radius is THE recall/scan-cost knob: each +1
      * admits C(nBits, r) more buckets. (On near-duplicate workloads
      * radius 1 already recovers everything — AnnSpec; on uncorrelated
      * vectors recall@k grows with the scanned fraction and the radius
      * buys a principled sweep of that tradeoff — AnnRecallSpec.)
      */
    def probeBuckets(q: Array[Float], probes: Int): Seq[Int] = {
      val b0 = bucketOf(q)
      val r = math.min(math.max(probes, 0), nBits)
      (0 to r).flatMap(k =>
        (0 until nBits).combinations(k).map(_.foldLeft(b0)((b, i) =>
          b ^ (1 << i))))
    }

    /** ANN top-k: prune to probe buckets, exact-rescore, take k. */
    def search(indexed: DataFrame, idCol: String, vecCol: String,
        q: Array[Float], k: Int, probes: Int = 1): DataFrame = {
      val bs = probeBuckets(q, probes)
      indexed.filter(col("bucket").isin(bs: _*))
        .select(col(idCol), round(cosineCol(col(vecCol), q), 6).as("score"))
        .orderBy(col("score").desc, col(idCol))
        .limit(k)
    }
  }

  /** Embedding near-duplicate PAIRS at scale: hyperplane-LSH bucketing →
    * candidate pair join (reusing [[Dedup.lshCandidatePairs]], so hot
    * buckets get the same exact block-salted self-join) → exact cosine
    * re-score ≥ `minSim`. This is the scale path that replaces the
    * brute-force all-pairs embedding compare (q26 restricts brute force to
    * a key range; this never goes all-pairs). Recall caveat: only pairs
    * landing in the SAME bucket are candidates — for near-dup thresholds
    * (cos ≥ 0.9) collisions are near-certain at small nBits; raise nBits
    * for precision, lower it (or union multiple rotated indexes) for
    * recall.
    */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      nBits: Int = 8, minSim: Double = 0.9, seed: Long = 42L,
      saltBlocks: Int = 1): DataFrame = {
    val lsh = new RandomHyperplaneLsh(nBits, dim, seed)
    val buckets = lsh.index(
        df.select(col(idCol).as("id"), col(vecCol).as("__v")), "__v")
      .select(col("id"), lit(0).as("band"), col("bucket").as("band_hash"))
    val pairs = Dedup.lshCandidatePairs(buckets, saltBlocks)
    val va = df.select(col(idCol).as("a"), col(vecCol).as("__va"))
    val vb = df.select(col(idCol).as("b"), col(vecCol).as("__vb"))
    pairs.join(va, "a").join(vb, "b")
      .select(col("a"), col("b"),
        round(graft.functions.CosineSimilarity(col("__va"), col("__vb")), 6)
          .as("sim"))
      .filter(col("sim") >= minSim)
  }

  /** IVF (inverted-file) index: k-means centroids as the coarse quantizer.
    * Centroids are fit once (sampled), broadcast as literals; assignment is
    * an argmin over centroid dot products — expression-level, no UDF.
    */
  final class Ivf(centroids: Array[Array[Double]]) extends Serializable {

    def assignCol(vecCol: Column): Column = {
      val dists = centroids.zipWithIndex.map { case (c, i) =>
        struct(sqDistCol(vecCol, c).as("d"), lit(i).as("i"))
      }
      array_min(array(dists.toIndexedSeq: _*)).getField("i")
    }

    def index(df: DataFrame, vecCol: String): DataFrame =
      df.withColumn("centroid", assignCol(col(vecCol)))

    def probeCentroids(q: Array[Float], nprobe: Int): Seq[Int] =
      centroids.zipWithIndex.map { case (c, i) =>
        (c.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum, i)
      }.sortBy(_._1).take(nprobe).map(_._2).toSeq

    def search(indexed: DataFrame, idCol: String, vecCol: String,
        q: Array[Float], k: Int, nprobe: Int = 2): DataFrame = {
      val probe = probeCentroids(q, nprobe)
      indexed.filter(col("centroid").isin(probe: _*))
        .select(col(idCol), round(cosineCol(col(vecCol), q), 6).as("score"))
        .orderBy(col("score").desc, col(idCol))
        .limit(k)
    }
  }

  object Ivf {
    /** Fit centroids on a bounded, deterministically-chosen sample.
      *
      * At 100 TB you never fit the coarse quantizer on the full corpus:
      * quantization error is dominated by k, not sample size, so a few
      * thousand sampled vectors pin the centroids as well as billions
      * (the standard IVF train-on-sample practice). One cluster job
      * selects the `sampleCap` lowest-hash vectors (stable across runs
      * and partitionings); Lloyd's with kmeans++ seeding then runs on the
      * driver in microseconds — no multi-pass distributed iteration at
      * all. Assignment of the full corpus stays expression-level and
      * distributed ([[Ivf.assignCol]]).
      */
    def fit(df: DataFrame, vecCol: String, kCentroids: Int,
        seed: Long = 42L, sampleCap: Int = 4096, maxIter: Int = 15): Ivf = {
      val sample = sampleVectors(df, vecCol, seed, sampleCap)
      new Ivf(lloyd(sample, math.min(kCentroids, sample.length), seed, maxIter))
    }

    private def sqDist(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }

    /** Seeded kmeans++ init + Lloyd's iterations; empty clusters are
      * re-seeded to the point farthest from its assigned centroid so k
      * centroids always survive. Fully deterministic for a given sample.
      */
    private[operators] def lloyd(points: Array[Array[Double]], k: Int, seed: Long,
        maxIter: Int): Array[Array[Double]] = {
      val rnd = new scala.util.Random(seed)
      val dim = points(0).length
      val centroids = Array.ofDim[Array[Double]](k)
      centroids(0) = points(rnd.nextInt(points.length)).clone()
      val minD = points.map(sqDist(_, centroids(0)))
      for (c <- 1 until k) {
        // kmeans++: sample proportional to squared distance to nearest.
        val total = minD.sum
        val pick =
          if (total <= 0) rnd.nextInt(points.length)
          else {
            var r = rnd.nextDouble() * total; var i = 0
            while (i < points.length - 1 && r >= minD(i)) { r -= minD(i); i += 1 }
            i
          }
        centroids(c) = points(pick).clone()
        var i = 0
        while (i < points.length) {
          val d = sqDist(points(i), centroids(c))
          if (d < minD(i)) minD(i) = d
          i += 1
        }
      }
      val assign = Array.ofDim[Int](points.length)
      var iter = 0; var moved = true
      while (iter < maxIter && moved) {
        moved = false
        var i = 0
        while (i < points.length) {
          var best = 0; var bd = sqDist(points(i), centroids(0)); var c = 1
          while (c < k) {
            val d = sqDist(points(i), centroids(c))
            if (d < bd) { bd = d; best = c }
            c += 1
          }
          if (assign(i) != best || iter == 0) { assign(i) = best; moved = true }
          i += 1
        }
        val sums = Array.fill(k)(Array.ofDim[Double](dim))
        val counts = Array.ofDim[Int](k)
        i = 0
        while (i < points.length) {
          val c = assign(i); counts(c) += 1
          var j = 0
          while (j < dim) { sums(c)(j) += points(i)(j); j += 1 }
          i += 1
        }
        for (c <- 0 until k) {
          if (counts(c) > 0) {
            var j = 0
            while (j < dim) { sums(c)(j) /= counts(c); j += 1 }
            centroids(c) = sums(c)
          } else {
            // Re-seed an emptied cluster to the globally farthest point,
            // then CLAIM that point (assign it here) so a second cluster
            // emptied in the same round picks a different seed instead of
            // duplicating this centroid.
            var far = 0; var fd = -1.0; var p = 0
            while (p < points.length) {
              val d = sqDist(points(p), centroids(assign(p)))
              if (d > fd) { fd = d; far = p }
              p += 1
            }
            centroids(c) = points(far).clone()
            assign(far) = c
          }
        }
        iter += 1
      }
      centroids
    }
  }
}
