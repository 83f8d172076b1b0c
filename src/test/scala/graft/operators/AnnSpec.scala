package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ANN indexes are recall machines for *near-duplicates* (cos ≥ ~0.9).
  * The testdata embeddings are near-random (top-10 cosine ≈ 0.33, labels
  * uncorrelated), so these specs plant true near-dups of the query and
  * assert the index recovers them while scanning a strict subset.
  */
class AnnSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))
  private lazy val query: Array[Float] = base.filter(col("vec_id") === 0)
    .select("embedding").head().getSeq[Float](0).toArray

  /** 5 planted near-dups: query + tiny deterministic perturbation. */
  private lazy val planted = (1 to 5).map { j =>
    val v = query.zipWithIndex.map { case (x, i) =>
      x + (if ((i + j) % 7 == 0) 0.02f * j else 0f)
    }
    (10000L + j, v.toSeq)
  }
  private lazy val corpus = base.filter(col("vec_id") =!= 0)
    .union(planted.toDF("vec_id", "embedding"))

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.collect().map(_.getLong(0)).toSeq

  test("brute force knn: planted near-dups are the exact top-5, ordered") {
    val top = Ann.bruteForceKnn(corpus, "vec_id", "embedding", query, 5)
    val r = top.collect()
    assert(r.map(_.getLong(0)).toSet == planted.map(_._1).toSet)
    val scores = r.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse)
    assert(scores.forall(_ > 0.9))
  }

  test("hyperplane LSH: full near-dup recall while scanning a subset") {
    val lsh = new Ann.RandomHyperplaneLsh(nBits = 8, dim = 64)
    val indexed = lsh.index(corpus, "embedding").cache()
    val found = ids(lsh.search(indexed, "vec_id", "embedding", query, 5,
      probes = 1))
    assert(found.toSet == planted.map(_._1).toSet)
    val cand = indexed.filter(col("bucket")
      .isin(lsh.probeBuckets(query, 1): _*)).count()
    assert(cand < corpus.count() / 2, s"scanned $cand rows")
    indexed.unpersist()
  }

  test("IVF kmeans: full near-dup recall at nprobe=2, pruned probe lists") {
    val ivf = Ann.Ivf.fit(corpus, "vec_id", "embedding", kCentroids = 8)
    val indexed = ivf.index(corpus, "embedding").cache()
    val found = ids(ivf.search(indexed, "vec_id", "embedding", query, 5,
      nprobe = 2))
    assert(found.toSet == planted.map(_._1).toSet)
    val cand = indexed.filter(col("centroid")
      .isin(ivf.probeCentroids(query, 2): _*)).count()
    assert(cand < corpus.count(), s"scanned $cand rows")
    indexed.unpersist()
  }

  test("IVF assignCol (PqAssign m=1 path) matches the driver-side argmin") {
    // r11: assignCol routes through the native PqAssign expression with a
    // single whole-vector subspace; this pins its equivalence against the
    // independent driver-side e6 arithmetic (quantizeE6 + sqDistE6 +
    // first-minimal index), the same reference probeCentroids uses.
    val ivf = Ann.Ivf.fit(corpus, "vec_id", "embedding", kCentroids = 8)
    val rows = ivf.index(corpus, "embedding")
      .select(col("vec_id"), col("centroid"), col("embedding"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getSeq[Float](2).toArray
      val qe = Ann.Ivf.quantizeE6(v)
      val want = ivf.centroidsE6.zipWithIndex
        .map { case (c, i) => (Ann.Ivf.sqDistE6(qe, c), i) }
        .minBy { case (d, i) => (d, i) }._2
      assert(r.getInt(1) == want, s"vec ${r.getLong(0)}")
    }
  }

  test("nearDupPairs: planted dups surface as bucket-join pairs at cos>=0.9") {
    val withQuery = base.union(planted.toDF("vec_id", "embedding"))
    val pairs = Ann.nearDupPairs(withQuery, "vec_id", "embedding", dim = 64,
        nBits = 8, minSim = 0.9, saltBlocks = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.nonEmpty)
    assert(pairs.forall(_._3 >= 0.9))
    // The planted vectors are perturbations of vec 0, so every returned
    // pair must involve the query/planted family — no false positives
    // among the random corpus.
    val family = planted.map(_._1).toSet + 0L
    assert(pairs.forall(p => family(p._1) && family(p._2)), pairs.toSeq)
    // Bucket-equality recall: pairs whose members share the LSH bucket.
    // Deterministic — pin that the query pairs with most of its dups.
    assert(pairs.count(p => p._1 == 0L || p._2 == 0L) >= 3, pairs.toSeq)
  }

  test("q49 IVF driver query: 5 rows, descending scores, deterministic") {
    val run1 = graft.queries.OperatorQueries.q49(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(run1.length == 5)
    val scores = run1.map(_._2)
    assert(scores == scores.sorted.reverse)
    val run2 = graft.queries.OperatorQueries.q49(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(run1 == run2, "k-means fit + search must be deterministic")
  }

  test("driver-side bucketOf agrees with the expression-level bucket column") {
    val lsh = new Ann.RandomHyperplaneLsh(nBits = 8, dim = 64)
    val indexed = lsh.index(corpus, "embedding")
    val sampled = indexed.filter(col("vec_id").isin(10001L, 10002L, 17L, 225L))
      .select("vec_id", "bucket", "embedding").collect()
    sampled.foreach { r =>
      val v = r.getSeq[Float](2).toArray
      assert(r.getInt(1) == lsh.bucketOf(v),
        s"bucket mismatch for vec ${r.getLong(0)}")
    }
  }

  test("multiProbeSequence: t distinct buckets, base first, ordered by " +
      "cheapest margin crossings") {
    val lsh = new Ann.RandomHyperplaneLsh(nBits = 8, dim = 64)
    val seqT = lsh.multiProbeSequence(query, 6)
    assert(seqT.length == 6)
    assert(seqT.distinct.length == 6)
    assert(seqT.head == lsh.bucketOf(query))
    // every probe differs from base in <= 2 bits (singles + pairs only)
    seqT.tail.foreach { b =>
      assert(Integer.bitCount(b ^ seqT.head) <= 2, seqT)
    }
    // the first perturbation flips exactly the minimum-margin plane
    val m = lsh.marginsE6(query)
    val minBit = m.indices.minBy(i => (m(i), i))
    // cheapest candidate is either the single min flip or (if two tiny
    // margins sum below it — impossible for non-negative margins unless
    // equal) the min single; assert the min single is probed.
    assert(seqT.contains(seqT.head ^ (1 << minBit)), seqT)
  }

  test("searchMultiProbe: planted near-dup recall at t=6; candidates " +
      "are a strict subset; more probes never lose results") {
    val lsh = new Ann.RandomHyperplaneLsh(nBits = 8, dim = 64)
    val indexed = lsh.index(corpus, "embedding").cache()
    val found = ids(lsh.searchMultiProbe(indexed, "vec_id", "embedding",
      query, 5, t = 6))
    assert(found.toSet == planted.map(_._1).toSet)
    val cand = indexed.filter(col("bucket")
      .isin(lsh.multiProbeSequence(query, 6): _*)).count()
    assert(cand < corpus.count() / 2, s"scanned $cand rows")
    // monotone: the t=37 sequence (all singles+pairs) is a superset of
    // t=6, so scores can only improve or stay
    val s6 = lsh.searchMultiProbe(indexed, "vec_id", "embedding",
      query, 5, t = 6).collect().map(_.getDouble(1)).sum
    val s37 = lsh.searchMultiProbe(indexed, "vec_id", "embedding",
      query, 5, t = 37).collect().map(_.getDouble(1)).sum
    assert(s37 >= s6 - 1e-9)
    indexed.unpersist()
  }
}
