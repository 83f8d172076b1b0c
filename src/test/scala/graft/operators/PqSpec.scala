package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))
  private lazy val query: Array[Float] = base.filter(col("vec_id") === 0)
    .select("embedding").head().getSeq[Float](0).toArray

  private lazy val planted = (1 to 5).map { j =>
    val v = query.zipWithIndex.map { case (x, i) =>
      x + (if ((i + j) % 7 == 0) 0.02f * j else 0f)
    }
    (10000L + j, v.toSeq)
  }
  private lazy val corpus = base.filter(col("vec_id") =!= 0)
    .union(planted.toDF("vec_id", "embedding"))

  test("PQ: planted near-dups survive ADC ranking + exact re-score") {
    val pq = Pq.fit(corpus, "vec_id", "embedding", dim = 64, m = 8, kSub = 16)
    val indexed = pq.index(corpus, "embedding").cache()
    val found = pq.search(indexed, "vec_id", "embedding", query, k = 5,
        pool = 50)
      .collect().map(_.getLong(0)).toSet
    assert(found == planted.map(_._1).toSet)
    indexed.unpersist()
  }

  test("PQ codes compress to m small ints and are deterministic") {
    val pq = Pq.fit(corpus, "vec_id", "embedding", dim = 64, m = 8, kSub = 16)
    val codes = pq.index(corpus, "embedding")
      .select(col("vec_id"), col("pq_code")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    assert(codes.values.forall(c => c.length == 8 &&
      c.forall(x => x >= 0 && x < 16)))
    val again = pq.index(corpus, "embedding")
      .select(col("vec_id"), col("pq_code")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    assert(codes == again)
  }

  test("ADC inner product correlates with the true dot product") {
    val pq = Pq.fit(corpus, "vec_id", "embedding", dim = 64, m = 8, kSub = 16)
    val rows = pq.index(corpus.filter(col("vec_id") < 20), "embedding")
      .select(col("vec_id"), col("embedding"),
        pq.adcIpCol(col("pq_code"), query).as("adc"))
      .collect()
      .map { r =>
        val v = r.getSeq[Float](1).toArray
        val exact = v.zip(query).map { case (a, b) => a.toDouble * b }.sum
        // adc is an exact e12 integer since r10
        (exact, r.getLong(2).toDouble)
      }
    // Spearman-ish check: top-5 by ADC overlaps top-5 by exact dot.
    val byExact = rows.sortBy(-_._1).take(5).toSet
    val byAdc = rows.sortBy(-_._2).take(5).toSet
    assert(byExact.intersect(byAdc).size >= 3,
      s"ADC ranking diverged: $byExact vs $byAdc")
  }

  test("IVF-PQ composition: coarse prune, ADC rank, exact re-score") {
    val ivf = Ann.Ivf.fit(corpus, "vec_id", "embedding", kCentroids = 8)
    val pq = Pq.fit(corpus, "vec_id", "embedding", dim = 64, m = 8, kSub = 16)
    val indexed = pq.index(ivf.index(corpus, "embedding"), "embedding")
      .cache()
    val probe = ivf.probeCentroids(query, nprobe = 2)
    val pruned = indexed.filter(col("centroid").isin(probe: _*))
    val found = pq.search(pruned, "vec_id", "embedding", query, k = 5,
        pool = 50)
      .collect().map(_.getLong(0)).toSet
    assert(found == planted.map(_._1).toSet)
    // and the prune is real: the ADC scan saw a strict subset
    assert(pruned.count() < indexed.count())
    indexed.unpersist()
  }

  test("native pq_assign expression matches the HOF formulation exactly") {
    val pq = Pq.fit(corpus, "vec_id", "embedding", dim = 64, m = 8, kSub = 16)
    val both = corpus
      .select(col("vec_id"), pq.codeCol(col("embedding")).as("native"),
        pq.codeColHof(col("embedding")).as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[Int](1) == r.getSeq[Int](2),
        s"codes diverge for vec ${r.getLong(0)}")
    }
  }

  test("dim must divide into m subspaces") {
    intercept[IllegalArgumentException] {
      Pq.fit(corpus, "vec_id", "embedding", dim = 64, m = 7)
    }
  }
}
