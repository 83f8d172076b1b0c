package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Recall@5 of the ANN tiers measured against exact brute-force cosine on
  * the REAL sf0.01 embeddings (500 × 64, near-random by construction —
  * top-5 cosine ≈ 0.3-0.37) — complementing AnnSpec's planted-near-dup
  * gates.
  *
  * Everything here is deterministic (fixed data, fixed seeds), so the
  * measured recalls are constants and the assertions are exact regression
  * tripwires, not statistical hopes. Two properties are pinned:
  *
  *   1. CONCENTRATION (the tripwire): at probe radius 1 the index finds
  *      true neighbors at ~3× the rate of a random prune of equal size
  *      (recall 0.11 from a 3.7% scan). A bucketing regression (wrong
  *      sign, shifted planes, broken multiprobe) collapses recall to the
  *      scanned fraction and fails this hard.
  *   2. RECALL KNOB: multiprobe radius sweeps recall up the scan-fraction
  *      curve; radius 5 reaches ≥ 0.9 recall on uncorrelated vectors
  *      while still scanning < 90%. (On the near-dup workloads ANN is FOR
  *      — cos ≥ 0.9, AnnSpec — radius 1 already achieves full recall at a
  *      3.7% scan; uncorrelated vectors are the worst case, where no LSH
  *      beats the information limit recall ≈ scan fraction by much.)
  */
class AnnRecallSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.01/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  private lazy val vecs: Map[Long, Array[Float]] = emb.collect()
    .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
  }

  private lazy val queryIds: Seq[Long] = (0L until 100L by 5L).toSeq

  private lazy val exactTop5: Map[Long, Set[Long]] = queryIds.map { qid =>
    val q = vecs(qid)
    qid -> vecs.iterator.filter(_._1 != qid)
      .map { case (id, v) => (id, cosine(q, v)) }
      .toSeq.sortBy { case (id, s) => (-s, id) }.take(5).map(_._1).toSet
  }.toMap

  private def meanRecallAndScan(candOf: Long => Set[Long])
      : (Double, Double) = {
    val per = queryIds.map { qid =>
      val cand = candOf(qid) - qid
      (exactTop5(qid).intersect(cand).size / 5.0,
        cand.size.toDouble / (vecs.size - 1))
    }
    (per.map(_._1).sum / per.size, per.map(_._2).sum / per.size)
  }

  test("LSH recall@5 vs exact: concentration at radius 1, >=0.9 at radius 5") {
    val lsh = new Ann.RandomHyperplaneLsh(nBits = 8, dim = 64)
    // Bucket via the expression-level index path (the regression target),
    // not the driver-side bucketOf.
    val buckets: Map[Long, Int] = lsh.index(emb, "embedding")
      .select(col("vec_id"), col("bucket")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    def cands(radius: Int)(qid: Long): Set[Long] = {
      val probe = lsh.probeBuckets(vecs(qid), radius).toSet
      buckets.collect { case (id, b) if probe(b) => id }.toSet
    }
    val (r1, scan1) = meanRecallAndScan(cands(1))
    info(f"radius 1: recall@5 = $r1%.3f from scan fraction $scan1%.3f")
    assert(scan1 < 0.08, s"radius-1 probe should scan a small fraction: $scan1")
    assert(r1 >= 0.10, s"radius-1 recall $r1 collapsed")
    assert(r1 >= 2.5 * scan1,
      s"no concentration: recall $r1 vs scan $scan1 — buckets look random")
    val (r5, scan5) = meanRecallAndScan(cands(5))
    info(f"radius 5: recall@5 = $r5%.3f from scan fraction $scan5%.3f")
    assert(r5 >= 0.9, s"radius-5 recall $r5")
    assert(scan5 < 0.9, s"radius-5 scan fraction $scan5")
  }

  test("IVF recall@5 vs exact: nprobe sweeps recall, beats random prune") {
    val ivf = Ann.Ivf.fit(emb, "vec_id", "embedding", kCentroids = 8)
    val assigned: Map[Long, Int] = ivf.index(emb, "embedding")
      .select(col("vec_id"), col("centroid")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    def cands(nprobe: Int)(qid: Long): Set[Long] = {
      val probe = ivf.probeCentroids(vecs(qid), nprobe).toSet
      assigned.collect { case (id, c) if probe(c) => id }.toSet
    }
    val (r2, scan2) = meanRecallAndScan(cands(2))
    info(f"nprobe 2: recall@5 = $r2%.3f from scan fraction $scan2%.3f")
    assert(r2 >= 0.5, s"nprobe-2 recall $r2 collapsed (measured 0.54)")
    assert(r2 >= 1.8 * scan2,
      s"no concentration: recall $r2 vs scan $scan2")
    val (r6, scan6) = meanRecallAndScan(cands(6))
    info(f"nprobe 6: recall@5 = $r6%.3f from scan fraction $scan6%.3f")
    assert(r6 >= 0.9, s"nprobe-6 recall $r6 (measured 0.92)")
    assert(scan6 < 0.9, s"nprobe-6 scan fraction $scan6")
  }
}
