package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANN recall-vs-scan-cost sweep over the embeddings table — the
  * measurement behind the q204/q240/q242/q251 recall floors and the
  * store's LSH/IVF-SQ operating point (VERDICT r17 #6: floors must be
  * tuned to a measured operating point, not liveness values).
  *
  * Replicates the store's fit-at-search semantics exactly
  * ([[graft.store.ChunkStore]]: L2-normalized vectors, radius/t
  * multiprobe over `lshBitsFor`-sized hyperplane buckets; IVF-SQ probe
  * + pool re-score) with the knobs exposed, and prints one JSON line
  * per configuration: mean recall@10 over the five q204 query vectors
  * plus the mean scanned fraction (candidate rows / corpus rows) — the
  * cost axis a 100 TB deployment trades against.
  *
  * Usage: runMain graft.RecallSweep <sfDir> [lsh|ivfsq|all]
  */
object RecallSweep {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val what = args.drop(1).headOption.getOrElse("all")
    val spark = SparkSession.builder()
      .appName("graft-recall-sweep")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, dir, what) finally spark.stop()
  }

  private def run(spark: SparkSession, dir: String, what: String): Unit = {
    val emb = graft.Tables.load(spark, dir, "embeddings")
    val dim = emb.select("embedding").head().getSeq[Float](0).length
    // The q204 store contract: L2-normalize at ingest.
    val n2 = aggregate(col("embedding"), lit(0.0d),
      (acc, x) => acc + x.cast("double") * x.cast("double"))
    val vecs = emb.select(col("vec_id").cast("string").as("key"),
        when(n2 > 0, transform(col("embedding"),
            x => (x.cast("double") / sqrt(n2)).cast("float")))
          .otherwise(col("embedding")).as("embedding"))
      .localCheckpoint(true)
    val n = vecs.count()
    val queries = emb.filter(col("vec_id") < 5).orderBy(col("vec_id"))
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val k = 10
    val exact = queries.map { case (qid, qv) =>
      qid -> graft.operators.Ann.bruteForceKnn(vecs, "key", "embedding",
        qv, k).collect().map(_.getString(0)).toSet
    }.toMap

    def report(tag: String, params: String,
        perQuery: Seq[(Double, Double)]): Unit = {
      val recall = perQuery.map(_._1).sum / perQuery.length
      val scanned = perQuery.map(_._2).sum / perQuery.length
      println(f"""{"sweep":"$tag",$params,"n":$n,""" +
        f""""mean_recall_at_$k":$recall%.3f,"scan_frac":$scanned%.4f}""")
    }

    if (what == "lsh" || what == "all") {
      // The index depends only on perBucket (via nBits) — build it once
      // per bucket setting and sweep the probe radius over the same
      // checkpointed index (advisor r18: the in-loop refit tripled
      // index builds for identical results).
      for (perBucket <- Seq(8, 16, 32, 64)) {
        val nBits = math.max(2, math.min(16,
          (math.log(math.max(n, perBucket.toLong).toDouble / perBucket) /
            math.log(2.0)).round.toInt))
        val lsh = new graft.operators.Ann.RandomHyperplaneLsh(
          nBits = nBits, dim = dim)
        val indexed = lsh.index(vecs, "embedding").localCheckpoint(true)
        for (radius <- Seq(1, 2, 3)) {
          val per = queries.toSeq.map { case (qid, qv) =>
            val probes = lsh.probeBuckets(qv, radius)
            val cand = indexed.filter(col("bucket").isin(probes: _*))
            val scanned = cand.count().toDouble / n
            val got = cand.select(col("key"),
                round(graft.operators.Ann.cosineCol(col("embedding"), qv), 6)
                  .as("score"))
              .orderBy(col("score").desc, col("key")).limit(k)
              .collect().map(_.getString(0))
            (got.count(exact(qid)).toDouble / k, scanned)
          }
          report("lsh",
            s""""per_bucket":$perBucket,"nbits":$nBits,"radius":$radius""",
            per)
        }
      }
    }

    if (what == "ivfsq" || what == "all") {
      // Same hoist: the fit + index depend only on kCentroids.
      for (kc <- Seq(8, 16, 32)) {
        val m = graft.operators.IvfSq.fit(vecs, "key", "embedding",
          kCentroids = kc, dim = dim)
        val indexed = m.ivf.index(vecs, "embedding").localCheckpoint(true)
        for (nprobe <- Seq(2, 3, 4, 5) if nprobe < kc) {
          val per = queries.toSeq.map { case (qid, qv) =>
            val probe = m.ivf.probeCentroids(qv, nprobe)
            val scanned = indexed.filter(col("centroid").isin(probe: _*))
              .count().toDouble / n
            val got = graft.operators.IvfSq.search(vecs, "key", "embedding",
                m, qv, k = k, nprobe = nprobe, pool = math.max(200, 20 * k))
              .select("key").collect().map(_.getString(0))
            (got.count(exact(qid)).toDouble / k, scanned)
          }
          report("ivfsq", s""""k_centroids":$kc,"nprobe":$nprobe""", per)
        }
      }
    }
  }
}
