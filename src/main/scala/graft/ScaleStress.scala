package graft

import graft.operators.{Dedup, Ranking}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-stress harness for the iterative graph tier (SCALE.md):
  * replicates the sf documents corpus ×1/×3/×10 (id-offset copies, so
  * every near-dup cluster grows by the replication factor — the
  * worst-case growth for clustering), rebuilds the q54 LSH candidate
  * graph at each scale, and times CC (q54), k-core (q135) and PageRank
  * (q118) phase by phase, with per-JOB walls for the iterative loops
  * (one job per CC round by construction: the convergence witness is
  * the round's single action). Driver heap is sampled (post-GC) after
  * every phase — the tier's driver state must stay O(1) in corpus
  * size. Output: one JSON line per (scale, phase) plus per-job arrays;
  * committed as SCALE.md.
  *
  * Usage: graft.ScaleStress [sfDir] [scales CSV, default 1,3,10]
  */
object ScaleStress {

  private final class JobLog extends SparkListener {
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long)]()
    private val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    override def onJobStart(j: SparkListenerJobStart): Unit =
      starts.put(j.jobId, j.time)
    override def onJobEnd(j: SparkListenerJobEnd): Unit = {
      val t0 = Option(starts.get(j.jobId)).getOrElse(j.time)
      jobs.put(j.jobId, (t0, j.time))
    }
    def snapshot(): Set[Int] = {
      import scala.jdk.CollectionConverters._
      jobs.keySet().asScala.toSet
    }
    def since(prev: Set[Int]): Seq[Double] = {
      import scala.jdk.CollectionConverters._
      jobs.asScala.toSeq.filterNot(kv => prev(kv._1)).sortBy(_._1)
        .map { case (_, (a, b)) => (b - a) / 1000.0 }
    }
  }

  private def usedHeapMb(): Long = {
    System.gc()
    Thread.sleep(200)
    val rt = Runtime.getRuntime
    (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val scales = args.drop(1).headOption.getOrElse("1,3,10")
      .split(',').map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.cleaner.periodicGC.interval", "30s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val log = new JobLog
    spark.sparkContext.addSparkListener(log)
    val docs0 = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val r3 = (v: Double) => math.rint(v * 1000) / 1000

    def phase[T](name: String, scale: Int)(body: => T): T = {
      val prev = log.snapshot()
      val t0 = System.nanoTime()
      val out = body
      val wall = (System.nanoTime() - t0) / 1e9
      val jobWalls = log.since(prev)
      val heap = usedHeapMb()
      println(s"""{"scale":$scale,"phase":"$name","wall_sec":${r3(wall)},""" +
        s""""n_jobs":${jobWalls.size},"job_walls":[${jobWalls.map(r3).mkString(",")}],""" +
        s""""driver_heap_mb":$heap}""")
      out
    }

    // Replication stride derived from the corpus itself: a fixed stride
    // smaller than max(doc_id) would silently alias replicated ids and
    // corrupt every pair/CC/k-core count this harness reports.
    val stride = docs0.agg(max(col("doc_id"))).head().getLong(0) + 1L

    for (k <- scales) {
      // id-offset replication: every cluster of near-dups grows ×k and
      // every replicated doc is an EXACT dup of its copies — the
      // adversarial direction for LSH bucket sizes and CC depth.
      val docs = (0 until k).map(i => docs0.select(
          (col("doc_id") + lit(i.toLong * stride)).as("doc_id"),
          col("text")))
        .reduce(_ union _).localCheckpoint(true)
      val nDocs = docs.count()
      val pairs = phase("lsh_pairs", k) {
        val sh = Dedup.shingles(docs, "doc_id", "text", n = 3)
        val p = Dedup.lshCandidatePairs(
          Dedup.lshBuckets(Dedup.minhashSignatures(sh, k = 16),
            bands = 4, rowsPerBand = 4)).localCheckpoint(true)
        println(s"""{"scale":$k,"n_docs":$nDocs,"n_pairs":${p.count()}}""")
        p
      }
      phase("cc", k) {
        Dedup.connectedComponents(pairs,
          docs.select(col("doc_id").as("id")))
          .write.format("noop").mode("overwrite").save()
      }
      phase("kcore", k) {
        Dedup.kCore(pairs, k = 2, rounds = 4)
          .write.format("noop").mode("overwrite").save()
      }
      phase("pagerank", k) {
        Ranking.pageRank(pairs, iterations = 3)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
