package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed-capacity training bins
  * (the shard-packing step between a curated corpus and a token-budgeted
  * training run).
  *
  * Two tiers:
  *   - [[packByStart]] — "start-based" contiguous packing: documents in
  *     deterministic id order; a document's bin is where its cumulative
  *     token count STARTS (`floor(cumsum_before / capacity)`). A document
  *     straddling a boundary overflows its bin by < its own length —
  *     the declarative rule is one window pass, oracle-checkable, and
  *     matches the common pack-then-truncate practice.
  *   - [[packGreedy]] — exact no-overflow greedy: sequential fill that
  *     closes a bin when the next document would not fit (oversized
  *     documents get singleton bins). Sequential per shard, so it runs as
  *     mapPartitions inside range-partitioned id shards — each shard
  *     packs independently and bin ids are globally unique via the shard
  *     offset. The sequential scan is per-shard, never per-corpus.
  */
object Packing {

  /** DISTRIBUTED exclusive prefix sum of `nTokensCol` in `idCol` order —
    * the two-pass primitive behind [[packByStart]] and the capacity-
    * ladder audit (q154): pass one computes each id-range shard's token
    * total (a bounded O(shards) collect), pass two streams each shard
    * adding its broadcast offset — a global `sum() over (order by id)`
    * without ever moving the corpus to one partition (the naive global-
    * window plan is the single-partition bottleneck Spark warns about).
    *
    * Output: one row per document — (idCol, n_tokens, cum_before).
    */
  def prefixSums(df: DataFrame, idCol: String, nTokensCol: String,
      shards: Int = 32): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // Eager checkpoint: BOTH passes must see the identical range
    // partitioning. Default localCheckpoint (blocks freed by the
    // ContextCleaner; fail-stop on executor loss); set
    // spark.graft.checkpoint.reliable=true + a checkpoint dir for the
    // durable, partitioning-preserving form on lossy clusters
    // (SparkUtil.stableCheckpoint).
    val sorted = graft.SparkUtil.stableCheckpoint(
      df.select(col(idCol).cast("long"), col(nTokensCol).cast("long"))
        .as[(Long, Long)]
        .repartitionByRange(shards, col(idCol))
        .sortWithinPartitions(col(idCol)))
    val partTotals = sorted.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var s = 0L
      it.foreach(s += _._2)
      Iterator.single((pid, s))
    }.collect().sortBy(_._1)
    // offset(pid) = sum of all earlier shards' totals (exclusive prefix).
    val offsets: Map[Int, Long] = partTotals.map(_._1)
      .zip(partTotals.map(_._2).scanLeft(0L)(_ + _)).toMap
    sorted.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var running = offsets.getOrElse(pid, 0L)
      it.map { case (id, n) =>
        val before = running
        running += n
        (id, n, before)
      }
    }.toDF(idCol, "n_tokens", "cum_before")
  }

  /** Window-rule packing over [[prefixSums]]: a document's bin is where
    * its cumulative token count STARTS. Output: one row per document
    * with its bin.
    */
  def packByStart(df: DataFrame, idCol: String, nTokensCol: String,
      capacity: Int, shards: Int = 32): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    prefixSums(df, idCol, nTokensCol, shards)
      .select(col(idCol), col("n_tokens"),
        expr(s"cum_before div $capacity").as("bin"))
  }

  /** Exact greedy packing inside id-range shards. Output: (id, n_tokens,
    * bin); bins never exceed `capacity` unless a single document does.
    * Deterministic: shard boundaries come from range partitioning on the
    * id and fill order is ascending id within each shard.
    */
  def packGreedy(df: DataFrame, idCol: String, nTokensCol: String,
      capacity: Int, shards: Int = 32): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    // Global bin ids: each shard owns a disjoint range [shardId << 40, …)
    // — no cross-shard coordination needed and ids stay stable under
    // re-runs with the same shards.
    df.select(col(idCol).cast("long"), col(nTokensCol).cast("long"))
      .as[(Long, Long)]
      .repartitionByRange(shards, col(idCol))
      .sortWithinPartitions(col(idCol))
      .mapPartitions { it =>
        val shard = org.apache.spark.TaskContext.getPartitionId().toLong
        var bin = shard << 40
        var fill = 0L
        var first = true
        it.map { case (id, n) =>
          if (!first && fill + n > capacity) { bin += 1; fill = 0L }
          first = false
          fill += n
          (id, n, bin)
        }
      }
      .toDF(idCol, "n_tokens", "bin")
  }
}
