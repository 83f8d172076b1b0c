package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Farthest-first traversal (Gonzalez) — the 2-approximation k-CENTER
  * coreset selector: start from the minimum-id vector, then k−1 times
  * pick the point FARTHEST from everything selected so far. The
  * selected set is the classic diversity coreset ("cover the embedding
  * space with k probes"), and the distance at each pick is a
  * monotonically shrinking COVERAGE-RADIUS curve — step r's radius is
  * an upper bound within 2× of the optimal r-center cost, so the curve
  * IS the "how many exemplars does this corpus need" diagnostic. q157's
  * MMR diversifies a per-query pool; this selects global corpus
  * exemplars.
  *
  * Scale shape: the loop is k-BOUNDED driver orchestration (k rows of
  * metadata cross the driver — the selected ids and their vectors);
  * each step is one codegen'd `SqDistE8` pass + a distributed
  * TakeOrdered(1) argmax over the corpus, and the running min-distance
  * column folds the new center in as a LITERAL (no join, no shuffle —
  * [[Centroids.assign]]'s discipline, one center at a time).
  * Checkpointed per step: lineage stays O(1), and each pass reads the
  * previous materialization, not the chain.
  *
  * Determinism: distances are e8 integer (`SqDistE8`), the argmax
  * tie-breaks on id, so the whole trajectory — selection AND radii —
  * replays exactly in SQL (the oracle unrolls all k steps).
  *
  * Output: (step 1..k, vec_id, radius_e8) — radius 0 for the seed —
  * plus a final row (step k+1, NULL, cover_radius_e8): the max
  * remaining min-distance, i.e. the k-center objective of the
  * selection.
  */
object Coreset {

  def farthestFirst(df: DataFrame, idCol: String, vecCol: String, k: Int)
      : DataFrame = {
    require(k >= 2, s"farthestFirst needs k >= 2, got $k")
    val s = df.sparkSession
    import s.implicits._
    val base = graft.SparkUtil.ensureParallelism(
        df.select(col(idCol).cast("long").as("__id"), col(vecCol).as("__v")))
      .localCheckpoint(true)
    // Census + seed pick fused into ONE aggregate action (r22, guide
    // §1.2-1): the count and the min-id row used to be two separate
    // jobs; min_by over the unique __id key is deterministic and
    // map-side combinable.
    val seedRow = base.agg(count(lit(1)),
      min_by(struct(col("__id"), col("__v")), col("__id"))).head()
    val nRows = seedRow.getLong(0)
    require(nRows > 0, "farthestFirst: empty input — nothing to select")
    require(k <= nRows,
      s"farthestFirst: k=$k exceeds the ${nRows} distinct input rows; " +
        "every row is already a center at k = n")
    val seed = seedRow.getStruct(1)
    val seedId = seed.getLong(0)
    val seedVec = seed.getSeq[Float](1).toArray
    var picks = List((1L, seedId, 0L))
    // LAZY per-step checkpoints (r22 — the CC loop discipline): each
    // step's distance table has exactly one action consumer (the
    // farthest-point aggregate below), whose job materializes the
    // checkpoint in passing — one scheduled job per step instead of
    // two. The farthest pick itself is a max_by aggregate on the
    // (__d, −__id) ordering struct — the identical (__d DESC, __id
    // ASC) winner the former orderBy().limit(1) produced (__id is
    // unique, so the ordering value is unique), with no sort.
    var cur = base.filter(col("__id") =!= seedId)
      .withColumn("__d",
        graft.functions.SqDistE8(col("__v"), typedLit(seedVec)))
      .localCheckpoint(false)
    for (step <- 2 to k) {
      val far = cur.agg(max_by(struct(col("__id"), col("__d"), col("__v")),
        struct(col("__d"), (-col("__id")).as("nid")))).head().getStruct(0)
      val fid = far.getLong(0)
      val fd = far.getLong(1)
      val fvec = far.getSeq[Float](2).toArray
      picks ::= ((step.toLong, fid, fd))
      cur = cur.filter(col("__id") =!= fid)
        .withColumn("__d", least(col("__d"),
          graft.functions.SqDistE8(col("__v"), typedLit(fvec))))
        .localCheckpoint(false)
    }
    // k == corpus size leaves nothing uncovered: null max → radius 0.
    val coverRow = cur.agg(max(col("__d"))).head()
    val cover = if (coverRow.isNullAt(0)) 0L else coverRow.getLong(0)
    val rows = picks.reverse.map { case (st, id, d) =>
      (st, Option(id), d)
    } :+ (((k + 1).toLong, Option.empty[Long], cover))
    rows.toDF("step", "vec_id", "radius_e8")
  }
}
