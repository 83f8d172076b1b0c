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
    val nRows = base.count()
    require(nRows > 0, "farthestFirst: empty input — nothing to select")
    require(k <= nRows,
      s"farthestFirst: k=$k exceeds the ${nRows} distinct input rows; " +
        "every row is already a center at k = n")
    val seedRow = base.orderBy(col("__id")).limit(1).head()
    val seedId = seedRow.getLong(0)
    val seedVec = seedRow.getSeq[Float](1).toArray
    var picks = List((1L, seedId, 0L))
    var cur = base.filter(col("__id") =!= seedId)
      .withColumn("__d",
        graft.functions.SqDistE8(col("__v"), typedLit(seedVec)))
      .localCheckpoint(true)
    for (step <- 2 to k) {
      val far = cur.orderBy(col("__d").desc, col("__id")).limit(1).head()
      val fid = far.getAs[Long]("__id")
      val fd = far.getAs[Long]("__d")
      val fvec = far.getAs[Seq[Float]]("__v").toArray
      picks ::= ((step.toLong, fid, fd))
      cur = cur.filter(col("__id") =!= fid)
        .withColumn("__d", least(col("__d"),
          graft.functions.SqDistE8(col("__v"), typedLit(fvec))))
        .localCheckpoint(true)
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
