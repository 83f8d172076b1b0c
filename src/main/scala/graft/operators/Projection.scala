package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Random-projection dimensionality reduction for embedding columns —
  * the Johnson–Lindenstrauss workhorse behind cheap clustering, sketch
  * indexes and near-dup prefilters at corpus scale: project 384-dim
  * vectors onto k seeded Rademacher (±1) directions and work in k dims.
  *
  * The projection matrix is the same splitmix64-derived ±1 family the LSH
  * tier uses ([[Ann.hyperplanes]], different seed), folded into the plan
  * as literals — so projection is a codegen'd per-row fold over the
  * vector, shuffle-free. Unlike the LSH tier (which keeps only the SIGN
  * bit per direction), this keeps the signed magnitudes, so distances in
  * projected space approximate true distances (JL) instead of just
  * bucketing.
  *
  * Determinism: each elementwise product is quantized to a FIXED-POINT
  * e6 long BEFORE the fold (`floor(x·s·1e6)`), so every aggregate
  * downstream — the projection fold itself, squared distances, any
  * cross-engine SUM over the components — is integer arithmetic, exact
  * in any evaluation order (SURVEY §5.4, same rule as [[Centroids.fit]]).
  * A double fold would be deterministic within Spark's fixed array order
  * but NOT replayable by an oracle that sums the components in arbitrary
  * row order; integers are replayable by both.
  */
object Projection {

  /** Fixed-point scale: projected components are e6 longs. */
  val Scale = 1e6

  /** `k` seeded ±1 directions over `dim` input dims (seed differs from
    * the LSH family's so the two index tiers stay uncorrelated).
    */
  def planes(k: Int, dim: Int): Array[Array[Float]] =
    Ann.hyperplanes(k, dim, seed = 7L)

  /** Signed projection of `vecCol` (array<float/double>) onto each of
    * `planes`: an array<long> of length k in e6 fixed-point. Per-row
    * integer fold — exact, order-independent, bit-reproducible across
    * engines.
    */
  def project(vecCol: Column, planes: Array[Array[Float]]): Column = {
    val proj = planes.map { p =>
      aggregate(
        zip_with(vecCol, lit(p.map(_.toDouble)), (x, s) =>
          floor(x.cast("double") * s * lit(Scale)).cast("long")),
        lit(0L), (acc, x) => acc + x)
    }
    array(proj.toIndexedSeq: _*)
  }

  /** Adds `outCol` = the k-dim e6 fixed-point projection of `vecCol`. */
  def reduce(df: DataFrame, vecCol: String, k: Int, dim: Int,
      outCol: String = "proj"): DataFrame =
    df.withColumn(outCol, project(col(vecCol), planes(k, dim)))

  /** Squared L2 distance between two e6-fixed-point projections: an e12
    * long (exact integer fold). Divide by [[Scale]]² for real units.
    */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, x) => acc + x)
}
