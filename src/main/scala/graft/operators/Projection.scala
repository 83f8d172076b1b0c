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
  * vector, shuffle-free and bit-reproducible across engines (which is
  * what lets the DuckDB oracle replay it exactly). Unlike the LSH tier
  * (which keeps only the SIGN bit per direction), this keeps the signed
  * magnitudes, so distances in projected space approximate true distances
  * (JL) instead of just bucketing.
  */
object Projection {

  /** `k` seeded ±1 directions over `dim` input dims (seed differs from
    * the LSH family's so the two index tiers stay uncorrelated).
    */
  def planes(k: Int, dim: Int): Array[Array[Float]] =
    Ann.hyperplanes(k, dim, seed = 7L)

  /** Signed projection of `vecCol` (array<float/double>) onto each of
    * `planes`: an array<double> of length k. Per-row array fold in fixed
    * array order — deterministic and identical across engines.
    */
  def project(vecCol: Column, planes: Array[Array[Float]]): Column = {
    val proj = planes.map { p =>
      aggregate(
        zip_with(vecCol, lit(p.map(_.toDouble)), (x, s) => x * s),
        lit(0.0), (acc, x) => acc + x)
    }
    array(proj.toIndexedSeq: _*)
  }

  /** Adds `outCol` = the k-dim projection of `vecCol`. */
  def reduce(df: DataFrame, vecCol: String, k: Int, dim: Int,
      outCol: String = "proj"): DataFrame =
    df.withColumn(outCol, project(col(vecCol), planes(k, dim)))

  /** Squared L2 distance between two projected arrays (fixed-order fold). */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)
}
