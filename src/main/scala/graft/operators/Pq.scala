package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization — the billion-vector tier of the similarity
  * stack. Each vector is cut into `m` subvectors; every subvector is
  * replaced by the id of its nearest centroid from a per-subspace
  * codebook of `kSub` entries, compressing a d-dim float vector to `m`
  * small ints (64 dims × 4 B → 8 codes: 32× smaller, and at kSub ≤ 256
  * one byte per code on disk).
  *
  * Query-time scoring is ADC (asymmetric distance computation): the
  * query precomputes an `m × kSub` lookup table of subspace distances on
  * the driver, and a row's approximate distance is just `m` table
  * lookups summed — pure expression algebra over the code column, no
  * float vectors read at all. The exact embedding column is only touched
  * to RE-SCORE a small candidate pool, so at scale the scan reads the
  * (tiny) code column instead of the full vectors: that I/O asymmetry is
  * the entire point of PQ.
  *
  * Fit mirrors [[Ann.Ivf]]: one bounded hash-ordered sample job, then
  * seeded kmeans++ Lloyd's per subspace on the driver. Compose with the
  * IVF centroid column for IVF-PQ (coarse prune, then ADC, then exact
  * re-score).
  */
final class Pq(val codebooks: Array[Array[Array[Double]]]) extends Serializable {
  private def m = codebooks.length
  private def subDim = codebooks(0)(0).length

  private def subSqDist(sub: Column, cent: Array[Double]): Column = {
    val cLit = array(cent.toIndexedSeq.map(lit): _*)
    aggregate(zip_with(sub, cLit, (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x)
  }

  /** `m` codes per row (int array; code j indexes codebook j). */
  def codeCol(vecCol: Column): Column = {
    val v = transform(vecCol, _.cast("double"))
    array((0 until m).map { s =>
      val sub = slice(v, s * subDim + 1, subDim)
      val cands = codebooks(s).zipWithIndex.map { case (c, i) =>
        struct(subSqDist(sub, c).as("d"), lit(i).as("i"))
      }
      array_min(array(cands.toIndexedSeq: _*)).getField("i")
    }: _*)
  }

  def index(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("pq_code", codeCol(col(vecCol)))

  /** ADC approximate squared-L2 distance of each row's code to `q`. */
  def adcDistCol(codeCol: Column, q: Array[Float]): Column = {
    val luts: Array[Array[Double]] = Array.tabulate(m) { s =>
      codebooks(s).map { c =>
        var d = 0.0; var j = 0
        while (j < subDim) {
          val diff = q(s * subDim + j) - c(j); d += diff * diff; j += 1
        }
        d
      }
    }
    (0 until m).map { s =>
      val lut = array(luts(s).toIndexedSeq.map(lit): _*)
      element_at(lut, element_at(codeCol, s + 1) + 1)
    }.reduce(_ + _)
  }

  /** ANN top-k: ADC-rank the codes, exact-rescore the best `pool`, keep
    * k. Only `pool` rows ever read the float vectors.
    */
  def search(indexed: DataFrame, idCol: String, vecCol: String,
      q: Array[Float], k: Int, pool: Int = 50): DataFrame = {
    val cands = indexed
      .select(col(idCol), col(vecCol),
        adcDistCol(col("pq_code"), q).as("__adc"))
      .orderBy(col("__adc").asc, col(idCol))
      .limit(pool)
    cands
      .select(col(idCol),
        round(Ann.cosineCol(col(vecCol), q), 6).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}

object Pq {
  /** Fit per-subspace codebooks on a bounded deterministic sample (same
    * sampling as [[Ann.Ivf.fit]]). `dim` must divide into `m` equal
    * subspaces.
    */
  def fit(df: DataFrame, vecCol: String, dim: Int, m: Int = 8,
      kSub: Int = 16, seed: Long = 42L, sampleCap: Int = 4096,
      maxIter: Int = 15): Pq = {
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    val sample: Array[Array[Double]] = df
      .select(transform(col(vecCol), _.cast("double")).as("__v"))
      .withColumn("__h", xxhash64(col("__v").cast("array<string>"), lit(seed)))
      .orderBy(col("__h"), col("__v"))
      .limit(sampleCap)
      .collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "Pq.fit: empty training input")
    val books = Array.tabulate(m) { s =>
      val subs = sample.map(v => java.util.Arrays.copyOfRange(v,
        s * subDim, (s + 1) * subDim))
      Ann.Ivf.lloyd(subs, math.min(kSub, subs.length), seed + s, maxIter)
    }
    new Pq(books)
  }
}
