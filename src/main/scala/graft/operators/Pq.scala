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
  * Query-time scoring is ADC (asymmetric distance computation) for the
  * INNER PRODUCT: the query precomputes an `m × kSub` table of subspace
  * dot products on the driver, and a row's approximate score is `m`
  * table lookups summed — pure expression algebra over the code column.
  * Candidates are ranked by approximate dot product, then ONLY the pool
  * rows are joined back to fetch their float vectors for the exact
  * cosine re-score; the ranking scan touches codes alone. That I/O
  * asymmetry is the entire point of PQ. (IP-ADC approximates cosine up
  * to the per-row norm; L2-normalize embeddings at index time to make
  * them coincide — unnormalized corpora with wildly varying norms can
  * rank a high-cosine/low-norm vector outside the pool.)
  *
  * Fit mirrors [[Ann.Ivf]] — the shared bounded md5-ordered sample and
  * the deterministic farthest-point + fixed-Lloyd k-means, per subspace,
  * on the driver. Everything lives in e6 fixed-point integer space
  * (quantized components, exact integer distances and ADC lookups, e12
  * integer ADC scores), so a SQL oracle replays fit, codes and ranking
  * verbatim (SURVEY §5.4). Compose with the IVF centroid column for
  * IVF-PQ (coarse prune → ADC → re-score).
  */
final class Pq(val codebooksE6: Array[Array[Array[Long]]]) extends Serializable {
  private def m = codebooksE6.length
  private def subDim = codebooksE6(0)(0).length

  /** `m` codes per row (int array; code j indexes codebook j) — the
    * native codegen'd expression ([[graft.functions.PqAssign]]): one
    * tight primitive loop inside WholeStageCodegen instead of m × kSub
    * interpreted higher-order aggregates per row.
    */
  def codeCol(vecCol: Column): Column =
    graft.functions.PqAssign(vecCol, codebooksE6)

  /** The declarative higher-order-function formulation of the same
    * assignment — kept as the independent semantic reference the native
    * expression is equivalence-tested against (PqSpec).
    */
  private[operators] def codeColHof(vecCol: Column): Column = {
    val ve = transform(vecCol,
      x => floor(x.cast("double") * 1e6).cast("long"))
    array((0 until m).map { s =>
      val sub = slice(ve, s * subDim + 1, subDim)
      val cands = codebooksE6(s).zipWithIndex.map { case (c, i) =>
        val cLit = array(c.toIndexedSeq.map(lit): _*)
        val d = aggregate(zip_with(sub, cLit, (x, ce) => {
          val diff = x - ce
          diff * diff
        }), lit(0L), (acc, x) => acc + x)
        struct(d.as("d"), lit(i).as("i"))
      }
      array_min(array(cands.toIndexedSeq: _*)).getField("i")
    }: _*)
  }

  def index(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("pq_code", codeCol(col(vecCol)))

  /** ADC approximate inner product of each row's code with `q`, as an
    * EXACT e12 integer: the query quantizes to e6 longs and each lookup
    * value is `Σ q_e6 · c_e6` — a long both engines compute identically
    * (per-term magnitude < 10^14 · subDim, no overflow at any sane dim).
    */
  def adcIpCol(codeCol: Column, q: Array[Float]): Column = {
    val qe = Ann.Ivf.quantizeE6(q)
    val luts: Array[Array[Long]] = Array.tabulate(m) { s =>
      codebooksE6(s).map { c =>
        var d = 0L; var j = 0
        while (j < subDim) { d += qe(s * subDim + j) * c(j); j += 1 }
        d
      }
    }
    (0 until m).map { s =>
      val lut = array(luts(s).toIndexedSeq.map(lit): _*)
      element_at(lut, element_at(codeCol, s + 1) + 1)
    }.reduce(_ + _)
  }

  /** ANN top-k: ADC-rank the CODES (the float column is not in the
    * ranking projection, so the wide vectors are never materialized for
    * the scan), join the best `pool` ids back for their vectors, exact
    * cosine re-score, keep k.
    */
  def search(indexed: DataFrame, idCol: String, vecCol: String,
      q: Array[Float], k: Int, pool: Int = 50): DataFrame = {
    val poolIds = indexed
      .select(col(idCol), adcIpCol(col("pq_code"), q).as("__adc"))
      .orderBy(col("__adc").desc, col(idCol))
      .limit(pool)
      .select(col(idCol))
    // Structurally drop the code column on the re-score side — it is not
    // needed there and recomputing it (when codes are derived inline
    // rather than read from storage) would double the expensive part.
    indexed.select(col(idCol), col(vecCol))
      .join(broadcast(poolIds), Seq(idCol), "left_semi")
      .select(col(idCol),
        round(Ann.cosineCol(col(vecCol), q), 6).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}

object Pq {
  /** Fit per-subspace codebooks on the shared bounded deterministic
    * sample ([[Ann.Ivf.sampleE6]]): the same md5-ordered e6-quantized
    * points, sliced per subspace, through the same farthest-point +
    * fixed-Lloyd k-means. `dim` must divide into `m` equal subspaces.
    */
  def fit(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      m: Int = 8, kSub: Int = 16, sampleCap: Int = 4096,
      rounds: Int = 3): Pq = {
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    val sample = Ann.Ivf.sampleE6(df, idCol, vecCol, sampleCap)
    val books = Array.tabulate(m) { s =>
      val subs = sample.map(v => java.util.Arrays.copyOfRange(v,
        s * subDim, (s + 1) * subDim))
      Ann.Ivf.deterministicKmeans(subs, kSub, rounds)
    }
    new Pq(books)
  }
}
