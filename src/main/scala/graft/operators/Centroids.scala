package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Nearest-class-centroid operators over embedding columns — the Rocchio
  * classifier / SemDeDup building block: average each labeled group into
  * a centroid, then assign every vector to its closest centroid. The same
  * primitive drives semantic-cluster dedup (assign, then dedup within a
  * cluster) and embedding-space eval (label ↔ cluster confusion).
  *
  * Scale shape (100 TB of vectors): the centroid fit is one map-side-
  * combinable aggregation over (label, dim) — k·d cells regardless of row
  * count; assignment broadcasts the k centroids (k·d doubles — kilobytes)
  * and scores each row in a codegen'd fold, shuffle-free. Nothing here is
  * quadratic and nothing shuffles the vectors themselves.
  *
  * Determinism: float summation order across partitions is not portable,
  * so the fit sums FIXED-POINT components — floor(x·1e6) as a long — and
  * divides back after the aggregate (SURVEY §5.4: integer partials are
  * exact in any order). Distances follow the same rule: each squared
  * component difference is quantized to an e8 long before the fold, so
  * the argmin compares exact integers, ties broken by label.
  */
object Centroids {

  /** Per-label fixed-point mean vectors. Output: labelCol,
    * `centroid` array<double> (component = Σ floor(x·1e6) / n / 1e6).
    */
  def fit(df: DataFrame, labelCol: String, vecCol: String): DataFrame = {
    val comps = df
      .select(col(labelCol), posexplode(col(vecCol)).as(Seq("__j", "__x")))
      .groupBy(col(labelCol), col("__j"))
      .agg(sum(floor(col("__x").cast("double") * 1e6).cast("long")).as("__s"),
        count(lit(1)).as("__n"))
      .select(col(labelCol), col("__j"),
        (col("__s").cast("double") / col("__n") / 1e6).as("__c"))
    comps.groupBy(col(labelCol))
      .agg(transform(array_sort(collect_list(struct(col("__j"), col("__c")))),
        s => s.getField("__c")).as("centroid"))
  }

  /** Assign each row of `df` to the nearest centroid (squared L2 in e8
    * fixed-point, label tiebreak). `centroids` is `fit`'s output — k
    * driver-sized rows, folded into the plan as literals so assignment is
    * a single codegen'd argmin expression per row: no join, no shuffle,
    * the only data movement is the scan itself. Each squared component
    * difference is quantized to an e8 long BEFORE the fold, so the
    * distance is an exact integer in any summation order — which is what
    * lets a row-order-agnostic oracle replay the argmin bit-for-bit
    * (SURVEY §5.4, same rule as `fit`). The argmin is `array_min` over
    * (dist2_e8, label) structs — struct ordering compares the distance
    * first, then label, which IS the documented tiebreak. Output: df
    * columns + `assigned` + `dist2` (= e8 integer / 1e8, one IEEE
    * division of identical integers in every engine).
    */
  def assign(df: DataFrame, vecCol: String, centroids: DataFrame,
      labelCol: String): DataFrame = {
    val cents = centroids
      .select(col(labelCol), col("centroid")).collect()
      .map(r => (r.get(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1.toString)
    require(cents.nonEmpty, "assign: empty centroid set")
    val scored = cents.map { case (lbl, cv) =>
      struct(
        // Native codegen'd loop (r11) — the HOF formulation
        // (aggregate∘zip_with) is interpreted and allocated a lambda
        // frame per element, k× per row; SqDistE8 is bit-identical.
        graft.functions.SqDistE8(col(vecCol), lit(cv)).as("d2e8"),
        lit(lbl).as("assigned"))
    }
    val best = array_min(array(scored.toIndexedSeq: _*))
    // dist2_e8 is the exact integer the argmin compared — downstream
    // rank/histogram work (outlier cutoffs, SemDeDup thresholds) stays
    // in integer space; dist2 is its one-division real-distance view.
    df.withColumn("dist2_e8", best.getField("d2e8"))
      .withColumn("dist2", col("dist2_e8").cast("double") / 1e8)
      .withColumn("assigned", best.getField("assigned"))
  }

  /** Per-row simplified SILHOUETTE under a frozen centroid set — the
    * cluster-quality audit an IVF index (q49/q151) or a SemDeDup pass
    * should see before trusting its partitioning: with a² the e8
    * squared distance to the ASSIGNED (nearest) centroid and b² the
    * distance to the runner-up,
    *
    *   sil = (b² − a²) / b²   ∈ [0, 1]
    *
    * (the centroid-based silhouette with max(a,b)=b structurally — b is
    * the second minimum — in squared-distance space; 0 = the vector
    * sits on the decision boundary between two cells, 1 = unambiguous).
    * Low per-cluster means flag cells that IVF probing will serve badly
    * (mass near cell walls → nprobe must grow) and SemDeDup will
    * under-merge.
    *
    * Same plan discipline as [[assign]]: centroids fold in as literals,
    * both distances come from ONE codegen'd sort over the k-struct
    * array — no join, no shuffle, one scan. sil quantizes to e4 from
    * the exact integer pair (one division + one ROUND, portable), ties
    * at the argmin give sil = 0 in both engines by the (d2, label)
    * struct order. Output: df columns + assigned, a2_e8, b2_e8, sil_e4.
    */
  def silhouette(df: DataFrame, vecCol: String, centroids: DataFrame,
      labelCol: String): DataFrame = {
    val cents = centroids
      .select(col(labelCol), col("centroid")).collect()
      .map(r => (r.get(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1.toString)
    require(cents.length >= 2, "silhouette needs >= 2 centroids")
    val scored = cents.map { case (lbl, cv) =>
      struct(graft.functions.SqDistE8(col(vecCol), lit(cv)).as("d2e8"),
        lit(lbl).as("assigned"))
    }
    val sorted = array_sort(array(scored.toIndexedSeq: _*))
    df.withColumn("assigned", element_at(sorted, 1).getField("assigned"))
      .withColumn("a2_e8", element_at(sorted, 1).getField("d2e8"))
      .withColumn("b2_e8", element_at(sorted, 2).getField("d2e8"))
      .withColumn("sil_e4", when(col("b2_e8") === 0, lit(0L))
        .otherwise(round((col("b2_e8") - col("a2_e8")).cast("double") /
          col("b2_e8") * 10000, 0).cast("long")))
  }
}
