package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch over a key column — the bounded-memory frequency
  * summary for point estimates (Cormode & Muthukrishnan 2005), portable
  * across engines.
  *
  * Why it exists next to [[graft.functions.MisraGries]] (q57): MG answers
  * "which keys are frequent" with a k-counter candidate set; count-min
  * answers "how frequent is THIS key" for any key, with a one-sided
  * error `est - true ∈ [0, e/w · N]` at confidence `1 - (1/2)^d`. At
  * 100 TB the register table is d·w integer cells (4 KB here) regardless
  * of key cardinality — the whole build is ONE map-side-combinable
  * aggregate over a d-way exploded stream, so every executor ships d·w
  * partial cells, never the key space. Contrast the exact
  * `groupBy(key).count()`: its aggregation state is the FULL key
  * cardinality (billions at corpus scale).
  *
  * Portability (SURVEY §5.4): row hashes are md5-derived — bucket of key
  * in row r = first 8 md5 hex digits of `"r:key"` as an integer, mod w —
  * so a DuckDB oracle replays the registers AND the estimates
  * bit-for-bit. All arithmetic is integral.
  */
object CountMin {

  /** Bucket of `key` (string column) in hash row `r`: 32 hex-derived
    * bits mod `w`. Each of the d rows is an independent hash by prefix.
    */
  def bucket(r: Int, key: Column, w: Int): Column =
    conv(substring(md5(concat_ws(":", lit(r), key)), 1, 8), 16, 10)
      .cast("long") % w

  /** Build the d×w register table: (r, b, c) with
    * c = count of rows whose key hashes to bucket b in hash row r.
    * The explode is map-side (×d before partial aggregation); partial
    * state is at most d·w cells per task.
    */
  def sketch(df: DataFrame, keyCol: String, d: Int, w: Int): DataFrame = {
    require(d > 0 && w > 0, s"need d,w > 0, got d=$d w=$w")
    val key = col(keyCol).cast("string")
    df.select(explode(array((0 until d).map(r =>
        struct(lit(r).as("r"), bucket(r, key, w).as("b"))): _*)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(count(lit(1)).as("c"))
  }

  /** The same d×w register table built from an ALREADY-AGGREGATED
    * (key, count) table: registers are per-bucket sums of row counts,
    * so summing per-key counts per bucket is cell-identical to
    * [[sketch]] over the raw stream — and when a query needs the exact
    * per-key counts anyway (q102's report, q181's calibration), the
    * stream is scanned ONCE for the aggregate and the sketch derives
    * from |keys| rows instead of a second full-stream pass.
    */
  def sketchFromCounts(counts: DataFrame, keyCol: String,
      countCol: String, d: Int, w: Int): DataFrame = {
    require(d > 0 && w > 0, s"need d,w > 0, got d=$d w=$w")
    val key = col(keyCol).cast("string")
    counts.select(col(countCol),
        explode(array((0 until d).map(r =>
          struct(lit(r).as("r"), bucket(r, key, w).as("b"))): _*)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(sum(col(countCol)).as("c"))
  }

  /** Point estimates for `probes` (a DataFrame with `keyCol`): the
    * count-min rule `est(k) = min over r of reg[r][bucket_r(k)]`.
    * The register table is tiny by construction, so it broadcasts; the
    * probe side explodes ×d and never shuffles on data volume.
    * A bucket no key hashed to has an implicit register of 0.
    */
  def estimate(probes: DataFrame, regs: DataFrame, keyCol: String,
      d: Int, w: Int): DataFrame = {
    val key = col(keyCol).cast("string")
    val pb = probes.select(col(keyCol),
        explode(array((0 until d).map(r =>
          struct(lit(r).as("r"), bucket(r, key, w).as("b"))): _*)).as("rb"))
      .select(col(keyCol), col("rb.r").as("r"), col("rb.b").as("b"))
    pb.join(broadcast(regs), Seq("r", "b"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
  }
}
