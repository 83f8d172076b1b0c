package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact salting for skewed equi-joins — the manual fallback when AQE's
  * skew-join split cannot help (it splits oversized partitions, not a
  * single hot KEY whose rows must still meet every matching row of the
  * other side in one task).
  *
  * The big (skewed) side gets a deterministic per-row salt in `[0, g)`;
  * the other side is replicated `g` ways; the join key extends with
  * `salt = replica`. A key with m big-side rows becomes g tasks of m/g
  * rows each, at the price of g× shuffle volume on the replicated side —
  * pick the smaller input as `other`. Every original pair still matches
  * in exactly one (salt, replica) block, so the result is EXACT (same
  * guarantee as [[Dedup.lshCandidatePairs]]'s block-salted self-join,
  * generalized to two tables).
  */
object SkewJoin {

  /** Inner equi-join `big ⋈ other` on `keys` with salt factor `g`.
    * Output columns: big's columns then other's non-key columns (like a
    * `using`-join). Salt is a hash of the whole big row — deterministic,
    * and spreads a hot key's rows evenly without any random state.
    */
  def inner(big: DataFrame, other: DataFrame, keys: Seq[String],
      g: Int): DataFrame = {
    require(g >= 1, s"salt factor must be >= 1, got $g")
    require(keys.nonEmpty, "need at least one join key")
    require(!big.columns.contains("__salt") && !other.columns.contains("__rep"),
      "inputs must not already carry __salt/__rep columns")
    val overlap = big.columns.toSet.intersect(other.columns.toSet) -- keys
    require(overlap.isEmpty,
      s"non-key columns collide across inputs: ${overlap.mkString(", ")}")
    // Salt mixes a per-row physical position into the hash: byte-identical
    // duplicate rows (pre-dedup corpora are full of them) must still
    // spread across blocks. Salt values only steer BALANCE — any value in
    // [0, g) yields the same exact result — so the result set stays
    // deterministic even though the position-dependent salt is not.
    val b = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col).toIndexedSeq: _*),
        spark_partition_id(), monotonically_increasing_id()), lit(g))
        .cast("int")).as("b")
    val o = other.withColumn("__rep",
      explode(array((0 until g).map(lit).toIndexedSeq: _*))).as("o")
    val cond = keys.map(k => col(s"b.$k") === col(s"o.$k"))
      .reduce(_ && _) && col("b.__salt") === col("o.__rep")
    val otherCols = other.columns.filterNot(keys.contains)
    // Hash-join the replicated side instead of sort-merge: salting already
    // guarantees no block exceeds ~|hot key|/g rows, so the build side is
    // bounded and the two per-side sorts are pure overhead. (AQE can't
    // pick this itself: the salted key's NDV estimate looks huge.)
    b.join(o.hint("shuffle_hash"), cond)
      .select(big.columns.map(c => col(s"b.$c")).toIndexedSeq ++
        otherCols.map(c => col(s"o.$c")): _*)
  }
}
