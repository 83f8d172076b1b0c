package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative weighted propagation over a graph — PageRank in exact
  * integer fixed-point, used here for canonical-document selection on
  * the near-dup candidate graph (the highest-ranked member of a
  * duplicate neighborhood is the one to keep; its neighbors are the
  * redundant copies).
  *
  * Arithmetic contract (what makes the DuckDB oracle replay bit-for-bit
  * and the distributed sum order-independent): ranks live in e9 integer
  * space, every contribution is the integer-division chain
  * `r · d_e2 div 100 div deg`, and an iteration is
  * `r' = (100 − d_e2)·1e9 div 100 + Σ contributions` — longs end to
  * end, no floats anywhere (SURVEY §5.4).
  *
  * Scale shape: per iteration ONE join of the rank table against the
  * edge list (both shuffled on vertex id) and one map-side-combinable
  * integer sum; ranks are locally checkpointed per round so lineage
  * stays O(1) — same discipline as
  * [[Dedup.connectedComponents]]. Only edge-touched vertices iterate.
  */
object Ranking {

  /** `edges`: undirected pairs (a, b). Returns (id, rank_e9) for every
    * edge-touched vertex after `iterations` damped rounds
    * (`dampingE2`/100 is the damping factor, default 0.85).
    */
  def pageRank(edges: DataFrame, iterations: Int = 3,
      dampingE2: Int = 85): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    require(dampingE2 >= 0 && dampingE2 <= 100, "dampingE2 in [0,100]")
    // Co-partition the LOOP STATE once (r21, guide §2.4): every
    // iteration joins the edge list and the rank/deg tables on the
    // vertex id, so hash-partition all of them on that key BEFORE the
    // checkpoint and the per-round joins run exchange-free — the only
    // shuffle an iteration pays is the contribution sum by dst. The
    // explicit partition count pins the co-partitioning against AQE
    // coalescing one side to a different count (scale-adaptive: it is
    // the session's shuffle parallelism, not a constant).
    val np = edges.sparkSession.sessionState.conf.numShufflePartitions
    val und = edges.select(col("a").as("src"), col("b").as("dst"))
      .union(edges.select(col("b").as("src"), col("a").as("dst")))
      .repartition(np, col("src"))
      .localCheckpoint(true)
    val deg = und.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    val base = (100L - dampingE2) * 1000000000L / 100L
    var ranks = deg.select(col("src").as("id"),
        lit(1000000000L).as("rank_e9"))
      .localCheckpoint(true)
    for (i <- 1 to iterations) {
      val contrib = und
        .join(ranks, col("src") === col("id"))
        .join(deg, Seq("src"))
        .select(col("dst"),
          // div-first ordering: `rank_e9 * 85` overflows Long once a
          // vertex's e9 rank exceeds ~1.08e17 (rank mass of ~1e8
          // vertices on one hub — plausible on a boilerplate-dominated
          // 100 TB candidate graph, and silent). Dividing first bounds
          // the intermediate at rank scale; the truncation cost is
          // <= 99/1e9 relative. The q118 oracle replays this exact
          // association.
          expr(s"rank_e9 div 100 div deg * $dampingE2").as("__c"))
        .groupBy(col("dst")).agg(sum(col("__c")).as("__in"))
      // The vertex set comes from the STATIC deg checkpoint, so `ranks`
      // has exactly one consumer per round (the contrib join) and an
      // un-materialized round re-executes nothing twice. That makes it
      // safe to checkpoint every SECOND round (r10): lineage stays
      // bounded at two rounds, the per-round materialization job count
      // halves, and the integer arithmetic is association-identical —
      // hashes unchanged.
      ranks = deg.select(col("src").as("id"))
        .join(contrib, col("id") === col("dst"), "left")
        .select(col("id"),
          (lit(base) + coalesce(col("__in"), lit(0L))).as("rank_e9"))
      if (i % 2 == 0 || i == iterations)
        ranks = ranks.localCheckpoint(true)
    }
    ranks
  }

  /** LABEL-PROPAGATION communities (Raghavan et al. 2007), synchronous
    * and DETERMINISTIC: every vertex starts as its own label; each
    * round it adopts the most frequent label among its NEIGHBORS
    * (ties → smallest label; isolated vertices keep their own). The
    * community view the rest of the graph tier can't give: CC labels a
    * barbell (two cliques bridged by one edge) as ONE component — LPA
    * splits it at the bridge, which is exactly the dedup-policy
    * question ("one mirror family or two template farms that share a
    * page"). Fixed `rounds` (synchronous LPA can oscillate on
    * bipartite-ish structures — a bounded round count makes the answer
    * a total function of the input, and the oracle replays the same
    * rounds), min-label ties make every round a pure function — no RNG,
    * no visit order.
    *
    * Scale shape: per round ONE edge⋈label join shuffled on vertex id,
    * one map-side-combinable (dst, label) count, one dst-keyed
    * window argmax on the label-candidate table (bounded by degree) —
    * [[pageRank]]'s per-round budget plus the argmax; labels
    * checkpointed per round, lineage O(1).
    *
    * Output: (id, community, community_size) for every vertex in
    * `vertices` (column `id`).
    */
  def labelPropagation(edges: DataFrame, vertices: DataFrame,
      rounds: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(rounds >= 1, "need at least one round")
    // Same co-partitioning discipline as [[pageRank]] (r21, guide
    // §2.4): edge list hashed on src and the label table on id before
    // their checkpoints, so the per-round edge⋈label join and the
    // label update join are exchange-free — each round shuffles only
    // the (dst, lbl) vote counts, never the edge list again. At 100 TB
    // that is the difference between `rounds` full edge-table shuffles
    // and zero.
    val np = edges.sparkSession.sessionState.conf.numShufflePartitions
    val und = edges.select(col("a").as("src"), col("b").as("dst"))
      .union(edges.select(col("b").as("src"), col("a").as("dst")))
      .repartition(np, col("src"))
      .sortWithinPartitions("src") // checkpoint keeps the ordering too:
      .localCheckpoint(true)       // round SMJs skip the edge-side sort
    var labels = vertices.select(col("id"), col("id").as("lbl"))
      .repartition(np, col("id"))
      .sortWithinPartitions("id")
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val counts = und.join(labels, col("src") === col("id"))
        .groupBy(col("dst"), col("lbl"))
        .agg(count(lit(1)).as("__c"))
      // Argmax as a map-side-combinable aggregate instead of a
      // row_number window (r21, guide §2.3): max over the
      // (count, −label) struct picks the most frequent label with
      // ties to the SMALLEST label — bit-identical to the former
      // `row_number over (order by __c desc, lbl)` pick — without a
      // full sort of the vote table, and partials combine before the
      // exchange. (Labels are nonneg vertex ids, so −lbl is safe.)
      val best = counts
        .groupBy(col("dst"))
        .agg(max(struct(col("__c"), (-col("lbl")).as("__nl"))).as("__m"))
        .select(col("dst"), (-col("__m.__nl")).as("__new"))
      labels = labels.join(best, col("id") === col("dst"), "left")
        .select(col("id"), coalesce(col("__new"), col("lbl")).as("lbl"))
        .localCheckpoint(true)
    }
    labels
      .withColumn("community_size", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("lbl"))))
      .select(col("id"), col("lbl").as("community"),
        col("community_size").cast("long").as("community_size"))
  }
}
