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
    // coalescing one side to a different count.
    val und0 = edges.select(col("a").as("src"), col("b").as("dst"))
      .union(edges.select(col("b").as("src"), col("a").as("dst")))
      .localCheckpoint(true)
    // Scale-adaptive co-partition count (r21): derived from the
    // materialized edge table, not pinned to session parallelism —
    // see [[graft.SparkUtil.loopPartitions]].
    val np = graft.SparkUtil.loopPartitions(und0)
    // Degree rides WITH the edge row (r21): `deg` is a per-src
    // constant, so joining it once into the checkpointed edge table
    // removes one join from EVERY iteration — the loop body is now
    // exactly one co-partitioned join + one combinable sum.
    val und = und0.join(
        und0.groupBy(col("src")).agg(count(lit(1)).as("deg")),
        Seq("src"))
      .repartition(np, col("src"))
      .localCheckpoint(true)
    val base = (100L - dampingE2) * 1000000000L / 100L
    // Round 1 folded into one edge aggregate (r22, guide §1.2-1): the
    // initial rank table is the CONSTANT 1e9 on every touched vertex,
    // so round 1's `und ⋈ ranks` join is the identity map and its
    // contribution is `1e9 div 100 div deg * d` computed straight off
    // the edge row — the identical integer-division chain with the
    // constant substituted (1e9 div 100 = 10^7 exactly). The separate
    // distinct identity-rank build (a full aggregate + checkpoint) and
    // the round-1 join are gone; rounds 2+ are unchanged.
    var ranks = und
      .groupBy(col("dst")).agg(
        sum(expr(s"1000000000 div 100 div deg * $dampingE2")).as("__in"))
      .select(col("dst").as("id"), (lit(base) + col("__in")).as("rank_e9"))
    if (iterations == 1) ranks = ranks.localCheckpoint(false)
    for (i <- 2 to iterations) {
      val contrib = und
        .join(ranks, col("src") === col("id"))
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
      // The contribution sum is TOTAL over the touched vertex set —
      // `und` is symmetric, so every edge-touched vertex receives at
      // least one contribution — which makes the former
      // `deg left-join contrib + coalesce(0)` a no-op: the next rank
      // table IS the contribution table plus the damping base (r21,
      // one join fewer per round; the 0-contribution branch was dead
      // code on a symmetric edge list). Values bit-identical.
      ranks = contrib.select(col("dst").as("id"),
        (lit(base) + col("__in")).as("rank_e9"))
      // `ranks` has exactly one consumer per round (the contrib
      // join), so checkpointing every SECOND round keeps lineage
      // bounded at two rounds while halving materialization jobs
      // (r10) — and LAZY (r21): the consumer's own job materializes
      // the checkpoint in passing, one scheduled job per checkpoint
      // fewer. Integer arithmetic association-identical. Failure
      // trade-off (ADVICE r21): lazy blocks have no lineage fallback
      // if evicted mid-job — fail-stop, fine for bounded rounds; if
      // iteration counts ever grow large, reinstate a periodic EAGER
      // checkpoint (every Nth round) as a materialization barrier.
      if (i % 2 == 0 || i == iterations)
        ranks = ranks.localCheckpoint(false)
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
    * Scale shape (r21): per round ONE co-partitioned edge⋈label join
    * (the edge table is hash-partitioned once, never reshuffled) and
    * ONE dst-keyed vote aggregate whose map-side state is bounded by
    * degree (`mode`) — the aggregate output IS the next label table,
    * so there is no per-round label-update join; labels checkpointed
    * per round, lineage O(1). Only edge-touched vertices iterate;
    * isolated vertices rejoin as community = id at the end.
    *
    * Output: (id, community, community_size) for every vertex in
    * `vertices` (column `id`). CONTRACT (ADVICE r21): `vertices.id`
    * must be unique — an edge-touched duplicate id collapses to one
    * output row (the loop state is keyed distinct) while an isolated
    * duplicate emits one row per input row via the left_anti; every
    * declared caller passes a primary-key projection. Deduplicating
    * the isolated side here would buy consistency on malformed input
    * at the cost of a corpus-sized shuffle every call — documented
    * instead.
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
    // The raw edge pipeline (often an LSH candidate join) materializes
    // ONCE unpartitioned; the co-partition count then derives from
    // what actually landed (SparkUtil.loopPartitions) instead of the
    // pinned session parallelism — scale-adaptive per guide §2.2.
    val und0 = edges.select(col("a").as("src"), col("b").as("dst"))
      .union(edges.select(col("b").as("src"), col("a").as("dst")))
      .localCheckpoint(true)
    val np = graft.SparkUtil.loopPartitions(und0)
    // Edges mentioning ids outside `vertices` drop up front: the
    // former per-round joins filtered them implicitly (votes from
    // outside ids never joined the label table; labels for outside
    // ids never existed) — one explicit semi-join pair keeps that
    // contract now that the loop iterates on the edge-derived set.
    val und = und0
      .join(vertices.select(col("id").as("src")), Seq("src"), "left_semi")
      .join(vertices.select(col("id").as("dst")), Seq("dst"), "left_semi")
      .repartition(np, col("src"))
      .sortWithinPartitions("src") // checkpoint keeps the ordering too:
      .localCheckpoint(true)       // round SMJs skip the edge-side sort
    // Iterate ONLY over edge-touched vertices (r21 — the
    // [[Dedup.connectedComponents]] discipline applied to LPA):
    // isolated vertices have no neighbors, so they keep their own
    // label and influence nobody; keeping them in the loop shuffled
    // the whole corpus-sized label table once per round for nothing.
    // They rejoin as community = id after the loop.
    // Round 1 folded into one edge aggregate (r22, guide §1.2-1): the
    // initial labels are the identity map, so round 1's `und ⋈ labels`
    // join is a no-op and the first vote table is `mode(src)` straight
    // off the edge rows — the separate touched-set distinct (a full
    // aggregate + checkpoint) and the round-1 join are gone. Every
    // later round's label table doubles as the touched set (each
    // touched vertex receives ≥ 1 vote on a symmetric edge list).
    var labels = und.groupBy(col("dst"))
      .agg(expr("mode(src, true)").as("lbl"))
      .select(col("dst").as("id"), col("lbl"))
      .localCheckpoint(false)
    for (_ <- 2 to rounds) {
      // One co-partitioned join + ONE dst-keyed aggregate per round
      // (r21, guide §2.3): `mode(lbl, true)` buffers the per-dst
      // neighbor-label counts map-side (bounded by degree) and
      // resolves ties to the SMALLEST label at eval — the exact LPA
      // tie rule the former `row_number over (order by count desc,
      // lbl)` implemented (verified on tie/negative cases). And
      // because `und` is symmetric, every touched vertex receives at
      // least one vote, so the vote argmax IS the next label table —
      // the former per-round `labels left-join best + coalesce`
      // update was a no-op on the touched set and is gone.
      // LAZY checkpoint (the r10 CC discipline): the next round's
      // join is the single consumer of a fresh label table, so its
      // job materializes the checkpoint in passing — one scheduled
      // job per round instead of two.
      labels = und.join(labels, col("src") === col("id"))
        .groupBy(col("dst"))
        .agg(expr("mode(lbl, true)").as("lbl"))
        .select(col("dst").as("id"), col("lbl"))
        .localCheckpoint(false)
    }
    val isolated = vertices.select(col("id"))
      .join(labels.select(col("id")), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("lbl"))
    labels.union(isolated)
      .withColumn("community_size", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("lbl"))))
      .select(col("id"), col("lbl").as("community"),
        col("community_size").cast("long").as("community_size"))
  }
}
