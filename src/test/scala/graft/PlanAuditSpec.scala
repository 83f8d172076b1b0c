package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan audits: assert the physical plans have the scale-critical
  * properties (pushdown, broadcast, codegen, exchange hygiene) — a
  * regression here is a 100 TB incident, not a style issue.
  */
class PlanAuditSpec extends SparkSpec {

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString

  test("q01: filter + projection pushed to parquet scan") {
    val p = plan("q01_scan_filter")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity"), p)
    assert(p.contains("ReadSchema") &&
      p.contains("l_orderkey") && !p.contains("l_comment"), p)
  }

  test("q05: dimension joins are broadcast, not shuffled") {
    val p = plan("q05_join_dims")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q06: customer side broadcast; big join keyed on orderkey") {
    val p = plan("q06_join_agg_topk")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q12: sort+limit+offset compiles to TakeOrderedAndProject") {
    val p = plan("q12_sort_limit_offset")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q03: aggregation is two-phase (partial then final)") {
    val p = plan("q03_agg_having")
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
  }

  test("whole-stage codegen spans plain scalar pipelines (q15)") {
    val p = SparkEntry.queries("q15_scalar_fns")(spark, "/root/testdata/sf0.001")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.CodegenMode)
    assert(p.contains("WholeStageCodegen"), p.take(500))
  }

  test("q21: single scan side distributed, query vector broadcast") {
    val p = plan("q21_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q38: exact percentiles via distributed selection — no Percentile buffer, no group-width Window") {
    // Spark's `percentile` aggregate buffers every group value in one
    // unspillable aggregation buffer — at 3 groups that's a third of
    // lineitem per buffer, an executor OOM at 100×. A
    // Window.partitionBy(group) sort would spill but caps parallelism at
    // the group count (3 tasks sorting 33 TB each at 100×). The
    // quantilesByGroup rank-selection shape does the heavy work in
    // range-partitioned spillable sorts upstream and returns a BOUNDED
    // driver-assembled result: the query plan must be a LocalTableScan
    // with neither operator.
    val p = plan("q38_percentiles")
    assert(!p.toLowerCase.contains("percentile"), p)
    assert(!p.contains("Window"), p)
    assert(p.contains("LocalTableScan"), p)
  }

  test("q28: simhash is one hash shuffle with no per-bit row explode") {
    val p = plan("q28_simhash")
    // The token explode (split) is map-side; there must be no second
    // explode fanning each token row out 60× into the shuffle.
    assert("explode\\(sequence".r.findAllIn(p).isEmpty, p)
    val hashShuffles = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashShuffles == 1, s"expected 1 hash shuffle, got $hashShuffles:\n$p")
  }

  test("q31: language ID tokenizes once (single split in the plan)") {
    val p = plan("q31_lang_id")
    val splits = "split\\(".r.findAllIn(p).length
    assert(splits == 1, s"expected 1 split, got $splits:\n${p.take(2000)}")
  }

  test("q50: near-dup pairs join on buckets — never a cartesian product") {
    val p = plan("q50_embed_neardup_lsh")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q62: as-of join is union + window — no join operator at all") {
    // The range-join formulation would shuffle a per-key cross product;
    // the union+window plan shuffles each input once on the key.
    val p = plan("q62_asof_join")
    assert(!p.toLowerCase.contains("join"), p)
    assert(p.contains("Window"), p)
  }

  test("q64: decontamination joins the distinct eval n-grams broadcast") {
    val p = plan("q64_decontam")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q66: sampling scan prunes to the three projected columns") {
    val p = plan("q66_stratified_sample")
    assert(p.contains("ReadSchema"), p)
    assert(!p.contains("text"), p) // the wide column stays unread
  }

  test("q67: z-order key reduces via TakeOrderedAndProject, no full sort") {
    val p = plan("q67_zorder_key")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q77/q80/q83: new curation/retrieval plans stay cartesian-free") {
    for (q <- Seq("q77_inverted_index", "q80_skew_report",
        "q83_curation_pipeline")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
    }
  }

  test("q81: seeded shuffle's top-100 reduces via TakeOrderedAndProject") {
    val p = plan("q81_seeded_shuffle")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q127: DSIR selects via TakeOrdered and broadcasts the ratio table") {
    val p = plan("q127_dsir_resample")
    // Global top-k must be per-partition k + driver merge, never a
    // single-partition global sort; the 512-row log-ratio table joins
    // back broadcast, so the per-doc stream never shuffles for scoring.
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q82: upsampling is explode-only — no join, no aggregation") {
    val p = plan("q82_upsample")
    assert(p.contains("Generate"), p)
    assert(!p.contains("Join") && !p.contains("HashAggregate"), p)
  }

  test("q87/q90: codec and filtered-KNN plans stay cartesian-free") {
    val p87 = plan("q87_tokenize_roundtrip")
    assert(!p87.contains("CartesianProduct"), p87)
    val p90 = plan("q90_filtered_knn")
    assert(!p90.contains("CartesianProduct"), p90)
    // the single query vector rides a broadcast, never a shuffle
    assert(p90.contains("BroadcastNestedLoopJoin") ||
      p90.contains("BroadcastHashJoin"), p90)
  }

  test("vocab: frequency rank is distributed — multi-partition output, " +
      "no Window, ids equal the windowed rank rule") {
    // Indexing.vocab numbers the sorted term table with zipWithIndex over
    // a range-partitioned sort. A partition-less Window (or any global
    // single-task sort) would single-thread a 100M-term vocabulary AND
    // collapse the result to ONE partition — so the audit pins (a) the
    // returned table spans >1 partition (the vocab is materialized
    // inside vocab(), so the partitioning of the RESULT is the
    // partitioning of the rank computation itself), (b) no Window
    // operator in the returned plan, and (c) id == the windowed rank
    // rule value-for-value.
    import org.apache.spark.sql.functions._
    val docsDf = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // AQE legitimately coalesces the tiny test vocab to one partition —
    // at scale it would keep many. Disable coalescing HERE so the
    // partition count reflects the PARTITIONER (range), not the data
    // size; production keeps the adaptive behavior.
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(coalesceKey)
    val v = try {
      spark.conf.set(coalesceKey, "false")
      graft.operators.Indexing.vocab(docsDf, "text")
    } finally spark.conf.set(coalesceKey, prev)
    assert(v.rdd.getNumPartitions > 1,
      s"vocab collapsed to ${v.rdd.getNumPartitions} partition(s) — " +
        "a single-task global sort shape")
    assert(!v.queryExecution.executedPlan.toString.contains("Window"))
    // The ids must equal the windowed rank rule.
    import org.apache.spark.sql.expressions.{Window => W}
    val expected = docsDf
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
      .select(col("term"), (row_number().over(
        W.orderBy(col("c").desc, col("term"))) - 1).cast("int").as("eid"))
    assert(v.join(expected, Seq("term"))
      .filter(col("id") =!= col("eid")).count() == 0L)
  }

  test("q202: compacted-store read-back prunes to the certificate's " +
      "columns and stays cartesian-free") {
    // The q202 result is an aggregate over the compacted BUCKETED store;
    // the scan must read only (key, content, documentid) — embedding and
    // context stay in the footer — and nothing in the physical plan may
    // fall back to a cartesian. (Touched-bucket pruning is proven
    // PHYSICALLY in BucketedVectorStoreSpec: an untouched bucket's files
    // survive a merge byte-identical.)
    val p = plan("q202_bucketed_compaction")
    assert(!p.contains("CartesianProduct"), p)
    val readSchema = "ReadSchema: [^\\n]*".r.findAllIn(p).mkString("\n")
    assert(readSchema.contains("key") && readSchema.contains("content"),
      readSchema)
    assert(!readSchema.contains("embedding") &&
      !readSchema.contains("context"), readSchema)
  }

  test("q86: sample-quantile plan prunes columns and stays cartesian-free") {
    val p = plan("q86_approx_percentiles")
    assert(!p.contains("CartesianProduct"), p)
    // only the rank keys + value + group column reach the scan
    assert(!p.contains("l_tax") && !p.contains("l_quantity") &&
      !p.contains("l_shipdate"), p)
    // r11: the sample's rank pick runs through Stats.quantilesByGroup's
    // distributed rank selection BEFORE this plan is built, so the final
    // plan is the mean's single scan-aggregate joined to a groups-sized
    // local relation of picks. The banned shapes: the r10 collect_list
    // fusion (unspillable O(rate·n) per-group buffer — same class
    // PlanAuditSpec bans for q38) and the r9 window sort.
    assert(!p.contains("collect_list"), p)
    assert("Scan parquet".r.findAllIn(p).size == 1, p)
    assert(p.contains("LocalTableScan") || p.contains("LocalRelation") ||
      p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("Window"), p)
  }

  test("q106/q49: vector distances run native, not as interpreted HOFs") {
    // r11: the pair-stage distance and the IVF coarse assignment are
    // native codegen'd expressions (SqDistE8 / PqAssign). A zip_with or
    // aggregate lambda reappearing in these plans means the hot loop
    // fell back to the interpreted path — pairs × 384 lambda frames.
    val p106 = plan("q106_semantic_dedup")
    assert(p106.contains("sq_dist_e8"), p106)
    assert(!p106.contains("zip_with"), p106)
    val p49 = plan("q49_ann_ivf")
    assert(p49.contains("pq_assign"), p49)
  }

  test("q124: corpus crosses ONE aggregate; report runs on the histogram") {
    val p = plan("q124_embedding_outliers")
    assert(!p.contains("CartesianProduct"), p)
    // The embeddings scan + native argmin ran INSIDE adaptiveThreshold's
    // histogram checkpoint (its hist feeds two consumers — without the
    // materialization the 384-dim argmin scan re-ran per consumer; this
    // pin caught that). The final plan is histogram-sized: no parquet.
    assert(!p.contains("Scan parquet"), p)
    assert(p.contains("Scan ExistingRDD"), p)
  }

  test("q91: the instance-sized bigram stream never crosses a join") {
    // The LM score joins must happen between COUNT tables (vocabulary-
    // sized), never against the raw exploded bigram stream — a Generate
    // reaching a Join without an intervening Aggregate means the largest
    // relation in the pipeline is being shuffled through the skewed w1
    // join again (the round-7 plan bug).
    import org.apache.spark.sql.catalyst.plans.logical._
    val lp = SparkEntry.queries("q91_lm_score")(spark, "/root/testdata/sf0.001")
      .queryExecution.optimizedPlan
    def generateAboveAggregate(p: LogicalPlan): Boolean = p match {
      case _: Aggregate => false
      case _: Generate => true
      case other => other.children.exists(generateAboveAggregate)
    }
    val joins = lp.collect { case j: Join => j }
    assert(joins.size == 2, s"expected the two count-table joins:\n$lp")
    joins.foreach { j =>
      assert(!j.children.exists(generateAboveAggregate),
        s"un-aggregated bigram stream feeds a join:\n$lp")
    }
  }

  test("q98-q101: span tier prunes columns and stays cartesian-free") {
    for (q <- Seq("q98_span_dedup", "q100_ngram_novelty",
        "q101_span_strip", "q126_paragraph_dedup", "q130_cdc_dedup")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
      // only doc_id + text feed the shingle/gram streams
      assert(!p.contains("n_chars") && !p.contains("source"), s"$q:\n$p")
    }
  }

  test("q98/q101: corpus explodes into shingles exactly ONCE") {
    // SpanDedup consumes the shingle stream twice (df aggregate + semi
    // join); without materialization Catalyst plants TWO corpus-fed
    // Generate subtrees (the round-8 plan bug). After the checkpoint the
    // per-query plan must show ZERO Generates fed by a parquet scan in
    // q98 (the one explode ran inside the materialized RDD) and in q101
    // (the rewrite is a per-row index-aware filter over the token
    // array — no token posexplode at all since r9b).
    def corpusGenerates(q: String): Int = {
      import org.apache.spark.sql.catalyst.plans.logical.{Generate, LogicalPlan}
      import org.apache.spark.sql.execution.datasources.LogicalRelation
      val lp = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.optimizedPlan
      def feedsFromParquet(p: LogicalPlan): Boolean =
        p.collectFirst { case _: LogicalRelation => true }.nonEmpty
      lp.collect { case g: Generate if feedsFromParquet(g.child) => g }.size
    }
    assert(corpusGenerates("q98_span_dedup") == 0)
    assert(corpusGenerates("q101_span_strip") == 0)
    // q126/q130: the segment/chunk streams are checkpointed once and the
    // rebuild is the same index-aware filter — zero corpus-fed explodes.
    assert(corpusGenerates("q126_paragraph_dedup") == 0)
    assert(corpusGenerates("q130_cdc_dedup") == 0)
    // q100: the distinct (doc, gram) stream is materialized once too
    // (both consumers read the checkpointed RDD).
    assert(corpusGenerates("q100_ngram_novelty") == 0)
  }

  test("q137: PII pass is one narrow codegen'd scan — single sort exchange, no join/agg") {
    // Detection + redaction are expression-level regexp work: the only
    // exchange in the whole plan is the final oracle-determinism
    // orderBy; a join or aggregate here means the operator stopped
    // composing into the scan.
    val p = plan("q137_pii_redact")
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 2, s"expected only the final sort exchange(s):\n$p")
    assert(!p.contains("Join") && !p.contains("HashAggregate"), p)
    val c = SparkEntry.queries("q137_pii_redact")(spark, "/root/testdata/sf0.001")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.CodegenMode)
    assert(c.contains("WholeStageCodegen"), c.take(500))
  }

  test("q138: IVF-SQ search broadcasts the pool and prunes on the probe filter") {
    // The pool re-score join must be broadcast (≤ pool rows), never a
    // corpus shuffle, and the probe prune must appear as a cid IN
    // filter below the ranking.
    val p = plan("q138_ann_ivfsq")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q134: corpus tokenized ONCE — no parquet scan or split at query time") {
    // The three-tier attribution shares ONE checkpointed (doc_id,
    // tokens) table: the shared tokenize is the only corpus read, so
    // the final plan must carry ZERO parquet scans (every leaf is the
    // checkpoint or a tier's derived checkpoint) and ZERO split()
    // calls (the r11 shape re-split `text` four times — three tier
    // tokenizations plus the coverage count — making q134 the slowest
    // batch query).
    val p = plan("q134_dedup_attribution")
    assert(!p.contains("Scan parquet"), p.take(2000))
    assert(!p.contains("split("), p.take(2000))
  }

  test("q78: portable Bloom probe scans the grams once; filter rides " +
      "as a 1-row broadcast") {
    // The words array is collected at build time (bounded: numBits/32
    // longs) and probed from a ONE-ROW broadcast relation (r21 — as an
    // inline literal it cost the driver canonicalization hashing per
    // plan pass). The only join allowed is that broadcast cross; a
    // shuffled join here means the filter regressed to a relational
    // probe, which re-shuffles the corpus gram stream at 100 TB.
    val p = plan("q78_decontam_bloom")
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size == 1, p.take(1000))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct")
      && !p.contains("BroadcastHashJoin"), p.take(1000))
    // per-doc aggregate + output sort + ensureParallelism's small-input
    // repartition (sf0.001 is a single parquet split) + the 1-row
    // BroadcastExchange — nothing else.
    assert("Exchange".r.findAllIn(p).length <= 4, p.take(1000))
    // the probe reads the packed-words array column
    assert(p.contains("element_at"), p.take(1000))
  }

  test("q99: the corpus crosses ONE aggregate; percentiles run on the histogram") {
    // The whole point of the histogram percentile: the only shuffle of
    // data-sized input is the partial+final (lang, score) count — the
    // windows run on the tiny histogram after it. A Window whose child
    // subtree contains the parquet scan without an intervening Aggregate
    // means the corpus is being sorted per language (the shape that dies
    // at 100 TB).
    import org.apache.spark.sql.catalyst.plans.logical._
    val lp = SparkEntry.queries("q99_adaptive_threshold")(
      spark, "/root/testdata/sf0.001").queryExecution.optimizedPlan
    def scanAboveAggregate(p: LogicalPlan): Boolean = p match {
      case _: Aggregate => false
      // r11: adaptiveThreshold materializes the histogram — a LogicalRDD
      // leaf IS the aggregated (histogram-sized) table, not the corpus.
      case _: org.apache.spark.sql.execution.LogicalRDD => false
      case l: LeafNode => true
      case other => other.children.exists(scanAboveAggregate)
    }
    lp.collect { case w: Window => w }.foreach { w =>
      assert(!scanAboveAggregate(w.child),
        s"window over un-aggregated corpus:\n$lp")
    }
  }

  test("q102: sketch build is two-phase; estimate join is broadcast") {
    // The register aggregate must map-side-combine (d·w partial cells)
    // and the tiny register table must broadcast into the probe side —
    // a SortMergeJoin here means the sketch is being treated as data.
    val p = plan("q102_countmin")
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q103: bounded-state sample has no Window and no per-stratum sort") {
    // The aggregate IS the point: a Window/row_number plan would sort
    // every stratum. ObjectHashAggregate partial+final carries the
    // k-pair state instead.
    val p = plan("q103_sample_k")
    assert(!p.contains("Window"), p)
    assert("ObjectHashAggregate".r.findAllIn(p).length >= 2, p)
  }

  test("q104: extraction is a single-pass projection (one Exchange, for the final sort)") {
    val p = plan("q104_html_extract")
    assert(!p.contains("Join"), p)
    assert("Exchange".r.findAllIn(p).length == 1, p)
  }

  test("q106: cluster-scoped pair search — no cartesian, assignment joinless") {
    // The pair stage joins ON the assigned cluster; anything cartesian
    // means the O(n²/k) restriction was lost. The centroid argmin is a
    // literal-folded expression, so exactly one join (a↔b) may appear.
    val p = plan("q106_semantic_dedup")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q110: tercile windows run on the histogram, never the corpus") {
    // Same invariant as q99 at the pipeline level: the per-language
    // cutoffs come from the (lang, score) histogram; a Window whose
    // subtree reaches a scan without an Aggregate means the corpus is
    // being sorted per language.
    import org.apache.spark.sql.catalyst.plans.logical._
    val lp = SparkEntry.queries("q110_ccnet_buckets")(
      spark, "/root/testdata/sf0.001").queryExecution.optimizedPlan
    def scanAboveAggregate(p: LogicalPlan): Boolean = p match {
      case _: Aggregate => false
      case _: LeafNode => true
      case other => other.children.exists(scanAboveAggregate)
    }
    lp.collect { case w: Window => w }.foreach { w =>
      assert(!scanAboveAggregate(w.child),
        s"window over un-aggregated corpus:\n$lp")
    }
  }

  test("q108: curriculum packing plan has no Window and no cartesian") {
    // Ordering + binning run through the two-pass prefix-sum packer
    // (mapPartitions over range partitions); a Window here would be the
    // single-partition global cumulative sum that dies at scale.
    val p = plan("q108_curriculum")
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q111: top-k per class via bounded aggregate — no Window, no join") {
    // The scored stream (vectors × classes) must reach the SampleK
    // ObjectHashAggregate directly: a Window means per-class sorting of
    // the exploded stream; a Join means the centroid table stopped
    // folding into the projection.
    val p = plan("q111_hard_negatives")
    assert(!p.contains("Window"), p)
    assert(!p.contains("Join"), p)
    assert("ObjectHashAggregate".r.findAllIn(p).length >= 2, p)
  }

  test("q113: chunking is a map-side generate — no shuffle before the sort") {
    val p = plan("q113_chunk_windows")
    assert(!p.contains("Join"), p)
    assert("Exchange".r.findAllIn(p).length == 1, p)
  }

  test("q114: KMV sketches flow through bounded aggregates, never a sort") {
    // Sketch collection AND sketch merge are SampleK ObjectHashAggregates;
    // a Window/Sort here means the per-set ranking plan crept back in.
    val p = plan("q114_kmv_overlap")
    assert(!p.contains("Window"), p)
    assert("ObjectHashAggregate".r.findAllIn(p).length >= 2, p)
  }

  test("q121: gap-fill window runs on the generated grid, not the corpus") {
    import org.apache.spark.sql.catalyst.plans.logical._
    val lp = SparkEntry.queries("q121_gap_fill")(
      spark, "/root/testdata/sf0.001").queryExecution.optimizedPlan
    def scanAboveAgg(p: LogicalPlan): Boolean = p match {
      case _: Aggregate => false
      case _: LeafNode => true
      case other => other.children.exists(scanAboveAgg)
    }
    lp.collect { case w: Window => w }.foreach { w =>
      assert(!scanAboveAgg(w.child), s"window over un-aggregated corpus:\n$lp")
    }
  }

  test("q122: fuzzy match is a keyed join — no cartesian, no nested loop") {
    val p = plan("q122_fuzzy_match")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q118: PageRank rounds stay cartesian-free with bounded lineage") {
    val p = plan("q118_canonical_rank")
    assert(!p.contains("CartesianProduct"), p)
    // final plan reads the checkpointed rank table, not a 3-round lineage
    assert(p.contains("Scan ExistingRDD") || p.contains("LocalTableScan"), p)
  }

  test("q149: both late-interaction stages broadcast the query side — " +
      "the corpus never self-joins or sort-merges") {
    val p = plan("q149_late_interaction")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // max→sum rescore aggregates are two-phase (map-side partials).
    assert("HashAggregate".r.findAllIn(p).length >= 4, p)
  }

  test("q152: the prefix ladder is the codegen'd expression — no " +
      "interpreted HOF fold in the pair stage") {
    // String plans elide wide projections ("... N more fields"), so
    // audit the expression TREES: PrefixDots present, no
    // ArrayAggregate (the interpreted fold q152 started on).
    val lp = SparkEntry.queries("q152_dim_truncation")(
      spark, "/root/testdata/sf0.001").queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.expressions.Expression
    def exprs(e: Expression): Seq[Expression] = e +: e.children.flatMap(exprs)
    val all = lp.collect { case n => n }.flatMap(_.expressions).flatMap(exprs)
    assert(all.exists(_.isInstanceOf[graft.functions.PrefixDots]), "no PrefixDots in the optimized plan")
    assert(!all.exists(_.getClass.getSimpleName == "ArrayAggregate"),
      "interpreted HOF fold crept back into the pair stage")
    val p = SparkEntry.queries("q152_dim_truncation")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      p.take(1500))
  }

  test("q154: one prefix-sum pass feeds every capacity — a single " +
      "scan of the checkpointed cumsum, no re-scan per capacity") {
    val lp = SparkEntry.queries("q154_packing_curve")(
        spark, "/root/testdata/sf0.001")
      .queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
    def countScans(n: LogicalPlan): Int =
      (if (n.getClass.getSimpleName.contains("LogicalRDD")) 1 else 0) +
        n.children.map(countScans).sum
    assert(countScans(lp) == 1, s"capacity ladder re-scans the cumsum:\n$lp")
  }

  test("q158: Kneser-Ney joins happen between count tables only") {
    // Same discipline as the q91 audit: the instance-sized bigram
    // stream must aggregate before any join — KN adds a third count
    // relation (continuation counts) but the raw stream still crosses
    // exactly one aggregate.
    import org.apache.spark.sql.catalyst.plans.logical._
    val lp = SparkEntry.queries("q158_kneser_ney")(spark,
      "/root/testdata/sf0.001").queryExecution.optimizedPlan
    def generateAboveAggregate(p: LogicalPlan): Boolean = p match {
      case _: Aggregate => false
      case _: Generate => true
      case other => other.children.exists(generateAboveAggregate)
    }
    lp.collect { case j: Join => j }.foreach { j =>
      assert(!j.children.exists(generateAboveAggregate),
        s"un-aggregated bigram stream feeds a join:\n$lp")
    }
  }

  test("q159: skyline global phase is a broadcast anti-join over " +
      "candidates — no cartesian, no sort-merge") {
    val p = plan("q159_pareto_frontier")
    assert(p.contains("BroadcastNestedLoopJoin") &&
      p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      p)
  }

  test("q160/q166: collocation stages run on the checkpointed pair " +
      "table — no corpus re-explode, no cartesian") {
    import org.apache.spark.sql.catalyst.plans.logical.{Generate, LogicalPlan}
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    for (q <- Seq("q160_pmi_collocations", "q166_textrank_keywords")) {
      val lp = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.optimizedPlan
      def feedsFromParquet(p: LogicalPlan): Boolean =
        p.collectFirst { case _: LogicalRelation => true }.nonEmpty
      assert(lp.collect {
        case g: Generate if feedsFromParquet(g.child) => g
      }.isEmpty, s"$q re-explodes the corpus:\n$lp")
      val pp = plan(q)
      assert(!pp.contains("CartesianProduct"), s"$q:\n$pp")
    }
  }

  test("q161: jackknife totals broadcast; corpus crosses one aggregate") {
    val p = plan("q161_jackknife_influence")
    // both cross joins carry 1-row broadcast totals, never a shuffle
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      p)
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q163: weighted sample reduces via TakeOrderedAndProject") {
    val p = plan("q163_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
  }

  test("q165: silhouette is joinless — centroid literals, native " +
      "distance expression") {
    val p = plan("q165_silhouette")
    assert(p.contains("sq_dist_e8"), p)
    assert(!p.contains("Join"), p)
  }

  test("q168-adjacent: coreset per-step argmax is a TakeOrdered over " +
      "the literal-folded distance") {
    // The operator's per-step plan, probed directly (the q168 entry
    // runs the full k-step loop — audit one representative step).
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // repartition: a pure LocalRelation would constant-fold the whole
    // step into a LocalTableScan and hide the expression from the plan
    val emb = (1L to 50L).map(i => (i, Array(i.toFloat, 0f)))
      .toDF("vec_id", "embedding").repartition(4)
    val step = emb.withColumn("__d",
        graft.functions.SqDistE8(col("embedding"),
          typedLit(Array(0f, 0f))))
      .orderBy(col("__d").desc, col("vec_id")).limit(1)
    val p = step.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject") &&
      p.contains("sq_dist_e8"), p)
  }

  test("q170: transition lag window is keyed by user — no global sort") {
    val p = plan("q170_markov_transitions")
    // the only Window must partition on user_id; an empty partition
    // spec would serialize the event stream through one task
    assert(p.contains("Window") && p.contains("user_id"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q174/q175: banded pair joins stay cartesian-free") {
    for (q <- Seq("q174_phash_neardup", "q175_triangle_census")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
    }
  }

  test("q176: rank lookup joins the histogram broadcast") {
    val p = plan("q176_quantile_normalize")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q178-adjacent: the moment pass is ONE aggregate over one scan") {
    // The PCA operator's corpus-side plan: a single explode feeding a
    // single combinable aggregate — audit the shape directly (q178's
    // entry also runs the driver iteration).
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = (1L to 20L).map(i => Tuple1(Array(i.toFloat, 2f * i)))
      .toDF("embedding").repartition(4)
    val idx = sequence(lit(0), lit(1))
    val xq = transform(col("embedding"),
      x => floor(x.cast("double") * 1000).cast("long"))
    val cells = df.select(xq.as("__q"))
      .select(explode(flatten(transform(idx, i => transform(idx, j =>
        struct(i.as("i"), j.as("j"),
          (element_at(col("__q"), i + 1) *
            element_at(col("__q"), j + 1)).as("p")))))).as("c"))
      .groupBy(col("c.i"), col("c.j")).agg(sum(col("c.p")).as("s"))
    val p = cells.queryExecution.executedPlan.toString
    assert(p.contains("HashAggregate") && p.contains("Generate"), p)
    assert(!p.contains("Join"), p)
  }

  test("q75/q76: BM25 is a joinless narrow scan; no cartesian anywhere") {
    // The literal-term BM25 plan is one projection over the checkpointed
    // per-doc stats — any Join/Exchange/Generate appearing here means the
    // token-table explode crept back in.
    val p75 = plan("q75_bm25")
    assert(!p75.contains("Join"), p75)
    assert(!p75.contains("Generate"), p75)
    assert(p75.contains("TakeOrderedAndProject"), p75)
    val p76 = plan("q76_hybrid_rrf")
    assert(!p76.contains("CartesianProduct"), p76)
  }

  test("q183: Otsu windows run on the checkpointed histogram, never " +
      "the corpus") {
    // Same contract as q99: the only data-sized shuffle is the
    // (group, bin) count; every Window's subtree must bottom out in the
    // materialized histogram (LogicalRDD) or an Aggregate, never a raw
    // parquet scan.
    import org.apache.spark.sql.catalyst.plans.logical._
    val lp = SparkEntry.queries("q183_otsu_threshold")(
      spark, "/root/testdata/sf0.001").queryExecution.optimizedPlan
    def scanAboveAggregate(p: LogicalPlan): Boolean = p match {
      case _: Aggregate => false
      case _: org.apache.spark.sql.execution.LogicalRDD => false
      case _: LeafNode => true
      case other => other.children.exists(scanAboveAggregate)
    }
    lp.collect { case w: Window => w }.foreach { w =>
      assert(!scanAboveAggregate(w.child),
        s"window over un-aggregated corpus:\n$lp")
    }
  }

  test("q184: rollup consumers read the checkpointed stream — no " +
      "parquet scan or Generate at query time") {
    // The hashed value stream is materialized once; the three audit
    // consumers (cells, direct, exact) must all read the LogicalRDD.
    val p = plan("q184_hll_rollup")
    assert(!p.contains("FileScan"), p)
    assert(!p.contains("Generate"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q185: canonicalization is per-row algebra — the only exchanges " +
      "are the census aggregate and its sort") {
    val p = plan("q185_url_canonical")
    assert(!p.contains("Join"), p)
    assert(!p.contains("Generate"), p)
    // census aggregate (the exact COUNT(DISTINCT raw_url) adds one
    // (canon, raw_url) dedup exchange before the final (canon) one)
    // plus the output range sort: exactly three Exchange boundaries,
    // all keyed by the cluster — never the corpus rows.
    val exchanges = "Exchange [a-z]+partitioning".r
      .findAllIn(p).size
    assert(exchanges <= 3, s"$exchanges exchanges:\n$p")
  }

  test("q186: keyness group totals join BROADCAST; no partition-less " +
      "window") {
    val p = plan("q186_keyness")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // a Window with an empty partition spec would single-thread the
    // vocabulary table; both windows here are keyed (term / grp).
    import org.apache.spark.sql.catalyst.plans.logical.Window
    val lp = SparkEntry.queries("q186_keyness")(
      spark, "/root/testdata/sf0.001").queryExecution.optimizedPlan
    lp.collect { case w: Window => w }.foreach { w =>
      assert(w.partitionSpec.nonEmpty, s"partition-less window:\n$w")
    }
  }

  test("q187: one corpus Generate builds every gram ladder") {
    // All three n ladders explode from ONE array column: exactly one
    // Generate fed by the parquet scan, one distinct-aggregate chain.
    import org.apache.spark.sql.catalyst.plans.logical.{Generate, LogicalPlan}
    val lp = SparkEntry.queries("q187_distinct_ngrams")(
      spark, "/root/testdata/sf0.001").queryExecution.optimizedPlan
    val gens = lp.collect { case g: Generate => g }
    assert(gens.size <= 2, s"${gens.size} Generates:\n$lp")
    val p = plan("q187_distinct_ngrams")
    assert(!p.contains("Join"), p)
  }

  test("q188: shard assignment rides the scan — no join, no window") {
    val p = plan("q188_consistent_shards")
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window"), p)
    // stacked explode + one partial/final aggregate + output sort
    assert(p.contains("Generate"), p)
  }

  test("q189: multiprobe prune is an In/InSet filter + TakeOrdered — " +
      "no join, no window") {
    val p = plan("q189_ann_multiprobe")
    assert(!p.contains("Join"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    // Catalyst collapses the bucket projection into the filter: the
    // probe-set prune shows as an IN (...) over the inlined bucket
    // expression, inside the scan's DataFilters.
    assert(p.contains(" IN ("), p)
  }

  test("q190: stitch detection is one keyed window — no cartesian, no " +
      "global sort before it") {
    import org.apache.spark.sql.catalyst.plans.logical.Window
    val lp = SparkEntry.queries("q190_shard_stitch")(
      spark, "/root/testdata/sf0.001").queryExecution.optimizedPlan
    val wins = lp.collect { case w: Window => w }
    assert(wins.nonEmpty)
    wins.foreach(w => assert(w.partitionSpec.nonEmpty,
      s"partition-less window:\n$w"))
    val p = plan("q190_shard_stitch")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q192: bootstrap explode is map-side; replicate windows run on " +
      "the b-by-groups cell table, never the corpus") {
    import org.apache.spark.sql.catalyst.plans.logical._
    val lp = SparkEntry.queries("q192_bootstrap_ci")(
      spark, "/root/testdata/sf0.001").queryExecution.optimizedPlan
    def scanAboveAggregate(p: LogicalPlan): Boolean = p match {
      case _: Aggregate => false
      case _: org.apache.spark.sql.execution.LogicalRDD => false
      case _: LeafNode => true
      case other => other.children.exists(scanAboveAggregate)
    }
    lp.collect { case w: Window => w }.foreach { w =>
      assert(!scanAboveAggregate(w.child),
        s"window over un-aggregated corpus:\n$lp")
    }
    val p = plan("q192_bootstrap_ci")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q193: encoding audit is one combinable aggregate — no join, " +
      "no window, no generate") {
    val p = plan("q193_encoding_audit")
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("Generate"), p)
  }

  test("q194: pairs unnest map-side from capped basket arrays; " +
      "supports broadcast; no user-keyed self-join") {
    // r21: ordered pairs come from posexplode×slice over the per-user
    // sorted item array (bounded by maxBasket²/2 per row) — the former
    // user-keyed self-join shuffle is gone, so the only joins left are
    // the broadcast support lookups and the 1-row census.
    val p = plan("q194_cooccurrence")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("Generate"), p)
  }

  test("q195: KS cumsum windows run on the value histogram, never " +
      "the corpus; one stacked explode") {
    import org.apache.spark.sql.catalyst.plans.logical._
    val lp = SparkEntry.queries("q195_ks_drift")(
      spark, "/root/testdata/sf0.001").queryExecution.optimizedPlan
    def scanAboveAggregate(p: LogicalPlan): Boolean = p match {
      case _: Aggregate => false
      case _: org.apache.spark.sql.execution.LogicalRDD => false
      case _: LeafNode => true
      case other => other.children.exists(scanAboveAggregate)
    }
    lp.collect { case w: Window => w }.foreach { w =>
      assert(!scanAboveAggregate(w.child),
        s"window over un-aggregated corpus:\n$lp")
    }
    val gens = lp.collect { case g: Generate => g }
    assert(gens.size <= 1, s"${gens.size} Generates:\n$lp")
  }

  test("q197: LPA rounds read checkpointed labels — cartesian-free, " +
      "bounded lineage") {
    val p = plan("q197_label_propagation")
    assert(!p.contains("CartesianProduct"), p)
    // labels come back from the per-round checkpoints: at most the
    // final round's joins appear in the executed plan
    assert("Scan ExistingRDD".r.findAllIn(p).size >= 1, p)
  }

  test("q198: every median is a histogram selection — windows only " +
      "over aggregated value tables") {
    import org.apache.spark.sql.catalyst.plans.logical._
    val lp = SparkEntry.queries("q198_robust_trend")(
      spark, "/root/testdata/sf0.001").queryExecution.optimizedPlan
    def scanAboveAggregate(p: LogicalPlan): Boolean = p match {
      case _: Aggregate => false
      case _: org.apache.spark.sql.execution.LogicalRDD => false
      case _: LeafNode => true
      case other => other.children.exists(scanAboveAggregate)
    }
    lp.collect { case w: Window => w }.foreach { w =>
      assert(!scanAboveAggregate(w.child),
        s"window over un-aggregated rows:\n$lp")
    }
    val p = plan("q198_robust_trend")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q200: mix assembly stays cartesian-free; quota table broadcast") {
    val p = plan("q200_mix_assembly")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q201: assignment is joinless argmin; keyness group totals " +
      "broadcast; no partition-less window") {
    import org.apache.spark.sql.catalyst.plans.logical.Window
    val lp = SparkEntry.queries("q201_topic_labels")(
      spark, "/root/testdata/sf0.001").queryExecution.optimizedPlan
    lp.collect { case w: Window => w }.foreach { w =>
      assert(w.partitionSpec.nonEmpty, s"partition-less window:\n$w")
    }
    val p = plan("q201_topic_labels")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q196: time decay is a windowless scan aggregate whose only " +
      "join is the broadcast 1-row anchor") {
    // r21: the as-of anchor (max ts) moved in-plan as a broadcast
    // scalar (Decay.timeDecayedAtStreamMax) — one action instead of
    // two. The ONLY join allowed is that single-row broadcast cross;
    // any shuffled join or window would mean the scan-aggregate shape
    // regressed.
    val p = plan("q196_time_decay")
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size == 1, p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct")
      && !p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("Generate"), p)
  }

  test("q191: yield tiers read the checkpointed projection; keeper " +
      "joins stay keyed") {
    val p = plan("q191_token_yield")
    assert(!p.contains("CartesianProduct"), p)
    // the base projection is materialized: no second parquet scan of
    // documents' text column on the aggregate path
    val scans = "FileScan parquet".r.findAllIn(p).size
    assert(scans <= 1, s"$scans corpus scans:\n$p")
  }

  test("partition-less WindowExec only over value-bounded domains " +
      "(SURVEY §5.4 discipline, asserted)") {
    // WindowExec with an empty partition spec runs as ONE task — the
    // "No Partition Defined ... serious performance degradation"
    // warning the test log shows. SURVEY §5.4's discipline is that
    // every such window in a gated plan sits on a VALUE-BOUNDED domain
    // (per-language totals, histogram bins, checkpoint grids, top-k
    // survivors) whose cardinality is independent of corpus size. This
    // audit makes the discipline mechanical: for every gated query
    // whose source carries a partition-less Window (the static-grep
    // census below), plan it and REQUIRE each partition-less WindowExec
    // input subtree to bound cardinality before any parquet scan — an
    // aggregate, a TakeOrdered/limit, or a local relation must sit
    // between the window and every file scan. A partition-less window
    // DIRECTLY over a corpus scan/join (the 100 TB single-task sort
    // incident) fails this test. AQE is disabled while planning so
    // WindowExec is structurally visible (not wrapped in lazy query
    // stages); production keeps AQE.
    import org.apache.spark.sql.execution._
    import org.apache.spark.sql.execution.window.WindowExec
    def bounded(p: SparkPlan): Boolean = p match {
      case _: aggregate.HashAggregateExec => true
      case _: aggregate.SortAggregateExec => true
      case _: aggregate.ObjectHashAggregateExec => true
      case _: TakeOrderedAndProjectExec => true
      case _: GlobalLimitExec => true
      case _: LocalLimitExec => true
      case _: LocalTableScanExec => true
      // A checkpointed table (Scan ExistingRDD): every one feeding the
      // audited windows materializes an already-aggregated or top-k
      // table; the hazard this audit hunts is a window directly over a
      // parquet corpus scan, which a checkpoint leaf is not.
      case _: RDDScanExec => true
      case _: FileSourceScanExec => false
      case other => other.children.forall(bounded)
    }
    // The census: every gated query whose implementation (or operator
    // it delegates to) builds a Window.partitionBy() / bare
    // Window.orderBy spec. Regenerate with:
    //   grep -rn 'Window\.orderBy|partitionBy()' src/main/scala/graft
    val audited = Seq(
      "q68_temperature_sample",    // stratum-mass table (≤ |langs|)
      "q76_hybrid_rrf",            // two top-20 TakeOrdered survivors
      "q131_unimax_budget",        // per-language token totals
      "q153_heaps_fit",            // 10-row checkpoint grid
      "q171_quota_apportionment",  // per-language totals
      "q172_mutual_information",   // (lang × source) cell table
      "q179_quota_sample",         // per-language totals
      "q182_dataset_card",         // token-count histogram bins
      "q230_neyman_allocation",    // per-language scale table
      "q233_rfm_segments",         // day/count value histograms
      // q234's dollar-histogram windows evaluate EAGERLY inside the
      // query builder (the cuts collapse to a collected aggregate), so
      // the returned plan carries no WindowExec to audit.
      "q249_t_closeness")          // (QI key × segment) cell table
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val missing = scala.collection.mutable.ArrayBuffer.empty[String]
      for (q <- audited) {
        val exec = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
          .queryExecution.executedPlan
        val bare = exec.collect {
          case w: WindowExec if w.partitionSpec.isEmpty => w
        }
        if (bare.isEmpty) missing += q
        bare.foreach { w =>
          assert(bounded(w.child),
            s"$q: partition-less WindowExec over an UNBOUNDED input — " +
              s"no aggregate/limit between the window and a file scan:\n$w")
        }
      }
      // The census must stay honest: a query listed here without a
      // partition-less window means the code moved and the list is
      // stale (update it with the grep above).
      assert(missing.isEmpty,
        s"stale census — no partition-less WindowExec found in: " +
          missing.mkString(", "))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
