package graft.operators

import graft.SparkSpec
import graft.queries.WarehouseQueries
import graft.queries.{EventQueries => EventQueriesAlias}
import java.sql.Timestamp
import java.time.LocalDate

/** Planted-fixture specs for the r15 warehouse/governance queries
  * (q206–q213). The DuckDB oracle certifies engine-equality on the
  * synthetic tables; these pin the SEMANTICS on corpora where the
  * right answer is known by construction.
  */
class WarehouseQueriesSpec extends SparkSpec {

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("wh-spec").toString

  private def ts(day: Int, hour: Int = 0, minute: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:$minute%02d:00")

  private def epochDay(day: Int): Long =
    LocalDate.of(2024, 1, day).toEpochDay

  /** events.parquet with only the columns the query under test touches
    * (plus ids for determinism).
    */
  private def eventsTable(
      rows: Seq[(Long, Timestamp, Long, String)]): String = {
    val dir = tmpDir()
    import spark.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def docsTable(
      rows: Seq[(Long, String, String, Long)]): String = {
    val dir = tmpDir()
    import spark.implicits._
    rows.toDF("doc_id", "text", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q206: consecutive same-tier days fold into one version with " +
      "chained validity bounds and a single current row per user") {
    // user 1: Jan 1 ×1 (low), Jan 2 ×1 (low), Jan 3 ×3 (mid)
    // → v1 [Jan1, Jan3) low 2 days 2 events; v2 [Jan3, ∅) mid current.
    val rows = Seq(
      (1L, ts(1, 9), 1L, "click"),
      (2L, ts(2, 9), 1L, "click"),
      (3L, ts(3, 9), 1L, "click"),
      (4L, ts(3, 10), 1L, "view"),
      (5L, ts(3, 11), 1L, "view"))
    val out = WarehouseQueries.queries("q206_scd2_intervals")(
      spark, eventsTable(rows)).collect()
    assert(out.length == 2)
    val v1 = out(0)
    assert(v1.getLong(0) == 1L && v1.getLong(1) == 1L) // user, version
    assert(v1.getString(2) == "low")
    assert(v1.getLong(3) == epochDay(1))  // valid_from_d
    assert(v1.getLong(4) == epochDay(3))  // valid_to_d = next start
    assert(v1.getLong(5) == 2L && v1.getLong(6) == 2L) // n_days, n_events
    assert(!v1.getBoolean(7))
    val v2 = out(1)
    assert(v2.getString(2) == "mid")
    assert(v2.getLong(3) == epochDay(3))
    assert(v2.isNullAt(4) && v2.getBoolean(7)) // open-ended current
    assert(v2.getLong(5) == 1L && v2.getLong(6) == 3L)
  }

  test("q207: keys only-early are removed, only-late added, both-equal " +
      "unchanged, both-different changed — with signed net_delta") {
    // Span Jan 1..Jan 11 (epoch-second cuts: A ≤ Jan 7, B ≥ Jan 5).
    def u(i: Long) = i
    val rows = Seq(
      // pin the span
      (0L, ts(1), u(9), "span"), (1L, ts(11), u(9), "span"),
      // user 1 click: only Jan 2 → removed (net −1)
      (2L, ts(2), u(1), "click"),
      // user 2 view: only Jan 10 → added (net +1)
      (3L, ts(10), u(2), "view"),
      // user 3 buy: Jan 6 ×2, in BOTH snapshots equally → unchanged
      (4L, ts(6), u(3), "buy"), (5L, ts(6, 1), u(3), "buy"),
      // user 4 err: Jan 2 ×1 vs Jan 6+Jan 10 — A sees 2, B sees 2 …
      // make it asymmetric: Jan 2 ×2 and Jan 10 ×1 → A=2, B=1, changed
      (6L, ts(2), u(4), "err"), (7L, ts(2, 1), u(4), "err"),
      (8L, ts(10), u(4), "err"))
    val out = WarehouseQueries.queries("q207_snapshot_diff")(
      spark, eventsTable(rows)).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(out(("removed", "click")) == (1L, -1L))
    assert(out(("added", "view")) == (1L, 1L))
    assert(out(("unchanged", "buy")) == (1L, 0L))
    assert(out(("changed", "err")) == (1L, -1L))
    // span user 9: Jan 1 in A only, Jan 11 in B only → changed? No:
    // same (user, type) key seen in A (cnt 1) and B (cnt 1) → unchanged.
    assert(out(("unchanged", "span")) == (1L, 0L))
  }

  test("q209: one dominant doc yields the closed-form Gini and an " +
      "exactly-split top-decile share; uniform lengths yield zero") {
    // source "skew": nine 1-token docs + one 91-token doc.
    // Ascending rank sum S = 45·1 + 10·91 = 955;
    // gini_e4 = (2·955 − 11·100)·10⁴ // (10·100) = 8100.
    // top decile = 1 doc = the 91-token one → 9100.
    // source "flat": four docs of 5 tokens → gini 0, top10 = 1 doc
    // of 5 tokens / 20 = 2500.
    val skew = (0L until 9L).map(i =>
      (i, "w", "skew", 1L)) :+ (9L, Seq.fill(91)("w").mkString(" "),
        "skew", 91L)
    val flat = (10L until 14L).map(i =>
      (i, "a b c d e", "flat", 9L))
    val out = WarehouseQueries.queries("q209_gini_concentration")(
      spark, docsTable(skew ++ flat)).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("skew") == (10L, 100L, 8100L, 9100L))
    assert(out("flat") == (4L, 20L, 0L, 2500L))
  }

  test("q210: a clocklike type reads Fano 0 (regular), a one-burst " +
      "type reads overdispersed (bursty), on the shared dense spine") {
    def u = 1L
    // 3-hour spine. 'tick': 2 events each hour → var 0 → fano 0.
    // 'burst': 6 events in hour 0 → S1=6, S2=36,
    // fano = (3·36 − 36)·10⁴ // (3·6) = 40000.
    val rows =
      (0 until 3).flatMap(h => Seq(
        (h * 10L, ts(1, h), u, "tick"),
        (h * 10L + 1, ts(1, h, 30), u, "tick"))) ++
      (0 until 6).map(i => (100L + i, ts(1, 0, i), u, "burst"))
    val out = WarehouseQueries.queries("q210_burstiness")(
      spark, eventsTable(rows)).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(out("tick") == (3L, 6L, 0L, "regular"))
    assert(out("burst") == (3L, 6L, 40000L, "bursty"))
  }

  test("q211: perfectly anti-correlated signals read ρ_e4 = −10000") {
    // n_chars ascending, distinct-word count descending: ranks exactly
    // reversed, Σd² = 20, n = 4 → 10⁴ − 6·10⁴·20 // 60 = −10000.
    val docs = Seq(
      (0L, "p q r s", "s0", 10L),
      (1L, "p q r", "s0", 20L),
      (2L, "p q", "s0", 30L),
      (3L, "p", "s0", 40L))
    val out = WarehouseQueries.queries("q211_spearman_agreement")(
      spark, docsTable(docs)).collect()
    assert(out.length == 1)
    assert(out.head.getLong(1) == 4L)      // n
    assert(out.head.getLong(2) == 20L)     // sum_d2
    assert(out.head.getLong(3) == -10000L) // rho_e4
  }

  test("q212: islands split on gaps; the longest-streak tie resolves " +
      "to the earliest start") {
    def u(i: Long) = i
    // user 1: days {1,2,3, 5, 7,8} → 3 streaks, longest 3 @ day 1.
    // user 2: days {1,2, 4,5} → tie of 2 → start day 1.
    val rows =
      Seq(1, 2, 3, 5, 7, 8).zipWithIndex.map { case (d, i) =>
        (i.toLong, ts(d), u(1), "e") } ++
      Seq(1, 2, 4, 5).zipWithIndex.map { case (d, i) =>
        (100L + i, ts(d), u(2), "e") }
    val out = WarehouseQueries.queries("q212_activity_streaks")(
      spark, eventsTable(rows)).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(1L) == (6L, 3L, 3L, epochDay(1)))
    assert(out(2L) == (4L, 2L, 2L, epochDay(1)))
  }

  test("q214: canonical-URL blocking is complete (pc 10⁴) with the " +
      "planted messy variants, and reduction follows from block sizes") {
    // 2 pages × 4 variants (doc_id 0..7, one source): canon and host
    // both put each page's 4 variants in one block → 2 blocks, C(4,2)·2
    // = 12 candidate pairs of C(8,2) = 28 total → reduction_e4 =
    // 10000 − 12·10⁴ // 28 = 5715; truth = 12, all co-blocked.
    val docs = (0L until 8L).map(i => (i, "t", "acme", 1L))
    val out = WarehouseQueries.queries("q214_blocking_audit")(
      spark, docsTable(docs)).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(out("canon") == (2L, 12L, 5715L, 12L, 12L, 10000L))
    assert(out("host") == (2L, 12L, 5715L, 12L, 12L, 10000L))
    // len blocking: completeness can only be ≤ perfect, reduction ≥ 0.
    val len = out("len")
    assert(len._6 <= 10000L && len._3 >= 0L && len._5 <= 12L)
  }

  test("q215: one dominant doc pulls every MASS quantile to its bin " +
      "while the doc-count median stays at the short bin") {
    // lengths {1,1,1,97}: token mass 100, 97% of it in one doc →
    // wp25 = wp50 = wp75 = 97, but the doc median is 1.
    val skew = (0L until 3L).map(i => (i, "w", "skew", 1L)) :+
      (3L, Seq.fill(97)("w").mkString(" "), "skew", 97L)
    val flat = (10L until 14L).map(i => (i, "a b c d e", "flat", 9L))
    val out = WarehouseQueries.queries("q215_weighted_quantiles")(
      spark, docsTable(skew ++ flat)).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(out("skew") == (4L, 100L, 1L, 97L, 97L, 97L))
    assert(out("flat") == (4L, 20L, 5L, 5L, 5L, 5L))
  }

  test("q216: folds partition the corpus and per-language shares sum " +
      "back to the whole") {
    val docs = (0L until 100L).map(i => (i, "t", "src", 1L))
    val dir = tmpDir()
    import spark.implicits._
    docs.toDF("doc_id", "text", "source", "n_chars")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = WarehouseQueries.queries("q216_kfold_balance")(spark, dir)
      .collect()
    assert(out.map(_.getLong(1)).sum == 100L)         // partition
    assert(out.forall(_.getLong(2) == 1L))            // one lang seen
    assert(out.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 5))
    assert(out.forall(r => r.getLong(3) == r.getLong(4))) // 1 lang ⇒ ==
  }

  test("q217: purchases credit the latest in-window touch; stale and " +
      "absent touches read none; a same-second view outranks the click") {
    def u(i: Long) = i
    val rows = Seq(
      // user 1: click 09:00, purchase 10:00 Jan 1 → click, age 0
      (0L, ts(1, 9), u(1), "click"), (1L, ts(1, 10), u(1), "purchase"),
      // user 2: view Jan 1, purchase Jan 20 → outside 7d → none
      (2L, ts(1), u(2), "view"), (3L, ts(20), u(2), "purchase"),
      // user 3: purchase with no prior touch → none
      (4L, ts(2), u(3), "purchase"),
      // user 4: click and view in the SAME second, purchase 2 days on
      // → view (code 2 > 1), age 2
      (5L, ts(5, 8), u(4), "click"), (6L, ts(5, 8), u(4), "view"),
      (7L, ts(7, 9), u(4), "purchase"))
    val out = WarehouseQueries.queries("q217_last_touch")(
      spark, eventsTable(rows)).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out(("click", 0L)) == 1L)
    assert(out(("none", -1L)) == 2L)
    assert(out(("view", 2L)) == 1L)
    assert(out.values.sum == 4L)
  }

  test("q218: the geometric mechanism is deterministic, internally " +
      "consistent, and calibrated (E|noise| = 1 for ε = ln 2)") {
    // 200 (lang, source) cells: one doc per lang, fixed source.
    val dir = tmpDir()
    import spark.implicits._
    (0L until 200L).map(i => (i, "t", "s", f"l$i%03d"))
      .toDF("doc_id", "text", "source", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = WarehouseQueries.queries("q218_dp_noisy_release")(
      spark, dir).collect()
    assert(out.length == 200)
    // noisy = true + noise, abs_noise = |noise|, magnitude ≤ 21
    assert(out.forall(r =>
      r.getLong(4) == r.getLong(2) + r.getLong(3) &&
        r.getLong(5) == math.abs(r.getLong(3)) && r.getLong(5) <= 21))
    // Geometric(1/2): half the cells should see zero noise, mean
    // |noise| ≈ 1 — loose deterministic bands over 200 seeded draws.
    val zeros = out.count(_.getLong(3) == 0L)
    assert(zeros > 60 && zeros < 140, s"zero-noise cells: $zeros")
    val meanAbs = out.map(_.getLong(5)).sum.toDouble / out.length
    assert(meanAbs > 0.5 && meanAbs < 2.0, s"mean |noise|: $meanAbs")
    // deterministic replay
    val again = WarehouseQueries.queries("q218_dp_noisy_release")(
      spark, dir).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("q219: six separated bins are exactly representable (vopt 0) " +
      "while equi-width pays; at seven bins the DP merges the " +
      "cheapest adjacent pair") {
    // bins (= n_chars div 20): {0,42,86,129,172,215} land in equi-width
    // buckets {0,0,2,3,4,5} — the two bins sharing bucket 0 cost
    // SSE_e4 = (17640·20 − 420²)·10⁴ // 20 = 88 200 000; with ≤6 bins
    // the v-opt histogram is exact. Adding bin 255 (bucket 5) forces
    // ONE merge: cheapest adjacent pair is (215,255) at 80 000 000;
    // equi-width pays both shared buckets = 168 200 000 →
    // improvement_e4 = 10⁴ − 8·10¹¹ // 1.682·10⁸ = 5244.
    val six = Seq(0L, 42L, 86L, 129L, 172L, 215L)
    val docsSix = six.zipWithIndex.flatMap { case (b, bi) =>
      (0 until 10).map(j =>
        (bi * 100L + j, "t", "s", "six", b * 20L))
    }
    val docsSeven = (six :+ 255L).zipWithIndex.flatMap { case (b, bi) =>
      (0 until 10).map(j =>
        (1000L + bi * 100L + j, "t", "s", "seven", b * 20L))
    }
    val dir = tmpDir()
    import spark.implicits._
    (docsSix ++ docsSeven)
      .toDF("doc_id", "text", "source", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = WarehouseQueries.queries("q219_vopt_histogram")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    assert(out("six") == (6L, 0L, 88200000L, 10000L))
    assert(out("seven") == (7L, 80000000L, 168200000L, 5244L))
  }

  test("q213: uniform keys read err 0; a skewed self-join shows the " +
      "uniform model's signed underestimate") {
    val dir = tmpDir()
    import spark.implicits._
    // customer 1,2; orders: 4 by cust 1 → est = 2·4 // 2 = 4 = actual.
    Seq(1L, 2L).toDF("c_custkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    (0L until 4L).map(i => (i, 1L)).toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // lineitem: one item per order → orders⋈lineitem also exact.
    (0L until 4L).map(i => (i, i)).toDF("l_linenumber", "l_orderkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    // events: user 1 ×3, user 2 ×1 → est = 16 // 2 = 8,
    // actual = 9 + 1 = 10 → err_e4 = −(2·10⁴ // 10) = −2000.
    Seq((0L, ts(1), 1L, "e"), (1L, ts(1), 1L, "e"),
        (2L, ts(1), 1L, "e"), (3L, ts(1), 2L, "e"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = WarehouseQueries.queries("q213_join_size_estimate")(
      spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    assert(out("customer_orders") == (4L, 4L, 0L))
    assert(out("orders_lineitem") == (4L, 4L, 0L))
    assert(out("events_self") == (8L, 10L, -2000L))
  }

  test("q233: four users spread across days land in four distinct " +
      "recency quartiles; single-valued F and in-band M read code 1") {
    val dir = tmpDir()
    import spark.implicits._
    // One $10 purchase per user on days 10/20/30/40 of Jan 2024; a
    // trailing view pins the anchor at day 40 for every fixture user.
    val rows = Seq((1L, ts(10), 1L, "purchase", 10.0),
      (2L, ts(20), 2L, "purchase", 10.0),
      (3L, ts(30) /* Jan 30 */, 3L, "purchase", 10.0),
      (4L, Timestamp.valueOf("2024-02-09 00:00:00"), 4L, "purchase", 10.0),
      (5L, Timestamp.valueOf("2024-02-09 01:00:00"), 9L, "view", 0.0))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = EventQueriesAlias.queries("q233_rfm_segments")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // r_days = 30/20/10/0 → r codes 4/3/2/1, one user each; F and M
    // are single-valued → codes 1.
    assert(out.toSeq == Seq((1L, 1L, 1L, 1L), (2L, 1L, 1L, 1L),
      (3L, 1L, 1L, 1L), (4L, 1L, 1L, 1L)))
  }

  test("q226: a perfectly linear covariate reads the exact theta and " +
      "the adjustment identity holds per arm") {
    // Users 1..4 with one pre purchase x = 0/10/20/30 and one post
    // purchase y = 2x: n=4, Σx=60, Σy=120, Σx²=1400, Σxy=2800 →
    // θ = (4·2800 − 60·120)·10⁴ / (4·1400 − 3600) = 20000 exactly;
    // the pooled pre mean is 15·10⁴ e4.
    val dir = tmpDir()
    import spark.implicits._
    val rows = (1L to 4L).flatMap { u =>
      val x = (u - 1) * 10.0
      Seq((u * 10, ts(5), u, "purchase", x),
        (u * 10 + 1, ts(20), u, "purchase", 2 * x))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = WarehouseQueries.queries("q226_cuped_readout")(spark, dir)
      .collect()
    assert(out.nonEmpty && out.forall(_.getLong(5) == 20000L))
    out.foreach { r =>
      val (pre, post, adj) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(adj == post - (20000L * (pre - 150000L)) / 10000L, r.toString)
      // y = 2x exactly, so the adjusted means equal the pooled post
      // mean 30·10⁴ for every arm — the variance reduction is total.
      assert(adj == 300000L, r.toString)
    }
  }

  test("q232: the frequent pair reads textbook support/confidence/" +
      "lift; sub-floor items are pruned before pairing") {
    val dir = tmpDir()
    import spark.implicits._
    // Orders 1-4 hold {10, 20}, order 5 {10}, order 6 {30}: item 30
    // (n=1) is pruned by the frequent-item floor; pair (10, 20) has
    // support 4 of N=6 baskets, conf 4/5 and 4/4, lift 4·6/(5·4).
    val rows = (1L to 4L).flatMap(o => Seq((o, 10L), (o, 20L))) ++
      Seq((5L, 10L), (6L, 30L))
    rows.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = WarehouseQueries.queries("q232_association_rules")(
      spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (10L, 20L, 4L))
    assert((r.getLong(5), r.getLong(6), r.getLong(7)) ==
      (8000L, 10000L, 12000L))
  }

  test("q234: a textbook 80/15/5 revenue split classifies one part " +
      "per class with exact shares") {
    val dir = tmpDir()
    import spark.implicits._
    Seq((1L, 800.0, 0.0), (2L, 150.0, 0.0), (3L, 50.0, 0.0))
      .toDF("l_partkey", "l_extendedprice", "l_discount")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = WarehouseQueries.queries("q234_abc_classification")(
      spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.toSeq == Seq(("A", 1L, 80000L, 8000L),
      ("B", 1L, 15000L, 1500L), ("C", 1L, 5000L, 500L)))
  }

  test("q235: a planted conversion imbalance reads the hand-computed " +
      "chi-square exactly") {
    val dir = tmpDir()
    import spark.implicits._
    // Need deterministic arms: users are chosen so md5('ab:u')[0]
    // splits them 2/2 (computed: 2,3 → treat; 1,4 → control — the
    // q226 fixture's split). Treat users convert (8 post purchases),
    // control users don't (1 post purchase): a=2 b=0 c=0 d=2 →
    // χ² = 4·(2·2)²·10⁴ / (2·2·2·2) = 4·10⁴.
    val rows = Seq(1L, 2L, 3L, 4L).flatMap { u =>
      val k = if (u == 2L || u == 3L) 8 else 1
      (0 until k).map(i =>
        (u * 100 + i, ts(20, i), u, "purchase", 5.0))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = WarehouseQueries.queries("q235_ab_chisquare")(spark, dir)
      .head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (2L, 2L, 2L, 0L))
    assert(r.getLong(4) == 10000L && r.getLong(5) == 0L)
    assert(r.getLong(6) == 40000L)
  }

  test("q237: a 2-hour gap splits the session — 3-gram paths never " +
      "cross it, and short sessions yield no path") {
    val dir = tmpDir()
    import spark.implicits._
    val rows = Seq(
      (1L, ts(5, 10, 0), 1L, "signup"), (2L, ts(5, 10, 5), 1L, "view"),
      (3L, ts(5, 10, 9), 1L, "click"),
      // 2-hour gap → new session
      (4L, ts(5, 13, 0), 1L, "view"), (5L, ts(5, 13, 2), 1L, "click"),
      (6L, ts(5, 13, 4), 1L, "purchase"),
      // user 2: two events only — no 3-gram
      (7L, ts(6, 9, 0), 2L, "view"), (8L, ts(6, 9, 1), 2L, "click"))
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = EventQueriesAlias.queries("q237_session_paths")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSet == Set(("signup>view>click", 1L),
      ("view>click>purchase", 1L)))
  }

  test("q238: a perfect linear pair reads +10000, a perfect inverse " +
      "pair -10000, and a constant feature reads NULL") {
    val dir = tmpDir()
    import spark.implicits._
    (1 to 10).map(i => (i.toLong, 2.0 * i, 0.50 - 0.01 * i, 0.05))
      .toDF("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = WarehouseQueries.queries("q238_corr_matrix")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    assert(out.toSeq == Seq(
      ("disc_e2", "tax_e2", None),
      ("price_c", "disc_e2", Some(-10000L)),
      ("price_c", "tax_e2", None),
      ("quantity", "disc_e2", Some(-10000L)),
      ("quantity", "price_c", Some(10000L)),
      ("quantity", "tax_e2", None)))
  }

  test("q227: planted first digits read exact shares and deviations " +
      "from the pinned Benford table") {
    val dir = tmpDir()
    import spark.implicits._
    val prices = Seq.fill(10)(1500.5) ++ Seq.fill(10)(2200.0) ++
      Seq.fill(10)(9001.99)
    prices.zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("o_orderkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = WarehouseQueries.queries("q227_benford_audit")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    assert(out.toSeq == Seq((1L, 10L, 3333L, 323L),
      (2L, 10L, 3333L, 1572L), (9L, 10L, 3333L, 2875L)))
  }
}
