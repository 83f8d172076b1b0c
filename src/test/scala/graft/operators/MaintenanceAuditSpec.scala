package graft.operators

import graft.SparkSpec
import graft.queries.{ModelQueries, OperatorQueries, PipelineQueries}
import org.apache.spark.sql.functions._

/** Planted-fixture specs for the r13 maintenance audits: q146 vector-
  * index staleness and q147 per-language tokenizer fertility. The
  * DuckDB oracle certifies engine-equality; these pin the SEMANTICS on
  * corpora where the right answer is computable by hand.
  */
class MaintenanceAuditSpec extends SparkSpec {

  private def writeDir(): String =
    java.nio.file.Files.createTempDirectory("maint-spec").toString

  test("q146: frozen centroids report zero inflation for an unmoved " +
      "delta and the exact e8 error for a drifted one") {
    val dir = writeDir()
    import spark.implicits._
    val c0 = Array(1f, 0f, 0f, 0f)
    val c1 = Array(0f, 1f, 0f, 0f)
    val drift = Array(0f, 0.5f, 0f, 0f)
    // Base cohort (vec_id % 10 != 0): three exact copies per label, so
    // both fitted centroids equal their label vector and base error is
    // 0. Delta cohort (vec_id % 10 == 0): id 10 sits ON c0 (inflation
    // 0); id 20 drifts halfway off c1 — d2 = (0.5)^2 = 0.25 → 25000000
    // in e8, and the label-1 cell's inflation is 25000000·1e4 ÷ 1.
    Seq(
      (1L, c0, 0), (2L, c0, 0), (3L, c0, 0),
      (4L, c1, 1), (5L, c1, 1), (6L, c1, 1),
      (10L, c0, 0), (20L, drift, 1)
    ).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = ModelQueries.queries("q146_index_staleness")(spark, dir)
      .collect()
    assert(out.length == 2)
    val r0 = out(0)
    assert(r0.getInt(0) == 0 && r0.getLong(1) == 3L && r0.getLong(2) == 1L)
    assert(r0.getLong(3) == 2500L, "delta share 1/4 in e4")
    assert(r0.getLong(4) == 0L && r0.getLong(5) == 0L && r0.getLong(6) == 0L)
    val r1 = out(1)
    assert(r1.getInt(0) == 1 && r1.getLong(1) == 3L && r1.getLong(2) == 1L)
    assert(r1.getLong(4) == 0L, "base cohort sits on its own centroid")
    assert(r1.getLong(5) == 25000000L, "drifted delta's exact e8 error")
    assert(r1.getLong(6) == 250000000000L,
      "inflation = mean_delta·1e4 ÷ max(mean_base, 1)")
  }

  test("q146: cohort counts conserve the corpus and shares stay in " +
      "[0, 10000] on real data") {
    val dir = "/root/testdata/sf0.001"
    val out = ModelQueries.queries("q146_index_staleness")(spark, dir)
      .collect()
    val emb = graft.Tables.load(spark, dir, "embeddings")
    assert(out.map(r => r.getLong(1) + r.getLong(2)).sum == emb.count(),
      "every vector is assigned to exactly one centroid")
    assert(out.forall(r => r.getLong(3) >= 0 && r.getLong(3) <= 10000))
    assert(out.forall(r => r.getLong(4) >= 0 && r.getLong(5) >= 0))
  }

  test("q151: an exact-copy delta leaves its centroid in place; a " +
      "drifted delta moves it to the hand-computed integer mean") {
    val dir = writeDir()
    import spark.implicits._
    // Eight well-separated base points (vec_id % 10 != 0) — with k=8
    // each becomes its own centroid, exactly (single-point integer
    // means are the point). Delta: id 10 copies base point A=(10,0,0,0)
    // (mean unchanged → zero displacement); id 20 = (0,9,0,0) joins
    // B=(0,10,0,0)'s list → refreshed component (10e6+9e6)/2 =
    // 9_500_000, displacement (1e7−9.5e6)² = 2.5e11 e12-units, and no
    // vector changes lists (the move is small) → churn all zero.
    val pts = Seq(
      Array(10f, 0f, 0f, 0f), Array(-10f, 0f, 0f, 0f),
      Array(0f, 10f, 0f, 0f), Array(0f, -10f, 0f, 0f),
      Array(0f, 0f, 10f, 0f), Array(0f, 0f, -10f, 0f),
      Array(0f, 0f, 0f, 10f), Array(0f, 0f, 0f, -10f))
    val rows = pts.zipWithIndex.map { case (p, i) => ((i + 1).toLong, p, 0) } ++
      Seq((10L, Array(10f, 0f, 0f, 0f), 0), (20L, Array(0f, 9f, 0f, 0f), 0))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = OperatorQueries.queries("q151_index_refresh")(spark, dir)
      .collect()
    assert(out.length == 8)
    assert(out.map(_.getLong(1)).sum == 8L, "base cohort conserved")
    assert(out.map(_.getLong(2)).sum == 2L, "delta cohort conserved")
    assert(out.forall(_.getLong(5) == 0L), "no vector changes lists")
    val moved = out.filter(_.getLong(3) != 0L)
    assert(moved.length == 1, "exactly one centroid moves")
    assert(moved.head.getLong(3) == 250000000000L,
      "(1e7 - 9.5e6)^2 displacement in e12")
    assert(moved.head.getLong(4) == 9500000L, "refreshed checksum")
    assert(moved.head.getLong(2) == 1L)
    val copied = out.filter(r => r.getLong(2) == 1L && r.getLong(3) == 0L)
    assert(copied.length == 1 && copied.head.getLong(1) == 1L,
      "the exact-copy delta joins a one-member base list, no move")
  }

  test("q151: refresh on real data conserves cohorts and keeps " +
      "churn within the corpus") {
    val dir = "/root/testdata/sf0.001"
    val out = OperatorQueries.queries("q151_index_refresh")(spark, dir)
      .collect()
    val emb = graft.Tables.load(spark, dir, "embeddings")
    assert(out.map(r => r.getLong(1) + r.getLong(2)).sum == emb.count())
    assert(out.map(_.getLong(5)).sum <= emb.count(),
      "a vector churns at most once")
    assert(out.forall(_.getLong(3) >= 0L))
  }

  test("q152: decoys indistinguishable in the prefix space displace " +
      "the true neighbors exactly until the cut passes their mass") {
    val dir = writeDir()
    import spark.implicits._
    // Query (vec_id 0) = e1. Decoys (ids 1..10): identical first-8
    // prefix, heavy mass in dims 9..16 — at d=8 they tie the true
    // neighbors at sim 1.0 and win on the vec_id tiebreak (lower ids),
    // so recall@10 is exactly 0; from d=16 on their prefix cosine
    // collapses to 1/√26 ≈ 0.196 and the true neighbors (ids 11..20,
    // e1 + a distinct tiny dim-33+ component each) fill the top-10 —
    // recall exactly 1. The d=64 row is the anchor by construction.
    def vec(f: Int => Float) = Array.tabulate(64)(i => f(i + 1))
    val q0 = vec(p => if (p == 1) 1f else 0f)
    val rows =
      Seq((0L, q0)) ++
        (1 to 10).map(i => (i.toLong, vec(p =>
          if (p == 1) 1f
          else if (p == 9 + ((i - 1) % 8)) 5f else 0f))) ++
        (11 to 20).map(i => (i.toLong, vec(p =>
          if (p == 1) 1f else if (p == 21 + i) 0.01f * (i - 10) else 0f)))
    rows.map { case (id, v) => (id, v, 0) }
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = OperatorQueries.queries("q152_dim_truncation")(spark, dir)
      .collect()
    val byD = out.map(r => r.getInt(0) -> r.getAs[Long]("recall10_e4"))
      .toMap
    assert(out.length == 4, "one audit query, four prefix lengths")
    assert(byD(8) == 0L, "prefix-8 top-10 is all decoys")
    assert(byD(16) == 10000L && byD(32) == 10000L,
      "past the decoy mass the true neighbors return")
    assert(byD(64) == 10000L, "full-dim anchor row")
    assert(out.forall(r =>
      r.getAs[Long]("mean_recall_d_e4") == r.getAs[Long]("recall10_e4")),
      "single-query corpus: mean equals the query's recall")
  }

  test("q157: MMR demotes the redundant near-copy below a diverse " +
      "lower-relevance candidate") {
    val dir = writeDir()
    import spark.implicits._
    // Query q = e1. A (5° off q) and B (7° off) are near-copies of
    // each other (cos 2° ≈ 0.9994); C sits 40° away in an e1/e3 plane.
    // Every vector's dim-1 component dominates its other component, so
    // all four share the pure-e1 LSH bucket pattern (sign decided by
    // the plane's h1 entry) — the pool is complete by construction.
    // Plain top-3 is (A, B, C); MMR picks A, then C (B's redundancy
    // to A eats its 0.993 relevance: 9925 − 9994 < 7660 − 7631), then
    // B last.
    def v(entries: (Int, Float)*) =
      Array.tabulate(64)(i => entries.toMap.getOrElse(i, 0f))
    Seq(
      (0L, v(0 -> 1f), 0),
      (1L, v(0 -> 0.9962f, 1 -> 0.0872f), 0),
      (2L, v(0 -> 0.9925f, 1 -> 0.1219f), 0),
      (3L, v(0 -> 0.766f, 2 -> 0.643f), 0)
    ).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = OperatorQueries.queries("q157_mmr_context")(spark, dir)
      .collect()
    assert(out.map(_.getInt(1)).toSeq == Seq(1, 2, 3))
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 3L, 2L),
      "selection order A, C, B — not relevance order A, B, C")
    assert(out(0).getLong(3) == out(0).getLong(4),
      "step 1 has no redundancy: mmr == relevance")
    assert(out(1).getLong(4) > out(2).getLong(4),
      "the diverse pick scores above the demoted near-copy")
  }

  test("q147: hand-trained merges give per-language fertility on a " +
      "three-word corpus") {
    val dir = writeDir()
    import spark.implicits._
    // Vocabulary {aa, bb, cccc}: pair counts (a,a)=1, (b,b)=1,
    // (c,c)=3 → merge 1 = (c,c); then the count-1 ties resolve
    // lexicographically: (a,a), (b,b), (cc,cc). All three words end as
    // a single token, so fertility is exactly 1 token/word and
    // chars/token equals word length.
    Seq(
      (1L, "aa", "aa bb"),
      (2L, "zz", "cccc")
    ).toDF("doc_id", "lang", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = PipelineQueries.queries("q147_tokenizer_fertility")(
      spark, dir).collect()
    assert(out.length == 2)
    val aa = out(0)
    assert(aa.getString(0) == "aa")
    assert(aa.getLong(1) == 1L && aa.getLong(2) == 2L, "1 doc, 2 words")
    assert(aa.getLong(3) == 2L && aa.getLong(4) == 4L,
      "2 single-token words, 4 codepoints")
    assert(aa.getLong(5) == 10000L, "1.0 tokens per word in e4")
    assert(aa.getLong(6) == 20000L, "2.0 chars per token in e4")
    val zz = out(1)
    assert(zz.getString(0) == "zz")
    assert(zz.getLong(1) == 1L && zz.getLong(2) == 1L)
    assert(zz.getLong(3) == 1L && zz.getLong(4) == 4L)
    assert(zz.getLong(5) == 10000L && zz.getLong(6) == 40000L)
  }

  test("q147: token totals agree with an independent re-encode on " +
      "real data") {
    val dir = "/root/testdata/sf0.001"
    val out = PipelineQueries.queries("q147_tokenizer_fertility")(
      spark, dir).collect()
    // Fertility is bounded: at least 1 token per word, and a token
    // never exceeds its word, so chars/token ≥ 1 and toks/word ≥ 1.
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(5) >= 10000L))
    assert(out.forall(_.getLong(6) >= 10000L))
    // Conservation: words and docs sum to the corpus totals.
    val d = graft.Tables.load(spark, dir, "documents")
    assert(out.map(_.getLong(1)).sum == d.count())
    val nWords = d.select(sum(size(filter(
      split(lower(col("text")), " "), t => length(t) > 0))))
      .head().getLong(0)
    assert(out.map(_.getLong(2)).sum == nWords)
  }
}
