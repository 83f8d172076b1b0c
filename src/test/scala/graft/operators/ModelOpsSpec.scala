package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics of the model-shaped curation operators (q91–q96 surface):
  * bigram-LM scoring, frozen linear classifier, random projection,
  * mixture weights, nearest-centroid fit/assign. The cross-engine
  * bit-level certification lives in the DuckDB oracle gate; these specs
  * pin the MATH on small hand-checkable inputs and the invariants the
  * oracle can't express (JL distance preservation, centroid recovery).
  */
class ModelOpsSpec extends SparkSpec {
  import spark.implicits._

  test("kneserNeyNll: hand-checked interpolated-KN scores") {
    // Corpus: "a b a b" and "a c". Bigram types: (a,b)=2, (b,a)=1,
    // (a,c)=1 → N1+(··)=3. Contexts: a: C=3, N1+=2; b: C=1, N1+=1.
    // Continuations: N1+(·b)=1, N1+(·a)=1, N1+(·c)=1. d=0.75:
    //   P(b|a) = (2−.75)/3 + .75·2/3·(1/3) = 7/12
    //   P(a|b) = (1−.75)/1 + .75·1/1·(1/3) = 1/2
    //   P(c|a) = (1−.75)/3 + .75·2/3·(1/3) = 1/4
    val df = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = LanguageModel.kneserNeyNll(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    val nll = (p: Double) => math.rint(-math.log(p) * 10000) / 10000.0
    assert(out(0).getLong(1) == 3)
    assert(math.abs(out(0).getDouble(2) -
      (2 * nll(7.0 / 12) + nll(0.5)) / 3) < 1e-9)
    assert(out(1).getLong(1) == 1)
    assert(math.abs(out(1).getDouble(2) - nll(0.25)) < 1e-9)
  }

  test("kneserNeyNll: continuation counts beat raw frequency (Francisco)") {
    // "francisco" is CORPUS-frequent (11 tokens) but follows almost only
    // "san"; "common" is rarer (5) but continues five distinct contexts.
    // KN's backoff must make a novel context predict "common" better —
    // the exact inversion add-one smoothing cannot express.
    val docs =
      (1 to 10).map(i => (i.toLong, "san francisco")) ++
        (1 to 5).map(i => (10L + i, s"x$i common")) :+
        (16L, "x6 francisco")
    val out = LanguageModel.kneserNeyNll(docs.toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // P(common|x1) = .25 + .75·(5/7) > P(francisco|x6) = .25 + .75·(2/7)
    assert(out(11L) < out(16L),
      s"novel-context 'common' ${out(11L)} should score better (lower " +
        s"NLL) than burst word 'francisco' ${out(16L)}")
  }

  test("silhouette: unambiguous members 1.0, boundary point 0") {
    // Clusters at (0,0) and (10,0); fit recovers those centroids
    // exactly. A member at its own centroid: a²=0, b²=100 → sil 1.
    // The midpoint (5,0): a²=b²=25 → sil 0, assigned to label 0 by tie.
    val emb = Seq(
      (1L, Array(0f, 0f), 0), (2L, Array(0f, 0f), 0),
      (3L, Array(10f, 0f), 1), (4L, Array(10f, 0f), 1))
      .toDF("vec_id", "embedding", "label")
    val cents = Centroids.fit(emb, "label", "embedding")
    val probe = Seq((9L, Array(5f, 0f), 9))
      .toDF("vec_id", "embedding", "label")
    val out = Centroids.silhouette(emb.union(probe), "embedding", cents,
      "label").select("vec_id", "assigned", "sil_e4").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(out(1L) == (0, 10000L) && out(3L) == (1, 10000L))
    assert(out(9L) == (0, 0L))
  }

  test("bigramNll: hand-checked add-one-smoothed scores") {
    // Corpus: "a b a b" and "a c". Unigrams: a=3, b=2, c=1 → V=3.
    // Doc 1 bigrams: (a,b)×2, (b,a)×1. C2(a,b)=2, C2(b,a)=1, C2(a,c)=1.
    // P(b|a) = (2+1)/(3+3) = .5;  P(a|b) = (1+1)/(2+3) = .4
    // P(c|a) = (1+1)/(3+3) = 1/3
    val df = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = LanguageModel.bigramNll(spark, df, "doc_id", "text")
      .orderBy("doc_id").collect()
    val nll = (p: Double) => math.rint(-math.log(p) * 10000) / 10000.0
    assert(out(0).getLong(1) == 3)
    assert(math.abs(out(0).getDouble(2) -
      (2 * nll(0.5) + nll(0.4)) / 3) < 1e-9)
    assert(out(1).getLong(1) == 1)
    assert(math.abs(out(1).getDouble(2) - nll(1.0 / 3)) < 1e-9)
  }

  test("bigramNll: planted gibberish scores worse than fluent repetition") {
    val fluent = (1 to 30).map(i => (i.toLong, "the cat sat on the mat"))
    val junk = Seq((99L, "qz wv xk jq zzt plo rrw mnb"))
    val out = LanguageModel.bigramNll(spark,
        (fluent ++ junk).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(99L) > out(1L) + 1.0,
      s"junk ${out(99L)} should far exceed fluent ${out(1L)}")
  }

  test("linearQuality: fixed-point score matches the decimal model") {
    val df = Seq((1L, "the cat and the dog in the house")).toDF(
      "doc_id", "text")
    val r = TextAnalysis.linearQuality(df, "text").head()
    // 8 tokens: stopwords {the×3, and, in} = 5/8; distinct 6/8; mean
    // word length 25/8 = 3.125; len feature 8/1000.
    assert(r.getAs[Double]("stop_frac") == 0.625)
    assert(r.getAs[Double]("uniq_frac") == 0.75)
    assert(r.getAs[Double]("mean_wl") == 3.125)
    val expected = (-600000L + 180 * 6250 + 90 * 7500 + 8 * 31250
      + 35 * 80) / 1e6
    assert(r.getAs[Double]("clf_score") == expected)
    assert(r.getAs[Boolean]("keep") == (expected >= 0.5))
  }

  test("linearQuality rejects non-2dp weights") {
    intercept[IllegalArgumentException] {
      TextAnalysis.linearQuality(
        Seq((1L, "x")).toDF("doc_id", "text"), "text",
        weights = Seq(0.123, 1.0, 1.0, 1.0, 1.0))
    }
  }

  test("random projection separates planted near-dups from the crowd") {
    // The testdata embeddings are near-random (all pairwise distances
    // concentrate), so ranking THEM after projection is noise by
    // construction — the meaningful JL property is that genuinely-close
    // vectors stay close. Plant 5 small perturbations of the vec-0 query
    // among the corpus; they must dominate the projected-space top-5.
    val emb = spark.read
      .parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val q = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray
    val planted = (1 to 5).map { i =>
      (10000L + i, q.zipWithIndex.map { case (x, j) =>
        x + (if ((i + j) % 2 == 0) 0.005f else -0.005f) })
    }.toDF("vec_id", "embedding")
    val proj = Projection.reduce(emb.union(planted), "embedding", 16, dim)
    val qp = proj.filter(col("vec_id") === 0)
      .select("proj").head().getSeq[Long](0).toArray
    val top = proj.filter(col("vec_id") =!= 0)
      .select(col("vec_id"),
        Projection.sqDist(col("proj"), lit(qp)).as("d"))
      .orderBy(col("d"), col("vec_id")).limit(5)
      .collect().map(_.getLong(0))
    val hits = top.count(_ >= 10000L)
    assert(hits >= 4, s"planted near-dups in projected top-5: $hits/5")
  }

  test("projection planes are deterministic and distinct from LSH planes") {
    val a = Projection.planes(16, 64)
    val b = Projection.planes(16, 64)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.map(_.toSeq).toSeq != Ann.hyperplanes(16, 64).map(_.toSeq).toSeq,
      "projection family must not alias the LSH family (different seed)")
  }

  test("mixtureWeights: shares sum to 1, weights hit the target mixture") {
    val df = Seq.tabulate(60)(i =>
        (i.toLong, s"d${i % 3}", ("w " * (i % 3 + 1)).trim))
      .toDF("id", "domain", "text")
    val out = Curation.mixtureWeights(df, "domain", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5)))
      .toMap
    assert(math.abs(out.values.map(_._2).sum - 1.0) < 1e-9)
    // Uniform target: share × weight == 1/3 for every uncapped domain.
    out.foreach { case (d, (_, share, w, capped)) =>
      assert(!capped)
      assert(math.abs(share * w - 1.0 / 3) < 1e-3, s"$d: $share × $w")
    }
  }

  test("mixtureWeights caps rare-domain weights") {
    val df = (Seq.tabulate(99)(i => (i.toLong, "big", "w w w w w w w w")) :+
      (99L, "rare", "w")).toDF("id", "domain", "text")
    val out = Curation.mixtureWeights(df, "domain", "text", maxWeight = 4.0)
      .collect().map(r => r.getString(0) -> (r.getDouble(4), r.getBoolean(5)))
      .toMap
    assert(out("rare") == ((4.0, true)), s"rare: ${out("rare")}")
    assert(!out("big")._2)
  }

  test("mixtureWeights: zero-token domain gets the ceiling weight, capped") {
    // All-whitespace texts make n_tokens = 0; the unguarded division is
    // Infinity in Spark and NULL in DuckDB, so the guard must fire BEFORE
    // the division (ADVICE r7).
    val df = (Seq.tabulate(10)(i => (i.toLong, "full", "w w w")) ++
      Seq((10L, "empty", ""), (11L, "empty", "   "))).toDF(
      "id", "domain", "text")
    val out = Curation.mixtureWeights(df, "domain", "text", maxWeight = 4.0)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getDouble(4), r.getBoolean(5))).toMap
    assert(out("empty") == ((0L, 4.0, true)), s"empty: ${out("empty")}")
    assert(out("full")._1 == 30L)
    assert(!out("full")._3)
  }

  test("centroid fit/assign recovers well-separated clusters exactly") {
    // Two tight clusters around (±10, 0, ...): every vector must assign
    // back to its own label, and the fixed-point centroid must sit within
    // quantization distance (1e-6 per component) of the true mean.
    val rows = (0 until 20).map { i =>
      val lbl = i % 2
      val base = if (lbl == 0) 10f else -10f
      (i.toLong, lbl, Array(base + (i / 2) * 0.01f, 1f, 0.5f))
    }
    val df = rows.toDF("vec_id", "label", "embedding")
    val cents = Centroids.fit(df, "label", "embedding")
    val c0 = cents.filter(col("label") === 0)
      .select("centroid").head().getSeq[Double](0)
    val trueMean = rows.filter(_._2 == 0).map(_._3(0).toDouble).sum / 10
    assert(math.abs(c0.head - trueMean) < 1e-5, s"${c0.head} vs $trueMean")
    val out = Centroids.assign(df, "embedding", cents, "label")
    assert(out.filter(col("assigned") =!= col("label")).count() == 0)
    // Shuffle-free at assignment time: the plan must not contain an
    // Exchange introduced by the argmin (the scan itself has none).
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"centroid assignment must be shuffle-free, got:\n$plan")
    // (The tiny local input constant-folds to a LocalTableScan here; the
    // sq_dist_e8-in-plan pin lives in PlanAuditSpec over real scans.)
  }

  test("q124 outlier report: P95 semantics against a direct filter") {
    val rep = graft.queries.ModelQueries
      .queries("q124_embedding_outliers")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(rep.nonEmpty)
    // Independent recount: re-assign and filter directly at each
    // cluster's reported cutoff — the histogram-rank path must agree
    // with the naive count, and the tail must be ~5% (ties may push it
    // slightly above 1/20, never below floor(n/20)).
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val cents = Centroids.fit(emb, "label", "embedding")
    val assigned = Centroids.assign(emb, "embedding", cents, "label")
      .select(col("assigned"), col("dist2_e8")).collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    rep.foreach { r =>
      val (cl, cutoff, nVecs, nOut, frac) = (r.getInt(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getDouble(4))
      val mine = assigned.filter(_._1 == cl)
      assert(mine.length.toLong == nVecs, s"cluster $cl size")
      val direct = mine.count(_._2 >= cutoff).toLong
      assert(direct == nOut, s"cluster $cl: histogram $nOut vs direct $direct")
      assert(nOut >= nVecs / 20 - 1 && nOut <= nVecs / 5,
        s"cluster $cl: tail $nOut of $nVecs not ~5%")
      assert(math.abs(frac - nOut.toDouble / nVecs) < 1e-12)
    }
  }
}
