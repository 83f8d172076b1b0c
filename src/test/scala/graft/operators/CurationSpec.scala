package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("piiScrub: counts and redaction, emails redacted before phones") {
    val df = Seq(
      (1L, "write to a.b+c@mail.example.org or 10.1.2.3 then call 555 0199"),
      (2L, "no pii here at all"),
      (3L, "two mails x@y.io z@w.co one ip 192.168.0.1")
    ).toDF("id", "text")
    val out = Curation.piiScrub(df, "text")
      .select("id", "n_emails", "n_ips", "n_phones", "redacted")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))).toMap
    assert(out(1L)._1 == 1 && out(1L)._2 == 1 && out(1L)._3 == 1)
    assert(out(1L)._4 == "write to [EMAIL] or [IP] then call [PHONE]")
    assert(out(2L) == (0, 0, 0, "no pii here at all"))
    assert(out(3L)._1 == 2 && out(3L)._2 == 1 && out(3L)._3 == 0)
  }

  test("decontaminate: full containment flags, disjoint does not") {
    val eval = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon"), // all 3-grams in eval -> 1.0
      (2L, "zeta eta theta iota kappa"),      // disjoint -> 0.0
      (3L, "alpha beta gamma xx yy zz")       // 1 of 4 3-grams
    ).toDF("doc_id", "text")
    val out = Curation.decontaminate(train, eval, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(out(1L) == (3L, 3L, 1.0, true))
    assert(out(2L) == (3L, 0L, 0.0, false))
    assert(out(3L) == (4L, 1L, 0.25, false))
  }

  test("decontaminate: docs shorter than n tokens drop from the report") {
    val eval = Seq((100L, "a b c")).toDF("doc_id", "text")
    val train = Seq((1L, "a b")).toDF("doc_id", "text")
    assert(Curation.decontaminate(train, eval, "doc_id", "text", n = 3)
      .count() == 0)
  }

  test("repetitionStats: repetitive docs fail the keep verdict") {
    val df = Seq(
      (1L, "spam spam spam spam spam spam spam spam spam spam"),
      (2L, "the quick brown fox jumps over a lazy dog today ok fine")
    ).toDF("doc_id", "text")
    val byName = Curation.repetitionStats(df, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_words"), r.getAs[Double]("top_word_frac"),
          r.getAs[Boolean]("keep"))).toMap
    assert(byName.size == 2)
    assert(byName(1L)._2 == 1.0 && !byName(1L)._3)
    assert(byName(2L)._2 <= 0.2 && byName(2L)._3)
  }

  test("temperatureSample: flattens the mixture toward small strata") {
    // 3200 "en" vs 800 "de": natural mix 80/20; alpha=0.5 targets
    // q_en ∝ sqrt(.8)=.894, q_de ∝ sqrt(.2)=.447 → 2:1 instead of 4:1.
    val df = (0L until 4000L).map(i =>
      (i, if (i % 5 == 4) "de" else "en")).toDF("id", "stratum")
    val kept = Curation.temperatureSample(df, "stratum", "id",
        alpha = 0.5, targetFrac = 0.4)
      .groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ratio = kept("en").toDouble / kept("de")
    assert(ratio > 1.4 && ratio < 2.8, s"en:de = $ratio, kept $kept")
    // expected total ≈ 0.4 * 4000 = 1600
    val total = kept.values.sum
    assert(total > 1300 && total < 1900, s"total $total")
    // alpha=1 preserves the natural 4:1 mixture (uniform rate per stratum)
    val nat = Curation.temperatureSample(df, "stratum", "id", 1.0, 0.4)
      .groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val natRatio = nat("en").toDouble / nat("de")
    assert(natRatio > 3.0 && natRatio < 5.5, s"alpha=1 en:de = $natRatio")
  }

  test("temperatureSample: tiny strata cap at rate 1 and survive whole") {
    val df = ((0L until 1000L).map(i => (i, "big")) ++
      (1000L until 1005L).map(i => (i, "rare"))).toDF("id", "stratum")
    val out = Curation.temperatureSample(df, "stratum", "id", 0.3, 0.5)
    assert(out.filter(col("stratum") === "rare").count() == 5)
  }

  test("stratifiedSample: deterministic, rate-proportional, default drops") {
    val df = (0L until 4000L).map(i =>
      (i, if (i % 2 == 0) "en" else "xx")).toDF("id", "stratum")
    val sampled = Curation.stratifiedSample(df, "stratum", "id",
      Map("en" -> "80"))
    val rows = sampled.collect().map(r => (r.getLong(0), r.getString(1)))
    // unlisted stratum gets default "00" -> nothing survives
    assert(rows.forall(_._2 == "en"))
    // ~50% of 2000 en rows; md5 is uniform so allow a wide band
    assert(rows.length > 800 && rows.length < 1200, rows.length)
    // re-run selects the identical row set (partition-stable)
    val again = Curation.stratifiedSample(df.repartition(7), "stratum", "id",
      Map("en" -> "80")).collect().map(_.getLong(0)).toSet
    assert(again == rows.map(_._1).toSet)
  }

  test("seededShuffle: total order, layout-invariant, seed-sensitive") {
    val df = (0L until 500L).map(i => (i, s"t$i")).toDF("id", "text")
    val a = Curation.seededShuffle(df, "id", "s1").collect().map(_.getLong(0))
    assert(a.toSet == (0L until 500L).toSet)          // a permutation
    assert(!a.sameElements(0L until 500L))            // actually shuffled
    val b = Curation.seededShuffle(df.repartition(11), "id", "s1")
      .collect().map(_.getLong(0))
    assert(a.sameElements(b))                         // layout-invariant
    val c = Curation.seededShuffle(df, "id", "s2").collect().map(_.getLong(0))
    assert(!a.sameElements(c))                        // seed changes order
  }

  test("q139 merge semantics: snapshot-only, arrivals-only, and mixed languages") {
    // The q139 incremental merge must equal a single-pass recompute on
    // every full-outer branch: a language present only in the snapshot
    // (doc_id % 10 != 0), only in the arrivals (doc_id % 10 == 0), and
    // in both. The oracle certifies this on the real corpus; here the
    // null-side coalesces are pinned on a corpus crafted to hit each.
    val dir = java.nio.file.Files.createTempDirectory("incr").toString
    Seq(
      (1L, "en", "a b c"), (2L, "en", "d e"),          // snapshot en
      (10L, "en", "f g h i"),                          // arrival en
      (3L, "fr", "x y"),                               // snapshot-only fr
      (20L, "zh", "p q r"))                            // arrival-only zh
      .toDF("doc_id", "lang", "text")
      .withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.CurationQueries
      .queries("q139_incremental_stats")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    assert(out("en") == ((3L, 9L, 2L, 4L, 30000L)))
    assert(out("fr") == ((1L, 2L, 2L, 2L, 20000L)))
    assert(out("zh") == ((1L, 3L, 3L, 3L, 30000L)))
  }

  test("upsample: expected copy counts, zero-weight drop, no [1,0] trap") {
    val df = ((0L until 2000L).map(i => (i, "a")) ++
      (2000L until 2100L).map(i => (i, "b")) ++
      (2100L until 2200L).map(i => (i, "zz"))).toDF("id", "stratum")
    val out = Curation.upsample(df, "stratum", "id",
      Map("a" -> 0.5, "b" -> 3.0))
    val byS = out.groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byS("b") == 300L)                          // integer weight exact
    assert(byS("a") > 800L && byS("a") < 1200L)       // ~0.5 of 2000
    assert(!byS.contains("zz"))                       // unlisted -> dropped
    // copies are 1..n per kept row, deterministic under re-run
    val copies = out.filter(col("stratum") === "b")
      .groupBy("id").count().collect().map(_.getLong(1))
    assert(copies.forall(_ == 3L))
    assert(out.count() == Curation.upsample(df.repartition(13), "stratum",
      "id", Map("a" -> 0.5, "b" -> 3.0)).count())
  }

  test("weightedSample: exact A-ES replay, WOR, and weight bias") {
    val df = (1L to 200L).map(i =>
        (i, if (i <= 20) 1000L else 1L))
      .toDF("id", "w").repartition(7)
    val out = Curation.weightedSample(df, "id", "w", k = 10, seed = "tt")
      .collect()
    // exact replay of the md5 -> (0,1] -> e9(ln(u)/w) pipeline in
    // Scala — StrictMath.log, because that is what Spark's `log` runs.
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(i: Long, w: Long): Long = {
      val hex = md.digest(s"tt:$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(13)
      val h = java.lang.Long.parseLong(hex, 16)
      math.rint(StrictMath.log((h + 1).toDouble / 4503599627370496.0) /
        w.toDouble * 1000000000).toLong
    }
    val expect = (1L to 200L).map(i => (i, if (i <= 20) 1000L else 1L))
      .map { case (i, w) => (i, key(i, w)) }
      .sortBy { case (i, k2) => (-k2, i) }.take(10)
    assert(out.map(r => (r.getLong(0), r.getLong(2))).toSeq == expect)
    // without replacement, and the 50x weights dominate the sample
    assert(out.map(_.getLong(0)).distinct.length == 10)
    assert(out.count(_.getLong(0) <= 20) >= 9,
      "weight-1000 rows should crowd out weight-1 rows")
  }

  test("weightedSample: zero or negative weight fails loudly instead of " +
      "biasing the top-k") {
    // A negative weight flips ln(u)/w positive — without the guard it
    // would WIN the sample; the in-plan raise_error must fire instead.
    val df = Seq((1L, 5L), (2L, -3L), (3L, 0L)).toDF("id", "w")
    val e = intercept[Exception] {
      Curation.weightedSample(df, "id", "w", k = 2, seed = "s").collect()
    }
    assert(e.getMessage.contains("non-positive weight"), e.getMessage)
  }

  test("bloomFprAudit: empty train-only negative set reports fpr 0, " +
      "no division error") {
    val train = Seq(Tuple1("a b c d")).toDF("text")
    val eval = Seq(Tuple1("a b c d e")).toDF("text")
    val out = Curation.bloomFprAudit(train, eval, "text", n = 3,
      bitSizes = Seq(64), numHashes = 2).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_negatives") == 0L)
    assert(out.head.getAs[Long]("fpr_e4") == 0L)
  }
}
