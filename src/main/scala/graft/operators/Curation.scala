package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation operators: PII scrubbing, benchmark
  * decontamination, repetition/quality filters (Gopher-style rules), and
  * deterministic stratified sampling — the standard steps between "crawled
  * corpus" and "training set" that run at full-corpus scale.
  *
  * Everything here is expression-level or shuffle-on-key — no UDFs, no
  * driver-side loops — so Catalyst keeps scans pruned and aggregations
  * map-side-combined at 100 TB.
  */
object Curation {

  // ---------------------------------------------------------------- PII

  /** RE2/Java-compatible patterns (work verbatim in Spark and DuckDB). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b[0-9]{3}[- ][0-9]{4}\\b"
  val Ipv4Re = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** Per-row PII detection counts + a redacted text column. Linear scan,
    * pure codegen'd regex expressions; at scale this pipelines inside the
    * parquet scan with zero shuffle.
    *
    * Redaction order matters and is fixed: emails, then IPs, then phones
    * (an email's digits must not be half-eaten by the phone pass first).
    */
  def piiScrub(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    graft.SparkUtil.ensureParallelism(df)
      .withColumn("n_emails", regexp_count(t, lit(EmailRe)))
      .withColumn("n_ips", regexp_count(t, lit(Ipv4Re)))
      .withColumn("n_phones", regexp_count(t, lit(PhoneRe)))
      .withColumn("redacted",
        regexp_replace(
          regexp_replace(
            regexp_replace(t, EmailRe, "[EMAIL]"),
            Ipv4Re, "[IP]"),
          PhoneRe, "[PHONE]"))
  }

  // ------------------------------------------------- decontamination

  /** Benchmark decontamination by word n-gram overlap: for every train
    * document, the fraction of its n-grams that appear anywhere in the
    * eval corpus. Docs above `threshold` are flagged (the Dolma/GPT-3
    * style train-test overlap filter).
    *
    * Scale shape: train n-grams are exploded map-side ONCE and hit-tested
    * with a left outer join against the DISTINCT eval n-gram set (0-or-1
    * matches per n-gram, so one count/sum aggregate yields totals and
    * hits together) — one shuffle keyed on the n-gram, map-side
    * combinable, never a cross product. (With a small eval set Spark
    * broadcasts the join automatically; a bloom-filter pre-pass is the
    * lossy variant when even the distinct eval set is huge.)
    */
  // n-gram = join of n consecutive tokens. The token array is PROJECTED
  // first so the transform lambda slices a materialized attribute —
  // referencing split(text) inside the lambda would re-split the whole
  // text once per position (CSE does not hoist out of higher-order
  // lambdas; same trap Dedup.shingleHashes documents).
  private def ngrams(df: DataFrame, textCol: String, n: Int,
      cols: Seq[Column]): DataFrame = {
    val toks = col("__toks")
    graft.SparkUtil.ensureParallelism(df)
      .select(cols :+ split(col(textCol), " ").as("__toks"): _*)
      // sequence(1, m) DESCENDS for m < 1, so short docs need the guard.
      .select(cols :+ explode(when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)), i =>
          concat_ws(" ", slice(toks, i, lit(n)))))
        .otherwise(array().cast("array<string>"))).as("g"): _*)
  }

  def decontaminate(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 3, threshold: Double = 0.3): DataFrame = {
    val trainNg = ngrams(train, textCol, n, Seq(col(idCol)))
    val evalNg = ngrams(eval, textCol, n, Seq.empty).distinct()
    // One pass over the exploded train n-grams: the distinct'd eval set
    // joins 0-or-1 rows per n-gram, so count/sum in a single aggregate
    // gives totals and hits together (vs a semi join + second groupBy,
    // which would explode the train side twice).
    trainNg.join(evalNg.withColumn("__hit", lit(1L)), Seq("g"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_ngrams"),
        coalesce(sum(col("__hit")), lit(0L)).as("n_hits"))
      .select(col(idCol), col("n_ngrams"), col("n_hits"),
        round(col("n_hits") / col("n_ngrams"), 4).as("contam_frac"))
      .withColumn("contaminated", col("contam_frac") >= threshold)
  }

  /** Leakage attribution — [[decontaminate]] answers "how contaminated
    * is this train doc"; this answers "WHICH train docs carry WHICH eval
    * doc's content": every (eval, train) pair sharing at least
    * `minShared` distinct n-grams, with the shared count and the
    * fraction of the eval doc's n-grams covered — the benchmark-leak
    * triage report a curation pipeline runs after the q64 filter fires.
    *
    * Scale shape: both sides collapse to DISTINCT (doc, gram) rows
    * first (map-side combinable); the pair join is keyed on the n-gram,
    * and n-grams present in more than `maxTrainDf` train docs are
    * semi-joined away BEFORE it. That bounds the per-gram pair fanout —
    * the skew guard: a boilerplate phrase in 10^6 train docs would
    * otherwise emit 10^6 pairs per eval hit — and is also the right
    * semantics, since ubiquitous boilerplate is not leakage evidence.
    * Deterministic, no sketch: the DuckDB oracle replays it exactly.
    *
    * Rows with a NULL train id are dropped up front (a null id cannot
    * be attributed, and the bounded carrier-set aggregate skips nulls
    * anyway — the filter makes that contract explicit). `train_id` is
    * cast back to the caller's id type on output, so an IntegerType
    * caller gets IntegerType back even though the bounded buffer
    * carries longs internally.
    */
  def leakageReport(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 3, minShared: Int = 5,
      maxTrainDf: Int = 100): DataFrame = {
    // ngrams() applies `cols` on both sides of its explode, so aliases
    // must happen after it, not inside it.
    //
    // The train side crosses exactly ONE shuffle — the raw exploded
    // n-gram stream goes straight into a per-gram
    // [[graft.functions.SampleKDistinct]] aggregate with
    // k = maxTrainDf + 1: duplicates collapse inside the bounded
    // buffer (no separate `.distinct()` exchange — the r8→r9a plans
    // paid one), a FULL buffer proves df > maxTrainDf (gram dropped as
    // ubiquitous boilerplate), and a non-full buffer IS the exact
    // distinct carrier set. State caps at maxTrainDf+1 pairs per gram
    // however hot the gram. The eval side is the benchmark suite —
    // small by definition (same argument as decontaminateBloom) — so
    // it broadcasts and the pair join never shuffles train rows again;
    // only actual (eval, train) hits reach the final aggregate.
    // The bounded aggregate carries ids as longs; fail fast for a
    // non-integral id column instead of ANSI-cast surprises mid-job
    // (the r8 window implementation was type-agnostic — this is the
    // documented price of the bounded-state fusion).
    require(Seq(org.apache.spark.sql.types.LongType,
        org.apache.spark.sql.types.IntegerType)
        .contains(train.schema(idCol).dataType),
      s"leakageReport needs an integral $idCol for the bounded " +
        "carrier-set aggregate")
    val trainNg = ngrams(train.filter(col(idCol).isNotNull),
        textCol, n, Seq(col(idCol)))
      .withColumnRenamed(idCol, "train_id")
    val evalNg = ngrams(eval, textCol, n, Seq(col(idCol)))
      .withColumnRenamed(idCol, "eval_id").distinct()
    val evalTot = evalNg.groupBy(col("eval_id"))
      .agg(count(lit(1)).as("eval_ngrams"))
    trainNg
      .groupBy(col("g"))
      // Constant hash: within a per-gram group the ordering is decided
      // by id alone, and storing the gram string k times per buffer
      // would multiply the shuffle bytes by gram-length × k for no
      // semantic difference.
      .agg(graft.functions.SampleKDistinct(lit(""), col("train_id"),
        maxTrainDf + 1).as("__ids"))
      .filter(size(col("__ids")) <= maxTrainDf)
      .select(col("g"), explode(col("__ids")).as("__e"))
      .select(col("g"), col("__e.id").as("train_id"))
      .join(broadcast(evalNg), Seq("g"))
      .groupBy(col("eval_id"), col("train_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .join(broadcast(evalTot), Seq("eval_id"))
      .select(col("eval_id"),
        col("train_id").cast(train.schema(idCol).dataType).as("train_id"),
        col("n_shared"), col("eval_ngrams"),
        round(col("n_shared").cast("double") / col("eval_ngrams"), 4)
          .as("overlap_frac"))
  }

  /** Bloom-filter decontamination — the 100 TB tier of [[decontaminate]].
    *
    * The exact variant shuffles every train n-gram to join the eval set;
    * at corpus scale that is a shuffle of the whole tokenized corpus. But
    * an eval/benchmark suite is small and fixed, so instead: build ONE
    * Bloom filter over the eval n-grams (Spark's native
    * `BloomFilterAggregate` — mergeable sketch, map-side combined, no
    * shuffle of eval beyond one sketch per partition), collect the few-MB
    * filter to the driver, and hit-test train n-grams with the codegen'd
    * `BloomFilterMightContain` against the filter as a literal — the
    * whole train side becomes a SHUFFLE-FREE linear scan (one partial+
    * final agg keyed on the doc id). One-sided error: `might_contain`
    * has no false negatives, so no contaminated doc is ever missed;
    * false positives inflate `n_hits` at the configured `fpp` rate
    * (SketchesSpec pins both properties against the exact operator).
    *
    * Not DuckDB-replayable (the sketch layout is Spark's), so the driver
    * gets a rows-only check; the semantics gate is the spec.
    */
  def decontaminateBloom(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 3, threshold: Double = 0.3,
      expectedEvalNgrams: Long = 0L, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.types.BinaryType
    // expectedEvalNgrams <= 0 → auto-size: one distinct-count over the
    // eval side (small by definition — it's the benchmark suite, not the
    // corpus). A hand-guessed 2^20 on a 20k-ngram eval set made the
    // sketch literal 50× oversized, and that literal rides EVERY task
    // closure of the train-side scan — right-sizing is a per-task
    // serialization win, not just memory hygiene.
    val expected =
      if (expectedEvalNgrams > 0) expectedEvalNgrams
      else math.max(
        ngrams(eval, textCol, n, Seq.empty).distinct().count(), 1024L)
    // Optimal bit count for the target fpp; BloomFilterAggregate clamps
    // to spark.sql.optimizer.runtime.bloomFilter.maxNumBits — raise that
    // conf alongside expectedEvalNgrams for very large eval suites.
    val numBits = math.ceil(
      -expected * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    def xx(c: Column) = XxHash64(Seq(GraftBridge.expression(c)), 42L)
    // No distinct on the eval side: inserting a duplicate n-gram into a
    // Bloom filter is a no-op, so the build is explode → sketch, zero
    // wide shuffles.
    val bloomAgg = GraftBridge.column(
      new BloomFilterAggregate(xx(col("g")),
        Literal(expected), Literal(numBits)).toAggregateExpression())
    val bloom = ngrams(eval, textCol, n, Seq.empty)
      .agg(bloomAgg.as("bf")).head().getAs[Array[Byte]](0)
    val hit = GraftBridge.column(
      BloomFilterMightContain(Literal(bloom, BinaryType), xx(col("g"))))
    ngrams(train, textCol, n, Seq(col(idCol)))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_ngrams"),
        sum(when(hit, 1L).otherwise(0L)).as("n_hits"))
      .select(col(idCol), col("n_ngrams"), col("n_hits"),
        round(col("n_hits") / col("n_ngrams"), 4).as("contam_frac"))
      .withColumn("contaminated", col("contam_frac") >= threshold)
  }

  /** PORTABLE Bloom decontamination — same contract and plan shape as
    * [[decontaminateBloom]], with an engine-neutral filter layout so the
    * verdicts are SQL-replayable (the q79 native-vs-portable HLL split,
    * applied to the Bloom tier).
    *
    * Layout: `numBits` bits as `numBits/32` 32-bit words packed in longs;
    * gram g sets bit `md5(g || "#i") mod numBits` for i < numHashes (15
    * md5 hex chars → 60-bit positive int, bit-identical in DuckDB via
    * `CAST('0x…' AS BIGINT)`; 32-bit words keep every shift < 32 — DuckDB
    * raises on a 63-bit shift). Build: explode eval grams × k positions,
    * one bounded `bit_or` aggregate (≤ numBits/32 rows), collect the words
    * to the driver — bounded by construction, like the native tier's
    * sketch — and hit-test the train scan against the array LITERAL:
    * shuffle-free, whole-stage-codegen'd, no join, exactly the native
    * tier's execution shape. One-sided error as native: no false
    * negatives; false positives at the (m, k, n)-determined rate — but
    * bit-for-bit deterministic, so the DuckDB oracle replays the exact
    * verdicts, collisions included.
    */
  def decontaminateBloomPortable(train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, n: Int = 3, threshold: Double = 0.3,
      numBits: Int = 1 << 20, numHashes: Int = 5): DataFrame = {
    require(Integer.bitCount(numBits) == 1 && numBits >= 64,
      s"numBits must be a power of two >= 64, got $numBits")
    def pos(i: Int): Column =
      conv(substring(md5(concat(col("g"), lit(s"#$i"))), 1, 15), 16, 10)
        .cast("long") % numBits
    // functions.shiftleft only takes a literal Int shift; the per-row
    // shift goes through the Catalyst ShiftLeft expression directly.
    def bitOf(p: Column): Column = org.apache.spark.sql.GraftBridge.column(
      org.apache.spark.sql.catalyst.expressions.ShiftLeft(
        org.apache.spark.sql.GraftBridge.expression(lit(1L)),
        org.apache.spark.sql.GraftBridge.expression(
          p.cast("int").bitwiseAND(lit(31)))))
    val built = ngrams(eval, textCol, n, Seq.empty)
      .select(explode(array((0 until numHashes).map(pos): _*)).as("p"))
      .select(shiftright(col("p"), 5).cast("int").as("w"),
        bitOf(col("p")).as("b"))
      .groupBy(col("w")).agg(bit_or(col("b")).as("word"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // Filter words ride as a ONE-ROW broadcast relation, not an
    // expression-tree literal (r21 — the bloomFprAudit fix): a
    // numHashes×-referenced literal array costs the driver
    // canonicalization hashing on every plan pass; data belongs in a
    // relation.
    val spark = train.sparkSession
    val wordsDf = spark.createDataFrame(
      java.util.Collections.singletonList(org.apache.spark.sql.Row(
        Array.tabulate(numBits / 32)(built.getOrElse(_, 0L)).toSeq)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__bw",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType, containsNull = false),
          nullable = false))))
    val hit = (0 until numHashes).map { i =>
      val p = pos(i)
      element_at(col("__bw"), shiftright(p, 5).cast("int") + 1)
        .bitwiseAND(bitOf(p)) =!= 0L
    }.reduce(_ && _)
    ngrams(train, textCol, n, Seq(col(idCol)))
      .crossJoin(broadcast(wordsDf))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_ngrams"),
        sum(when(hit, 1L).otherwise(0L)).as("n_hits"))
      .select(col(idCol), col("n_ngrams"), col("n_hits"),
        round(col("n_hits") / col("n_ngrams"), 4).as("contam_frac"))
      .withColumn("contaminated", col("contam_frac") >= threshold)
  }

  /** Bloom-filter FALSE-POSITIVE-RATE calibration — the measured curve
    * behind choosing `numBits` for [[decontaminateBloomPortable]]
    * (q140/q141's discipline applied to the decontamination filter): a
    * filter built over the eval n-gram KEY set is probed with the
    * train-only n-grams (TRUE negatives by construction — the eval set
    * is anti-joined away), at each candidate size; every flagged probe
    * is a measured false positive. Output per size: m_bits, k_hashes,
    * n_keys, n_negatives, n_fp, fpr_e4 — exact integers end to end (no
    * float theory column; the (1−e^{−kn/m})^k comparison lives in
    * BASELINE.md where pow portability can't bite a hash).
    *
    * Scale shape: key and negative sets are distinct-gram tables
    * (vocabulary-sized, checkpointed once, probed per size); each
    * filter is `m/32` longs built by one combinable BIT_OR aggregate
    * and shipped to the probe scan as a ONE-ROW broadcast relation
    * (r21, guide §4): as expression-tree literals the three word
    * arrays (up to 32k longs, referenced numHashes× each) cost the
    * driver ~1 s of analysis/canonicalization hashing per bench rep —
    * data belongs in a relation, not in the plan.
    */
  def bloomFprAudit(train: DataFrame, eval: DataFrame, textCol: String,
      n: Int, bitSizes: Seq[Int], numHashes: Int): DataFrame = {
    bitSizes.foreach(m => require(Integer.bitCount(m) == 1 && m >= 64,
      s"bit sizes must be powers of two >= 64, got $m"))
    val s = train.sparkSession
    import s.implicits._
    val evalG = ngrams(eval, textCol, n, Seq.empty)
      .select(col("g")).distinct().localCheckpoint(true)
    val negG = ngrams(train, textCol, n, Seq.empty)
      .select(col("g")).distinct()
      .join(evalG, Seq("g"), "left_anti").localCheckpoint(true)
    val nKeys = evalG.count()
    def bitOf(p: Column): Column = org.apache.spark.sql.GraftBridge.column(
      org.apache.spark.sql.catalyst.expressions.ShiftLeft(
        org.apache.spark.sql.GraftBridge.expression(lit(1L)),
        org.apache.spark.sql.GraftBridge.expression(
          p.cast("int").bitwiseAND(lit(31)))))
    def pos(i: Int, m: Int): Column =
      conv(substring(md5(concat(col("g"), lit(s"#$i"))), 1, 15), 16, 10)
        .cast("long") % m
    // FUSED audit (r19): the per-m loop paid one build-collect + one
    // negative-scan count PER bit size (the q180 profile showed 26
    // Spark jobs for three sizes). All sizes' filter words build in ONE
    // (m, w)-keyed aggregate over the eval keys, and all sizes' false-
    // positive counts reduce in ONE conditional aggregate over the
    // negative set — per-size register contents and hit predicates are
    // unchanged (same md5-derived positions, mod per size), so the
    // reported rows are bit-identical; the eval and negative streams
    // are each scanned once for the whole sweep.
    val builtAll = evalG.select(explode(array(
        bitSizes.flatMap(m => (0 until numHashes).map { i =>
          val p = pos(i, m)
          struct(lit(m).as("m"), shiftright(p, 5).cast("int").as("w"),
            bitOf(p).as("b"))
        }): _*)).as("x"))
      .groupBy(col("x.m").as("m"), col("x.w").as("w"))
      .agg(bit_or(col("x.b")).as("word"))
      .collect()
      .groupBy(_.getInt(0))
      .map { case (m, rs) =>
        m -> rs.map(r => r.getInt(1) -> r.getLong(2)).toMap }
    val wordsRow = org.apache.spark.sql.Row(bitSizes.map { m =>
      val built = builtAll.getOrElse(m, Map.empty[Int, Long])
      Array.tabulate(m / 32)(built.getOrElse(_, 0L)).toSeq
    }: _*)
    val wordsSchema = org.apache.spark.sql.types.StructType(bitSizes.map(
      m => org.apache.spark.sql.types.StructField(s"__w$m",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType, containsNull = false),
        nullable = false)))
    val wordsDf = s.createDataFrame(
      java.util.Collections.singletonList(wordsRow), wordsSchema)
    def hitFor(m: Int): Column =
      (0 until numHashes).map { i =>
        val p = pos(i, m)
        element_at(col(s"__w$m"), shiftright(p, 5).cast("int") + 1)
          .bitwiseAND(bitOf(p)) =!= 0L
      }.reduce(_ && _)
    // coalesce: sum over an EMPTY negative set is null, not 0.
    val fpRow = negG.crossJoin(broadcast(wordsDf))
      .agg(count(lit(1)).as("__n"),
      bitSizes.map(m => coalesce(sum(when(hitFor(m), 1L).otherwise(0L)),
        lit(0L)).as(s"__fp$m")): _*).head()
    val nNeg = fpRow.getLong(0) // negative census rides the same pass
    val rows = bitSizes.zipWithIndex.map { case (m, ix) =>
      val fp = fpRow.getLong(ix + 1)
      // nNeg == 0 (every train n-gram appears in eval) means there is
      // nothing to false-positive on: report fpr 0, don't divide.
      (m.toLong, numHashes.toLong, nKeys, nNeg, fp,
        if (nNeg == 0) 0L else fp * 10000L / nNeg)
    }
    rows.toDF("m_bits", "k_hashes", "n_keys", "n_negatives", "n_fp",
      "fpr_e4")
  }

  // ------------------------------------------------- repetition rules

  /** Most-frequent-element count of a string array, as pure expression
    * algebra: the max count of any element equals the longest run of
    * identical ADJACENT elements once the array is sorted — one per-row
    * array_sort + one linear fold, no explode, no shuffle. State is
    * (prev, current run, best run); a first element equal to the ""
    * seed still starts its run at 0+1 = 1, so the seed cannot
    * overcount.
    */
  private def maxElemCount(arr: Column): Column = {
    val run = (acc: Column, x: Column) =>
      when(x === acc.getField("prev"), acc.getField("run") + 1)
        .otherwise(lit(1L))
    aggregate(array_sort(arr),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => struct(x.as("prev"), run(acc, x).as("run"),
        greatest(acc.getField("best"), run(acc, x)).as("best")),
      acc => acc.getField("best"))
  }

  /** Gopher-style repetition/quality signals per document: word count,
    * mean word length, top-word fraction, top-bigram fraction, and the
    * composite keep/drop verdict. Every signal is per-row expression
    * algebra over the tokenized array ([[maxElemCount]] for the top
    * fractions) — the corpus crosses ZERO shuffles and zero joins; the
    * round-8 explode + triple-aggregate + join-back shape left ~0.9 s
    * of real work at sf0.1 that this removes outright, and at 100 TB it
    * removes the only data-sized exchange the verdict had.
    */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 10, wordLenRange: (Double, Double) = (2.0, 10.0),
      maxTopWordFrac: Double = 0.2, maxTopBigramFrac: Double = 0.18)
      : DataFrame = {
    val toks = split(col(textCol), " ")
    val bigrams = zip_with(slice(col("__t"), lit(1), size(col("__t")) - 1),
      slice(col("__t"), lit(2), size(col("__t")) - 1),
      (a, b) => concat(a, lit(" "), b))
    graft.SparkUtil.ensureParallelism(df)
      .select(col(idCol), toks.as("__t"),
        size(toks).as("n_words"),
        round(aggregate(transform(toks, w => length(w)), lit(0),
          (acc, x) => acc + x).cast("double") / size(toks), 4)
          .as("mean_word_len"))
      .withColumn("top_word_frac",
        round(maxElemCount(col("__t")) / size(col("__t")), 4))
      // A one-token doc has no bigrams: top_bigram_frac is null and the
      // verdict must be a definite false, not null (such a doc also fails
      // minWords, but null && false is null in SQL).
      .withColumn("top_bigram_frac",
        when(size(col("__t")) > 1,
          round(maxElemCount(bigrams) / (size(col("__t")) - 1), 4)))
      .drop("__t")
      .withColumn("keep",
        col("n_words") >= minWords &&
          col("mean_word_len").between(wordLenRange._1, wordLenRange._2) &&
          col("top_word_frac") <= maxTopWordFrac &&
          coalesce(col("top_bigram_frac") <= maxTopBigramFrac, lit(false)))
  }

  // ------------------------------------------------- stratified sample

  /** Deterministic stratified sampling: a row survives iff the first two
    * hex chars of `md5(key)` fall below its stratum's threshold —
    * `"80"` keeps 128/256 = 50%, `"40"` 25%, `"20"` 12.5%. md5-of-string
    * is engine-portable (oracle-checkable) and partition-stable: the same
    * row set survives any shuffle, repartition, or re-run, which is what
    * makes the sample reproducible at 100 TB (and incrementally stable
    * as new data arrives — old rows never flip).
    */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String,
      thresholds: Map[String, String], default: String = "00"): DataFrame = {
    val thr = thresholds.foldLeft(lit(default)) { case (acc, (s, t)) =>
      when(col(strataCol) === s, lit(t)).otherwise(acc)
    }
    df.filter(substring(md5(col(keyCol).cast("string")), 1, 2) < thr)
  }

  /** Temperature-balanced stratum sampling (the multilingual-LM mixing
    * rule): stratum `s` with mass `p_s = n_s/N` is sampled at a rate that
    * realizes mixture weight `q_s ∝ p_s^alpha` over an expected
    * `targetFrac * N` kept rows — `alpha = 1` preserves the natural
    * distribution, `alpha → 0` equalizes strata, 0.5–0.7 is the usual
    * compromise. Rates are capped at 1 (a small stratum cannot be
    * oversampled without replacement).
    *
    * Fully distributed: stratum masses come from one map-side-combined
    * aggregate (a handful of rows), rates ride back on a broadcast join,
    * and row selection reuses the md5-bucket rule — deterministic,
    * partition-stable, engine-portable (rates rounded to 6 decimals so an
    * IEEE ulp cannot flip a row across engines). No driver collect.
    */
  def temperatureSample(df: DataFrame, strataCol: String, keyCol: String,
      alpha: Double, targetFrac: Double): DataFrame = {
    val whole = org.apache.spark.sql.expressions.Window.partitionBy()
    // NB: column resolution is case-INsensitive — names here must differ
    // by more than case (a `__n`/`__N` pair silently aliases).
    val rates = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__cnt"))
      .withColumn("__tot", sum(col("__cnt")).over(whole))
      .withColumn("__w", pow(col("__cnt") / col("__tot"), alpha))
      .withColumn("rate", round(least(lit(1.0),
        lit(targetFrac) * col("__tot") *
          (col("__w") / sum(col("__w")).over(whole)) / col("__cnt")), 6))
      .select(col(strataCol), col("rate"))
    // Keep iff the first 32 md5 bits, read as a fraction of 2^32, fall
    // below the stratum's rate — compared in hex-string space so both
    // engines evaluate the identical predicate.
    val thr = lower(lpad(hex(floor(col("rate") * lit(4294967296L))
      .cast("bigint")), 8, "0"))
    df.join(broadcast(rates), Seq(strataCol))
      .filter(col("rate") >= 1.0 ||
        substring(md5(col(keyCol).cast("string")), 1, 8) < thr)
  }

  // ------------------------------------------------- training order

  /** Deterministic corpus shuffle — the "randomize training order" step.
    * Each row's position is `md5(seed || key)`: reproducible across
    * re-runs, partition layouts and cluster sizes, incrementally stable
    * (new rows interleave without moving old ones), and free of any
    * driver-side RNG. At scale this is one range-partitioned sort on a
    * 16-byte key; writing the result range-partitioned IS the shuffled
    * shard layout.
    */
  def seededShuffle(df: DataFrame, keyCol: String, seed: String): DataFrame =
    df.withColumn("shuffle_key",
        md5(concat(lit(seed), lit(":"), col(keyCol).cast("string"))))
      .orderBy(col("shuffle_key"))

  /** Weighted sampling WITHOUT replacement — Efraimidis–Spirakis A-ES:
    * each row draws a deterministic uniform u from its md5 (the
    * [[seededShuffle]] hash family) and ranks by `ln(u)/w` (the
    * monotone twin of the textbook u^(1/w) — no pow, better
    * conditioning near w≫1); the top-k ARE a weighted sample without
    * replacement. One expression + one TakeOrdered: reproducible
    * across re-runs, partition layouts and cluster sizes, no RNG
    * state, no rejection loop — at 100 TB this is a map + a k-row
    * per-partition heap merge, the cheapest possible "pick 10k docs
    * proportional to quality" primitive.
    *
    * u = (h+1)/2^52 over the md5's first 13 hex digits: (0,1] exactly
    * representable, ln(1)=0 harmless. The key is quantized to an e9
    * LONG before ranking (tie-break: keyCol): Spark's `log` is
    * StrictMath (fdlibm) while DuckDB's `ln` is libm — they can differ
    * in the last ulp, so a raw-double boundary would be engine-
    * dependent; at e9 a flip needs the exact value within ~1e-20 of a
    * rounding edge (SURVEY §5.4 taken one step further: quantize the
    * SELECTION key, not just the output). Weights must be positive and
    * that is ENFORCED in-plan: a zero weight would make the key
    * -Infinity and a negative weight flips ln(u)/w positive — silently
    * promoting exactly the invalid rows to the top-k — so the key
    * expression `raise_error`s on w <= 0 (or null) instead: the scan
    * itself fails loudly, at zero extra passes.
    */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
      k: Int, seed: String): DataFrame = {
    val h = conv(substring(md5(concat(lit(seed), lit(":"),
      col(keyCol).cast("string"))), 1, 13), 16, 10).cast("long")
    val u = (h + lit(1L)).cast("double") / lit(4503599627370496.0)
    val w = col(weightCol).cast("double")
    df.withColumn("es_key_e9",
        when(w > 0, round(log(u) / w * 1000000000, 0).cast("long"))
          .otherwise(raise_error(concat(
            lit(s"weightedSample: non-positive weight in '$weightCol' "),
            lit("(row key "), col(keyCol).cast("string"),
            lit(", weight "), col(weightCol).cast("string"),
            lit(") — weights must be > 0")))))
      .orderBy(col("es_key_e9").desc, col(keyCol))
      .limit(k)
  }

  /** Deterministic weighted upsampling WITH replacement — epoch mixing
    * ("see wikipedia 3.3 times per epoch"). A row with weight `w` yields
    * `floor(w)` copies plus one more iff its md5 fraction falls below
    * `w - floor(w)` — expected copies = w, exact, reproducible, no RNG.
    * Map-side explode only (`copy` index disambiguates downstream
    * shuffles); no aggregation, no skew: a weight-10 stratum costs 10×
    * its rows, spread evenly across partitions.
    */
  def upsample(df: DataFrame, strataCol: String, keyCol: String,
      weights: Map[String, Double]): DataFrame = {
    val w = weights.foldLeft(lit(0.0)) { case (acc, (s, x)) =>
      when(col(strataCol) === s, lit(x)).otherwise(acc)
    }
    // frac(w) in hex-string space, same predicate family as the samplers.
    val thr = lower(lpad(hex(floor((w - floor(w)) * lit(4294967296L))
      .cast("bigint")), 8, "0"))
    val copies = (floor(w) +
      when(substring(md5(col(keyCol).cast("string")), 1, 8) < thr, 1)
        .otherwise(0)).cast("int")
    // sequence(1, 0) DESCENDS (same trap as ngrams): zero copies must be
    // an empty array, not [1, 0].
    df.withColumn("copy", explode(when(copies >= 1,
      sequence(lit(1), copies)).otherwise(array().cast("array<int>"))))
  }

  /** Domain mixture reweighting — the static DoReMi/Pile-style mixing
    * step: given per-domain token mass and a target share per domain,
    * emit the sampling weight (target share ÷ actual share) each domain
    * needs to hit the target mixture, capped at `maxWeight` so rare
    * domains aren't repeated into memorization.
    *
    * One map-side-combinable aggregation keyed by domain (the domain
    * count is tiny — tens, not millions) and a broadcast of the 1-row
    * corpus total; everything after the agg is constant-size. Exact
    * integer token counts; the weight is one fixed-shape double division
    * per domain, so the oracle replays it bit-for-bit.
    *
    * `targetShare(domain)` defaults to uniform when the map has no entry.
    * Output: domain, n_docs, n_tokens, share (6 dp), weight (4 dp),
    * capped.
    */
  def mixtureWeights(df: DataFrame, domainCol: String, textCol: String,
      targetShares: Map[String, Double] = Map.empty,
      maxWeight: Double = 4.0): DataFrame = {
    val nToks = size(filter(split(lower(col(textCol)), " "),
      t => length(t) > 0)).cast("long")
    val per = df.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_docs"), sum(nToks).as("n_tokens"))
    val tot = per.agg(sum(col("n_tokens")).as("__tot"),
      count(lit(1)).as("__nd"))
    val target = targetShares.foldLeft(lit(1.0) / col("__nd")) {
      case (acc, (d, s)) =>
        when(col(domainCol) === d, lit(s)).otherwise(acc)
    }
    // weight = target / (n_tokens / tot), written as the single division
    // target * tot / n_tokens so both engines evaluate one IEEE tree.
    val rawW = target * col("__tot").cast("double") /
      col("n_tokens").cast("double")
    // A domain whose texts are all empty (n_tokens = 0) must be guarded
    // BEFORE the division: Spark's double 0-division yields Infinity while
    // DuckDB's yields NULL, so the unguarded expression diverges across
    // engines. Zero-token domains get the ceiling weight, explicitly
    // capped — the upsample-to-target interpretation of "no tokens yet".
    val hasToks = col("n_tokens") > 0
    per.crossJoin(broadcast(tot))
      .select(col(domainCol), col("n_docs"), col("n_tokens"),
        round(col("n_tokens").cast("double") / col("__tot").cast("double"), 6)
          .as("share"),
        when(hasToks, round(least(rawW, lit(maxWeight)), 4))
          .otherwise(lit(maxWeight)).as("weight"),
        when(hasToks, rawW > lit(maxWeight)).otherwise(lit(true)).as("capped"))
  }

  /** Adaptive per-group quality cutoffs — the data-driven replacement for
    * hand-tuned filter thresholds: within each group (language, source),
    * keep documents whose quality score is at or above that group's
    * `pct` percentile, reporting the cutoff and the kept share.
    *
    * The score must be an INTEGER expression (fixed-point if derived
    * from a ratio): the whole computation then reduces to ONE map-side-
    * combinable aggregate over (group, score) — count cells — followed by
    * a running sum over that TINY table. No corpus sort, no per-group
    * window over data rows, no sketch: the exact percentile comes from
    * the score histogram, which is the scalable way to take exact
    * quantiles of bounded-cardinality scores at 100 TB. The rank rule is
    * integer arithmetic (`ceil(pct*n)` as `(pct_num*n + den-1) div den`),
    * so the DuckDB oracle replays it exactly.
    *
    * Output: one row per group — groupCol, cutoff, n_docs, n_kept,
    * kept_frac (one IEEE division of two exact longs).
    */
  def adaptiveThreshold(df: DataFrame, groupCol: String, score: Column,
      pctNum: Int = 1, pctDen: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Materialized (r11): the histogram feeds BOTH the cutoff derivation
    // and the final join — Catalyst does not share subtrees, so an
    // un-materialized hist re-runs the corpus scan + score expression
    // once per consumer (caught by PlanAuditSpec's one-scan pin when
    // q124 put a 384-dim argmin in the score path). The checkpoint is
    // the corpus's LAST aggregate; everything after is histogram-sized.
    val hist = df.select(col(groupCol), score.cast("long").as("__s"))
      .groupBy(col(groupCol), col("__s"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint(true)
    val byScore = Window.partitionBy(col(groupCol)).orderBy(col("__s"))
    val grp = Window.partitionBy(col(groupCol))
    // cum counts docs with score <= __s; the pct-rank doc sits at
    // position ceil(pct * n): the cutoff is the smallest score whose
    // cumulative count reaches it. Everything below is dropped.
    val ranked = hist
      .withColumn("__cum", sum(col("__c")).over(byScore))
      .withColumn("__n", sum(col("__c")).over(grp))
      .withColumn("__rank",
        expr(s"(${pctNum}L * __n + ${pctDen - 1}) div $pctDen"))
    val cutoff = ranked.filter(col("__cum") >= col("__rank"))
      .groupBy(col(groupCol))
      .agg(min(col("__s")).as("cutoff"))
    ranked.join(cutoff, Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(first(col("cutoff")).as("cutoff"),
        max(col("__n")).as("n_docs"),
        sum(when(col("__s") >= col("cutoff"), col("__c"))
          .otherwise(lit(0L))).as("n_kept"))
      .select(col(groupCol), col("cutoff"), col("n_docs"), col("n_kept"),
        (col("n_kept").cast("double") / col("n_docs").cast("double"))
          .as("kept_frac"))
  }

  /** OTSU per-group threshold — [[adaptiveThreshold]]'s percentile rule
    * needs a keep-rate chosen by hand; Otsu's method (Otsu 1979) derives
    * the threshold from the score DISTRIBUTION itself: pick the cut
    * maximizing the between-class variance ω₀ω₁(μ₀−μ₁)² over the score
    * histogram — the binarization rule for bimodal quality scores
    * ("boilerplate mode vs prose mode"), with no tunable at all.
    *
    * Same scale shape as [[adaptiveThreshold]]: ONE map-side-combinable
    * (group, score-bin) count aggregate over the corpus (checkpointed),
    * then windows over the histogram — the candidate evaluation is
    * bins-sized, never data-sized. The score must already be an integer
    * bin (cap it — e.g. `least(n_chars div 20, 255)`); bounded bins are
    * what makes the histogram the exact-and-scalable path at 100 TB.
    *
    * ALL-INTEGER objective (the q178 discipline): with cumulative
    * w₀ = Σ c, m₀ = Σ c·s at threshold t and complements w₁, m₁,
    * maximize obj = w₀·w₁·d² where d = (m₀·w₁ − m₁·w₀)·100 div (w₀·w₁)
    * is (μ₀−μ₁) at e2 — trunc-div integer arithmetic both engines
    * replay bit-for-bit, ties broken toward the smaller bin. Overflow
    * budget (documented AND enforced): with B = max bin value,
    * m₀·w₁ ≤ N²·B needs ·100 ≤ Long.Max, and obj ≤ (N²/4)·(100·B)²
    * must fit — the binding cap is N ≤ √(4·Long.Max)/(100·B), ≈ 2.4·10⁸
    * rows per group at B = 255; `require`d from the histogram's own
    * marginals, so past the cap the call fails loudly (sample, or
    * coarsen bins) instead of silently wrapping.
    *
    * Output per group: (groupCol, threshold (smallest KEPT bin = t+1),
    * n_below, n_above, mu_below_e2, mu_above_e2, sep_obj).
    */
  def otsuThreshold(df: DataFrame, groupCol: String, scoreBin: Column)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = graft.SparkUtil.ensureParallelism(df)
      .select(col(groupCol), scoreBin.cast("long").as("__s"))
      .groupBy(col(groupCol), col("__s"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint(true)
    val caps = hist.groupBy(col(groupCol))
      .agg(sum(col("__c")).as("__n"), max(col("__s")).as("__mx"),
        min(col("__s")).as("__mn"))
      .agg(max(col("__mx")).as("maxS"), min(col("__mn")).as("minS"),
        max(col("__n")).as("maxN")).head()
    require(!caps.isNullAt(0), "otsuThreshold: empty input")
    val (maxS, maxN) = (caps.getLong(0), caps.getLong(2))
    require(caps.getLong(1) >= 0, "otsuThreshold: score bins must be >= 0")
    val nCap = math.sqrt(4.0 * Long.MaxValue).toLong / (100L * math.max(maxS, 1L))
    require(maxN <= nCap,
      s"otsuThreshold: largest group has $maxN rows, over the " +
        s"exact-integer cap $nCap at max bin $maxS — coarsen the bins " +
        "or sample; refusing to overflow silently")
    val byScore = Window.partitionBy(col(groupCol)).orderBy(col("__s"))
    val grp = Window.partitionBy(col(groupCol))
    val scored = hist
      .withColumn("__w0", sum(col("__c")).over(byScore))
      .withColumn("__m0", sum(col("__c") * col("__s")).over(byScore))
      .withColumn("__n", sum(col("__c")).over(grp))
      .withColumn("__m", sum(col("__c") * col("__s")).over(grp))
      .withColumn("__w1", col("__n") - col("__w0"))
      .withColumn("__m1", col("__m") - col("__m0"))
      .filter(col("__w1") > 0)
      .withColumn("__d",
        expr("(__m0 * __w1 - __m1 * __w0) * 100 div (__w0 * __w1)"))
      .withColumn("__obj", col("__w0") * col("__w1") * col("__d") * col("__d"))
      .withColumn("__rk", row_number().over(
        grp.orderBy(col("__obj").desc, col("__s"))))
    scored.filter(col("__rk") === 1)
      .select(col(groupCol), (col("__s") + 1).as("threshold"),
        col("__w0").as("n_below"), col("__w1").as("n_above"),
        expr("__m0 * 100 div __w0").as("mu_below_e2"),
        expr("__m1 * 100 div __w1").as("mu_above_e2"),
        col("__obj").as("sep_obj"))
  }

  /** N-gram novelty attribution: for every document, how many of its
    * distinct n-grams appear HERE FIRST (no lower-id document contains
    * them)? The diversity-decay curve of a corpus in document order —
    * high novelty early, boilerplate-dominated tails late — and the
    * per-document signal behind "does adding this shard still add
    * information?".
    *
    * Two map-side-combinable aggregates of the exploded stream and one
    * doc-count-sized join — deliberately NO gram-keyed join back to the
    * corpus: the novel count per doc is just the histogram of
    * min(doc_id) over grams, so a boilerplate gram in 10^6 docs costs
    * one combiner cell and hot keys never meet a window or a join.
    * Output: idCol, n_grams, n_novel, novelty_frac; docs with fewer
    * than n tokens emit nothing.
    */
  def ngramNovelty(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    // Materialized: the distinct (doc, gram) stream feeds BOTH the
    // per-doc count and the min-doc histogram, and Catalyst does not
    // share the subtree — un-checkpointed, the corpus explode +
    // distinct ran once per consumer (two parquet scans + two
    // Generates, confirmed via PlanDump in r9).
    val pairs = ngrams(df, textCol, n, Seq(col(idCol))).distinct()
      .localCheckpoint(true)
    val perDoc = pairs.groupBy(col(idCol)).agg(count(lit(1)).as("n_grams"))
    val novel = pairs.groupBy(col("g"))
      .agg(min(col(idCol)).as(idCol))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_novel"))
    perDoc.join(novel, Seq(idCol), "left")
      .select(col(idCol), col("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        (coalesce(col("n_novel"), lit(0L)).cast("double") /
          col("n_grams").cast("double")).as("novelty_frac"))
  }

  /** k-anonymity generalization over a two-column quasi-identifier —
    * the release-safety report a corpus needs before publication:
    * records whose (q1, q2) combination occurs in fewer than `k`
    * documents are re-identification risks, so they generalize up the
    * lattice (q1, q2) → (q1, '*') → ('*', '*') until their group
    * reaches `k`, and are SUPPRESSED (level 3) if even the fully
    * generalized remainder stays under `k`.
    *
    * Scale shape: the corpus crosses exactly ONE map-side-combinable
    * aggregate (to the |q1|×|q2| cells table, materialized — three
    * consumers, and Catalyst does not share subtrees); the lattice walk
    * is algebra on that bounded table. Output: q1, q2 (generalized
    * values, '*' where folded), level (0 = released as-is, 1 = source
    * folded, 2 = fully generalized, 3 = suppressed), n_docs.
    */
  def kAnonymize(df: DataFrame, q1: String, q2: String,
      k: Int): DataFrame = {
    val cells = df.groupBy(col(q1), col(q2))
      .agg(count(lit(1)).as("n_docs"))
      .localCheckpoint(true)
    val l0 = cells.filter(col("n_docs") >= k)
      .select(col(q1), col(q2), lit(0).as("level"), col("n_docs"))
    val f0 = cells.filter(col("n_docs") < k)
    val l1c = f0.groupBy(col(q1)).agg(sum(col("n_docs")).as("n_docs"))
    val l1 = l1c.filter(col("n_docs") >= k)
      .select(col(q1), lit("*").as(q2), lit(1).as("level"), col("n_docs"))
    val l2 = l1c.filter(col("n_docs") < k)
      .agg(sum(col("n_docs")).as("n_docs"))
      .select(lit("*").as(q1), lit("*").as(q2),
        when(col("n_docs") >= k, 2).otherwise(3).as("level"),
        col("n_docs"))
      .filter(col("n_docs").isNotNull)
    l0.unionByName(l1).unionByName(l2)
  }

  /** UniMax language sampling (Chung et al. 2023, arXiv:2304.09151) —
    * allocate a total token budget across languages so every language
    * is used as uniformly as possible WITHOUT exceeding `epochCap`
    * repetitions of its corpus: languages too small to absorb a fair
    * share saturate at cap·n_tokens epochs, and the freed budget
    * water-fills the rest. The greedy (ascending-size) allocation is
    * the closed-form waterfill: with caps sorted ascending, saturation
    * is prefix-closed, so one pass of window prefix sums finds the
    * saturated prefix and the integer split of the remainder
    * (first `rem` unsaturated languages get one extra token).
    *
    * Budget = n_total · budgetNum / budgetDen (integer div). All
    * arithmetic is exact integer, so the allocation is deterministic
    * and oracle-replayable. Scale shape: the corpus crosses ONE
    * map-side-combinable aggregate (language → token count); the
    * waterfill is window algebra on the languages-sized table (the
    * single-partition windows see |languages| rows, never the corpus).
    *
    * Output: langCol, n_tokens, cap, alloc, saturated (0/1),
    * epochs_e4 = alloc·10⁴ div n_tokens.
    */
  def unimaxAllocation(df: DataFrame, langCol: String, textCol: String,
      epochCap: Int, budgetNum: Int, budgetDen: Int): DataFrame = {
    val langs = df
      .groupBy(col(langCol))
      .agg(sum(size(split(col(textCol), " ")).cast("long"))
        .as("n_tokens"))
      .localCheckpoint(true)
    val all = Window.partitionBy()
    val byCap = Window.partitionBy()
      .orderBy(col("cap"), col(langCol))
    val ranked = langs
      .withColumn("cap", col("n_tokens") * epochCap)
      .withColumn("T", expr(s"sum(n_tokens) over () * $budgetNum" +
        s" div $budgetDen"))
      .withColumn("L", count(lit(1)).over(all))
      .withColumn("r", row_number().over(byCap))
      .withColumn("P", sum(col("cap")).over(
        Window.partitionBy().orderBy(col("cap"), col(langCol))))
      // saturated iff cap·(langs from here on) fits the budget left
      // after granting every smaller language its cap
      .withColumn("sat",
        (col("cap") * (col("L") - col("r") + 1)) <=
          (col("T") - (col("P") - col("cap"))))
    val filled = ranked
      .withColumn("m", sum(when(col("sat"), 1L).otherwise(0L)).over(all))
      .withColumn("Pm",
        sum(when(col("sat"), col("cap")).otherwise(0L)).over(all))
      .withColumn("base",
        when(col("m") < col("L"),
          expr("(T - Pm) div (L - m)")).otherwise(lit(0L)))
      .withColumn("rem",
        when(col("m") < col("L"),
          expr("(T - Pm) % (L - m)")).otherwise(lit(0L)))
      .withColumn("alloc",
        when(col("sat"), col("cap"))
          .otherwise(col("base") +
            when(col("r") - col("m") <= col("rem"), 1L).otherwise(0L)))
    filled.select(col(langCol), col("n_tokens"), col("cap"),
      col("alloc"),
      when(col("sat"), 1).otherwise(0).as("saturated"),
      expr("alloc * 10000 div n_tokens").as("epochs_e4"))
  }
}
