package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inverted-index construction — the build side of lexical retrieval
  * (q75's BM25 consumes corpus stats; this materializes the term →
  * posting-list mapping itself).
  *
  * Scale shape: the corpus explodes to distinct (term, doc_id) pairs —
  * one shuffle keyed on the pair with map-side combine — and posting
  * lists are assembled PER TERM after a `row_number` cap, so no
  * aggregation buffer ever holds an unbounded list: a stopword term with
  * a hundred-million-document posting list contributes `maxPostings`
  * rows to the assembly, not its full list (the full-list variant is the
  * same plan minus the cap, written out partitioned by term-hash).
  */
object Indexing {

  /** (term, df, postings): document frequency over the whole corpus and
    * the first `maxPostings` doc ids in ascending order, comma-joined.
    */
  def postings(df: DataFrame, idCol: String, textCol: String,
      maxPostings: Int = 5): DataFrame = {
    val pairs = df
      .select(col(idCol).cast("long").as("doc_id"),
        explode(split(lower(col(textCol)), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .distinct()
    val dfreq = pairs.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val top = pairs
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("term")).orderBy(col("doc_id"))))
      .filter(col("rn") <= maxPostings)
      .groupBy(col("term"))
      .agg(array_join(transform(sort_array(collect_list(col("doc_id"))),
        x => x.cast("string")), ",").as("postings"))
    dfreq.join(top, Seq("term"))
  }

  /** Frequency-ranked vocabulary: id = dense rank by (count desc, term),
    * zero-based. The rank is DISTRIBUTED: the term table is
    * range-partitioned on the rank key, sorted within partitions, and
    * numbered with zipWithIndex — a partition-count job plus a local
    * offset add, never a partition-less Window (which would single-
    * thread a 100M-term vocabulary through one task). The rank rule
    * (count desc, term asc) is total — term is unique after the groupBy
    * — so the assigned ids are independent of where the range
    * boundaries land. PlanAuditSpec pins the no-global-window shape.
    */
  def vocab(df: DataFrame, textCol: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val spark = df.sparkSession
    val counts = graft.SparkUtil.ensureParallelism(df)
      .select(explode(split(col(textCol), " ")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
    // Materialized ONCE (vocabulary-sized): zipWithIndex runs a
    // partition-size job up front, and the checkpoint keeps that job +
    // every downstream action reading sorted blocks instead of
    // re-tokenizing the corpus. (Eager local checkpoint, freed by the
    // ContextCleaner — the BucketedMerge discipline.)
    val sorted = counts
      .repartitionByRange(col("c").desc, col("term"))
      .sortWithinPartitions(col("c").desc, col("term"))
      .localCheckpoint(true)
    val indexed = sorted.rdd.zipWithIndex()
      .map { case (r, i) =>
        Row(r.getString(0), i.toInt, r.getLong(1))
      }
    spark.createDataFrame(indexed, StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("id", IntegerType, nullable = false),
      StructField("c", LongType, nullable = false))))
  }

  /** Token-id encoding — the text → ids step before sequence packing.
    * One explode, one (broadcastable) vocab join, one per-doc assembly;
    * OOV tokens map to -1. Returns (idCol, ids ARRAY<INT>, toks
    * ARRAY<STRING>) with both arrays in original token order, so
    * `array_join(toks, " ")` is the exact decode.
    */
  def encode(df: DataFrame, vocabDf: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val pairs = graft.SparkUtil.ensureParallelism(df)
      .select(col(idCol),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "term")))
    // The vocab's own `id` column is renamed before the join — a caller
    // whose idCol is literally "id" would otherwise hit AMBIGUOUS_REFERENCE.
    pairs.join(vocabDf.select(col("term"), col("id").as("__tid")),
        Seq("term"), "left")
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("pos"),
        coalesce(col("__tid"), lit(-1)).as("id"), col("term")))).as("__e"))
      .select(col(idCol),
        transform(col("__e"), x => x.getField("id")).as("ids"),
        transform(col("__e"), x => x.getField("term")).as("toks"))
  }
}
