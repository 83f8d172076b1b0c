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
}
