package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Per-group bigram LMs (bigramNllBy) must be ISOLATED: a group's scores
  * in a multi-group run equal the scores from training on that group
  * alone — no vocabulary, count, or smoothing leakage across groups.
  */
class GroupedLmSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "en", "the cat sat on the mat"),
    (2L, "en", "the dog sat on the rug"),
    (3L, "en", "a cat and a dog met"),
    (4L, "de", "der hund sitzt auf der matte"),
    (5L, "de", "die katze sitzt auf dem teppich")
  ).toDF("doc_id", "lang", "text")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"), col("n_bigrams"), col("score_e4"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet

  test("a group's slice of the joint run equals training on it alone") {
    val joint = LanguageModel.bigramNllBy(docs, "lang", "doc_id", "text")
    val enOnly = LanguageModel.bigramNllBy(
      docs.filter(col("lang") === "en"), "lang", "doc_id", "text")
    assert(rows(joint.filter(col("lang") === "en")) == rows(enOnly))
    val deOnly = LanguageModel.bigramNllBy(
      docs.filter(col("lang") === "de"), "lang", "doc_id", "text")
    assert(rows(joint.filter(col("lang") === "de")) == rows(deOnly))
  }

  test("scores are sane: a repeated transition is likelier than vocabulary size alone") {
    val joint = LanguageModel.bigramNllBy(docs, "lang", "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("score_e4")).toMap
    // Every doc gets a positive NLL (probabilities < 1).
    assert(joint.values.forall(_ > 0), joint)
    // All 5 docs scored; none dropped (all have >= 2 tokens).
    assert(joint.size == 5, joint)
  }
}
