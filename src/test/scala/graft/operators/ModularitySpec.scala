package graft.operators

import graft.SparkSpec
import graft.queries.DedupQueries

/** Planted-fixture spec for q236: two clean near-dup cliques have the
  * closed-form modularity 1/2.
  */
class ModularitySpec extends SparkSpec {
  import spark.implicits._

  test("two 4-cliques read Q = 0.5 exactly: full intra mass, half " +
      "lost to the degree null model") {
    val dir = java.nio.file.Files.createTempDirectory("mod-spec").toString
    val textA = (0 until 30).map(i => s"alpha$i").mkString(" ")
    val textB = (0 until 30).map(i => s"beta$i").mkString(" ")
    val docs = (0L until 4L).map(i => (i, textA, "s", "en")) ++
      (10L until 14L).map(i => (i, textB, "s", "en")) ++
      Seq((20L, (0 until 30).map(i => s"gamma$i").mkString(" "), "s",
        "en"))
    docs.toDF("doc_id", "text", "source", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = DedupQueries.queries("q236_lpa_modularity")(spark, dir)
      .head()
    // identical texts share every band → two complete 4-cliques:
    // m = 12, per clique e_c = 6, d_c = 12 →
    // Q = 12/12 − 2·144/(4·144) = 0.5.
    assert(r.getLong(0) == 12L, s"m = ${r.getLong(0)}")
    assert(r.getLong(1) == 2L && r.getLong(2) == 12L)
    assert(r.getLong(3) == 5000L)
  }
}
