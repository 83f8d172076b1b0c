package graft.operators

import graft.SparkSpec

class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  private def words(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  test("a document wholly quoted inside a longer one reads containment " +
      "10000 even though its Jaccard is low") {
    val short = words("w", 20)
    val long = short + " " + words("z", 40)
    val df = Seq((1L, short), (2L, long), (3L, words("u", 30)))
      .toDF("doc_id", "text")
    val out = Dedup.containmentPairs(df, "doc_id", "text",
      n = 5, dfCap = 50, minContainE4 = 5000).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(0), r.getLong(1)) == (1L, 2L))
    assert(r.getLong(5) == 10000L)
    // And the pair's Jaccard is small: 16 shared / (16 + 56 - 16)
    assert(r.getLong(2) == 16L && r.getLong(3) == 56L)
  }

  test("the ubiquity cap drops boilerplate-only evidence") {
    // The same 6-word banner in ALL 8 docs plus unique tails: with
    // dfCap below the corpus size every banner shingle is boilerplate
    // and no pair survives.
    val banner = words("b", 10)
    val df = (0L until 8L)
      .map(i => (i, banner + " " + words(s"t$i", 15)))
      .toDF("doc_id", "text")
    val out = Dedup.containmentPairs(df, "doc_id", "text",
      n = 5, dfCap = 4, minContainE4 = 5000).collect()
    assert(out.isEmpty)
  }

  test("short documents (under n tokens) produce no shingles and no " +
      "pairs, without throwing") {
    val df = Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text")
    assert(Dedup.containmentPairs(df, "doc_id", "text",
      n = 5).collect().isEmpty)
  }
}
