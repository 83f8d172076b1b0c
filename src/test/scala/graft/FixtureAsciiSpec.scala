package graft

import org.apache.spark.sql.functions._

/** Guards the ASCII-only assumption the q34/q35 oracle SQL depends on.
  *
  * The engine tokenizes with Unicode classes (`\p{L}`/`\p{N}`,
  * `Char.isLetter`) and hashes FNV over UTF-16 code units, while the
  * DuckDB oracle replays with ASCII classes (`[a-z]+|[0-9]+|[^a-z0-9\s]`,
  * `BETWEEN 'a' AND 'z'`) and `unicode()` codepoints — the two agree
  * bit-for-bit ONLY on ASCII input. The synthetic `documents` fixtures
  * are ASCII today; this spec makes a future non-ASCII fixture fail
  * HERE, loudly, instead of as a silent oracle hash mismatch.
  */
class FixtureAsciiSpec extends SparkSpec {

  private val sfDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
    "/root/testdata/sf0.1").filter(d => new java.io.File(d).exists)

  test("documents fixture is ASCII-only at every gated SF " +
      "(q34/q35 oracle precondition)") {
    assert(sfDirs.nonEmpty, "no testdata dirs found")
    for (dir <- sfDirs) {
      val nonAscii = spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("text").rlike("[^\\x00-\\x7F]"))
        .count()
      assert(nonAscii == 0L,
        s"$dir/documents.parquet has $nonAscii non-ASCII rows — the " +
          "q34/q35 DuckDB oracles replay the tokenizer with ASCII-only " +
          "regex/codepoint arithmetic and will silently diverge; make " +
          "the oracle SQL Unicode-aware (incl. surrogate pairs) before " +
          "accepting such a fixture")
    }
  }
}
