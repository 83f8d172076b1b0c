package graft.operators

import graft.SparkSpec

/** UniMax waterfill semantics (q131's operator) on corpora whose
  * allocation is computed by hand: saturation of small languages, the
  * integer remainder split, budget conservation, and the all-saturated
  * regime. The DuckDB oracle certifies the window arithmetic
  * engine-for-engine; these pin the algorithm.
  */
class UnimaxSpec extends SparkSpec {
  import spark.implicits._

  /** langs -> token counts, built as docs of single-space text. */
  private def corpus(langTokens: (String, Int)*) =
    langTokens.zipWithIndex.map { case ((l, n), i) =>
      (i.toLong, l, (1 to n).map(j => s"t$j").mkString(" "))
    }.toDF("doc_id", "lang", "text")

  private def run(df: org.apache.spark.sql.DataFrame, cap: Int,
      num: Int, den: Int) =
    Curation.unimaxAllocation(df, "lang", "text", cap, num, den)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4),
          r.getLong(5)))).toMap

  test("small languages saturate; the freed budget waterfills the rest") {
    // tokens a=10 b=20 c=100, cap=2 epochs, budget=100% (T=130).
    // caps 20/40/200: a,b saturate, c takes the remaining 70.
    val out = run(corpus(("a", 10), ("b", 20), ("c", 100)), 2, 1, 1)
    assert(out("a") == ((10L, 20L, 20L, 1, 20000L)))
    assert(out("b") == ((20L, 40L, 40L, 1, 20000L)))
    assert(out("c") == ((100L, 200L, 70L, 0, 7000L)))
    assert(out.values.map(_._3).sum == 130L) // exact budget conservation
  }

  test("integer remainder goes to the first unsaturated languages") {
    // tokens a=10 b=100 c=100, T = 210*47/70 = 141. a saturates (20);
    // 121 splits 61/60 with the +1 to b (rank order ties by lang).
    val out = run(corpus(("a", 10), ("b", 100), ("c", 100)), 2, 47, 70)
    assert(out("a")._3 == 20L && out("a")._4 == 1)
    assert(out("b")._3 == 61L && out("b")._4 == 0)
    assert(out("c")._3 == 60L && out("c")._4 == 0)
  }

  test("budget above total caps saturates everyone") {
    val out = run(corpus(("a", 10), ("b", 20), ("c", 100)), 2, 10, 1)
    assert(out.values.forall(v => v._3 == v._2 && v._4 == 1))
    assert(out.values.forall(_._5 == 20000L))
  }

  test("uniform regime: no saturation, even split") {
    // equal languages, budget 50%: fair share below every cap.
    val out = run(corpus(("a", 40), ("b", 40)), 2, 1, 2)
    assert(out("a")._3 == 20L && out("b")._3 == 20L)
    assert(out.values.forall(_._4 == 0))
  }
}
