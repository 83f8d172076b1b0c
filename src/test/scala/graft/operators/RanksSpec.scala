package graft.operators

import graft.SparkSpec
import graft.queries.WarehouseQueries
import java.sql.Timestamp
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[Ranks.groupedPrefixSum]] — the distributed-rank swap behind the
  * rank-window statistics (q211 Spearman, q250 Mann-Whitney): the
  * keyed window within the budget, the range-partitioned two-pass
  * prefix cumulation past it, REQUIRED to return the same rows. The
  * q-level tests drive the real query plans across the swap with a
  * budget of 1 (every group overflows), pinning that the fallback is
  * not a near-miss approximation but the identical answer.
  */
class RanksSpec extends SparkSpec {

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("ranks-spec").toString

  test("distributed fallback == keyed window: ties, multi-row groups " +
      "spanning range partitions, weighted cumulation") {
    import spark.implicits._
    // Deterministic values with heavy ties; group "a" is large enough
    // to span several range partitions at 4 shuffle partitions.
    val rows = (0 until 997).map { i =>
      val g = if (i % 7 == 0) "b" else if (i == 13) "c" else "a"
      (g, (i * 37) % 50, s"t$i", (i % 5 + 1).toLong)
    }
    val df = rows.toDF("g", "v", "tb", "w")
    val w = Window.partitionBy(col("g")).orderBy(col("v"), col("tb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val expected = df
      .withColumn("cum", coalesce(sum(col("w")).over(w), lit(0L)))
      .select("g", "v", "tb", "w", "cum")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getLong(4))).sorted.toSeq
    val got = Ranks.distributedPrefixSum(df, "g", Seq("v", "tb"), "w", "cum")
      .select("g", "v", "tb", "w", "cum")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getLong(4))).sorted.toSeq
    assert(got == expected)
    // The public entry with an overflowed budget takes the same path.
    val auto = Ranks.groupedPrefixSum(df, "g", Seq("v", "tb"), "w", "cum",
        windowBudget = 1L)
      .select("g", "v", "tb", "w", "cum")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getLong(4))).sorted.toSeq
    assert(auto == expected)
  }

  test("the budget trigger actually MEASURES and routes: overflowed " +
      "budget plans without a Window, default budget plans with one") {
    import spark.implicits._
    // Regression (r18): the memoized trigger's map briefly used a Scala
    // Long value, whose null-on-miss unboxed to 0 — every call "hit" a
    // memoized max of 0 and the window path was pinned forever. Rows
    // stayed correct (the two paths are row-identical, the test above
    // can't see it), so this pins the ROUTE via the physical plan.
    val df = (0 until 100).map(i => (s"g${i % 3}", i, i.toLong))
      .toDF("g", "v", "w")
    def hasWindow(out: org.apache.spark.sql.DataFrame): Boolean =
      out.queryExecution.executedPlan.toString.contains("Window")
    assert(!hasWindow(Ranks.groupedPrefixSum(df, "g", Seq("v"), "w",
        "cum", windowBudget = 1L)),
      "a measured max-per-group of ~34 must overflow budget 1 and " +
        "take the distributed fallback (no Window operator)")
    assert(hasWindow(Ranks.groupedPrefixSum(df, "g", Seq("v"), "w",
        "cum")),
      "under the default budget the keyed window is the right plan")
    // And the memo serves the repeat call the same route.
    assert(!hasWindow(Ranks.groupedPrefixSum(df, "g", Seq("v"), "w",
        "cum", windowBudget = 1L)))
  }

  test("q211's Spearman plan returns identical rows across the swap " +
      "(budget forced below every source's cardinality)") {
    val dir = tmpDir()
    import spark.implicits._
    // 60 docs over 3 sources with deliberate ties in n_chars AND in
    // the distinct-word count (the doc_id tiebreak must decide).
    val docs = (0 until 60).map { i =>
      val words = (0 to (i % 7)).map(j => s"w${(i + j) % 9}")
      (i.toLong, s"src${i % 3}", words.mkString(" "),
        ((i % 11) * 10).toLong)
    }
    docs.toDF("doc_id", "source", "text", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def rowsOf(budget: Long) =
      WarehouseQueries.q211Plan(spark, dir, budget)
        .collect().map(_.toSeq).toSeq
    assert(rowsOf(1L) == rowsOf(Ranks.DefaultWindowBudget),
      "the distributed rank must reproduce the window's Spearman rows")
  }

  test("q250's Mann-Whitney plan returns identical rows across the " +
      "swap (budget forced below every pair's value-distinct count)") {
    val dir = tmpDir()
    import spark.implicits._
    val types = Seq("click", "error", "signup", "view", "purchase")
    val events = (0 until 400).map { i =>
      (i.toLong, Timestamp.valueOf(f"2024-01-${i % 28 + 1}%02d 00:00:00"),
        (i % 13).toLong, types(i % types.length),
        ((i * 31) % 40).toDouble / 4.0)
    }
    events.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    def rowsOf(budget: Long) =
      WarehouseQueries.q250Plan(spark, dir, budget)
        .collect().map(_.toSeq).toSeq
    assert(rowsOf(1L) == rowsOf(Ranks.DefaultWindowBudget),
      "the distributed cumulation must reproduce the window's U rows")
  }
}
