package graft.operators

import graft.SparkSpec
import graft.queries.WarehouseQueries
import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.DataFrame

/** Hand-computed fixtures for the round-16 statistics trio —
  * q248 Kaplan-Meier (censoring conventions + the integer survival
  * recurrence), q249 t-closeness (EMD ground cases), q250 Mann-Whitney
  * (tie handling + effect-size extremes). Each case writes a tiny
  * synthetic table and drives the QUERY itself (the exact plan the
  * oracle gates), not a reimplementation.
  */
class SurvivalStatsSpec extends SparkSpec {

  private def ts(day: Int, hour: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-${day + 1}%02d $hour%02d:00:00")

  /** Write an events.parquet with the testdata schema. */
  private def eventsDir(
      rows: Seq[(Long, Timestamp, Long, String, Double)]): String = {
    val dir = Files.createTempDirectory("stats-ev").toString
    import spark.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", org.apache.spark.sql.functions.lit("{}"))
      .write.parquet(s"$dir/events.parquet")
    dir
  }

  private def km(dir: String): Seq[(Int, Long, Long, Long, Long)] =
    WarehouseQueries.queries("q248_kaplan_meier")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq

  test("q248 KM: no censoring — survival is the empirical survivor " +
      "function, stepwise") {
    // 4 users sign up day 0; purchases at days 0, 1, 1, 2.
    val dir = eventsDir(
      (0L until 4L).map(u => (u, ts(0), u, "signup", 1.0)) ++
        Seq((10L, ts(0, 1), 0L, "purchase", 1.0),
          (11L, ts(1), 1L, "purchase", 1.0),
          (12L, ts(1), 2L, "purchase", 1.0),
          (13L, ts(2), 3L, "purchase", 1.0)))
    // t=0: n=4,d=1 -> 750000; t=1: n=3,d=2 -> x1/3 = 250000;
    // t=2: n=1,d=1 -> 0.
    assert(km(dir) == Seq((0, 4L, 1L, 0L, 750000L),
      (1, 3L, 2L, 0L, 250000L), (2, 1L, 1L, 0L, 0L)))
  }

  test("q248 KM: everyone censored — survival never drops") {
    val dir = eventsDir(
      (0L until 3L).map(u => (u, ts(0), u, "signup", 1.0)))
    assert(km(dir) == Seq((2, 3L, 0L, 3L, 1000000L)))
  }

  test("q248 KM: mixed events and censoring at the horizon — the " +
      "censored stay in the risk set, and a post-horizon purchase IS " +
      "a censoring") {
    // A buys day 0; D buys day 1; B buys day 3 (past the 2-day
    // horizon -> administratively censored); C never buys.
    val dir = eventsDir(Seq(
      (0L, ts(0), 1L, "signup", 1.0), (1L, ts(0), 2L, "signup", 1.0),
      (2L, ts(0), 3L, "signup", 1.0), (3L, ts(0), 4L, "signup", 1.0),
      (10L, ts(0, 2), 1L, "purchase", 1.0),
      (11L, ts(3), 2L, "purchase", 1.0),
      (12L, ts(1), 4L, "purchase", 1.0),
      (13L, ts(5), 3L, "view", 1.0)))
    assert(km(dir) == Seq((0, 4L, 1L, 0L, 750000L),
      (1, 3L, 1L, 0L, 500000L), (2, 2L, 0L, 2L, 500000L)))
  }

  test("q249 t-closeness: identical group distributions score EMD 0; " +
      "a concentrated group scores its exact hand-computed distance") {
    import spark.implicits._
    def run(rows: Seq[(Long, String, Double)]) = {
      val dir = Files.createTempDirectory("stats-cust").toString
      rows.toDF("c_nationkey", "c_mktsegment", "c_acctbal")
        .write.parquet(s"$dir/customer.parquet")
      WarehouseQueries.queries("q249_t_closeness")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3),
          r.getBoolean(4))).toSeq
    }
    // Ground case: every group shares one distribution -> global is
    // that distribution -> every EMD is exactly 0.
    val uniform = for (g <- 0L until 3L; i <- 0 until 10) yield
      (g, "A", if (i < 5) 500.0 else 1500.0)
    assert(run(uniform).forall(_._3 == 0L))
    // Skewed case: A and C split 5/5, B sits entirely in band 0.
    // Global m=(20,10), M=30. B: A_0 = 10·30 − 20·10 = 100 ->
    // emd_e6 = 1e6·100/(10·30·1) = 333333. A (and C): n=(5,5) ->
    // A_0 = 5·30 − 20·10 = −50 -> 1e6·50/300 = 166666 (B's skew
    // SHIFTS THE GLOBAL, so no 5/5 group can sit at zero — the
    // reference distribution is the table's, not a platonic one).
    val out = run(
      (0 until 10).map(i => (0L, "A", if (i < 5) 500.0 else 1500.0)) ++
        (0 until 10).map(_ => (1L, "B", 500.0)) ++
        (0 until 10).map(i => (2L, "C", if (i < 5) 500.0 else 1500.0)))
    val byKey = out.map(t => (t._1, t._2) -> (t._3, t._4)).toMap
    assert(byKey((0L, "A"))._1 == 166666L, s"5/5 group vs shifted: $out")
    assert(byKey((2L, "C"))._1 == 166666L)
    assert(byKey((1L, "B"))._1 == 333333L, s"concentrated group: $out")
    // Worst quartile: 3 groups -> r*4 <= 3 never holds (quartile is
    // empty below 4 groups) — the flag must be all-false, not arbitrary.
    assert(out.forall(!_._4))
  }

  test("q250 Mann-Whitney: identical samples give zero effect, total " +
      "separation gives ±1e6, and ties average exactly") {
    // click == purchase values (identical): rb 0.
    // error all ABOVE purchase: rb +1e6. view all BELOW: rb -1e6.
    // signup: all values tie with purchase at 5.0 -> rb 0 via the
    // tie-averaged ranks.
    // ONE purchase cohort (1, 2, 3) serves every pair.
    val pv = Seq(1.0, 2.0, 3.0)
    val rows =
      pv.zipWithIndex.map { case (v, i) =>
        (100L + i, ts(0), 1L, "purchase", v) } ++
      pv.zipWithIndex.map { case (v, i) =>
        (200L + i, ts(0), 1L, "click", v) } ++
      Seq((300L, ts(0), 1L, "error", 10.0),
        (301L, ts(0), 1L, "error", 11.0)) ++
      Seq((400L, ts(0), 1L, "view", 0.1), (401L, ts(0), 1L, "view", 0.2)) ++
      Seq((500L, ts(0), 1L, "signup", 3.0), (501L, ts(0), 1L, "signup", 3.0))
    val dir = eventsDir(rows)
    val out = WarehouseQueries.queries("q250_mann_whitney")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("click")._4 == 0L, s"identical samples: ${out("click")}")
    assert(out("error")._4 == 1000000L, s"separated: ${out("error")}")
    assert(out("view")._4 == -1000000L, s"reversed: ${out("view")}")
    // signup (3.0, 3.0) vs purchases (1, 2, 3): the 3.0 tie run starts
    // after w0=2 rows with c=3 members -> each member's DOUBLED
    // average rank is 2w0+c+1 = 8; R2 = 2×8 = 16; U2 = 16 − n1(n1+1)
    // = 10 (each signup beats 2 purchases and half-wins the tied one:
    // U = 2×2.5 = 5); rb = (10−6)/6 -> 666666 truncated.
    assert(out("signup")._1 == 2L && out("signup")._2 == 3L)
    assert(out("signup")._3 == 10L && out("signup")._4 == 666666L,
      s"tie case: ${out("signup")}")
  }
}
