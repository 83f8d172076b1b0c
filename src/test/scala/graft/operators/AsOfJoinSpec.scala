package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.sql.Timestamp

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // quotes: (sym, ts, px); trades: (trade_id, sym, ts)
  private lazy val quotes = Seq(
    ("A", ts("2026-01-01 10:00:00"), 1.0),
    ("A", ts("2026-01-01 10:05:00"), 2.0),
    ("A", ts("2026-01-01 10:10:00"), 3.0),
    ("B", ts("2026-01-01 10:07:00"), 9.0)
  ).toDF("sym", "t", "px")

  private lazy val trades = Seq(
    (1L, "A", ts("2026-01-01 10:04:59")), // between q1 and q2 -> 1.0
    (2L, "A", ts("2026-01-01 10:05:00")), // exact tie -> 2.0 (inclusive)
    (3L, "A", ts("2026-01-01 10:30:00")), // after all -> 3.0
    (4L, "B", ts("2026-01-01 10:00:00")), // before any B quote -> null
    (5L, "C", ts("2026-01-01 12:00:00"))  // key with no quotes -> null
  ).toDF("trade_id", "sym", "t")

  private def run(tolMs: Option[Long] = None): Map[Long, Option[Double]] =
    AsOfJoin.backward(trades, quotes, Seq("sym"), "t", Seq("px"), tolMs)
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap

  test("backward as-of: latest quote at or before each trade, else null") {
    assert(run() == Map(1L -> Some(1.0), 2L -> Some(2.0), 3L -> Some(3.0),
      4L -> None, 5L -> None))
  }

  test("tolerance drops stale matches") {
    // trade 3 is 20 min after the last A quote; 10-minute tolerance nulls it.
    assert(run(Some(10 * 60 * 1000L)) ==
      Map(1L -> Some(1.0), 2L -> Some(2.0), 3L -> None, 4L -> None, 5L -> None))
  }

  test("equal-timestamp right rows resolve deterministically to max payload") {
    val dupQuotes = quotes.unionAll(
      Seq(("A", ts("2026-01-01 10:05:00"), 2.5)).toDF("sym", "t", "px"))
    val out = AsOfJoin.backward(trades, dupQuotes, Seq("sym"), "t", Seq("px"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    // (rts, px) struct ordering: 2.5 > 2.0 at the same timestamp.
    assert(out(2L) == Some(2.5))
  }

  test("payload name collisions are rejected") {
    intercept[IllegalArgumentException] {
      AsOfJoin.backward(trades, quotes.withColumnRenamed("px", "sym2")
        .withColumnRenamed("sym2", "trade_id"), Seq("sym"), "t", Seq("trade_id"))
    }
  }

  test("randomized: agrees with the brute-force O(n^2) definition") {
    val rnd = new scala.util.Random(23)
    val keys = Seq("A", "B", "C")
    val rights = (1 to 120).map { i =>
      (keys(rnd.nextInt(3)), new Timestamp(rnd.nextInt(100000) * 1000L),
        i.toDouble)
    }
    val lefts = (1 to 150).map { i =>
      (i.toLong, keys(rnd.nextInt(3)),
        new Timestamp(rnd.nextInt(100000) * 1000L))
    }
    val out = AsOfJoin.backward(
        lefts.toDF("trade_id", "sym", "t"),
        rights.toDF("sym", "t", "px"), Seq("sym"), "t", Seq("px"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None
        else Some(r.getDouble(3)))).toMap
    // brute force: max (ts, px) among rights at-or-before, per key
    lefts.foreach { case (id, k, t) =>
      val expected = rights.filter(r => r._1 == k && !r._2.after(t))
        .sortBy(r => (r._2.getTime, r._3)).lastOption.map(_._3)
      assert(out(id) == expected, s"trade $id key $k ts $t")
    }
  }

  test("single shuffle plan: no join operator, one window") {
    val plan = AsOfJoin.backward(trades, quotes, Seq("sym"), "t", Seq("px"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("join"), plan)
  }
}
