package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exponential time-decay aggregates (q196 surface): exact bucketed
  * weights, the future-clamp, the 20-half-life horizon, and anchor
  * reproducibility.
  */
class DecaySpec extends SparkSpec {
  import spark.implicits._

  private val H = 100L // half-life seconds for the fixture
  private val AsOf = 10000L

  private def ts(epoch: Long) =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(epoch))

  test("timeDecayed: hand-computed bucket weights, clamp, and horizon") {
    // ages: 0 (k=0, w=1e6), 150 (k=1, w=5e5), 250 (k=2, w=25e4),
    // -50 future (clamp k=0, w=1e6), 9999*H ancient (w=0).
    val rows = Seq(
      ("a", ts(10000L), 2.0), ("a", ts(9850L), 4.0),
      ("a", ts(9750L), 8.0), ("a", ts(10050L), 1.0),
      ("a", ts(10000L - 9999L * H), 100.0))
    val out = Decay.timeDecayed(rows.toDF("g", "ts", "v"), "g",
      col("ts"), col("v"), AsOf, H).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_events") == 5L)
    // 1e6 + 5e5 + 25e4 + 1e6 + 0
    assert(r.getAs[Long]("decayed_n_e6") == 2750000L)
    // 1e6·200 + 5e5·400 + 25e4·800 + 1e6·100 + 0·10000
    assert(r.getAs[Long]("decayed_value_e8") == 700000000L)
    assert(r.getAs[Long]("recency_e4") == 2750000L / 500L)
  }

  test("timeDecayed: partition-invariant and per-group independent") {
    val rows = (0L until 300L).map(i =>
      (s"g${i % 3}", ts(10000L - i * 37L), (i % 10).toDouble))
    val df = rows.toDF("g", "ts", "v")
    val a = Decay.timeDecayed(df, "g", col("ts"), col("v"), AsOf, H)
      .orderBy("g").collect().toSeq
    val b = Decay.timeDecayed(df.repartition(17), "g", col("ts"),
      col("v"), AsOf, H).orderBy("g").collect().toSeq
    assert(a == b)
    assert(a.map(_.getString(0)) == Seq("g0", "g1", "g2"))
  }
}
