package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Pins the state bound of the q203 watermarked URL-dedup shape: a
  * canonical URL's state row survives only until the watermark passes
  * its event time + delay. Two controlled micro-batches drive the
  * watermark so both sides of the horizon trade-off are observable:
  * eviction (state rows removed once the horizon passes) and the
  * documented re-emit of a key that returns AFTER eviction.
  */
class UrlDedupWatermarkSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("dropDuplicatesWithinWatermark: 2-batch run evicts expired keys " +
      "and re-emits a key arriving after eviction") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, java.sql.Timestamp)]
    val deduped = mem.toDF().toDF("canon", "ts")
      .withWatermark("ts", "10 seconds")
      .dropDuplicatesWithinWatermark("canon")
      .select("canon")
    val q = deduped.writeStream
      .format("memory").queryName("url_wm_dedup")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // Batch 1: three keys, one duplicated within the horizon.
      mem.addData(("u1", ts(100)), ("u2", ts(101)), ("u1", ts(102)),
        ("u3", ts(103)))
      q.processAllAvailable()
      val p1 = q.lastProgress.stateOperators.head
      // The in-horizon duplicate was dropped, not re-emitted...
      assert(spark.table("url_wm_dedup").as[String].collect().sorted.toSeq ==
        Seq("u1", "u2", "u3"))
      // ...and state holds exactly the distinct keys (the bound).
      assert(p1.numRowsTotal == 3L, s"state after batch 1: $p1")

      // Batch 2: event time jumps far past the horizon — the watermark
      // moves to 1000−10 s AFTER this batch, so batch-1 keys are evicted
      // at its end (eviction always runs one batch behind the data that
      // advanced the watermark).
      mem.addData(("u4", ts(1000)))
      q.processAllAvailable()
      // Batch 3: u1 RETURNS — its state row was evicted at the end of
      // batch 2 (expiry 102+10 s ≪ watermark 990 s), so it re-emits.
      mem.addData(("u1", ts(1001)), ("u5", ts(1002)))
      q.processAllAvailable()
      val p2 = q.lastProgress.stateOperators.head
      // Batch-1 keys (event time ~100 s) are GONE from the state store:
      // only the keys within the current horizon remain.
      assert(p2.numRowsTotal <= 3L,
        s"expired keys were not evicted: $p2")
      // The horizon trade-off, observable: u1 re-emitted after eviction.
      val out = spark.table("url_wm_dedup").as[String].collect()
      assert(out.count(_ == "u1") == 2L,
        s"expected the post-eviction re-arrival of u1 to re-emit: " +
          out.sorted.mkString(","))
      assert(out.count(_ == "u4") == 1L && out.count(_ == "u5") == 1L)
    } finally q.stop()
  }
}
