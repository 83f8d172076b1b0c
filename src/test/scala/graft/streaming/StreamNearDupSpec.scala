package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class StreamNearDupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog " +
    "while rain falls softly on the quiet empty village square tonight"

  test("incremental filter: store blocks cross-batch dups, pair rule in-batch") {
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft-snd")
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val q = StreamNearDup.run(stream, "doc_id", "text",
      s"$tmp/store", s"$tmp/out", s"$tmp/ckpt",
      trigger = Trigger.ProcessingTime(0))
    try {
      mem.addData((1L, base), (2L, "completely different words about ships " +
        "and harbors and long voyages across cold northern seas at dawn"))
      q.processAllAvailable()
      val after1 = spark.read.parquet(s"$tmp/out")
        .select("doc_id").as[Long].collect().toSet
      assert(after1 == Set(1L, 2L))

      mem.addData(
        (3L, base),                      // exact dup of stored doc 1 -> drop
        (4L, "novel text on gardens where tomatoes and basil grow " +
          "beside old stone walls under warm september light each year"),
        (5L, "twin payload alpha beta gamma delta epsilon zeta eta theta " +
          "iota kappa lambda mu nu xi omicron pi rho sigma tau"),
        (6L, "twin payload alpha beta gamma delta epsilon zeta eta theta " +
          "iota kappa lambda mu nu xi omicron pi rho sigma tau")) // dup of 5
      q.processAllAvailable()
      val after2 = spark.read.parquet(s"$tmp/out")
        .select("doc_id").as[Long].collect().toSet
      assert(after2 == Set(1L, 2L, 4L, 5L),
        s"got $after2 — 3 must fall to the store, 6 to the in-batch pair rule")
      // the store tracks survivors only
      val stored = spark.read.parquet(s"$tmp/store/sigs")
        .select("id").as[Long].collect().toSet
      assert(stored == Set(1L, 2L, 4L, 5L))
    } finally q.stop()
  }

  test("filterBatch with empty store equals the one-shot pair rule") {
    val docs = Seq((10L, base), (11L, base + " extra"), (12L, "unrelated " +
      "chronicle of mountains rivers forests and the slow turning seasons " +
      "observed from a wooden cabin porch every single morning"))
      .toDF("doc_id", "text")
    val (survivors, sigs, buckets) =
      StreamNearDup.filterBatch(docs, "doc_id", "text", None)
    val ids = survivors.select("doc_id").as[Long].collect().toSet
    // 11 is a one-token extension of 10: shares nearly all shingles, so
    // the pair rule keeps the smaller id.
    assert(ids == Set(10L, 12L), ids)
    assert(sigs.select("id").as[Long].collect().toSet == Set(10L, 12L))
    assert(buckets.select("id").distinct().as[Long].collect().toSet ==
      Set(10L, 12L))
  }
}
