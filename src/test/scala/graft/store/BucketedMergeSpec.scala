package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

class BucketedMergeSpec extends SparkSpec {
  import spark.implicits._

  private def state(dir: String): Map[Long, (Int, Long)] =
    BucketedMerge.read(spark, dir).collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Int]("version"), r.getAs[Long]("v"))).toMap

  private def bucketFiles(dir: String): Map[String, Set[(String, Long)]] =
    scala.util.Using.resource(Files.list(Paths.get(dir))) { outer =>
      outer.iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("bucket="))
        .map { p =>
          p.getFileName.toString ->
            scala.util.Using.resource(Files.list(p)) { inner =>
              inner.iterator().asScala
                .filter(_.getFileName.toString.endsWith(".parquet"))
                .map(f => (f.getFileName.toString,
                  Files.getLastModifiedTime(f).toMillis))
                .toSet
            }
        }.toMap
    }

  test("merge: upserts, inserts, deletes resolve to latest per key") {
    val dir = Files.createTempDirectory("graft-merge").toString
    val base = (0L until 100L).map(i => (i, 0, i * 10)).toDF("id", "version", "v")
    BucketedMerge.init(base, dir, "id", nBuckets = 8)

    val updates = Seq(
      (5L, 1, 999L, false),   // update
      (200L, 1, 1L, false),   // insert (new key)
      (7L, 1, 0L, true),      // delete
      (300L, 1, 0L, true)     // delete of absent key: no-op
    ).toDF("id", "version", "v", "del")
    BucketedMerge.merge(spark, dir, updates, "id", "version", 8,
      tombstoneCol = Some("del"))

    val s = state(dir)
    assert(s.size == 100) // 100 - 1 delete + 1 insert
    assert(s(5L) == (1, 999L))
    assert(s(200L) == (1, 1L))
    assert(!s.contains(7L))
    assert(s(6L) == (0, 60L)) // untouched key unchanged
  }

  test("merge rewrites only the touched buckets") {
    val dir = Files.createTempDirectory("graft-merge2").toString
    val base = (0L until 100L).map(i => (i, 0, i)).toDF("id", "version", "v")
    BucketedMerge.init(base, dir, "id", nBuckets = 8)
    val before = bucketFiles(dir)
    assert(before.size == 8)

    // one-row batch: exactly one bucket is touched
    Thread.sleep(20)
    BucketedMerge.merge(spark, dir,
      Seq((5L, 1, 999L)).toDF("id", "version", "v"), "id", "version", 8)
    val after = bucketFiles(dir)
    val changed = after.keySet.filter(b => before(b) != after(b))
    assert(changed.size == 1, s"buckets rewritten: $changed")
    // stale base version loses to the batch even on a later re-merge of
    // the same batch (idempotent)
    BucketedMerge.merge(spark, dir,
      Seq((5L, 1, 999L)).toDF("id", "version", "v"), "id", "version", 8)
    assert(state(dir)(5L) == (1, 999L))
  }

  test("deletes that empty a whole bucket remove it — no resurrection") {
    val dir = Files.createTempDirectory("graft-merge4").toString
    // one key alone in its bucket (4 buckets, single row)
    BucketedMerge.init(Seq((1L, 0, 10L)).toDF("id", "version", "v"),
      dir, "id", 4)
    assert(state(dir) == Map(1L -> (0, 10L)))
    BucketedMerge.merge(spark, dir,
      Seq((1L, 1, 0L, true)).toDF("id", "version", "v", "del"),
      "id", "version", 4, tombstoneCol = Some("del"))
    assert(state(dir).isEmpty, "tombstoned key must not survive via a stale bucket dir")
  }

  test("null tombstone means not-a-delete, not a silent drop") {
    val dir = Files.createTempDirectory("graft-merge5").toString
    BucketedMerge.init(Seq((1L, 0, 10L)).toDF("id", "version", "v"),
      dir, "id", 4)
    val upd = Seq((1L, 1, 20L)).toDF("id", "version", "v")
      .withColumn("del", lit(null).cast("boolean"))
    BucketedMerge.merge(spark, dir, upd, "id", "version", 4,
      tombstoneCol = Some("del"))
    assert(state(dir) == Map(1L -> (1, 20L)))
  }

  test("re-init fully rewrites: no stale buckets from an old layout") {
    val dir = Files.createTempDirectory("graft-merge6").toString
    BucketedMerge.init((0L until 50L).map(i => (i, 0, i)).toDF("id", "version", "v"),
      dir, "id", 16)
    BucketedMerge.init(Seq((7L, 0, 7L)).toDF("id", "version", "v"),
      dir, "id", 4)
    assert(state(dir) == Map(7L -> (0, 7L)))
  }

  test("streaming CDC: a change stream applies via foreachBatch merges") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-merge-cdc").toString
    BucketedMerge.init(
      (0L until 20L).map(i => (i, 0, i)).toDF("id", "version", "v"),
      dir, "id", 4)

    val mem = MemoryStream[(Long, Int, Long, Boolean)]
    val q = mem.toDF().toDF("id", "version", "v", "del")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        BucketedMerge.merge(spark, dir, batch, "id", "version", 4,
          tombstoneCol = Some("del"))
      }
      .outputMode("update").start()
    try {
      mem.addData((5L, 1, 500L, false), (20L, 1, 20L, false))
      q.processAllAvailable()
      mem.addData((5L, 2, 555L, false), (7L, 1, 0L, true))
      q.processAllAvailable()
      val s = state(dir)
      assert(s(5L) == (2, 555L)) // two successive stream updates applied
      assert(s(20L) == (1, 20L)) // stream insert
      assert(!s.contains(7L)) // stream delete
      assert(s(6L) == (0, 6L)) // untouched
      assert(s.size == 20)
    } finally q.stop()
  }

  test("randomized model check: 6 merge batches vs an in-memory reference") {
    val rnd = new scala.util.Random(37)
    val dir = Files.createTempDirectory("graft-merge-model").toString
    val model = scala.collection.mutable.Map.empty[Long, (Int, Long)]

    val base = (0L until 60L).map(i => (i, 0, rnd.nextInt(1000).toLong))
    base.foreach { case (id, ver, v) => model(id) = (ver, v) }
    BucketedMerge.init(base.toDF("id", "version", "v"), dir, "id", 8)

    for (round <- 1 to 6) {
      // random batch: updates, inserts, deletes — one distinct version
      // per key per batch (the operator's documented determinism duty)
      val keys = rnd.shuffle((0L until 80L).toList).take(12)
      val batch = keys.map { id =>
        (id, round, rnd.nextInt(1000).toLong, rnd.nextInt(4) == 0)
      }
      batch.foreach { case (id, ver, v, del) =>
        val newer = model.get(id).forall(_._1 <= ver)
        if (newer) { if (del) model.remove(id) else model(id) = (ver, v) }
      }
      BucketedMerge.merge(spark, dir,
        batch.toDF("id", "version", "v", "del"), "id", "version", 8,
        tombstoneCol = Some("del"))
      assert(state(dir) == model.toMap, s"diverged at merge round $round")
    }
  }

  test("older version in a batch does not clobber a newer base row") {
    val dir = Files.createTempDirectory("graft-merge3").toString
    BucketedMerge.init(Seq((1L, 5, 50L)).toDF("id", "version", "v"),
      dir, "id", 4)
    BucketedMerge.merge(spark, dir,
      Seq((1L, 3, 30L)).toDF("id", "version", "v"), "id", "version", 4)
    assert(state(dir)(1L) == (5, 50L))
  }
}
