package graft.store

import graft.SparkSpec
import graft.model.EmbeddedChunk
import java.nio.file.Files
import org.apache.spark.sql.{Dataset, Encoders}

/** The snapshot commit protocol on OBJECT-STORE semantics — the claim
  * the local-fs certificates (q244/q246) cannot make: on a filesystem
  * whose rename is a non-atomic copy+delete ([[ObjectStoreFs]], the S3
  * model), the manifest CAS must be a conditional CREATE, racing
  * writers must still get one winner per version slot with losers
  * rebasing, and NO step of the commit path may rename into a slot
  * (any such rename could be observed torn).
  */
class SnapshotObjectStoreSpec extends SparkSpec {

  private def objRoot(): String = {
    spark.sparkContext.hadoopConfiguration.set(
      "fs.objfs.impl", classOf[ObjectStoreFs].getName)
    "objfs://" + Files.createTempDirectory("graft-objfs").toString
  }

  private def chunksOf(tag: String,
      ids: (String, Int)*): Dataset[EmbeddedChunk] = {
    val rows = ids.flatMap { case (d, n) =>
      (0 until n).map(i => EmbeddedChunk(s"$d:$tag$i",
        Array(1.0f, 0.25f * i), s"$d/$tag/$i", "ctx", d))
    }
    spark.createDataset(rows)(Encoders.product[EmbeddedChunk])
  }

  private def keysOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select("key").collect().map(_.getString(0)).sorted.toSeq

  test("racing writers on copy+delete-rename semantics: one winner per " +
      "slot, losers rebase, no torn manifest, zero slot renames") {
    val st = new SnapshotStore(spark, objRoot(), 4)
    ObjectStoreFs.slotRenames.set(0)
    st.upsert(chunksOf("a", "d0" -> 2), "c")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val writers = (1 to 6).map { i =>
      Future(st.upsert(chunksOf("w", s"w$i" -> 1), "c"))
    }
    Await.result(Future.sequence(writers), 120.seconds)
    assert(st.versions("c") == (1L to 7L),
      "7 commits must land 7 contiguous versions on object-store semantics")
    // Every manifest parses whole and chains to its parent — a torn
    // (partially-PUT) manifest would fail the parse or the chain.
    (1L to 7L).foreach { v =>
      val m = st.readManifestJson("c", v)
      assert(m.version == v && m.parent == v - 1,
        s"manifest v$v must parse whole and chain to v${v - 1}")
    }
    val keys = keysOf(st.read("c"))
    (1 to 6).foreach(i => assert(keys.contains(s"w$i:w0"),
      s"writer $i's batch must survive the race"))
    assert(ObjectStoreFs.slotRenames.get == 0,
      "the commit path must NEVER rename into a manifest slot on an " +
        "object store — rename there is copy+delete and can be seen torn")
  }

  test("racing compactions and upserts on object-store semantics: one " +
      "base per manifest, no torn state, all batches survive") {
    val st = new SnapshotStore(spark, objRoot(), 4)
    st.upsert(chunksOf("a", "d1" -> 2, "d2" -> 2), "c")
    st.upsert(chunksOf("b", "d2" -> 1), "c")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val racers = Seq(
      Future(st.compact("c")).map(_ => ()),
      Future(st.compact("c")).map(_ => ()),
      Future(st.upsert(chunksOf("r", "d9" -> 1), "c")))
    Await.result(Future.sequence(racers), 180.seconds)
    st.versions("c").foreach { v =>
      assert(st.readManifestJson("c", v).entries
          .count(_.kind == "base") <= 1,
        s"manifest v$v carries two bases on object-store semantics")
    }
    val keys = keysOf(st.read("c"))
    assert(keys.contains("d9:r0"), s"racing upsert lost: $keys")
    assert(keys.filter(_.startsWith("d2")) == Seq("d2:b0"),
      s"replace semantics broke under the race: $keys")
  }

  test("vacuum on object-store semantics: aged-out and mid-sweep-torn " +
      "versions fail LOUDLY (manifests go first, so no fresh reader can " +
      "pin torn data); retained readers racing the sweep get full rows") {
    val root = objRoot()
    val st = new SnapshotStore(spark, root, 4)
    import org.apache.spark.sql.Encoders
    // ≥2 parquet objects in v1's base dir, so a mid-sweep state can be
    // a STRICT subset of the version's files — the torn shape a
    // per-object, non-atomic object-store sweep actually leaves.
    st.upsert(chunksOf("a", "d1" -> 2, "d2" -> 2).repartition(2)
      .as[EmbeddedChunk](Encoders.product[EmbeddedChunk]), "c")  // v1
    st.upsert(chunksOf("b", "d2" -> 1), "c")                     // v2
    st.compact("c")                                              // v3
    val v1Files = st.liveDataFiles("c", 1L)
    assert(v1Files.size >= 2, s"need ≥2 v1 objects, got $v1Files")
    // In-flight readers: plans built (manifest read, file set pinned)
    // BEFORE anything is deleted.
    val inFlightV1 = st.readAt("c", 1L)
    val inFlightV2 = st.readAt("c", 2L)
    val retainedInFlight = st.readAt("c", 3L)
    // Model a vacuum(retain=1) CRASHED MID-SWEEP, exactly in protocol
    // order: both aged manifests deleted first (each a single-object
    // delete), then the data sweep dies after removing ONE of v1's
    // base objects. Deletes go through the raw local dir backing the
    // objfs shim — per-object, like S3.
    val local = root.stripPrefix("objfs://")
    java.nio.file.Files.delete(java.nio.file.Paths.get(
      s"$local/c/_snapshots/v00000001.json"))
    java.nio.file.Files.delete(java.nio.file.Paths.get(
      s"$local/c/_snapshots/v00000002.json"))
    java.nio.file.Files.delete(java.nio.file.Paths.get(
      s"$local/c/${v1Files.head}"))
    // Fresh readers of the torn versions CANNOT pin the surviving
    // subset: the manifest is gone, so the read refuses up front —
    // manifests-before-data is what makes the non-atomic sweep safe.
    Seq(1L, 2L).foreach { v =>
      val e = intercept[IllegalArgumentException](st.readAt("c", v))
      assert(e.getMessage.contains("vacuumed") ||
        e.getMessage.contains("does not exist"),
        s"fresh readAt($v) of a torn version must refuse loudly")
    }
    // In-flight readers fail LOUDLY at materialization — the pinned
    // file set surfaces the missing object; never the surviving rows.
    Seq(inFlightV1, inFlightV2).foreach { df =>
      val e = intercept[Throwable](df.collect())
      val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .map(t => s"${t.getClass.getName}: ${t.getMessage}")
        .mkString(" | ").toLowerCase
      assert(Seq("filenotfound", "file_not_exist", "does not exist",
          "no such file").exists(chain.contains),
        s"a torn-version read must surface the missing object, got: $chain")
    }
    // Retained readers RACING the real (completing) sweep: vacuum only
    // deletes dirs no kept manifest references, so every concurrent
    // read of the retained version returns the full 3 rows — defined
    // read-through, never partial.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val readers = (1 to 4).map(_ => Future(st.read("c").count()))
    val sweep = Future(st.vacuum("c", retainLast = 1, minAgeMs = 0L))
    val counts = Await.result(Future.sequence(readers), 120.seconds)
    Await.result(sweep, 120.seconds)
    assert(counts.forall(_ == 3L),
      s"retained readers racing the sweep saw partial rows: $counts")
    assert(retainedInFlight.count() == 3L,
      "the pre-sweep retained plan reads full rows after the sweep")
  }

  test("delete, compact and time travel hold on object-store semantics") {
    val st = new SnapshotStore(spark, objRoot(), 4)
    st.upsert(chunksOf("a", "d1" -> 2, "d2" -> 2), "c") // v1
    st.upsert(chunksOf("b", "d2" -> 1), "c")            // v2
    st.delete("c", Seq("d1"))                           // v3
    val preCompact = keysOf(st.read("c"))
    st.compact("c")                                     // v4
    assert(st.versions("c") == Seq(1L, 2L, 3L, 4L))
    assert(keysOf(st.read("c")) == preCompact,
      "compaction must not change content on object-store semantics")
    assert(keysOf(st.readAt("c", 1L)) ==
      Seq("d1:a0", "d1:a1", "d2:a0", "d2:a1"),
      "v1 must still read exactly as committed")
  }
}
