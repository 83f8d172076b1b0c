package graft.store

import graft.SparkSpec
import graft.model.EmbeddedChunk
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.{FileSystem, Path}

/** [[ChunkStore.commitSwap]] — the crash-safe rename-aside commit both
  * stores' `compact` publishes through. The property under test: at NO
  * intermediate point is the collection unrecoverable, and a FAILED
  * publish leaves the collection readable with its original content
  * (rolled back), not PATH_NOT_FOUND. The r15 shape (delete dir, then
  * rename tmp) failed exactly that: a crash between the two calls left
  * the collection path absent.
  */
class CommitSwapSpec extends SparkSpec {

  private def chunk(doc: Int, i: Int): EmbeddedChunk =
    EmbeddedChunk(s"d$doc:$i", Array(0.5f, 0.25f), s"content $doc $i",
      "ctx", s"d$doc")

  private def contentOf(vs: VectorStore, c: String): Seq[String] =
    vs.read(c).select(col("key"), col("content"), col("documentid"))
      .collect().map(_.toString).sorted.toSeq

  private def freshStore(): (VectorStore, String) = {
    val root = java.nio.file.Files
      .createTempDirectory("commitswap-spec").toString
    val vs = new VectorStore(spark, root)
    import spark.implicits._
    val rows = for (d <- 0 until 4; i <- 0 until 3) yield chunk(d, i)
    vs.upsert(rows.toDS().repartition(4), "c")
    (vs, root)
  }

  private def stageTmp(dir: String): String = {
    val tmp = dir + "__compact_tmp"
    spark.read.parquet(dir).repartition(col("documentid"))
      .write.partitionBy("documentid").mode("overwrite").parquet(tmp)
    tmp
  }

  test("failed publish rename rolls the original data back into place") {
    val (vs, root) = freshStore()
    val dir = s"$root/c"
    val original = contentOf(vs, "c")
    val tmp = stageTmp(dir)
    // Injected failure: the rename-aside (step 1) succeeds, the
    // publish (step 2) reports failure — the mid-commit crash window.
    var calls = 0
    val failingPublish = (fs: FileSystem, a: Path, b: Path) => {
      calls += 1
      if (calls == 2) false else fs.rename(a, b)
    }
    val e = intercept[IllegalStateException] {
      ChunkStore.commitSwap(spark, dir, tmp, failingPublish)
    }
    assert(e.getMessage.contains("previous data restored"))
    // The collection is READABLE with its original content — no
    // PATH_NOT_FOUND, no manual recovery from a tmp dir.
    assert(contentOf(vs, "c") == original,
      "rolled-back collection content differs from the original")
    // The staged rewrite is still on disk for inspection/retry.
    val fs = FileSystem.get(new java.net.URI(dir),
      spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new Path(tmp)), "staged tmp was destroyed")
    assert(!fs.exists(new Path(dir + "__compact_old")),
      "rollback left the aside copy behind")
  }

  test("throwing publish rename also rolls back") {
    val (vs, root) = freshStore()
    val dir = s"$root/c"
    val original = contentOf(vs, "c")
    val tmp = stageTmp(dir)
    var calls = 0
    val throwingPublish = (fs: FileSystem, a: Path, b: Path) => {
      calls += 1
      if (calls == 2) throw new java.io.IOException("injected crash")
      fs.rename(a, b)
    }
    intercept[java.io.IOException] {
      ChunkStore.commitSwap(spark, dir, tmp, throwingPublish)
    }
    assert(contentOf(vs, "c") == original,
      "rolled-back collection content differs from the original")
  }

  test("stale __compact_old from a prior crash-after-publish is cleared") {
    val (vs, root) = freshStore()
    val dir = s"$root/c"
    val original = contentOf(vs, "c")
    // Simulate the post-publish crash residue: a garbage aside copy.
    val fs = FileSystem.get(new java.net.URI(dir),
      spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(dir + "__compact_old/garbage"))
    val tmp = stageTmp(dir)
    ChunkStore.commitSwap(spark, dir, tmp)
    assert(contentOf(vs, "c") == original,
      "commit over stale residue changed content")
    assert(!fs.exists(new Path(dir + "__compact_old")),
      "successful commit left the aside copy behind")
    assert(!fs.exists(new Path(tmp)), "successful commit left tmp behind")
  }

  test("both stores' compact leave no residue and keep content") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("commitswap-both").toString
    val fs = FileSystem.get(new java.net.URI(root),
      spark.sparkContext.hadoopConfiguration)
    val rows = for (d <- 0 until 5; i <- 0 until 3) yield chunk(d, i)
    Seq(new VectorStore(spark, s"$root/doc"): ChunkStore,
        new BucketedVectorStore(spark, s"$root/bkt", nBuckets = 4))
      .foreach { store =>
        store.upsert(rows.toDS().repartition(4), "c")
        val before = store.read("c")
          .select(col("key"), col("content"), col("documentid"))
          .collect().map(_.toString).sorted.toSeq
        val (b, a) = store.compact("c")
        assert(a <= b, s"compact grew the census ($b -> $a)")
        val after = store.read("c")
          .select(col("key"), col("content"), col("documentid"))
          .collect().map(_.toString).sorted.toSeq
        assert(after == before, "compact changed reader-visible content")
      }
    val residue = fs.listStatus(new Path(s"$root/doc")).map(_.getPath.getName) ++
      fs.listStatus(new Path(s"$root/bkt")).map(_.getPath.getName)
    assert(residue.toSet == Set("c"),
      s"compact left residue directories: ${residue.mkString(",")}")
  }
}
