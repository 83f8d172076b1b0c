package graft.store

import graft.SparkSpec
import graft.model.EmbeddedChunk
import org.apache.spark.sql.functions._

class BucketedVectorStoreSpec extends SparkSpec {
  import spark.implicits._

  private def mk(key: String, content: String, doc: String) =
    EmbeddedChunk(key, Array(0.1f, 0.2f), content, "ctx", doc)

  private def tmpRoot() =
    java.nio.file.Files.createTempDirectory("bvs-spec").toString

  test("upsert + read round-trips chunks; bucket column is layout only") {
    val vs = new BucketedVectorStore(spark, tmpRoot(), nBuckets = 4)
    val chunks = Seq(mk("a:0", "alpha", "a"), mk("a:1", "beta", "a"),
      mk("b:0", "gamma", "b")).toDS()
    vs.upsert(chunks, "c")
    val back = vs.read("c")
    assert(back.columns.sorted.toSeq ==
      Seq("content", "context", "documentid", "embedding", "key"))
    assert(back.select("key", "content").as[(String, String)].collect()
      .sorted.toSeq == Seq(("a:0", "alpha"), ("a:1", "beta"), ("b:0", "gamma")))
  }

  test("replace-by-document: a re-ingested document with FEWER chunks " +
      "leaves no orphans; other documents untouched") {
    val vs = new BucketedVectorStore(spark, tmpRoot(), nBuckets = 4)
    vs.upsert(Seq(mk("a:0", "a0", "a"), mk("a:1", "a1", "a"),
      mk("a:2", "a2", "a"), mk("b:0", "b0", "b")).toDS(), "c")
    vs.upsert(Seq(mk("a:r0", "A0-new", "a")).toDS(), "c")
    val back = vs.read("c").select("key", "content")
      .as[(String, String)].collect().sorted.toSeq
    assert(back == Seq(("a:r0", "A0-new"), ("b:0", "b0")))
  }

  test("upsert prunes to touched buckets: an untouched bucket's files " +
      "are not rewritten") {
    val root = tmpRoot()
    val vs = new BucketedVectorStore(spark, root, nBuckets = 8)
    // Two documents in provably different buckets.
    val d1 = "doc-one"
    val d2 = (1 to 50).map(i => s"doc-$i").find { d =>
      spark.range(1).select(BucketedMerge.bucketOf(lit(d), 8)).head.getInt(0) !=
        spark.range(1).select(BucketedMerge.bucketOf(lit(d1), 8)).head.getInt(0)
    }.get
    vs.upsert(Seq(mk("1:0", "one", d1), mk("2:0", "two", d2)).toDS(), "c")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    def filesOf(doc: String): Set[(String, Long)] = {
      val b = spark.range(1).select(BucketedMerge.bucketOf(lit(doc), 8))
        .head.getInt(0)
      val p = new org.apache.hadoop.fs.Path(s"$root/c/bucket=$b")
      fs.listStatus(p).map(f => (f.getPath.getName, f.getModificationTime))
        .toSet
    }
    val d2Before = filesOf(d2)
    vs.upsert(Seq(mk("1:1", "one-more", d1)).toDS(), "c")
    assert(filesOf(d2) == d2Before,
      "untouched bucket was rewritten by a pruned merge")
    // Replace-by-document: the second batch replaced d1 wholesale.
    assert(vs.read("c").select("key").as[String].collect().sorted.toSeq ==
      Seq("1:1", "2:0"))
  }

  test("readDocument: point read prunes to ONE bucket at the FileIndex " +
      "level and returns exactly the document's chunks") {
    val vs = new BucketedVectorStore(spark, tmpRoot(), nBuckets = 8)
    vs.upsert((0 until 32).map(i => mk(s"d$i:0", s"c$i", s"d$i")).toDS(), "c")
    val q = vs.readDocument("c", "d7")
    assert(q.select("key", "content").as[(String, String)].collect()
      .toSeq == Seq(("d7:0", "c7")))
    // Physical pruning proof (the q162 discipline): the scan must carry
    // a bucket partition filter, and the FileIndex must list exactly
    // one partition directory under it.
    val scans = q.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty, q.queryExecution.sparkPlan.toString)
    val scan = scans.head
    assert(scan.partitionFilters
      .exists(_.references.exists(_.name == BucketedMerge.BucketCol)))
    val pruned = scan.relation.location
      .listFiles(scan.partitionFilters, Nil).length
    val all = scan.relation.location.listFiles(Nil, Nil).length
    assert(pruned == 1 && all > 1, s"pruned=$pruned all=$all")
  }

  test("compactFragmented: rewrites ONLY over-threshold buckets; " +
      "untouched buckets' files survive byte-identical; content intact") {
    val root = tmpRoot()
    val vs = new BucketedVectorStore(spark, root, nBuckets = 4)
    // Several merge batches fragment the touched buckets.
    for (step <- 0 until 5)
      vs.upsert((0 until 8).map(i =>
        mk(s"d$i:$step", s"c$i-$step", s"d$i")).toDS(), "c")
    val counts = vs.bucketFileCounts("c")
    assert(counts.values.exists(_ > 2), s"fixture not fragmented: $counts")
    // Pick a threshold that splits the buckets into both classes if
    // possible; otherwise compact everything over 2.
    val thr = 2
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    def filesOf(b: Int): Set[(String, Long)] = {
      val p = new org.apache.hadoop.fs.Path(s"$root/c/bucket=$b")
      if (!fs.exists(p)) Set.empty
      else fs.listStatus(p)
        .map(f => (f.getPath.getName, f.getModificationTime)).toSet
    }
    val untouched = counts.filter(_._2 <= thr).keys.toSeq
    val untouchedBefore = untouched.map(b => b -> filesOf(b)).toMap
    val contentBefore = vs.read("c").select("key", "content")
      .as[(String, String)].collect().sorted.toSeq
    val (nRewritten, before, after) = vs.compactFragmented("c", thr)
    assert(nRewritten == counts.count(_._2 > thr))
    assert(after < before, s"census did not shrink: $before -> $after")
    assert(vs.bucketFileCounts("c").filter(k => !untouched.contains(k._1))
      .values.forall(_ == 1), "rewritten buckets must hold one file")
    untouched.foreach { b =>
      assert(filesOf(b) == untouchedBefore(b),
        s"untouched bucket $b was rewritten")
    }
    val contentAfter = vs.read("c").select("key", "content")
      .as[(String, String)].collect().sorted.toSeq
    assert(contentAfter == contentBefore)
    // Idempotent: a second pass finds nothing to do.
    val (n2, b2, a2) = vs.compactFragmented("c", thr)
    assert(n2 == 0 && b2 == a2)
  }

  test("model-based property sweep: random upsert/compact sequences " +
      "match an in-memory replace-by-document model (seeded)") {
    // The storage layer's whole contract in one sweep: after ANY
    // sequence of upserts (random doc subsets, random chunk counts,
    // re-ingests shrinking/growing documents) interleaved with
    // compactions, the store content equals a trivial Map[doc ->
    // chunks] model applying replace-by-document. Seeded => repeatable.
    val rnd = new scala.util.Random(20250815L)
    val vs = new BucketedVectorStore(spark, tmpRoot(), nBuckets = 4)
    val model = scala.collection.mutable.Map.empty[String, Seq[(String, String)]]
    for (step <- 1 to 6) {
      val docs = rnd.shuffle((0 until 12).toList).take(1 + rnd.nextInt(6))
        .map(i => s"d$i")
      val batch = docs.flatMap { d =>
        val n = 1 + rnd.nextInt(3)
        (0 until n).map(ci => (s"$d:$step:$ci", s"content-$d-$step-$ci", d))
      }
      vs.upsert(batch.map { case (k, c, d) => mk(k, c, d) }.toDS(), "c")
      docs.foreach { d =>
        model(d) = batch.filter(_._3 == d).map(t => (t._1, t._2))
      }
      if (step % 3 == 0) {
        val (_, after) = vs.compact("c")
        assert(after <= 4, s"census $after exceeds nBuckets after compact")
      }
      val got = vs.read("c").select("key", "content")
        .as[(String, String)].collect().sorted.toSeq
      val want = model.values.flatten.toSeq.sorted
      assert(got == want, s"step $step: store diverged from model\n" +
        s"got:  ${got.take(8)}...\nwant: ${want.take(8)}...")
    }
  }

  test("compact: census shrinks to <= nBuckets and content is unchanged") {
    val vs = new BucketedVectorStore(spark, tmpRoot(), nBuckets = 4)
    // Several merge batches so buckets accumulate multiple files.
    vs.upsert((0 until 8).map(i => mk(s"d$i:0", s"c$i", s"d$i")).toDS(), "c")
    vs.upsert((8 until 16).map(i => mk(s"d$i:0", s"c$i", s"d$i")).toDS(), "c")
    vs.upsert((16 until 24).map(i => mk(s"d$i:0", s"c$i", s"d$i")).toDS(), "c")
    val contentBefore = vs.read("c").select("key", "content")
      .as[(String, String)].collect().sorted.toSeq
    val (before, after) = vs.compact("c")
    assert(after < before, s"census did not shrink: $before -> $after")
    assert(after <= 4, s"compacted census $after exceeds nBuckets")
    val contentAfter = vs.read("c").select("key", "content")
      .as[(String, String)].collect().sorted.toSeq
    assert(contentAfter == contentBefore)
  }
}
