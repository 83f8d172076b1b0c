package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def docs(ns: Seq[Long]) =
    ns.zipWithIndex.map { case (n, i) => (i.toLong, n) }.toDF("id", "n")

  test("packByStart: bin = where the cumulative count starts") {
    // capacity 10; cum-before: 0,4,8,14,17 -> bins 0,0,0,1,1
    val out = Packing.packByStart(docs(Seq(4, 4, 6, 3, 9)), "id", "n", 10)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L))
  }

  test("packByStart: distributed prefix sum matches a single-node cumsum") {
    val rnd = new scala.util.Random(11)
    val ns = Seq.fill(5000)(rnd.nextInt(200).toLong + 1)
    val expected = ns.scanLeft(0L)(_ + _).init.map(_ / 512)
    val out = Packing.packByStart(docs(ns), "id", "n", 512, shards = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out.size == 5000)
    ns.indices.foreach { i =>
      assert(out(i.toLong) == expected(i), s"doc $i")
    }
  }

  test("packGreedy: no bin exceeds capacity except singleton oversized docs") {
    val rnd = new scala.util.Random(13)
    val ns = Seq.fill(2000)(rnd.nextInt(300).toLong + 1) ++ Seq(999L)
    val out = Packing.packGreedy(docs(ns), "id", "n", 512, shards = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == ns.length) // every doc packed exactly once
    val byBin = out.groupBy(_._3)
    byBin.foreach { case (bin, rows) =>
      val total = rows.map(_._2).sum
      assert(total <= 512 || rows.length == 1,
        s"bin $bin holds $total tokens in ${rows.length} docs")
    }
    // deterministic under re-run
    val again = Packing.packGreedy(docs(ns), "id", "n", 512, shards = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("q154 packing curve: three 100-word docs give the hand-computed " +
      "ladder") {
    // T = 300; cum starts 0/100/200.
    //  L=128: start bins {0,0,1} → 2 bins; docs 2,3 straddle
    //         (100+100−128=72, 72+100−128=44) → over 116;
    //         util = 3_000_000 div 256 = 11718.
    //  L=256: 1 bin; doc 3 straddles (200+100−256=44); util 11718.
    //  L=512 / 1024: 1 bin, no straddlers, util 5859 / 2929.
    val dir = java.nio.file.Files.createTempDirectory("pack-curve").toString
    (1 to 3).map(i => (i.toLong, Seq.fill(100)("w").mkString(" ")))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.CurationQueries
      .queries("q154_packing_curve")(spark, dir)
      .collect()
      .map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    assert(out(128) == ((300L, 2L, 2L, 116L, 11718L)))
    assert(out(256) == ((300L, 1L, 1L, 44L, 11718L)))
    assert(out(512) == ((300L, 1L, 0L, 0L, 5859L)))
    assert(out(1024) == ((300L, 1L, 0L, 0L, 2929L)))
  }

  test("packGreedy: fill order is ascending id within each shard") {
    val out = Packing.packGreedy(docs(Seq(3, 3, 3, 3)), "id", "n", 6,
        shards = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // ids 0,1 -> first bin; 2,3 -> second
    assert(out(0L) == out(1L) && out(2L) == out(3L) && out(0L) != out(2L))
  }
}
