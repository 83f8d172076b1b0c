package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IndexingSpec extends SparkSpec {
  import spark.implicits._

  test("vocab: frequency rank with deterministic term tiebreak") {
    val df = Seq((1L, "b a b c a b")).toDF("id", "text")
    val v = Indexing.vocab(df, "text").collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(v("b") == (0, 3L))      // most frequent
    assert(v("a") == (1, 2L))
    assert(v("c") == (2, 1L))
  }

  test("encode: original order preserved, OOV maps to -1, decode is exact") {
    val train = Seq((1L, "x y z y")).toDF("id", "text")
    val v = Indexing.vocab(train, "text") // y=0, x=1, z=2
    val other = Seq((7L, "z q x")).toDF("id", "text")
    val row = Indexing.encode(other, v, "id", "text").collect().head
    assert(row.getSeq[Int](1) == Seq(2, -1, 1))
    assert(row.getSeq[String](2) == Seq("z", "q", "x"))
  }

  test("postings: df counts every doc, list caps at maxPostings ascending") {
    val df = (0L until 9L).map(i => (i, "common " +
      (if (i % 2 == 0) "even" else "odd"))).toDF("id", "text")
    val out = Indexing.postings(df, "id", "text", maxPostings = 3).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out("common") == (9L, "0,1,2"))   // df = all 9, list capped at 3
    assert(out("even") == (5L, "0,2,4"))
    assert(out("odd") == (4L, "1,3,5"))
  }
}
