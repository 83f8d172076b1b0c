package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zorderKey interleaves bits (known value)") {
    // x=5 (101), y=3 (011), 3 bits: x bits land at even positions, y odd:
    // j0: x->b0=1, y->b1=1; j1: x->b2=0, y->b3=1; j2: x->b4=1, y->b5=0
    // => 0b011011 = 27
    val out = Seq((5, 3)).toDF("x", "y")
      .select(Layout.zorderKey(Seq(col("x"), col("y")), 3).as("k"))
      .head().getLong(0)
    assert(out == 27L)
  }

  test("key width guard") {
    intercept[IllegalArgumentException] {
      Layout.zorderKey(Seq(col("x"), col("y")), 32)
    }
  }

  test("negative inputs fail loudly instead of sign-extending") {
    val ex = intercept[Exception] {
      Seq((-1, 2)).toDF("x", "y")
        .select(Layout.zorderKey(Seq(col("x"), col("y")), 4)).collect()
    }
    assert(ex.getMessage.contains("negative input") ||
      Option(ex.getCause).exists(_.getMessage.contains("negative input")))
  }

  test("z-order yields tight per-partition ranges on BOTH columns") {
    val grid = for { x <- 0 until 64; y <- 0 until 64 } yield (x, y)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(scala.util.Random.shuffle(grid), 8))
      .toDF("x", "y")

    def spans(d: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val s = d.withColumn("p", spark_partition_id())
        .groupBy("p")
        .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
        .agg(sum("sx"), sum("sy")).head()
      (s.getLong(0), s.getLong(1))
    }
    val (zx, zy) = spans(Layout.zorder(df, Seq("x", "y"), bits = 6,
      numPartitions = 16))
    val lex = df.repartitionByRange(16, col("x"), col("y"))
      .sortWithinPartitions(col("x"), col("y"))
    val (lx, ly) = spans(lex)
    info(s"zorder spans x=$zx y=$zy; lex spans x=$lx y=$ly")
    // Lexicographic range partitioning on (x, y) gives x-stripes: tight x
    // (48) but full-width y (16 partitions × span 63 = 1008) — a filter
    // on y prunes nothing. Z-order cuts the grid into 16×16 blocks
    // (240/240): the WORST dimension is 4x+ tighter and the combined
    // prune-relevant span is smaller.
    assert(math.max(zx, zy) * 4 <= math.max(lx, ly),
      s"z-order worst-dim span ${math.max(zx, zy)} vs lex ${math.max(lx, ly)}")
    assert(zx + zy < lx + ly,
      s"z-order total span ${zx + zy} vs lex ${lx + ly}")
  }
}
