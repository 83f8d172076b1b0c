package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HilbertSpec extends SparkSpec {
  import spark.implicits._

  private def curve(bits: Int): Map[Long, (Long, Long)] = {
    val n = 1L << bits
    val cells = for (x <- 0L until n; y <- 0L until n) yield (x, y)
    Layout.hilbertKey(cells.toDF("x", "y"), col("x"), col("y"), bits, "d")
      .collect().map(r => r.getLong(2) -> (r.getLong(0), r.getLong(1)))
      .toMap
  }

  test("order-1 curve is the canonical U: (0,0) (0,1) (1,1) (1,0)") {
    val m = curve(1)
    assert(m(0L) == (0L, 0L) && m(1L) == (0L, 1L) &&
      m(2L) == (1L, 1L) && m(3L) == (1L, 0L))
  }

  test("order-4 curve (256 cells) is a bijection whose consecutive " +
      "positions are always grid-adjacent — the property Z-order lacks") {
    val m = curve(4)
    assert(m.size == 256 && m.keySet == (0L until 256L).toSet)
    val adjacent = (0L until 255L).forall { d =>
      val (x1, y1) = m(d); val (x2, y2) = m(d + 1)
      math.abs(x1 - x2) + math.abs(y1 - y2) == 1
    }
    assert(adjacent)
    // Z-order on the same grid does NOT have this property (the
    // quadrant seam at d=3→4 jumps): the comparison that motivates the
    // q224 audit.
    val z = (for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y))
      .toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.zorderKey(Seq(col("x"), col("y")), 4).as("d"))
      .collect().map(r => r.getLong(2) -> (r.getLong(0), r.getLong(1)))
      .toMap
    val zAdjacent = (0L until 255L).forall { d =>
      val (x1, y1) = z(d); val (x2, y2) = z(d + 1)
      math.abs(x1 - x2) + math.abs(y1 - y2) == 1
    }
    assert(!zAdjacent)
  }

  test("out-of-range input raises in-plan") {
    val ex = intercept[Exception] {
      Layout.hilbertKey(Seq((4L, 0L)).toDF("x", "y"),
        col("x"), col("y"), 2, "d").collect()
    }
    assert(ex.getMessage != null)
  }

  test("hilbertLevelSql is pure text over the previous level's columns " +
      "— no engine-specific operators") {
    val (d, x, y) = Layout.hilbertLevelSql(256L, 128L)
    Seq(d, x, y).foreach { e =>
      assert(!e.contains("^") && !e.contains("xor"), e)
      assert(e.contains("__x") || e.contains("__y") || e.contains("__d"))
    }
  }
}
