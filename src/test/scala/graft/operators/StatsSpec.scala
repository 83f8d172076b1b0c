package graft.operators

import graft.SparkSpec

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("profile: nulls, distincts, min/max per column in one pass") {
    val df = Seq(
      (Some(1), Some("a")), (Some(2), None),
      (None, Some("c")), (Some(2), Some("a"))
    ).toDF("x", "s")
    val p = Stats.profile(df, Seq("x", "s")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4))).toMap
    assert(p("x") == (1L, 2L, "1", "2"))
    assert(p("s") == (1L, 2L, "a", "c"))
  }

  test("profile: all-null column yields null min/max, zero distincts") {
    val df = Seq((1, Option.empty[String]), (2, None)).toDF("x", "s")
    val p = Stats.profile(df, Seq("s")).collect().head
    assert(p.getLong(1) == 2L && p.getLong(2) == 0L)
    assert(p.isNullAt(3) && p.isNullAt(4))
  }
}
