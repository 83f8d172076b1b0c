package graft.operators

import graft.SparkSpec
import graft.queries.DedupQueries

/** Planted-fixture spec for the q225 entity-resolution capstone: exact
  * census on a corpus where variant structure is known by construction.
  */
class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  private def customers(keys: Seq[Long]): String = {
    val dir = java.nio.file.Files.createTempDirectory("er-spec").toString
    keys.map(k => (k, s"Customer#$k")).toDF("c_custkey", "c_name")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    dir
  }

  test("variant structure maps exactly onto the cluster census: no " +
      "variant → singleton, one variant → pair, both → triple") {
    // keys 1, 101: canonical only; key 3: +dash-dropped; key 5:
    // +doubled digit; key 15: both.
    val dir = customers(Seq(1L, 3L, 5L, 15L, 101L))
    val out = DedupQueries.queries("q225_entity_resolution")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // sizes: 1 → keys 1, 101 (both pure); 2 → keys 3, 5; 3 → key 15.
    assert(out.toSeq == Seq((1L, 2L, 2L), (2L, 2L, 2L), (3L, 1L, 1L)))
  }

  test("records of DIFFERENT entities in the same block stay separate " +
      "— the md5 tail keeps distinct keys beyond the edit threshold") {
    // 0..9 share block '00000'; every cluster must be pure here (the
    // planted tails of adjacent keys are far apart in edit space).
    val dir = customers((0L until 10L).toSeq)
    val out = DedupQueries.queries("q225_entity_resolution")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.forall { case (_, nc, npure) => nc == npure })
    // 10 entities total, regardless of how variants group them.
    // 16 records: 10 canonical + 4 dash-dropped (0,3,6,9) + 2 doubled
    // (0,5), however they cluster.
    assert(out.map { case (sz, nc, _) => sz * nc }.sum == 16L)
  }

  test("custkeys past six digits fail loudly instead of colliding") {
    val dir = customers(Seq(1000000L))
    val ex = intercept[Exception] {
      DedupQueries.queries("q225_entity_resolution")(spark, dir).collect()
    }
    assert(ex.getMessage != null)
  }
}
