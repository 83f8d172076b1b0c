package graft

import org.scalatest.funsuite.AnyFunSuite

/** Ad-hoc plan audit (run manually): prints formatted plans for the
  * heaviest queries so shuffle/reuse regressions are visible.
  */
class PlanAuditSpec extends SparkSpec {
  test("q27 plan: bucket exchange is reused, not recomputed") {
    val df = SparkEntry.queries("q27_minhash_lsh")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    info("q27 ReusedExchange present: " + plan.contains("ReusedExchange"))
    val nScans = "Scan parquet".r.findAllIn(plan).length
    info(s"q27 parquet scans in plan: $nScans")
    assert(true)
  }
}
