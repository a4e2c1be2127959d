package graft

import graft.operators.{Analytics, RetailEtl}
import graft.sources.Tables

/** Plan-shape regression specs: at 100 TB the plan IS the product,
  * so broadcast strategy, filter pushdown, and partial aggregation
  * are asserted, not assumed.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String = {
    df.queryExecution.executedPlan.toString
  }

  test("enrichOrders joins dims via broadcast, fact never shuffles") {
    val p = plan(Analytics.enrichOrders(
      Tables.orders(spark, dir), Tables.customer(spark, dir), Tables.nation(spark, dir)))
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"fact side must not shuffle:\n$p")
  }

  test("q5-style join broadcasts every dimension") {
    val p = plan(Analytics.regionalRevenue(
      Tables.region(spark, dir), Tables.nation(spark, dir), Tables.customer(spark, dir),
      Tables.supplier(spark, dir), Tables.orders(spark, dir), Tables.lineitem(spark, dir)))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).length
    assert(broadcasts >= 4, s"expected >=4 broadcast joins, got $broadcasts:\n$p")
  }

  test("source filters reach the parquet scan (pushdown)") {
    val p = plan(RetailEtl.salesFromLineitem(Tables.lineitem(spark, dir), Some("F")))
    assert(p.contains("PushedFilters") && p.contains("EqualTo(l_linestatus,F)"),
      s"expected pushed linestatus filter:\n$p")
  }

  test("scans prune to referenced columns only") {
    val p = plan(Analytics.pricingSummary(Tables.lineitem(spark, dir)))
    assert(!p.contains("l_orderkey"),
      s"pricing summary must not read join keys it never uses:\n$p")
    assert(!p.contains("l_shipdate"), s"unused column not pruned:\n$p")
  }

  test("aggregates run map-side partials before the exchange") {
    val p = plan(RetailEtl.aggregate(
      RetailEtl.salesFromLineitem(Tables.lineitem(spark, dir))))
    assert(p.contains("partial_sum"), s"expected partial aggregation:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected exactly one shuffle, got $exchanges:\n$p")
  }
}
