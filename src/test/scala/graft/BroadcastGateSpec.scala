package graft

import graft.operators.{Analytics, Events, FinAnalytics}
import graft.sources.Tables

/** The broadcast scale gate: tables that grow with SF (supplier,
  * customer, part — 10k/150k/200k × SF rows in the TPC-H-shaped
  * testdata) must NOT carry forced broadcast() hints, because a hint
  * pins a multi-GB build side at the 100 TB design point that AQE
  * cannot override. These tests pin the other half of the contract:
  * with the hints absent, the size-statistics/AQE threshold still
  * broadcasts them while they are small, so nothing is lost at
  * bench scale.
  */
class BroadcastGateSpec extends SparkSpec {

  private def executedPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // force AQE to settle on the final plan
    df.queryExecution.executedPlan.toString
  }

  private def countBhj(plan: String): Int =
    "BroadcastHashJoin".r.findAllIn(plan).length

  test("q5_region_revenue: supplier + customer broadcast via threshold, no hint") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    val plan = executedPlan(
      Analytics.regionRevenue(t.region, t.nation, t.customer, t.supplier, t.orders, t.lineitem))
    // dims (hinted, O(1)-sized) + supplier + customer = at least 3
    // broadcast joins at this SF even with the two hints removed
    assert(countBhj(plan) >= 3, s"expected >=3 BroadcastHashJoin, plan:\n$plan")
  }

  test("fin_company_enrich: customer broadcasts via threshold, no hint") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    val plan = executedPlan(FinAnalytics.companyEnrich(t.events, t.customer))
    assert(countBhj(plan) >= 1, s"expected a BroadcastHashJoin, plan:\n$plan")
  }

  test("top_parts_revenue: part broadcasts via threshold, no hint") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    val plan = executedPlan(Events.topPartsRevenue(t.lineitem, t.part))
    assert(countBhj(plan) >= 1, s"expected a BroadcastHashJoin, plan:\n$plan")
  }
}
