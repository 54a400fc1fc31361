package graft

import graft.operators.Analytics
import org.apache.spark.sql.SparkSession

/** The fact⋈fact scale path: when neither join side broadcasts, the
  * optimizer must inject a runtime Bloom filter (built from the
  * selective side) into the big side's scan. This needs its own
  * session — the shared test session broadcasts the small side at
  * test SF, which (correctly) makes the Bloom filter unnecessary.
  */
class RuntimeFilterSpec extends SparkSpec {

  /** Isolated child session (own SQLConf, shared context) — builder
    * .getOrCreate() would return the shared session and leak the
    * no-broadcast conf into every other spec.
    */
  private lazy val noBroadcast: SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    // test tables are tiny; don't let the size floor veto the demo
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    s
  }

  test("fact-fact join injects a runtime Bloom filter when no side broadcasts") {
    val dir = "/root/testdata/sf0.001"
    val orders = noBroadcast.read.parquet(s"$dir/orders.parquet")
    val lineitem = noBroadcast.read.parquet(s"$dir/lineitem.parquet")
    val df = Analytics.factFactPruned(orders, lineitem)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("might_contain"), "big side's scan must carry the runtime filter")
    assert(opt.contains("bloom_filter_agg"), "selective side must build the Bloom filter")

    // and the pruned shuffle-join answer equals the broadcast-session answer
    val t = graft.sources.Tables(spark, dir)
    val want = Analytics.factFactPruned(t.orders, t.lineitem).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val got = df.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === want)
    assert(got.nonEmpty)
  }
}
