package graft

import graft.operators._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 (one `queries` entry
  * per inventory line) and §5 (engine-parity rules the oracle SQL
  * mirrors expression-for-expression).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val t = Tables(spark, "/root/testdata/sf0.001")
    Analytics.regionRevenue(t.region, t.nation, t.customer, t.supplier, t.orders, t.lineitem)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary"   -> ((s, d) => Analytics.pricingSummary(Tables(s, d).lineitem)),
    "q3_shipping_priority" -> ((s, d) => { val t = Tables(s, d); Analytics.shippingPriority(t.customer, t.orders, t.lineitem) }),
    "q5_region_revenue"    -> ((s, d) => { val t = Tables(s, d); Analytics.regionRevenue(t.region, t.nation, t.customer, t.supplier, t.orders, t.lineitem) }),
    "q_filter_project"     -> ((s, d) => Analytics.filterProject(Tables(s, d).orders)),
    "q_topk_orders"        -> ((s, d) => Analytics.topkOrders(Tables(s, d).orders)),
    "q_distinct_segments"  -> ((s, d) => Analytics.distinctSegments(Tables(s, d).customer)),
    "q_case_bucketing"     -> ((s, d) => Analytics.caseBucketing(Tables(s, d).orders)),
    "q_union_dedup"        -> ((s, d) => Analytics.unionDedup(Tables(s, d).orders)),
    "fin_last_update"       -> ((s, d) => Maintenance.lastUpdate(Tables(s, d).orders)),
    "fin_dedup_latest"      -> ((s, d) => Maintenance.dedupLatest(Tables(s, d).events)),
    "fin_retention_window"  -> ((s, d) => Maintenance.retentionWindow(Tables(s, d).events)),
    "fin_incremental_delta" -> ((s, d) => Maintenance.incrementalDelta(Tables(s, d).events)),
    "fin_daily_ohlc"        -> ((s, d) => FinAnalytics.dailyOhlc(Tables(s, d).events)),
    "fin_moving_avg"        -> ((s, d) => FinAnalytics.movingAvg(Tables(s, d).events)),
    "fin_rolling_hilo"      -> ((s, d) => FinAnalytics.rollingHiLo(Tables(s, d).events)),
    "fin_returns"           -> ((s, d) => FinAnalytics.returns(Tables(s, d).events)),
    "fin_volatility"        -> ((s, d) => FinAnalytics.volatility(Tables(s, d).events)),
    "fin_beta"              -> ((s, d) => FinAnalytics.beta(Tables(s, d).events)),
    "fin_cyclical_features" -> ((s, d) => FinAnalytics.cyclicalFeatures(Tables(s, d).events)),
    "fin_company_enrich"    -> ((s, d) => { val t = Tables(s, d); FinAnalytics.companyEnrich(t.events, t.customer) }),
  )

  // ---- oracle SQL (DuckDB dialect), mirroring each query's exact
  //      arithmetic: decimal casts, total-order tiebreaks, and
  //      second-aligned timestamp cutoffs (SURVEY §5). ----

  /** Daily-close CTE shared by the fin_* window analytics. */
  private val closesCte =
    """WITH closes AS (
      |  SELECT user_id, day, value AS close FROM (
      |    SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day, value, ts, event_id,
      |           row_number() OVER (PARTITION BY user_id, CAST(date_trunc('day', ts) AS DATE)
      |                              ORDER BY ts DESC, event_id DESC) AS rn
      |    FROM events) WHERE rn = 1)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty,
        |  sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS sum_base_price,
        |  sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4))) AS sum_disc_price,
        |  sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2)))) AS sum_charge,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey,
        |  sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS revenue,
        |  CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority
        |FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_region_revenue" ->
      """SELECT n_name,
        |  sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS revenue
        |FROM region JOIN nation ON n_regionkey = r_regionkey
        |  JOIN supplier ON s_nationkey = n_nationkey
        |  JOIN lineitem ON l_suppkey = s_suppkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q_filter_project" ->
      """SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DECIMAL(12,2)) AS o_totalprice
        |FROM orders WHERE o_totalprice > 400000.0 AND o_orderstatus = 'O'""".stripMargin,
    "q_topk_orders" ->
      """SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(12,2)) AS o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin,
    "q_distinct_segments" ->
      "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment",
    "q_case_bucketing" ->
      """SELECT CASE WHEN o_totalprice < 100000 THEN 'small'
        |            WHEN o_totalprice < 300000 THEN 'medium'
        |            ELSE 'large' END AS bucket,
        |       o_orderpriority, count(*) AS n
        |FROM orders GROUP BY bucket, o_orderpriority ORDER BY bucket, o_orderpriority""".stripMargin,
    "q_union_dedup" ->
      """SELECT DISTINCT o_custkey FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |  UNION ALL
        |  SELECT o_custkey FROM orders WHERE o_totalprice > 450000.0) ORDER BY o_custkey""".stripMargin,
    "fin_last_update" ->
      """SELECT o_custkey, CAST(max(o_orderdate) AS DATE) AS last_order_date, count(*) AS n_orders
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "fin_dedup_latest" ->
      """SELECT event_id, user_id, day, event_type, value FROM (
        |  SELECT event_id, user_id, CAST(date_trunc('day', ts) AS DATE) AS day, event_type, value,
        |         row_number() OVER (PARTITION BY user_id, CAST(date_trunc('day', ts) AS DATE)
        |                            ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1 ORDER BY user_id, day""".stripMargin,
    "fin_retention_window" ->
      """SELECT event_id, user_id, event_type, value FROM events
        |WHERE ts >= (SELECT date_trunc('second', max(ts)) - INTERVAL 7 DAY FROM events)
        |ORDER BY event_id""".stripMargin,
    "fin_incremental_delta" ->
      """SELECT event_id, user_id, event_type, value FROM (
        |  SELECT event_id, user_id, event_type, value, ts,
        |         date_trunc('second', max(ts) OVER (PARTITION BY user_id)) - INTERVAL 3 DAY AS cutoff
        |  FROM events) WHERE ts >= cutoff ORDER BY event_id""".stripMargin,
    "fin_daily_ohlc" ->
      """SELECT user_id, day,
        |  max(CASE WHEN rn_a = 1 THEN value END) AS open,
        |  max(value) AS high, min(value) AS low,
        |  max(CASE WHEN rn_d = 1 THEN value END) AS close,
        |  count(*) AS n_ticks
        |FROM (
        |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day, value,
        |         row_number() OVER (PARTITION BY user_id, CAST(date_trunc('day', ts) AS DATE)
        |                            ORDER BY ts, event_id) AS rn_a,
        |         row_number() OVER (PARTITION BY user_id, CAST(date_trunc('day', ts) AS DATE)
        |                            ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM events)
        |GROUP BY user_id, day ORDER BY user_id, day""".stripMargin,
    "fin_moving_avg" -> (closesCte +
      """
        |SELECT user_id, day, close,
        |  CAST(sum(CAST(close AS DECIMAL(12,2))) OVER w5 AS DOUBLE) / count(*) OVER w5 AS ma5,
        |  CAST(sum(CAST(close AS DECIMAL(12,2))) OVER w20 AS DOUBLE) / count(*) OVER w20 AS ma20
        |FROM closes
        |WINDOW w5 AS (PARTITION BY user_id ORDER BY day ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
        |       w20 AS (PARTITION BY user_id ORDER BY day ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, day""".stripMargin),
    "fin_rolling_hilo" -> (closesCte +
      """
        |SELECT user_id, day, close,
        |  max(close) OVER w AS rolling_high, min(close) OVER w AS rolling_low
        |FROM closes
        |WINDOW w AS (PARTITION BY user_id ORDER BY day ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, day""".stripMargin),
    "fin_returns" -> (closesCte +
      """
        |SELECT user_id, day, close, close / prev_close - 1.0 AS ret FROM (
        |  SELECT user_id, day, close,
        |         lag(close, 1) OVER (PARTITION BY user_id ORDER BY day) AS prev_close
        |  FROM closes) WHERE prev_close IS NOT NULL ORDER BY user_id, day""".stripMargin),
    "fin_volatility" -> (closesCte +
      """
        |, rets AS (
        |  SELECT user_id, CAST(round(close / prev_close - 1.0, 6) AS DECIMAL(19,6)) AS r FROM (
        |    SELECT user_id, close,
        |           lag(close, 1) OVER (PARTITION BY user_id ORDER BY day) AS prev_close
        |    FROM closes) WHERE prev_close IS NOT NULL)
        |SELECT user_id, n, round(sqrt((CAST(n AS DOUBLE) * CAST(sr2 AS DOUBLE)
        |  - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE))
        |  / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))), 6) + 0.0 AS volatility
        |FROM (SELECT user_id, count(*) AS n, sum(r) AS sr, sum(r * r) AS sr2
        |      FROM rets GROUP BY user_id) WHERE n > 1 ORDER BY user_id""".stripMargin),
    "fin_beta" -> (closesCte +
      """
        |, market AS (
        |  SELECT day, sum(CAST(close AS DECIMAL(12,2))) AS mkt_value FROM closes GROUP BY day),
        |mret AS (
        |  SELECT day, CAST(mkt_value AS DOUBLE) / CAST(prev AS DOUBLE) - 1.0 AS mret FROM (
        |    SELECT day, mkt_value, lag(mkt_value, 1) OVER (ORDER BY day) AS prev FROM market)
        |  WHERE prev IS NOT NULL),
        |uret AS (
        |  SELECT user_id, day, close / prev - 1.0 AS ret FROM (
        |    SELECT user_id, day, close, lag(close, 1) OVER (PARTITION BY user_id ORDER BY day) AS prev
        |    FROM closes) WHERE prev IS NOT NULL),
        |moments AS (
        |  SELECT user_id, count(*) AS n,
        |         sum(CAST(round(ret, 6) AS DECIMAL(19,6))) AS sr, sum(CAST(round(mret, 6) AS DECIMAL(19,6))) AS sm,
        |         sum(CAST(round(ret, 6) AS DECIMAL(19,6)) * CAST(round(mret, 6) AS DECIMAL(19,6))) AS srm,
        |         sum(CAST(round(mret, 6) AS DECIMAL(19,6)) * CAST(round(mret, 6) AS DECIMAL(19,6))) AS sm2
        |  FROM uret JOIN mret USING (day) GROUP BY user_id)
        |SELECT user_id, n,
        |  round((CAST(n AS DOUBLE) * CAST(srm AS DOUBLE) - CAST(sr AS DOUBLE) * CAST(sm AS DOUBLE))
        |  / (CAST(n AS DOUBLE) * CAST(sm2 AS DOUBLE) - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE)), 6) + 0.0 AS beta
        |FROM moments WHERE n > 1 ORDER BY user_id""".stripMargin),
    "fin_cyclical_features" ->
      """SELECT event_id, date_part('hour', ts) AS hour, date_part('dow', ts) AS dow,
        |  date_part('month', ts) AS month,
        |  round(sin(date_part('hour', ts) * (2 * pi() / 24)), 6) + 0.0 AS hour_sin,
        |  round(cos(date_part('hour', ts) * (2 * pi() / 24)), 6) + 0.0 AS hour_cos,
        |  round(sin(date_part('dow', ts) * (2 * pi() / 7)), 6) + 0.0 AS dow_sin,
        |  round(cos(date_part('dow', ts) * (2 * pi() / 7)), 6) + 0.0 AS dow_cos,
        |  round(sin(date_part('month', ts) * (2 * pi() / 12)), 6) + 0.0 AS month_sin,
        |  round(cos(date_part('month', ts) * (2 * pi() / 12)), 6) + 0.0 AS month_cos
        |FROM events ORDER BY event_id""".stripMargin,
    "fin_company_enrich" ->
      """SELECT event_id, user_id, c_name, c_mktsegment, value
        |FROM events JOIN customer ON user_id = c_custkey ORDER BY event_id""".stripMargin,
  )
}
