package graft.operators

import graft.functions.Exact._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Core relational analytics — the reference's SQL query surface
  * (filtered reads, joins to the dimension table, aggregated
  * summaries; finanalyzer findatabase.py:118 `read_database` and the
  * namesId joins) re-expressed as declarative Spark plans on the
  * TPC-H-ish test schema.
  *
  * Scale notes: facts (`lineitem`, `orders`, `events`) are the only
  * tables that grow to 100 TB; every dimension join below broadcasts
  * (dims are ≤ millions of rows even at SF 100k), so no query
  * shuffles a fact table for a join — only for its final
  * aggregation, which partial-aggregates map-side first.
  */
object Analytics {

  /** Full-scan aggregate with exact decimal arithmetic (TPC-H Q1
    * shape). At scale: one pass, map-side partial agg on 4 tiny key
    * groups — the shuffle moves O(groups × partitions) rows.
    */
  def pricingSummary(lineitem: DataFrame): DataFrame = {
    val one = lit(1).cast(DecimalType(12, 2))
    // Downcast the exact 4-decimal product to (18,4) (lossless) so the
    // second multiply stays inside DECIMAL(38) on every engine.
    val disc  = (dec2(col("l_extendedprice")) * (one - dec2(col("l_discount")))).cast(DecimalType(18, 4))
    val charge = disc * (one + dec2(col("l_tax")))
    lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec2(col("l_quantity"))).as("sum_qty"),
        sum(dec2(col("l_extendedprice"))).as("sum_base_price"),
        sum(disc).as("sum_disc_price"),
        sum(charge).as("sum_charge"),
        avgExact(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order"))
      // exact decimal sums internally; doubles at the output boundary.
      // Money outputs emit at scale 2 so |x|·100 stays far under 2^53
      // at any SF (see Exact.outD) — the decimal-space round is exact.
      .withColumn("sum_qty", outD(col("sum_qty"), 2))
      .withColumn("sum_base_price", outD(col("sum_base_price"), 2))
      .withColumn("sum_disc_price", outD(col("sum_disc_price"), 2))
      .withColumn("sum_charge", outD(col("sum_charge"), 2))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Selective 3-way join + agg + top-N (TPC-H Q3 shape). Customer
    * filter broadcasts; lineitem joins orders on the shuffle key both
    * sides already need for the final groupBy.
    */
  def shippingPriority(customer: DataFrame, orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val cut = lit("1998-03-15")
    customer.filter(col("c_mktsegment") === "BUILDING")
      .join(orders.filter(col("o_orderdate") < cut), col("c_custkey") === col("o_custkey"))
      .join(lineitem.filter(col("l_shipdate") > cut), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(dec2(col("l_extendedprice")) * (lit(1).cast("decimal(12,2)") - dec2(col("l_discount")))).as("revenue"))
      // order + limit on the exact decimal (so the top-10 cut is
      // engine-identical), THEN convert for output — and re-sort on
      // the ROUNDED value so the emitted order matches the oracle's
      // outer ORDER BY (which binds to the rounded alias; two rows
      // colliding at 2 decimals would otherwise interleave)
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
      .select(col("l_orderkey"), outD(col("revenue"), 2).as("revenue"),
        col("o_orderdate").cast("date").as("o_orderdate"), col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
  }

  /** Star join across the full dimension chain (TPC-H Q5 shape) —
    * region/nation (genuinely O(1)-sized: 5 and 25 rows at every SF)
    * carry an explicit broadcast hint; supplier and customer scale
    * linearly with SF (10k×SF / 150k×SF rows), so they carry NO hint —
    * AQE's autoBroadcastJoinThreshold decides at runtime, broadcasting
    * them at small SF and falling back to a shuffled hash join once
    * they outgrow the threshold. A forced broadcast() here would pin a
    * multi-GB build side at the 100 TB design point and OOM the
    * executors — the hint is the scale bug, not the join order.
    */
  def regionRevenue(region: DataFrame, nation: DataFrame, customer: DataFrame,
                    supplier: DataFrame, orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val dims = broadcast(
      region.filter(col("r_name") === "ASIA")
        .join(nation, col("n_regionkey") === col("r_regionkey")))
    lineitem
      .join(orders.filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1997-01-01")),
        col("l_orderkey") === col("o_orderkey"))
      .join(supplier, col("l_suppkey") === col("s_suppkey"))
      .join(dims, col("s_nationkey") === col("n_nationkey"))
      .join(customer, col("o_custkey") === col("c_custkey") && col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec2(col("l_extendedprice")) * (lit(1).cast("decimal(12,2)") - dec2(col("l_discount")))).as("revenue"))
      .withColumn("revenue", outD(col("revenue"), 2))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Predicate + projection pushdown: both must reach the parquet
    * scan (verified via explain in the test suite — PushedFilters +
    * 3-column ReadSchema).
    */
  def filterProject(orders: DataFrame): DataFrame =
    orders.filter(col("o_totalprice") > 400000.0 && col("o_orderstatus") === "O")
      .select(col("o_orderkey"), col("o_custkey"), outD(dec2(col("o_totalprice")), 2).as("o_totalprice"))

  /** Relative-standing windows: percent_rank and cume_dist of each
    * high-value order within its priority class. The (o_totalprice,
    * o_orderkey) order is TOTAL, so rank has no tie-groups and both
    * functions reduce to engine-identical IEEE divisions of exact
    * integer counts. Emitted UNROUNDED: the quotient is the same
    * double bit-for-bit in every engine, whereas rounding to a fixed
    * scale hits exact decimal half-boundaries ((rank−1)/(n−1) with
    * n−1 = 2^a·5^b·… lands on …5 at any scale) where Spark rounds
    * the shortest decimal repr and DuckDB rounds the binary value —
    * verified divergent at sf0.01. One shuffle on the partition key.
    */
  def percentRanks(orders: DataFrame, minTotal: Double = 400000.0): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderpriority")).orderBy(col("o_totalprice"), col("o_orderkey"))
    orders.filter(col("o_totalprice") > minTotal)
      .select(col("o_orderkey"), col("o_orderpriority"),
        outD(dec2(col("o_totalprice")), 2).as("o_totalprice"))
      .withColumn("pct_rank", percent_rank().over(w) + lit(0.0))
      .withColumn("cume", cume_dist().over(w) + lit(0.0))
      .orderBy(col("o_orderpriority"), col("o_orderkey"))
  }

  /** Set-operation breadth: customers with an urgent order AND a
    * high-value order, MINUS those with any failed order —
    * INTERSECT/EXCEPT over single-column key sets. Catalyst rewrites
    * both into distinct left-semi/left-anti joins, so each branch is
    * a pruned single-column scan and the joins shuffle only distinct
    * keys.
    */
  def setOpsCustomers(orders: DataFrame): DataFrame = {
    val urgent = orders.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
    val high = orders.filter(col("o_totalprice") > 450000.0).select(col("o_custkey"))
    val failed = orders.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    urgent.intersect(high).except(failed).orderBy(col("o_custkey"))
  }

  /** Correlated-subquery shape — "orders above their customer's own
    * average" — decorrelated into a whole-partition window instead of
    * a self-join against a grouped subquery: ONE shuffle on the
    * correlation key, no join at all, and each row compares against
    * its partition's average in place. The average is an exact
    * decimal sum over an integer count so the comparison double is
    * bit-identical across engines.
    */
  def aboveAvg(orders: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("o_custkey"))
    orders.select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("avg_price",
        sum(dec2(col("o_totalprice"))).over(w).cast("double") / count(lit(1)).over(w))
      .filter(col("o_totalprice") > col("avg_price"))
      .select(col("o_custkey"), col("o_orderkey"),
        outD(dec2(col("o_totalprice")), 2).as("o_totalprice"),
        (round(col("avg_price"), 6) + lit(0.0)).as("cust_avg"))
      .orderBy(col("o_orderkey"))
  }

  /** Global order-by + limit — plans as TakeOrderedAndProject (per-
    * partition top-k, no full sort shuffle).
    */
  def topkOrders(orders: DataFrame, k: Int = 25): DataFrame =
    orders.select(col("o_orderkey"), outD(dec2(col("o_totalprice")), 2).as("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(k)

  /** Distinct — partial-aggregate dedup (map-side combine before the
    * shuffle; 5 distinct values move per partition).
    */
  def distinctSegments(customer: DataFrame): DataFrame =
    customer.select(col("c_mktsegment")).distinct().orderBy(col("c_mktsegment"))

  /** CASE WHEN bucketing + count — the reference's category-collapse
    * (plot_cyclical_feature_engineering.py `replace(heavy_rain →
    * rain)`) generalized to value-band bucketing.
    */
  def caseBucketing(orders: DataFrame): DataFrame =
    orders.select(
        when(col("o_totalprice") < 100000, "small")
          .when(col("o_totalprice") < 300000, "medium")
          .otherwise("large").as("bucket"),
        col("o_orderpriority"))
      .groupBy(col("bucket"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("bucket"), col("o_orderpriority"))

  /** Selective fact ⋈ fact join — the shape where broadcast stops
    * working at real scale (both sides grow). The selective side's
    * filter keeps ~1% of orders; at 100 TB neither side fits in
    * memory, the join shuffles, and the session's runtime
    * Bloom-filter injection (GraftSession) builds a filter from the
    * small side and applies it at the lineitem SCAN, killing
    * non-matching rows before the shuffle. RuntimeFilterSpec asserts
    * the `might_contain`/`bloom_filter_agg` plan under the
    * no-broadcast configuration; at test SF the optimizer correctly
    * prefers a plain broadcast.
    */
  def factFactPruned(orders: DataFrame, lineitem: DataFrame): DataFrame =
    lineitem
      .join(orders.filter(col("o_totalprice") > 450000.0), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(dec2(col("l_extendedprice")) * (lit(1).cast("decimal(12,2)") - dec2(col("l_discount")))).as("revenue"))
      .withColumn("revenue", outD(col("revenue"), 2))
      .orderBy(col("o_orderpriority"))

  /** EXISTS / IN-subquery shape — dimension rows with at least one
    * matching fact (customers holding an urgent order), as a
    * left-semi join: the dual of [[Maintenance.inactiveCustomers]]'s
    * anti join. Semi joins never replicate fact rows into the
    * output, so the operator's output is bounded by the dimension
    * regardless of fact-side fan-out; only the fact's join key
    * column is read (pruning reaches the scan) and the filtered key
    * set broadcasts when small.
    */
  def existsUrgent(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.join(
        orders.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))

  /** UNION of two filtered scans + dedup — e.g. merging candidate
    * ticker lists from two feeds (findatabase.py:154
    * `set_database_names` skip-if-present semantics).
    */
  def unionDedup(orders: DataFrame): DataFrame =
    orders.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
      .union(orders.filter(col("o_totalprice") > 450000.0).select(col("o_custkey")))
      .distinct()
      .orderBy(col("o_custkey"))
}
