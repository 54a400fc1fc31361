package graft

/** The SQL surface (GraftSql): operator outputs as composable temp
  * views — the reference's `read_database(table, element, "WHERE …
  * ORDER BY …")` workflow (findatabase.py:118) done Spark-first.
  * Pins (a) view SQL ≡ the direct operator call across 12 operator
  * families, (b) ad-hoc WHERE/ORDER BY composition on top of a view,
  * and (c) that an outer predicate pushes THROUGH a view into the
  * parquet scan (views are logical plans, not materializations).
  */
class SqlSurfaceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val viewNames = Seq(
    "q1_pricing_summary", "q_topk_orders", "q_case_bucketing",
    "fin_daily_ohlc", "fin_last_update", "fin_moving_avg",
    "text_quality", "text_langid", "dedup_exact",
    "curate_split", "events_hourly_rollup", "mm_binary_meta",
    // trainer-backed view: the fit runs at registration, the scored
    // frame composes like any other relation
    "fin_ridge", "fin_vwap", "events_histogram", "text_surprisal",
    // round-8 additions: the IVF-PQ composite (two trainers at
    // registration) and the multimodal planner/feature views
    "ann_ivfpq", "mm_resize_plan", "mm_byte_histogram",
    // round-9 additions: risk ratios, containment dedup, shard
    // manifests, debounce
    "fin_sharpe", "fin_var_es", "dedup_containment", "curate_shard",
    "events_debounce", "mm_neardup", "fin_calmar", "curate_oversample",
    "events_rolling_active", "fin_info_ratio")

  private lazy val registered: Seq[String] =
    GraftSql.register(spark, dir, viewNames)

  test("every registered operator view matches the direct operator result") {
    registered // force registration
    viewNames.foreach { name =>
      val viaSql = spark.sql(s"SELECT * FROM $name").collect().toSeq
      val direct = SparkEntry.queries(name)(spark, dir).collect().toSeq
      assert(viaSql === direct, s"view $name diverges from the operator result")
    }
  }

  test("ad-hoc WHERE / ORDER BY composes over an operator view (read_database shape)") {
    registered
    val viaSql = spark.sql(
      "SELECT user_id, day, close FROM fin_daily_ohlc WHERE user_id = 3 ORDER BY day DESC")
      .collect().toSeq
    val direct = SparkEntry.queries("fin_daily_ohlc")(spark, dir)
      .select("user_id", "day", "close")
      .filter("user_id = 3")
      .orderBy(org.apache.spark.sql.functions.col("day").desc)
      .collect().toSeq
    assert(viaSql.nonEmpty && viaSql === direct)
  }

  test("an outer predicate pushes through a view into the parquet scan") {
    registered
    val plan = spark.sql("SELECT doc_id, n_chars FROM text_quality WHERE doc_id < 10")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("LessThan(doc_id,10)"),
      s"doc_id predicate did not reach the scan:\n$plan")
  }

  test("base tables register alongside operator views for raw SQL joins") {
    registered
    val n = spark.sql(
      "SELECT count(*) AS n FROM documents d JOIN dedup_exact x ON d.doc_id = x.keep_id")
      .head().getLong(0)
    assert(n > 0)
  }
}
