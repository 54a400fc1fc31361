package graft

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL surface over the whole engine — the first-class equivalent of
  * the reference's ad-hoc SQL workflow, where every read goes through
  * `read_database(table, element, "WHERE … ORDER BY … DESC")`
  * (finanalyzer findatabase.py:118): users compose arbitrary SQL
  * over named relations instead of calling operator functions.
  *
  * [[register]] binds each operator's UNEXECUTED DataFrame as a temp
  * view (plus the base parquet tables), so `spark.sql("SELECT …
  * FROM fin_feature_snapshot WHERE instrument = 7 ORDER BY day")`
  * plans THROUGH the operator: Catalyst sees one tree, and outer
  * predicates/projections push into the operator's scans exactly as
  * if the filter were written inside it (a view is a logical plan,
  * not a materialization — nothing executes at registration).
  * SqlSurfaceSpec pins both the equivalence (view SQL ≡ direct
  * operator call) and the pushdown (an outer WHERE reaches the
  * parquet scan of a view).
  */
object GraftSql {

  /** Base parquet tables, named as in the testdata directory. */
  val baseTables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Bind base tables + the named operator views (default: every
    * registered query) for the given scale-factor directory.
    * Operator views are lazy logical plans, so most registrations
    * cost only plan construction — EXCEPT the trainer-backed queries
    * (ridge/GBM/CV/k-means/PQ/components), whose model fit runs at
    * DataFrame-construction time; pass an explicit `queryNames`
    * subset to defer those. Returns the registered view names.
    */
  def register(spark: SparkSession, dir: String,
               queryNames: Seq[String] = SparkEntry.queries.keys.toSeq): Seq[String] = {
    val t = Tables(spark, dir)
    // One accessor per table (not table(name) in a loop): `events`
    // must go through its TIMESTAMP(NANOS) read path.
    Seq("region" -> t.region, "nation" -> t.nation, "customer" -> t.customer,
      "supplier" -> t.supplier, "part" -> t.part, "orders" -> t.orders,
      "lineitem" -> t.lineitem, "events" -> t.events,
      "documents" -> t.documents, "embeddings" -> t.embeddings)
      .foreach { case (n, df) => df.createOrReplaceTempView(n) }
    val qs = SparkEntry.queries
    queryNames.foreach { n =>
      qs.get(n).foreach(fn => fn(spark, dir).createOrReplaceTempView(n))
    }
    baseTables ++ queryNames
  }

  /** Run ad-hoc SQL against the registered views — the
    * `read_database` equivalent, minus the string concatenation. */
  def sql(spark: SparkSession, query: String): DataFrame = spark.sql(query)
}
