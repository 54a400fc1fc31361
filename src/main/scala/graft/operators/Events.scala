package graft.operators

import graft.functions.Exact._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics (SURVEY §2 #33-35) — batch forms; the
  * Structured Streaming mirrors live in [[graft.streaming.EventsStream]].
  */
object Events {

  /** 30-minute-gap sessionization via lag + running sum — one
    * shuffle on user_id, sequential scan per key. Gap comparison and
    * outputs use second-truncated timestamps (SURVEY §5: sub-second
    * precision differs across engines).
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val ord = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("tsec", date_trunc("second", col("ts")))
      .withColumn("prev", lag(col("tsec"), 1).over(ord))
      .withColumn("new_session",
        when(col("prev").isNull ||
          col("tsec") > col("prev") + expr(s"INTERVAL $gapMinutes MINUTES"), 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("tsec")).as("start_ts"),
        max(col("tsec")).as("end_ts"),
        sum(dec2(col("value"))).as("total_value"))
      .withColumn("total_value", outD(col("total_value"), 2))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** Tumbling 1-hour rollup per event_type — the batch mirror of the
    * streaming watermark+window job. Map-side partial aggs; the
    * shuffle carries (buckets × types) rows.
    */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .withColumn("bucket", date_trunc("hour", col("ts")))
      .groupBy(col("bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec2(col("value"))).as("total_value"),
        countDistinct(col("user_id")).as("n_users"))
      .withColumn("total_value", outD(col("total_value"), 2))
      .orderBy(col("bucket"), col("event_type"))

  /** Per-user event-type profile — the pivot/crosstab pattern as
    * explicit conditional aggregation (deterministic column set; a
    * dynamic `pivot` would scan for distinct values first). One
    * hash aggregation on user_id.
    */
  def typePivot(events: DataFrame): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        types.map(t => sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"n_$t")) :+
          sum(dec2(col("value"))).as("total_value"): _*)
      .withColumn("total_value", outD(col("total_value"), 2))
      .orderBy(col("user_id"))
  }

  /** Revenue per part ranked within brand (dense_rank ≤ 3) — the
    * windowed top-N pattern; part dimension broadcasts.
    */
  def topPartsRevenue(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("p_brand")).orderBy(col("revenue").desc, col("l_partkey"))
    lineitem.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("l_partkey"))
      .agg(sum(dec2(col("l_extendedprice")) * (lit(1).cast("decimal(12,2)") - dec2(col("l_discount")))).as("revenue"))
      .withColumn("rank", dense_rank().over(w).cast("long"))
      .filter(col("rank") <= 3)
      // rank is computed over the exact decimal; output converts after
      .withColumn("revenue", outD(col("revenue"), 2))
      .orderBy(col("p_brand"), col("rank"), col("l_partkey"))
  }
}
