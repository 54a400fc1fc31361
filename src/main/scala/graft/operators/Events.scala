package graft.operators

import graft.functions.Exact._
import org.apache.spark.sql.{Column, DataFrame}
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

  /** Interval (range) join with NO equi key — every event attributed
    * to every "promo window" (`windowDays` from each high-value
    * purchase) containing its timestamp. Spark plans a bare
    * range-predicate join as a BroadcastNestedLoopJoin —
    * O(|events|·|windows|) and broadcast-bound. Bucketized rewrite:
    * the timeline is cut into fixed-width buckets; each window
    * EXPLODES to the buckets it covers (≤ ⌈len/width⌉+1 rows), each
    * event hashes to its single bucket, and the join becomes a
    * shuffled EQUI-join on bucket with the exact range predicate as
    * residual. An event's one bucket meets each covering window
    * exactly once, so no dedup is needed. Scales as |events| +
    * Σ window-spans, partitioned by time bucket.
    *
    * Boundary parity: window starts truncate to the SECOND, so every
    * >=/< decision is identical under the events reader's ns→µs
    * floor vs an ns-native engine (SURVEY §5).
    */
  def intervalJoin(events: DataFrame, valueThreshold: Double = 250.0,
                   windowDays: Int = 2, bucketDays: Int = 2): DataFrame = {
    val bucketSec = bucketDays * 86400L
    def bucketOf(ts: Column): Column = floor(unix_timestamp(ts) / bucketSec)
    // window starts truncate to the SECOND (SURVEY §5: sub-second
    // precision differs across engines; a whole-second boundary makes
    // every >=/< decision identical under the reader's ns→µs floor)
    val windows = events
      .filter(col("event_type") === "purchase" && col("value") > valueThreshold)
      .select(col("event_id").as("win_id"),
        date_trunc("second", col("ts")).as("win_start"))
      .withColumn("win_end", col("win_start") + expr(s"INTERVAL $windowDays DAYS"))
      // end is exclusive: the last covered bucket is the one holding
      // end − 1µs, so a window ending exactly on a bucket edge does
      // not bleed into the next bucket
      .withColumn("bucket", explode(sequence(
        bucketOf(col("win_start")),
        bucketOf(col("win_end") - expr("INTERVAL 1 MICROSECOND")))))
    events.select(col("event_id"), col("user_id"), col("ts"))
      .withColumn("bucket", bucketOf(col("ts")))
      .join(windows, "bucket")
      .filter(col("ts") >= col("win_start") && col("ts") < col("win_end"))
      .select(col("event_id"), col("win_id"), col("user_id"))
      .orderBy(col("event_id"), col("win_id"))
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
