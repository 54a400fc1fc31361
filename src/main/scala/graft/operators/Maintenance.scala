package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Table-maintenance operators — the reference's ETL loop
  * (findatabase.py): last-update checkpoints, window-function dedup
  * (sql/redundancy.sql), trailing-window retention, and incremental
  * delta selection (`update_database`).
  *
  * In a 100 TB lakehouse these are the compaction/upsert primitives:
  * each shuffles at most once on the entity key, and the per-key
  * aggregates they derive are tiny relative to the fact table.
  */
object Maintenance {

  /** max(date) per key — findatabase.py:70 `check_last_update`. */
  def lastUpdate(orders: DataFrame): DataFrame =
    orders.groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate")).cast("date").as("last_order_date"),
           count(lit(1)).as("n_orders"))
      .orderBy(col("o_custkey"))

  /** Keep exactly one row per (key, day) — newest by (ts, event_id).
    * Mirrors sql/redundancy.sql's `row_number() OVER (PARTITION BY
    * dateValue, namesId) → delete n > 1`, with a deterministic
    * ORDER BY the reference leaves unspecified.
    */
  def dedupLatest(events: DataFrame): DataFrame =
    latestPerKeyDay(events).drop("ts")
      .orderBy(col("user_id"), col("day"))

  /** The shared keep-newest winner pick: one row per (user_id, day),
    * newest by (ts, event_id). Both [[dedupLatest]] and [[cdcApply]]
    * build on this so the tiebreak and day-truncation rules live in
    * exactly one place.
    */
  private def latestPerKeyDay(events: DataFrame): DataFrame = {
    val day = date_trunc("day", col("ts")).cast("date").as("day")
    val w = Window.partitionBy(col("user_id"), col("day"))
      .orderBy(col("ts").desc, col("event_id").desc)
    events.select(col("event_id"), col("user_id"), day, col("ts"), col("event_type"), col("value"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }

  /** Trailing-window retention — findatabase.py:224 `DELETE WHERE
    * dateAdded < start` as a filter against a second-aligned global
    * cutoff (second-aligned so µs/ns timestamp precision can't flip
    * boundary rows across engines).
    */
  def retentionWindow(events: DataFrame, days: Int = 7): DataFrame = {
    val cutoff = events.agg(
      (date_trunc("second", max(col("ts"))) - expr(s"INTERVAL $days DAYS")).as("cutoff"))
    events.crossJoin(broadcast(cutoff))
      .filter(col("ts") >= col("cutoff"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))
  }

  /** Incremental MERGE/upsert: split the stream at a checkpoint into
    * "existing state" and "new batch", reduce each to its keyed
    * latest, and merge with delta-wins semantics (new keys inserted,
    * colliding keys replaced, untouched keys carried over via
    * left_anti). The correctness gate's oracle is the full batch
    * recompute ([[dedupLatest]] over everything) — i.e. the
    * incremental path is PROVEN equal to the recompute, which is the
    * property that lets a 100 TB pipeline process only the delta.
    */
  def upsert(events: DataFrame, days: Int = 2): DataFrame = {
    val cutoff = events.agg(
      (date_trunc("second", max(col("ts"))) - expr(s"INTERVAL $days DAYS")).as("cutoff"))
    val tagged = events.crossJoin(broadcast(cutoff))
    // Shuffle audit (round 12): the anti-join MERGE shape is the
    // scale-correct one — the 100-TB snapshot side never shuffles
    // (scan → broadcast-anti against delta keys → union), which a
    // collapsed single-window rewrite would break by shuffling the
    // whole snapshot to apply a small delta. Three exchanges ARE
    // shared at runtime though the static plan shows them thrice:
    // AQE ReuseExchange dedupes the identical 1-row cutoff
    // broadcast subtrees. What was genuinely redundant and is now
    // gone: (a) dedupLatest's presentation orderBy ran per union
    // leg (2 range exchanges + 2 sorts under the final global sort)
    // — the legs now use the unsorted latestPerKeyDay; (b) the
    // anti-join build side ran the full window winner-pick when it
    // only needs delta KEYS — now a map-side-combined 2-column
    // distinct, so the broadcast build carries ids only.
    val snapLatest = latestPerKeyDay(tagged.filter(col("ts") < col("cutoff")).drop("cutoff")).drop("ts")
    val deltaLatest = latestPerKeyDay(tagged.filter(col("ts") >= col("cutoff")).drop("cutoff")).drop("ts")
    val deltaKeys = tagged.filter(col("ts") >= col("cutoff"))
      .select(col("user_id").as("du"), date_trunc("day", col("ts")).cast("date").as("dd"))
      .distinct()
    val carried = snapLatest.join(deltaKeys,
      col("user_id") === col("du") && col("day") === col("dd"), "left_anti")
    deltaLatest.unionByName(carried).orderBy(col("user_id"), col("day"))
  }

  /** Referential-integrity sweep: dimension rows with no facts —
    * left_anti join, which Spark executes as a broadcast/shuffled
    * hash anti-join with only the key column of the fact side read
    * (column pruning reaches the scan).
    */
  def inactiveCustomers(customer: DataFrame, events: DataFrame): DataFrame =
    customer.join(events.select(col("user_id")),
        col("c_custkey") === col("user_id"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))

  /** Incremental delta: rows newer than each key's checkpoint
    * (per-key max(ts) − N days) — `update_database`'s fetch-only-
    * newer-than-last-recorded-date, per key in one pass via a
    * whole-partition window max instead of a self-join.
    */
  def incrementalDelta(events: DataFrame, days: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    events
      .withColumn("cutoff",
        date_trunc("second", max(col("ts")).over(w)) - expr(s"INTERVAL $days DAYS"))
      .filter(col("ts") >= col("cutoff"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))
  }

  /** Snapshot reconciliation: classify every (key, day) as added /
    * removed / changed / unchanged between the CDC snapshot as of a
    * cutoff and the current one — the audit step after any
    * incremental maintenance run. Built on [[cdcApply]] twice (so
    * tombstones can genuinely REMOVE keys between snapshots) and a
    * single full-outer join on the snapshot key; value comparison is
    * null-safe. At scale both snapshots are keyed aggregates of the
    * change log, each one shuffle, and the diff join is co-partitioned
    * on the same key.
    */
  def snapshotDiff(events: DataFrame, days: Int = 2): DataFrame = {
    val cutoff = events.agg(
      (date_trunc("second", max(col("ts"))) - expr(s"INTERVAL $days DAYS")).as("cutoff"))
    // explicit presence markers: a key may legitimately carry a NULL
    // value, so "old_value IS NULL" cannot mean "absent from old"
    val prev = cdcApply(events.crossJoin(broadcast(cutoff))
        .filter(col("ts") < col("cutoff")).drop("cutoff"))
      .select(col("user_id"), col("day"), col("value").as("old_value"), lit(true).as("in_old"))
    val cur = cdcApply(events)
      .select(col("user_id"), col("day"), col("value").as("new_value"), lit(true).as("in_new"))
    prev.join(cur, Seq("user_id", "day"), "full_outer")
      .withColumn("status",
        when(col("in_old").isNull, "added")
          .when(col("in_new").isNull, "removed")
          .when(!(col("old_value") <=> col("new_value")), "changed")
          .otherwise("unchanged"))
      .select(col("user_id"), col("day"), col("old_value"), col("new_value"), col("status"))
      .orderBy(col("user_id"), col("day"))
  }

  /** SCD-2 dimension build: collapse the per-(key, day) latest-value
    * history into validity intervals — one row per VERSION (runs of
    * equal values merge), `[valid_from, valid_to)` half-open with
    * NULL valid_to marking the current version. This is the batch
    * producer of the dimension shape
    * [[graft.streaming.EventsStream.enrichScd]] consumes.
    *
    * Change detection is null-safe (`IS DISTINCT FROM`), so NULL
    * values form their own runs rather than being dropped or merged.
    * Both windows ride the one hash(user_id) shuffle the history
    * already needs; nothing here is quadratic in versions or days.
    */
  def scd2Build(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val changed = latestPerKeyDay(events)
      .select(col("user_id"), col("day"), col("value"))
      .withColumn("pv", lag(col("value"), 1).over(w))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 || !(col("value") <=> col("pv")))
    changed
      .withColumn("valid_to", lead(col("day"), 1).over(w))
      .select(col("user_id"), col("value"), col("day").as("valid_from"),
        col("valid_to"), col("valid_to").isNull.as("is_current"))
      .orderBy(col("user_id"), col("valid_from"))
  }

  /** Incremental aggregate-state maintenance: merge the pre-computed
    * per-(key, day) aggregate STATE of the old data with the delta's
    * aggregates — never re-scanning the old facts — and the gate
    * proves merged ≡ full recompute. This works because the state is
    * MERGEABLE: counts add, and the sums are exact decimals
    * (associative regardless of partitioning or merge order); a
    * double sum would NOT survive this equivalence. The additive
    * companion to [[upsert]]'s keep-latest merge, and the batch
    * analog of a streaming agg's state update: at 100 TB you
    * maintain the aggregate table by merging yesterday's state with
    * today's delta, one delta-sized shuffle.
    */
  def aggMerge(events: DataFrame, days: Int = 2): DataFrame = {
    import graft.functions.Exact.{dec2, outD}
    val cutoff = events.agg(
      (date_trunc("second", max(col("ts"))) - expr(s"INTERVAL $days DAYS")).as("cutoff"))
    def state(df: DataFrame): DataFrame = {
      val day = date_trunc("day", col("ts")).cast("date").as("day")
      df.select(col("user_id"), day, col("value"))
        .groupBy(col("user_id"), col("day"))
        .agg(count(col("value")).as("n"), sum(dec2(col("value"))).as("total"))
    }
    val tagged = events.crossJoin(broadcast(cutoff))
    val oldState = state(tagged.filter(col("ts") < col("cutoff")))
      .withColumnsRenamed(Map("n" -> "n_old", "total" -> "t_old"))
    val delta = state(tagged.filter(col("ts") >= col("cutoff")))
      .withColumnsRenamed(Map("n" -> "n_new", "total" -> "t_new"))
    val n = coalesce(col("n_old"), lit(0L)) + coalesce(col("n_new"), lit(0L))
    oldState.join(delta, Seq("user_id", "day"), "full_outer")
      .select(col("user_id"), col("day"), n.as("n"),
        // an all-NULL-value group has n = 0 and must stay NULL (the
        // recompute's sum over no non-null rows), not become 0.00
        when(n > 0, outD(coalesce(col("t_old"), lit(0).cast("decimal(12,2)")) +
          coalesce(col("t_new"), lit(0).cast("decimal(12,2)")), 2)).as("total_value"))
      .orderBy(col("user_id"), col("day"))
  }

  /** CDC apply: materialize a snapshot from a change log with DELETE
    * tombstones — the missing half of [[dedupLatest]]'s keep-latest
    * (which has no delete path) and the incremental form of a
    * warehouse MERGE with WHEN MATCHED DELETE. Each (user_id, day)
    * key's LATEST change (by ts, event_id) decides its fate: an
    * upsert keeps the row with that change's value, a tombstone
    * ('error' events stand in for deletes in the testdata schema)
    * removes the key entirely. One shuffle on the key; row_number
    * picks the winner without materializing intermediate versions.
    */
  /** Schema-evolution union: merge an OLD-schema snapshot (no `props`
    * column — the pre-migration table) with the new-schema slice by
    * COLUMN NAME, missing columns null-filled — `unionByName(…,
    * allowMissingColumns = true)`, the read-side half of a rolling
    * schema migration (positional UNION would silently misalign).
    * The split is second-aligned on the corpus max-ts so both engines
    * cut identically; pure scan + union, no shuffle.
    */
  def schemaUnion(events: DataFrame, days: Int = 2): DataFrame = {
    val cutoff = events.agg(
      (date_trunc("second", max(col("ts"))) - expr(s"INTERVAL $days DAYS")).as("cutoff"))
    val tagged = events.crossJoin(broadcast(cutoff))
    val old = tagged.filter(col("ts") < col("cutoff"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    val neu = tagged.filter(col("ts") >= col("cutoff"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"), col("props"))
    old.unionByName(neu, allowMissingColumns = true)
      .orderBy(col("event_id"))
  }

  def cdcApply(events: DataFrame): DataFrame =
    latestPerKeyDay(events)
      .filter(col("event_type") =!= "error") // tombstone: key removed
      .select(col("user_id"), col("day"), col("value"),
        date_trunc("second", col("ts")).as("last_ts"))
      .orderBy(col("user_id"), col("day"))
}
