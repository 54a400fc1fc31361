package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation join strategies (SURVEY §2 #39).
  *
  * AQE's skew-join splitting handles sort-merge skew at runtime, but
  * a hot key that dwarfs a single reducer still benefits from
  * explicit salting: the fact side fans a key's rows out across S
  * sub-keys, the (small) build side replicates each row S times, and
  * the join runs on (key, salt) — every reducer sees ≤ 1/S of the
  * hot key. Output is identical to the unsalted join (the oracle IS
  * the plain-join SQL).
  */
object Skew {

  /** Salted fact ⋈ replicated dimension. The salt is deterministic
    * (event_id mod S) so re-runs partition identically; the dimension
    * is replicated S× BEFORE the broadcast/shuffle, which costs S·|dim|
    * rows — cheap for a dimension, and what bounds the hot key's
    * reducer load at 100 TB.
    */
  def saltedEnrich(events: DataFrame, customer: DataFrame, salts: Int = 8): DataFrame = {
    val fact = events.withColumn("salt", pmod(col("event_id"), lit(salts.toLong)))
    val dim = customer
      .withColumn("salt", explode(sequence(lit(0L), lit(salts.toLong - 1))))
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"), col("salt").as("dsalt"))
    // No broadcast hint: salting only matters on the SHUFFLED join
    // path (a broadcast join has no reducers to skew). Locally the
    // planner still broadcasts the small dim; at scale, where the
    // replicated dim exceeds the threshold, the shuffle partitions
    // on (key, salt) and the hot key spreads across S reducers.
    fact.join(dim,
        col("user_id") === col("c_custkey") && col("salt") === col("dsalt"))
      .select(col("event_id"), col("user_id"), col("c_name"), col("c_mktsegment"), col("value"))
      .orderBy(col("event_id"))
  }
}
