package graft

import org.apache.spark.sql.SparkSession

/** Tuned SparkSession factory for the graft engine.
  *
  * Local-mode defaults mirror what we'd set cluster-side: AQE for
  * runtime re-planning (coalesce + skew-join splitting), shuffle
  * partition count sized to the test rig (32 cores) rather than the
  * 200 default, and a broadcast threshold generous enough that every
  * TPC-H-ish dimension table broadcast-joins.
  */
object GraftSession {
  def builder(appName: String = "graft", master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]"): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .master(master)
      // graft extensions: cosine_f64 SQL function + AsOfJoin strategy
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // Let parallelism-first coalescing keep partitions for
      // CPU-bound stages whose shuffle bytes are small (hashing,
      // HOF-heavy text ops); 1 MB default would serialize them.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      // Cached plans pin their shuffle output partitioning unless AQE
      // is allowed to re-plan it; at high shuffle-partition counts
      // that turns every .cache() inside an iterative loop (label
      // propagation) into partitions×iterations scheduler overhead —
      // PartitionSweep measured components 6.2× SLOWER at 2048
      // partitions before this flag, invariant-and-flat after.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      // Fact⋈fact path (neither side broadcastable at real scale):
      // inject a runtime Bloom filter built from the selective side
      // into the big side's scan, so most non-matching rows die
      // before the shuffle. No-op when a side broadcasts anyway.
      // RuntimeFilterSpec asserts the injection happens.
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.ui.enabled", "false")

  def get(appName: String = "graft"): SparkSession = {
    val spark = builder(appName).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
