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
      // Shuffle WRITER: never take the bypass-merge path. Bypass
      // creates one file per (map task × reduce partition) — at the
      // session's 32×32 that is 1024 file creates/deletes per
      // exchange, and thread-dump sampling showed ~27% of busy
      // executor time inside FileOutputStream.open0 on this
      // container filesystem (iterative trainers pay it per Lloyd
      // iteration: dedup_semantic_hier_wide 5.7 → 3.1 s,
      // ann_ivf_trained_wide 3.0 → 1.7 s from this alone). The
      // serialized sort writer creates ONE file per map task — and
      // it is the path every >200-partition production shuffle
      // takes anyway (bypass fires only when partitions <
      // threshold), so this makes local mode exercise the
      // at-scale writer rather than tuning for the bench box.
      // Parameterised for clusters whose small broadcast-adjacent
      // shuffles genuinely prefer bypass on fast local disks.
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BYPASS_MERGE_THRESHOLD", "1"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.ui.enabled", "false")

  def get(appName: String = "graft"): SparkSession = {
    val spark = builder(appName).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
