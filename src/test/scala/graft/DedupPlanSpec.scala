package graft

import graft.operators.Dedup
import graft.sources.Tables

/** Plan gate for the count-based Jaccard verify (Dedup.verifyJaccard
  * via minhashLsh): the candidate verification must stay an EQUI-join
  * pipeline — hash or sort-merge, chosen by size statistics — and can
  * never silently degrade to a nested-loop/cartesian shape, which
  * would be all-pairs over the corpus. At bench SF the checkpointed
  * shingle frame is stats-small and rides the build side of
  * BroadcastHashJoins (zero extra shuffles of the shingle scan);
  * at 100 TB the stats push the same joins to shuffled equi-joins —
  * both linear. These assertions protect the round-5 skew fix from a
  * future stats/AQE drift re-planning the verify as a non-equi join.
  */
class DedupPlanSpec extends SparkSpec {

  private lazy val verifiedPlan: String = {
    val df = Dedup.minhashLsh(Tables(spark, "/root/testdata/sf0.01").documents)
    df.collect() // force AQE to settle on the final plan
    df.queryExecution.executedPlan.toString
  }

  test("verify stage never plans a nested-loop or cartesian join") {
    assert(!verifiedPlan.contains("BroadcastNestedLoopJoin")
      && !verifiedPlan.contains("CartesianProduct"),
      s"non-equi join in the verify plan:\n$verifiedPlan")
  }

  test("containment's one-sided probe and verify plan only equi-joins") {
    val df = Dedup.containment(Tables(spark, "/root/testdata/sf0.01").documents)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin")
      && !plan.contains("CartesianProduct"),
      s"non-equi join in the containment plan:\n$plan")
  }

  test("the (b, s) intersection join is a broadcast hash join at bench SF") {
    // The exact join of the skew fix: candidate (b, s) rows against
    // the narrow shingle frame. BuildRight = the shingle side while
    // its stats stay under the threshold; the LEFT (candidate) side
    // streams, so no candidate-row ever widens past a few dozen bytes.
    val bs = """BroadcastHashJoin \[b#\d+L?, s#\d+\], \[b2#\d+L?, s2#\d+\]""".r
    assert(bs.findFirstIn(verifiedPlan).isDefined,
      s"(b,s) x (b2,s2) BroadcastHashJoin not found in:\n$verifiedPlan")
  }

  test("the banded self-join reads checkpointed signatures, not a replayed min-aggregation") {
    // sigs is an eager localCheckpoint: the 32-min signature
    // aggregation runs once at materialization, and neither side of
    // the band-bucket self-join may replay it (round 6: 12 RDD-block
    // reads through two copies of the aggregation).
    assert(!verifiedPlan.contains("min(xxhash64"),
      s"signature aggregation replayed in the candidate plan:\n$verifiedPlan")
  }

  test("simhash's candidate self-join never re-tokenizes the corpus") {
    // sig is one checkpointed row per doc; both pigeonhole join sides
    // must read it back — zero tokenize/shingle/md5 work in the final
    // plan (round 6: two complete shingle→hash→bit-sum chains, one
    // under a BroadcastExchange where ReuseExchange cannot fire).
    val df = Dedup.simhash(Tables(spark, "/root/testdata/sf0.01").documents)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("split(") && !plan.contains("md5("),
      s"tokenize/hash chain replayed in the simhash candidate plan:\n$plan")
    assert(!plan.contains("Scan parquet"),
      s"corpus re-scanned in the simhash candidate plan:\n$plan")
  }

  test("ngramJaccard's self-join reads the checkpointed prefix, not a replayed ranking window") {
    // prefix is checkpointed after the frequency join + row_number
    // ranking; the candidate self-join and verify stages must contain
    // no window operator at all (round 6: the ranking window ran on
    // both join sides — 16 block reads).
    val df = Dedup.ngramJaccard(Tables(spark, "/root/testdata/sf0.01").documents)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"ranking window replayed in the ngramJaccard candidate plan:\n$plan")
    assert(!plan.contains("split("),
      s"tokenization replayed in the ngramJaccard candidate plan:\n$plan")
  }

  test("with broadcasting disabled the verify degrades to shuffled EQUI-joins — the 100 TB shape") {
    // The inverse pin of the bench-SF broadcast assertions above:
    // Dedup.scala's verify commentary claims that past the broadcast
    // threshold the SAME plan degrades to shuffled equi-joins —
    // linear, never a nested-loop. Prove it by forcing the
    // over-threshold regime (threshold = -1 disables broadcast
    // entirely, static and AQE-runtime alike) instead of waiting for
    // corpus stats to cross it.
    val thresholdKey = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(thresholdKey)
    spark.conf.set(thresholdKey, "-1")
    try {
      val df = Dedup.minhashLsh(Tables(spark, "/root/testdata/sf0.01").documents)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin")
        && !plan.contains("CartesianProduct"),
        s"non-equi join under disabled broadcast:\n$plan")
      assert(!plan.contains("BroadcastHashJoin"),
        s"broadcast join planned with the threshold disabled:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected shuffled equi-joins in the degraded plan:\n$plan")
    } finally spark.conf.set(thresholdKey, prev)
  }

  test("the checkpointed shingle frame shuffles at most once (its doc_id repartition)") {
    // Every Exchange directly over the ExistingRDD scan is the
    // user-numbered repartition from shingleRows; the verify joins
    // must not add shuffles of the corpus-sized shingle rows on top
    // (they either broadcast-build or reuse the existing partitioning).
    val shingleShuffles =
      """Exchange hashpartitioning\(doc_id#\d+L?, \d+\)""".r.findAllIn(verifiedPlan).length
    val shingleScans = "Scan ExistingRDD".r.findAllIn(verifiedPlan).length
    assert(shingleScans >= 3, s"expected the checkpointed shingle RDD to feed >=3 consumers")
    assert(shingleShuffles <= shingleScans,
      s"shingle scans re-shuffled beyond the doc_id repartition:\n$verifiedPlan")
  }
}
