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

  test("the (b, s) intersection join is a broadcast hash join at bench SF") {
    // The exact join of the skew fix: candidate (b, s) rows against
    // the narrow shingle frame. BuildRight = the shingle side while
    // its stats stay under the threshold; the LEFT (candidate) side
    // streams, so no candidate-row ever widens past a few dozen bytes.
    val bs = """BroadcastHashJoin \[b#\d+L?, s#\d+\], \[b2#\d+L?, s2#\d+\]""".r
    assert(bs.findFirstIn(verifiedPlan).isDefined,
      s"(b,s) x (b2,s2) BroadcastHashJoin not found in:\n$verifiedPlan")
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
