package graft

import graft.operators.SecondarySort
import org.apache.spark.sql.functions._

/** The secondary-sort contract: plan = one hash Exchange + a
  * partition-LOCAL sort (nothing global), and every key's rows arrive
  * contiguously in order inside mapPartitions.
  */
class SecondarySortSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq.tabulate(200)(i => ((i % 7).toLong, (97 - i).toLong, i.toLong))
    .toDF("k", "ord", "payload")

  test("plan is Exchange hashpartitioning + local sort, no global sort") {
    val plan = SecondarySort.clusterSort(df, Seq("k"), Seq("ord"), Some(8))
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning"), plan)
    assert(plan.contains("Sort [") && plan.contains("false, 0"),
      s"expected a non-global sort:\n$plan") // Sort(..., global=false, ...)
    assert(!plan.contains("rangepartitioning"), s"no global sort exchange expected:\n$plan")
  }

  test("each key's rows are contiguous and ordered within a partition") {
    val sorted = SecondarySort.clusterSort(df, Seq("k"), Seq("ord"), Some(8))
    val perPartition = sorted.select("k", "ord").as[(Long, Long)]
      .mapPartitions(it => Iterator.single(it.toVector)).collect()
    assert(perPartition.map(_.size).sum === 200)
    perPartition.foreach { rows =>
      // grouped: a key never reappears after a different key
      val keyRuns = rows.map(_._1).foldLeft(Vector.empty[Long]) {
        (acc, k) => if (acc.lastOption.contains(k)) acc else acc :+ k
      }
      assert(keyRuns.distinct === keyRuns, s"keys interleaved: $keyRuns")
      // ordered within each key
      rows.groupBy(_._1).values.foreach { g =>
        assert(g.map(_._2) === g.map(_._2).sorted)
      }
    }
  }
}
