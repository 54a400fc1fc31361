package graft

import graft.operators.Events
import graft.plans.{TopKLongPairs, TopKPairsBuffer}
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The bounded-heap grouped top-k aggregate: buffer-level ordering
  * contract, equivalence with the windowed top-N on real data, and
  * the plan property that justifies its existence (no Window sort of
  * the group anywhere).
  */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("buffer keeps k best pairs ordered score desc, id asc") {
    val b = new TopKPairsBuffer(3)
    Seq((5L, 9L), (1L, 1L), (5L, 2L), (7L, 4L), (3L, 3L), (5L, 1L)).foreach {
      case (s, i) => b.add(s, i)
    }
    assert(b.pairs === Seq((7L, 4L), (5L, 1L), (5L, 2L)))
  }

  test("buffer merge is the sorted union capped at k, regardless of split") {
    val all = Seq((5L, 9L), (1L, 1L), (5L, 2L), (7L, 4L), (3L, 3L), (5L, 1L), (7L, 9L))
    val expected = { val b = new TopKPairsBuffer(4); all.foreach { case (s, i) => b.add(s, i) }; b.pairs }
    (0 to all.length).foreach { cut =>
      val (l, r) = all.splitAt(cut)
      val bl = new TopKPairsBuffer(4); l.foreach { case (s, i) => bl.add(s, i) }
      val br = new TopKPairsBuffer(4); r.foreach { case (s, i) => br.add(s, i) }
      assert(bl.merge(br).pairs === expected, s"split at $cut")
    }
  }

  test("aggregate survives partial-agg machinery: same answer at 1 and 32 partitions") {
    val df = Seq.tabulate(500)(i => ((i % 7).toLong, (i * 37 % 101).toLong, i.toLong))
      .toDF("g", "score", "id")
    def run(p: Int) = df.repartition(p)
      .groupBy(col("g")).agg(TopKLongPairs(col("score"), col("id"), 5).as("top"))
      .select(col("g"), col("top").cast("string"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(run(1) === run(32))
  }

  test("topPartsHeap equals the row_number window top-3 on testdata") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    val got = Events.topPartsHeap(t.lineitem, t.part).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val w = Window.partitionBy(col("p_brand")).orderBy(col("revenue").desc, col("l_partkey"))
    val want = t.lineitem.join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("l_partkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(12,2)")
        * (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)"))).as("revenue"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("p_brand"), col("l_partkey"),
        (round(col("revenue"), 2).cast("double") + lit(0.0)).as("revenue"), col("rank"))
      .orderBy(col("p_brand"), col("rank"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(got.nonEmpty && got.toSeq === want.toSeq)
  }

  test("topk_pairs is callable from SQL with a literal k") {
    val df = Seq((1L, 10L, 100L), (1L, 20L, 200L), (1L, 30L, 300L))
      .toDF("g", "score", "id")
    df.createOrReplaceTempView("topk_sql_in")
    val got = spark.sql(
      "SELECT g, topk_pairs(score, id, 2) AS top FROM topk_sql_in GROUP BY g")
      .selectExpr("g", "top[0].id", "top[1].id").head()
    assert((got.getLong(1), got.getLong(2)) === (300L, 200L))
  }

  test("heap plan has no Window operator (ranking never sorts the group)") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    val plan = Events.topPartsHeap(t.lineitem, t.part).queryExecution.executedPlan.toString
    assert(plan.contains("topk_pairs"), "aggregate must appear in the physical plan")
    assert(!plan.contains("Window"), s"no window sort expected:\n$plan")
  }
}
