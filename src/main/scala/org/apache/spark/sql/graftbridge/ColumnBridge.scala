package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column ↔ Expression converters.
  * Lives under org.apache.spark.sql so graft's custom Catalyst
  * expressions can be exposed through the public Column API (the
  * supported pattern for Spark-native extension libraries).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame from a hand-built logical plan (for custom operators). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan):
      org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Analyzed logical plan of a DataFrame. */
  def planOf(df: org.apache.spark.sql.DataFrame):
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Eager localCheckpoint with HONEST post-materialization
    * statistics.
    *
    * `Dataset.localCheckpoint` carries the PRE-checkpoint size
    * estimate into the LogicalRDD it returns (SPARK-39869
    * semantics), and estimates through explode/join/window chains
    * routinely undershoot reality by orders of magnitude. Every
    * downstream join then decides broadcast-vs-shuffle on fiction:
    * at 100× bench scale a 536 MB checkpointed shingle frame was
    * planned as the BUILD side of BroadcastHashJoins — two
    * single-threaded driver hash-relation builds of 77 s and 39 s
    * (and at real cluster scale, a driver OOM instead). The blocks
    * are MATERIALIZED by the time this returns, so the real size is
    * sitting in the block manager; this helper rebinds the
    * LogicalRDD with `Statistics(sizeInBytes = actual)` and lets
    * every downstream join decide on truth. Behavior-neutral where
    * estimates were already honest (bench-SF plans unchanged — the
    * plan gate pins that).
    */
  def honestCheckpoint(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val out = df.localCheckpoint(true)
    out.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        val sc = df.sparkSession.sparkContext
        sc.getRDDStorageInfo.find(_.id == l.rdd.id) match {
          case Some(info) if info.memSize + info.diskSize > 0 =>
            val honest = new org.apache.spark.sql.execution.LogicalRDD(
              l.output, l.rdd, l.outputPartitioning, l.outputOrdering,
              l.isStreaming, l.stream)(
              df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
              Some(org.apache.spark.sql.catalyst.plans.logical.Statistics(
                sizeInBytes = info.memSize + info.diskSize)),
              None)
            ofRows(df.sparkSession, honest)
          case _ => out
        }
      case _ => out
    }
  }
}
