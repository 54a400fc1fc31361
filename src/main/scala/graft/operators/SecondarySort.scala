package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Secondary sort — the "cluster by key, iterate each key's rows in
  * order" contract that per-partition sequential algorithms need
  * (time-series replay, legacy record formats, run-length encoders):
  * one hash Exchange on the keys, then a PARTITION-LOCAL sort on
  * (keys ++ order columns). No global sort, no range exchange — at
  * 100 TB the local sorts run fully parallel and spill per-partition,
  * while a global `orderBy` would range-partition and resort the
  * world.
  *
  * After [[clusterSort]], a `mapPartitions` sees every row of a key
  * contiguously, in order — the Hadoop-era secondary-sort pattern as
  * two declarative operators (SortSpec asserts the plan shape:
  * Exchange hashpartitioning + local Sort, nothing global).
  */
object SecondarySort {
  def clusterSort(df: DataFrame, partCols: Seq[String], orderCols: Seq[String],
                  numPartitions: Option[Int] = None): DataFrame = {
    val keys = partCols.map(col)
    val base = numPartitions match {
      case Some(n) => df.repartition(n, keys: _*)
      case None    => df.repartition(keys: _*)
    }
    base.sortWithinPartitions((partCols ++ orderCols).map(col): _*)
  }
}
