package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Syntax for [[ColumnBridge.honestCheckpoint]] — the eager
  * localCheckpoint whose statistics reflect the MATERIALIZED size
  * instead of the pre-checkpoint estimate, so downstream joins
  * decide broadcast-vs-shuffle on truth. Use this for every
  * checkpointed frame that is later JOINED (shingle frames, rank
  * prefixes, code tables); the stock `.localCheckpoint(true)` is
  * fine for frames that are only scanned/written.
  */
object HonestCheckpoint {
  implicit class HonestCheckpointOps(private val df: DataFrame) extends AnyVal {
    def honestCheckpoint(): DataFrame = ColumnBridge.honestCheckpoint(df)

    /** [[honestCheckpoint]] that re-declares the hash partitioning an
      * explicit `repartition(n, cols)` physically gave the frame (AQE
      * checkpoints otherwise surface as Unknown partitioning and
      * force downstream re-shuffles). ONLY call directly above that
      * repartition — see ColumnBridge.honestCheckpointHashPartitioned.
      */
    def honestCheckpointHashPartitioned(n: Int, cols: String*): DataFrame =
      ColumnBridge.honestCheckpointHashPartitioned(df, cols, n)
  }
}
