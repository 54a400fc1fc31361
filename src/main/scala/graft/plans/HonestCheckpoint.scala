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
  }
}
