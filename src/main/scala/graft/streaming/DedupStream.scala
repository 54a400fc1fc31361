package graft.streaming

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}

/** Incremental (streaming) exact deduplication — the continuous form
  * of [[graft.operators.Dedup.exact]] for an ever-growing corpus:
  * every arriving document is verdicted against all content EVER
  * seen, not just the current micro-batch.
  *
  * State is keyed by the content hash and holds ONE long (the keeper
  * doc_id) per distinct content — the same O(distinct) bound as the
  * batch aggregation, now resident in the state store and carried
  * across micro-batches/restarts by checkpointing. Within a batch the
  * keeper is the minimum doc_id (matching the batch operator); across
  * batches the FIRST-seen keeper wins — the incremental contract (a
  * later, smaller doc_id cannot retroactively re-keep content that
  * already streamed through downstream sinks).
  */
object DedupStream {

  case class Doc(doc_id: Long, text: String)

  /** keep = this doc is the canonical copy; keeper_id = the canonical
    * doc for its content (itself when keep).
    */
  case class Verdict(doc_id: Long, keep: Boolean, keeper_id: Long)

  /** Null text is a legal corpus shape (the batch operator's
    * md5(NULL) groups all nulls together); a sentinel key mirrors
    * that instead of NPE-poisoning the stream — a crashing record
    * would replay from the checkpoint forever.
    */
  private def contentHash(text: String): String =
    if (text == null) "__null__"
    else MessageDigest.getInstance("MD5").digest(text.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  def exactDedup(docs: Dataset[Doc]): Dataset[Verdict] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(d => contentHash(d.text))
      .flatMapGroupsWithState[Long, Verdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, batch: Iterator[Doc], state: GroupState[Long]) =>
          val ids = batch.map(_.doc_id).toVector.sorted
          val keeper = state.getOption.getOrElse(ids.head)
          if (!state.exists) state.update(keeper)
          ids.iterator.map(id => Verdict(id, id == keeper, keeper))
      }
  }
}
