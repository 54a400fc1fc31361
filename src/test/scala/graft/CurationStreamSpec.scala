package graft

import graft.operators.{Curation, QualityModel, TextOps}
import graft.streaming.CurationStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Frozen-model streaming quality gate: every micro-batch's verdicts
  * must equal the one-shot batch gate on the same rows (per-document
  * features only — batch boundaries can never change a verdict).
  */
class CurationStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streamed quality-gate verdicts equal the batch gate doc-for-doc") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "lang", "text")
    // coefficients fit OFFLINE on the full corpus, then frozen
    val beta = QualityModel.fit(TextOps.withToks(docs))
    val rows = docs.as[(Long, String, String)].collect().toSeq
    val (batch1, batch2) = rows.splitAt(rows.length / 2)
    val input = MemoryStream[(Long, String, String)]
    val got = scala.collection.mutable.Map.empty[Long, Seq[String]]
    val q = CurationStream.qualityGateServe(
      input.toDF().toDF("doc_id", "lang", "text"), beta) {
      (df, id) => got.synchronized { got(id) = df.collect().map(_.toString).toSeq }
    }
    try {
      input.addData(batch1: _*); q.processAllAvailable()
      input.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()
    val snapshot = got.synchronized(got.toMap)
    assert(snapshot.keySet === Set(0L, 1L))
    def want(batch: Seq[(Long, String, String)]): Seq[String] =
      Curation.filterGateModel(batch.toDF("doc_id", "lang", "text"), beta)
        .collect().map(_.toString).toSeq
    assert(snapshot(0L) === want(batch1), "batch 1 verdicts drifted from the batch gate")
    assert(snapshot(1L) === want(batch2), "batch 2 verdicts drifted from the batch gate")
    // the gate actually discriminates on real data: both verdicts occur
    val keeps = snapshot.values.flatten.count(_.endsWith("true]"))
    assert(keeps > 0 && keeps < rows.length, s"degenerate gate: $keeps/${rows.length} kept")
  }

  test("streamed CCNet gate under the frozen LM equals the one-shot pplFilter doc-for-doc") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "lang", "text")
    // the LM + per-language terciles fit OFFLINE on the full corpus,
    // then frozen — the two artifacts CCNet ships
    val model = Curation.pplModel(docs)
    val rows = docs.as[(Long, String, String)].collect().toSeq
    val (batch1, batch2) = rows.splitAt(rows.length / 2)
    val input = MemoryStream[(Long, String, String)]
    val got = scala.collection.mutable.Map.empty[Long, Set[String]]
    val q = CurationStream.pplGateServe(
      input.toDF().toDF("doc_id", "lang", "text"), model) {
      (df, id) => got.synchronized { got(id) = df.collect().map(_.toString).toSet }
    }
    try {
      input.addData(batch1: _*); q.processAllAvailable()
      input.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()
    val snapshot = got.synchronized(got.toMap)
    assert(snapshot.keySet === Set(0L, 1L))
    // the model was fit on the full corpus, so every batch token is
    // in-vocabulary and the streamed union must equal the one-shot
    // batch operator exactly — batch boundaries never move a verdict
    val want = Curation.pplFilter(docs).collect().map(_.toString).toSet
    assert((snapshot(0L) ++ snapshot(1L)) === want,
      "streamed CCNet verdicts drifted from the one-shot pplFilter")
    assert(snapshot(0L).nonEmpty && snapshot(1L).nonEmpty)
    // OOV behavior: a doc whose tokens the frozen LM has never seen
    // reads maximum surprisal per token and must land in the TAIL
    // (dropped at the default rates)
    val oov = Curation.pplGate(model,
      Seq((999999L, "en", "zzqx9 wvvk7 qqpl3 zzqx9 wvvk7 mmnb2 zzqx9"))
        .toDF("doc_id", "lang", "text"))
    assert(oov.filter($"doc_id" === 999999L).count() === 0L,
      "an all-OOV doc must route to the tail bucket and be dropped")
    // UNMODELED LANGUAGE (advisor r15): a doc whose language has no
    // frozen threshold row must SURFACE (bucket `unmodeled`, kept at
    // the default rates) instead of vanishing through an inner join —
    // the silent-loss mode where a whole new-language micro-batch
    // disappeared from the serve with no signal.
    val newLang = Curation.pplGate(model,
      Seq((888888L, "xx", "the quick brown fox jumps over the lazy dog again"))
        .toDF("doc_id", "lang", "text")).cache()
    assert(newLang.filter($"doc_id" === 888888L).count() === 1L,
      "a new-language doc must not be silently dropped by the frozen-model gate")
    assert(newLang.filter($"doc_id" === 888888L)
      .select("bucket").head().getString(0) === "unmodeled")
    newLang.unpersist()
    // and an ingest that WANTS to drop them does so explicitly
    val dropped = Curation.pplGate(model,
      Seq((888888L, "xx", "the quick brown fox jumps over the lazy dog again"))
        .toDF("doc_id", "lang", "text"),
      rates = Map("head" -> 10000, "middle" -> 5000, "tail" -> 0, "unmodeled" -> 0))
    assert(dropped.filter($"doc_id" === 888888L).count() === 0L)
  }
}
