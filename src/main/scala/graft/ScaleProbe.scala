package graft

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Scale probe: replicate sf0.1 ~10× into /tmp and measure how the
  * heavy pipelines scale. Replicas perturb identity columns (and
  * append a replica token to document text) so per-key series grow
  * 10× deep while duplicate structure stays linear — the honest
  * scale-up, not a degenerate 100×-duplicates corpus.
  *
  * Dev tool — not part of the driver contract.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("scale-probe")
    import spark.implicits._
    val src = Tables(spark, "/root/testdata/sf0.1")
    val base = "/tmp/graft_scale10"
    val replicas = 10

    def replicate(df: DataFrame, idCols: Seq[String], textCol: Option[String] = None): DataFrame = {
      val r = df.crossJoin(spark.range(replicas).toDF("rep"))
      val withIds = idCols.foldLeft(r) { (d, c) =>
        d.withColumn(c, col(c) + col("rep") * 100000000L)
      }
      textCol.fold(withIds)(tc =>
        withIds.withColumn(tc, concat(col(tc), lit(" r"), col("rep")))).drop("rep")
    }

    // events: same users (series get 10x deeper), new event ids
    replicate(src.events, Seq("event_id")).write.mode(SaveMode.Overwrite)
      .parquet(s"$base/events10.parquet")
    replicate(src.documents, Seq("doc_id"), Some("text")).write.mode(SaveMode.Overwrite)
      .parquet(s"$base/documents10.parquet")
    replicate(src.lineitem, Seq("l_orderkey")).write.mode(SaveMode.Overwrite)
      .parquet(s"$base/lineitem10.parquet")
    // Embeddings additionally perturb the VECTOR per replica with
    // HASH-decorrelated deterministic noise (uniform-ish ±0.6 per
    // dim; noise norm ~2.3 vs vector norm ~1) so replica-to-original
    // cosine lands ~0.35 — below the 0.45 near-dup threshold — and
    // noise is independent BETWEEN vectors (a shared waveform like
    // sin(id + i) correlates across ids and manufactures fake pairs).
    // Id-only perturbation would leave every vector 9 cosine-1.0
    // copies: a degenerate corpus where near-dup volume and ANN top-k
    // are dominated by self-copies. Replica 0 keeps the originals.
    replicate(src.embeddings, Seq("vec_id"))
      .withColumn("embedding", expr(
        "transform(embedding, (x, i) -> CAST(x + (hash(vec_id, i) % 1000) / 1000.0 * 0.6" +
          " * least(vec_id DIV 100000000, 1) AS FLOAT))"))
      .write.mode(SaveMode.Overwrite)
      .parquet(s"$base/embeddings10.parquet")

    val events10 = spark.read.parquet(s"$base/events10.parquet")
    val docs10 = spark.read.parquet(s"$base/documents10.parquet")
    val li10 = spark.read.parquet(s"$base/lineitem10.parquet")
    val emb10 = spark.read.parquet(s"$base/embeddings10.parquet")
    println(s"rows: events=${events10.count()} docs=${docs10.count()} " +
      s"lineitem=${li10.count()} embeddings=${emb10.count()}")

    def time(name: String)(f: => Long): Double = {
      def once(): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      val t = math.min(once(), once())
      println(f"$name%-22s $t%7.2f s")
      t
    }

    // 1x baselines on the same session for a fair ratio
    val e1 = src.events; val d1 = src.documents; val l1 = src.lineitem
    println("== 1x (sf0.1) ==")
    val b = Map(
      "q1_pricing" -> time("q1_pricing")(operators.Analytics.pricingSummary(l1).count()),
      "daily_ohlc" -> time("daily_ohlc")(operators.FinAnalytics.dailyOhlc(e1).count()),
      "moving_avg" -> time("moving_avg")(operators.FinAnalytics.movingAvg(e1).count()),
      "beta" -> time("beta")(operators.FinAnalytics.beta(e1).count()),
      "asof" -> time("asof")(operators.FinAnalytics.asofPrice(e1).count()),
      "sessionize" -> time("sessionize")(operators.Events.sessionize(e1).count()),
      "minhash" -> time("minhash")(operators.Dedup.minhashLsh(d1).count()),
      "simhash" -> time("simhash")(operators.Dedup.simhash(d1).count()),
      "ngram" -> time("ngram")(operators.Dedup.ngramJaccard(d1).count()),
      "exact_dedup" -> time("exact_dedup")(operators.Dedup.exact(d1).count()),
      "quantiles" -> time("quantiles")(operators.FinAnalytics.valueQuantiles(e1).count()),
      "quantiles_sketch" -> time("quantiles_sketch")(operators.FinAnalytics.quantileSketch(e1).count()),
      "feature_snapshot" -> time("feature_snapshot")(operators.FinAnalytics.featureSnapshot(e1).count()),
      "funnel" -> time("funnel")(operators.Events.funnel(e1).count()),
      "rollup" -> time("rollup")(operators.Events.rollupTypeDay(e1).count()),
      "ewma" -> time("ewma")(operators.FinAnalytics.ewma(e1).count()),
      "topk_heap" -> time("topk_heap")(operators.Events.topPartsHeap(l1, src.part).count()),
      "pack" -> time("pack")(operators.Curation.packSequences(d1).count()),
      "tfidf" -> time("tfidf")(operators.TextOps.tfidf(d1).count()),
      // FIXED query set at both scales (the parameterized API): at
      // real scale the query table is bounded, it does not grow with
      // the corpus — the default vec_id%100 rule exists for the
      // oracle gate only.
      // corpus-subset frame -> keep self-exclusion ON so the probe
      // measures the same computation as the gated default path
      "ann_lsh" -> time("ann_lsh")(operators.Similarity.annLsh(src.embeddings,
        Some(src.embeddings.filter(col("vec_id") % 100 === 0)),
        queriesAreCorpusDerived = Some(true)).count()),
      "embed_neardup" -> time("embed_neardup")(operators.Similarity.embeddingNearDup(src.embeddings).count()),
      "attribution" -> time("attribution")(operators.Events.attribution(e1).count()),
      "cohort" -> time("cohort")(operators.Events.cohortRetention(e1).count()),
      "resample_ffill" -> time("resample_ffill")(operators.FinAnalytics.resampleFfill(e1).count()),
      "corr_pairs" -> time("corr_pairs")(operators.FinAnalytics.corrPairs(e1).count()),
      "range_day_sum" -> time("range_day_sum")(operators.FinAnalytics.rangeDaySum(e1).count()),
      "macd" -> time("macd")(operators.FinAnalytics.macd(e1).count()),
      "gap_quantiles" -> time("gap_quantiles")(operators.Events.gapQuantiles(e1).count()),
      "repetition" -> time("repetition")(operators.TextOps.repetition(d1).count()),
      "token_budget" -> time("token_budget")(operators.Curation.tokenBudget(d1).count()),
      // FIXED query set at both scales, like ann_lsh above
      "ann_pq" -> time("ann_pq")(operators.Similarity.annPq(src.embeddings,
        Some(src.embeddings.filter(col("vec_id") % 100 === 0)),
        queriesAreCorpusDerived = Some(true)).count()),
      // learn/eval family: model size is FIXED (7 coefficients / 10
      // stumps / 5 folds) — only the histogram/Gram scans grow
      "ridge" -> time("ridge")(operators.Ridge.predict(e1).count()),
      "gbt" -> time("gbt")(operators.GradientBoost.predict(e1).count()),
      "time_split" -> time("time_split")(operators.Curation.timeSplit(e1).count()),
      "cv_eval" -> time("cv_eval")(operators.CvEval.ridgeCv(e1).count()),
      // round-6 additions: the CC+apply chain (double-step label
      // propagation + label reuse) and the corpus-wide surprisal join
      "components" -> time("components")(operators.Dedup.components(d1).count()),
      "surprisal" -> time("surprisal")(operators.TextOps.surprisal(d1).count()),
      "histogram" -> time("histogram")(operators.Events.histogram(e1).count()),
      // round-6/7/8 additions: the indicator family (windowed bar
      // chains over per-user daily closes), the wide-info snapshot
      // join, and the IVF-PQ composite (fixed query set, like ann_pq)
      "vwap" -> time("vwap")(operators.FinAnalytics.vwap(e1).count()),
      "stochastic" -> time("stochastic")(operators.FinAnalytics.stochastic(e1).count()),
      "obv" -> time("obv")(operators.FinAnalytics.obv(e1).count()),
      "atr" -> time("atr")(operators.FinAnalytics.atr(e1).count()),
      "info_snapshot" -> time("info_snapshot")(operators.FinAnalytics.infoSnapshot(e1, src.customer).count()),
      "ann_ivfpq" -> time("ann_ivfpq")(operators.Similarity.annIvfPq(src.embeddings,
        Some(src.embeddings.filter(col("vec_id") % 100 === 0)),
        queriesAreCorpusDerived = Some(true)).count()))
    println("== 10x ==")
    val s = Map(
      "q1_pricing" -> time("q1_pricing")(operators.Analytics.pricingSummary(li10).count()),
      "daily_ohlc" -> time("daily_ohlc")(operators.FinAnalytics.dailyOhlc(events10).count()),
      "moving_avg" -> time("moving_avg")(operators.FinAnalytics.movingAvg(events10).count()),
      "beta" -> time("beta")(operators.FinAnalytics.beta(events10).count()),
      "asof" -> time("asof")(operators.FinAnalytics.asofPrice(events10).count()),
      "sessionize" -> time("sessionize")(operators.Events.sessionize(events10).count()),
      "minhash" -> time("minhash")(operators.Dedup.minhashLsh(docs10).count()),
      "simhash" -> time("simhash")(operators.Dedup.simhash(docs10).count()),
      "ngram" -> time("ngram")(operators.Dedup.ngramJaccard(docs10).count()),
      "exact_dedup" -> time("exact_dedup")(operators.Dedup.exact(docs10).count()),
      "quantiles" -> time("quantiles")(operators.FinAnalytics.valueQuantiles(events10).count()),
      "quantiles_sketch" -> time("quantiles_sketch")(operators.FinAnalytics.quantileSketch(events10).count()),
      "feature_snapshot" -> time("feature_snapshot")(operators.FinAnalytics.featureSnapshot(events10).count()),
      "funnel" -> time("funnel")(operators.Events.funnel(events10).count()),
      "rollup" -> time("rollup")(operators.Events.rollupTypeDay(events10).count()),
      "ewma" -> time("ewma")(operators.FinAnalytics.ewma(events10).count()),
      "topk_heap" -> time("topk_heap")(operators.Events.topPartsHeap(li10, src.part).count()),
      "pack" -> time("pack")(operators.Curation.packSequences(docs10).count()),
      "tfidf" -> time("tfidf")(operators.TextOps.tfidf(docs10).count()),
      "ann_lsh" -> time("ann_lsh")(operators.Similarity.annLsh(emb10,
        Some(src.embeddings.filter(col("vec_id") % 100 === 0)),
        queriesAreCorpusDerived = Some(true)).count()),
      // Θ(n²) by definition — expect ~100x here; recorded to keep the
      // exact-baseline cost visible next to its sub-quadratic companions
      "embed_neardup" -> time("embed_neardup")(operators.Similarity.embeddingNearDup(emb10).count()),
      "attribution" -> time("attribution")(operators.Events.attribution(events10).count()),
      "cohort" -> time("cohort")(operators.Events.cohortRetention(events10).count()),
      "resample_ffill" -> time("resample_ffill")(operators.FinAnalytics.resampleFfill(events10).count()),
      // watchlist size is FIXED (top 20) — the pair fan-out must not
      // grow with corpus depth, only the per-day return series does
      "corr_pairs" -> time("corr_pairs")(operators.FinAnalytics.corrPairs(events10).count()),
      "range_day_sum" -> time("range_day_sum")(operators.FinAnalytics.rangeDaySum(events10).count()),
      "macd" -> time("macd")(operators.FinAnalytics.macd(events10).count()),
      "gap_quantiles" -> time("gap_quantiles")(operators.Events.gapQuantiles(events10).count()),
      "repetition" -> time("repetition")(operators.TextOps.repetition(docs10).count()),
      // budget scales with the corpus so the probe measures the
      // prefix-sum machinery, not a fixed-size early cut
      "token_budget" -> time("token_budget")(operators.Curation.tokenBudget(docs10, budget = 100000L).count()),
      "ann_pq" -> time("ann_pq")(operators.Similarity.annPq(emb10,
        Some(src.embeddings.filter(col("vec_id") % 100 === 0)),
        queriesAreCorpusDerived = Some(true)).count()),
      "ridge" -> time("ridge")(operators.Ridge.predict(events10).count()),
      "gbt" -> time("gbt")(operators.GradientBoost.predict(events10).count()),
      "time_split" -> time("time_split")(operators.Curation.timeSplit(events10).count()),
      "cv_eval" -> time("cv_eval")(operators.CvEval.ridgeCv(events10).count()),
      "components" -> time("components")(operators.Dedup.components(docs10).count()),
      "surprisal" -> time("surprisal")(operators.TextOps.surprisal(docs10).count()),
      "histogram" -> time("histogram")(operators.Events.histogram(events10).count()),
      "vwap" -> time("vwap")(operators.FinAnalytics.vwap(events10).count()),
      "stochastic" -> time("stochastic")(operators.FinAnalytics.stochastic(events10).count()),
      "obv" -> time("obv")(operators.FinAnalytics.obv(events10).count()),
      "atr" -> time("atr")(operators.FinAnalytics.atr(events10).count()),
      // customer dim stays 1x — the snapshot join's broadcast side is
      // a bounded dimension at any corpus scale
      "info_snapshot" -> time("info_snapshot")(operators.FinAnalytics.infoSnapshot(events10, src.customer).count()),
      "ann_ivfpq" -> time("ann_ivfpq")(operators.Similarity.annIvfPq(emb10,
        Some(src.embeddings.filter(col("vec_id") % 100 === 0)),
        queriesAreCorpusDerived = Some(true)).count()))
    println("== scaling factor (10x data / 1x time; 10 = linear) ==")
    b.keys.toSeq.sorted.foreach { k =>
      println(f"$k%-22s ${s(k) / b(k)}%6.1f x")
    }
    spark.stop()
  }
}
