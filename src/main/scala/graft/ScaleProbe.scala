package graft

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Scale probe: replicate sf0.1 N× into /tmp and measure how the
  * heavy pipelines scale. Replicas perturb identity columns (and
  * bijectively rename document tokens per replica) so per-key series
  * grow N× deep while duplicate structure stays linear — the honest
  * scale-up, not a degenerate N×-duplicates corpus.
  *
  * Usage: `graft.ScaleProbe [replicas] [probe ...]` — replicas
  * defaults to 10 (the full 44-probe sweep); a probe-name filter
  * selects a subset (the 100× spot-run covers the heaviest families
  * only: the Θ(n²) exact baseline at 100× would be 10000× its 1×
  * time by design, and the cheap linear probes add no information
  * past the 10× decade).
  *
  * Dev tool — not part of the driver contract.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val replicas = args.headOption.map(_.toInt).getOrElse(10)
    val only: Set[String] = args.drop(1).toSet
    val spark = GraftSession.get("scale-probe")
    val src = Tables(spark, "/root/testdata/sf0.1")
    // The _SUCCESS reuse check below is keyed on this path: bump
    // recipeVersion whenever the replication RECIPE changes, or a
    // machine that ran the old recipe silently re-measures stale
    // replicas (the round-8 trailing-token corpus). The serve-probe
    // INDEX dirs embed the same version, so a recipe bump also
    // invalidates the frozen probe indexes (an equal-count recipe
    // change would otherwise serve a stale index — the corpus-count
    // fingerprint can't see it).
    val recipeVersion = "v2"
    val base = s"/tmp/graft_scale${replicas}_$recipeVersion"
    // Stale-recipe replicas (the unversioned/_v1 paths) are multi-GB
    // and nothing re-reads them once the recipe version bumps —
    // best-effort delete them so they don't linger until the machine
    // cleans /tmp.
    Seq(s"/tmp/graft_scale$replicas", s"/tmp/graft_scale${replicas}_v1").foreach { stale =>
      val p = java.nio.file.Paths.get(stale)
      if (java.nio.file.Files.exists(p)) {
        try {
          java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
            .forEach(f => java.nio.file.Files.deleteIfExists(f))
          println(s"deleted stale replica dir $stale")
        } catch { case e: Exception => println(s"stale-dir cleanup skipped ($stale): $e") }
      }
    }

    def replicate(df: DataFrame, idCols: Seq[String], textCol: Option[String] = None): DataFrame = {
      val r = df.crossJoin(spark.range(replicas).toDF("rep"))
      val withIds = idCols.foldLeft(r) { (d, c) =>
        d.withColumn(c, col(c) + col("rep") * 100000000L)
      }
      // Text perturbation must decorrelate at the SHINGLE level, not
      // the document level. Appending one trailing token (the round-8
      // recipe) leaves replica copies sharing all but the last
      // shingle — J ≈ (n−2)/(n+2) ≈ 0.89 on these ~35-token docs, so
      // every doc gained replicas−1 genuine ≥0.8 near-dup twins and
      // the pair-based probes (minhash/simhash/ngram/components)
      // measured a duplicate mass growing QUADRATICALLY in replicas
      // (first seen as components "161×" at 100×). Partial marker
      // interleaving is not enough either: cross-replica J ~0.34
      // still sits ABOVE the 16-band/2-row S-curve midpoint
      // ((1/16)^(1/2) = 0.25), so ~87% of the quadratic cross-pair
      // universe still surfaced as LSH candidates for the verify to
      // reject. The clean construction is a PER-REPLICA TOKEN RENAME
      // (suffix every token with the replica id): a bijective rename
      // preserves within-replica Jaccard EXACTLY (the original
      // near-dup clusters replicate, linear in replicas) while
      // cross-replica shingle sets are disjoint — J = 0, no band
      // collisions beyond random 64-bit ones.
      textCol.fold(withIds)(tc =>
        withIds.withColumn(tc, regexp_replace(col(tc),
          lit("(\\S+)"), concat(lit("$1r"), col("rep"))))).drop("rep")
    }

    // Replicas are content-deterministic per (source, replicas), so a
    // completed write (marked by _SUCCESS) is reused across probe
    // invocations — a 100× rerun then measures, not re-replicates.
    // Per-table so adding a new variant table doesn't rewrite the rest.
    def writeIfMissing(name: String)(df: => DataFrame): Unit =
      if (!java.nio.file.Files.exists(
          java.nio.file.Paths.get(s"$base/$name.parquet/_SUCCESS")))
        df.write.mode(SaveMode.Overwrite).parquet(s"$base/$name.parquet")

    // events: same users (series get N× deeper), new event ids
    writeIfMissing("events")(replicate(src.events, Seq("event_id")))
    writeIfMissing("documents")(replicate(src.documents, Seq("doc_id"), Some("text")))
    // documents_hist: the payload-near-dup variant. The token rename
    // decorrelates SHINGLES but leaves nibble HISTOGRAMS identical
    // across replicas ('r' + any digit shifts bins 7 and 3 equally
    // for every replica id), so every doc would gain replicas−1
    // byte-histogram twins and the mm probe's output would grow
    // quadratically in replicas — the same degenerate-corpus trap
    // the rename fixed for the shingle probes. Appending a
    // replica-PROPORTIONAL run of a 2-byte UTF-8 char ('Ā' →
    // C4 80, bins C and 8) shifts each replica's normalized
    // histogram by ~(rep+1)% — pairwise ≥ 1% apart, far above the
    // 1/200 threshold — while within-replica near-dup structure is
    // preserved exactly (same-length docs get same-length runs).
    writeIfMissing("documents_hist")(
      src.documents.crossJoin(spark.range(replicas).toDF("rep"))
        .withColumn("doc_id", col("doc_id") + col("rep") * 100000000L)
        .withColumn("text", concat(col("text"),
          expr("repeat(chr(256), CAST((rep + 1) * ceil(length(text) / 100.0) AS INT))")))
        .drop("rep"))
    writeIfMissing("lineitem")(replicate(src.lineitem, Seq("l_orderkey")))
    // Embeddings additionally perturb the VECTOR per replica with
    // HASH-decorrelated deterministic noise (uniform-ish ±0.6 per
    // dim; noise norm ~2.3 vs vector norm ~1) so replica-to-original
    // cosine lands ~0.35 — below the 0.45 near-dup threshold — and
    // noise is independent BETWEEN vectors (a shared waveform like
    // sin(id + i) correlates across ids and manufactures fake pairs).
    // Id-only perturbation would leave every vector N-1 cosine-1.0
    // copies: a degenerate corpus where near-dup volume and ANN top-k
    // are dominated by self-copies. Replica 0 keeps the originals.
    writeIfMissing("embeddings")(
      replicate(src.embeddings, Seq("vec_id"))
        .withColumn("embedding", expr(
          "transform(embedding, (x, i) -> CAST(x + (hash(vec_id, i) % 1000) / 1000.0 * 0.6" +
            " * least(vec_id DIV 100000000, 1) AS FLOAT))")))

    val eventsN = spark.read.parquet(s"$base/events.parquet")
    val docsN = spark.read.parquet(s"$base/documents.parquet")
    val docsHistN = spark.read.parquet(s"$base/documents_hist.parquet")
    val liN = spark.read.parquet(s"$base/lineitem.parquet")
    val embN = spark.read.parquet(s"$base/embeddings.parquet")
    println(s"rows: events=${eventsN.count()} docs=${docsN.count()} " +
      s"lineitem=${liN.count()} embeddings=${embN.count()}")

    // Fixed query set for the ann* probes AT BOTH SCALES (the
    // parameterized API): at real scale the query table is bounded,
    // it does not grow with the corpus — the default vec_id%100 rule
    // exists for the oracle gate only. Self-exclusion stays ON so the
    // probe measures the same computation as the gated default path.
    val fixedQ = Some(src.embeddings.filter(col("vec_id") % 100 === 0))

    // Frozen ppl model memo for the ppl_gate_serve probe: first
    // timed run fits, min-of-2 reads serve-only (the in-memory
    // analog of the on-disk index-detection pattern below).
    val pplModels = scala.collection.mutable.Map.empty[Long, operators.Curation.PplModel]
    // ann_opq_aniso's per-scale prepared corpus/queries (the recall
    // comparison runs once, inside the memo — see the probe).
    val anisoData = scala.collection.mutable.Map.empty[Long, (DataFrame, DataFrame)]
    def anisoPrep(k: Long): (DataFrame, DataFrame) = anisoData.getOrElseUpdate(k, {
      import spark.implicits._
      val n = 500 * k.toInt
      val rng = new scala.util.Random(7)
      val centers = Array.fill(8, 8)((rng.nextDouble() * 2 - 1).toFloat)
      val rows = (0 until n).map { i =>
        val c = centers(i % 8)
        val sig = c.map(v => v + (rng.nextDouble() * 0.2 - 0.1).toFloat)
        val noise = Array.fill(56)((rng.nextDouble() * 0.02 - 0.01).toFloat)
        (i.toLong, sig ++ noise)
      }
      val corpus = rows.toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
        .localCheckpoint(true)
      val queries = corpus.filter(col("vec_id") % 100 === 0).localCheckpoint(true)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))
      val exact = corpus.join(broadcast(queries.select(col("vec_id").as("query_id"),
          col("embedding").as("qe"))), col("vec_id") =!= col("query_id"))
        .withColumn("cosine", functions.VectorFunctions.cosineExact(
          functions.VectorFunctions.decDot(col("qe"), col("embedding")),
          functions.VectorFunctions.decNorm2(col("qe")),
          functions.VectorFunctions.decNorm2(col("embedding"))))
        .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
        .select(col("query_id"), col("vec_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      def recall(df: DataFrame): Double =
        df.collect().count(r => exact.contains((r.getLong(0), r.getLong(1)))).toDouble / exact.size
      val flat = recall(operators.Similarity.annPq(corpus, Some(queries),
        queriesAreCorpusDerived = Some(true)))
      val opq = recall(operators.Similarity.annOpq(corpus, Some(queries),
        queriesAreCorpusDerived = Some(true)))
      // do the two recall levers COMPOSE? round 16 measured the
      // rotation's win persisting at 10x but absolute recall
      // collapsing under the fixed cb=8 budget; the production
      // combination is rotation + wide codebooks
      val flatW = recall(operators.Similarity.annPq(corpus, Some(queries),
        codebookSize = 64, queriesAreCorpusDerived = Some(true)))
      val opqW = recall(operators.Similarity.annOpq(corpus, Some(queries),
        codebookSize = 64, queriesAreCorpusDerived = Some(true)))
      println(f"    [aniso n=$n] recall@5 flat=$flat%.3f opq=$opq%.3f (win ${opq - flat}%+.3f)"
        + f" | cb=64: flat=$flatW%.3f opq=$opqW%.3f (win ${opqW - flatW}%+.3f)")
      (corpus, queries)
    })

    // name -> (events, docs, lineitem, embeddings, scaleMult) => row
    // count; scaleMult is 1 on the baseline pass and `replicas` on
    // the scaled pass, for the probes whose PARAMETER must track
    // corpus size (token_budget) — a fixed budget at both scales
    // would compare unlike workloads (1x with a corpus-dwarfing
    // budget degenerates to keep-everything).
    // Scale notes carried over from the round-6..8 sweeps:
    // - embed_neardup is Θ(n²) BY DEFINITION — recorded to keep the
    //   exact-baseline cost visible next to its sub-quadratic
    //   companions; expect replicas² here, never include it at 100×.
    // - corr_pairs: watchlist size is FIXED (top 20) — the pair
    //   fan-out must not grow with corpus depth, only the per-day
    //   return series does.
    // - token_budget: budget scales with the corpus so the probe
    //   measures the prefix-sum machinery, not a fixed-size early cut.
    // - learn/eval family (ridge/gbt/cv_eval): model size is FIXED
    //   (7 coefficients / 10 stumps / 5 folds) — only the
    //   histogram/Gram scans grow.
    // - info_snapshot: customer dim stays 1× — the snapshot join's
    //   broadcast side is a bounded dimension at any corpus scale.
    val probes: Seq[(String, (DataFrame, DataFrame, DataFrame, DataFrame, Long) => Long)] = Seq(
      "q1_pricing" -> ((_, _, l, _, _) => operators.Analytics.pricingSummary(l).count()),
      "daily_ohlc" -> ((e, _, _, _, _) => operators.FinAnalytics.dailyOhlc(e).count()),
      "moving_avg" -> ((e, _, _, _, _) => operators.FinAnalytics.movingAvg(e).count()),
      "beta" -> ((e, _, _, _, _) => operators.FinAnalytics.beta(e).count()),
      "asof" -> ((e, _, _, _, _) => operators.FinAnalytics.asofPrice(e).count()),
      "sessionize" -> ((e, _, _, _, _) => operators.Events.sessionize(e).count()),
      "minhash" -> ((_, d, _, _, _) => operators.Dedup.minhashLsh(d).count()),
      "simhash" -> ((_, d, _, _, _) => operators.Dedup.simhash(d).count()),
      "ngram" -> ((_, d, _, _, _) => operators.Dedup.ngramJaccard(d).count()),
      "exact_dedup" -> ((_, d, _, _, _) => operators.Dedup.exact(d).count()),
      "quantiles" -> ((e, _, _, _, _) => operators.FinAnalytics.valueQuantiles(e).count()),
      "quantiles_sketch" -> ((e, _, _, _, _) => operators.FinAnalytics.quantileSketch(e).count()),
      "feature_snapshot" -> ((e, _, _, _, _) => operators.FinAnalytics.featureSnapshot(e).count()),
      "funnel" -> ((e, _, _, _, _) => operators.Events.funnel(e).count()),
      "rollup" -> ((e, _, _, _, _) => operators.Events.rollupTypeDay(e).count()),
      "ewma" -> ((e, _, _, _, _) => operators.FinAnalytics.ewma(e).count()),
      "topk_heap" -> ((_, _, l, _, _) => operators.Events.topPartsHeap(l, src.part).count()),
      "pack" -> ((_, d, _, _, _) => operators.Curation.packSequences(d).count()),
      "tfidf" -> ((_, d, _, _, _) => operators.TextOps.tfidf(d).count()),
      "ann_lsh" -> ((_, _, _, em, _) => operators.Similarity.annLsh(em, fixedQ,
        queriesAreCorpusDerived = Some(true)).count()),
      "embed_neardup" -> ((_, _, _, em, _) => operators.Similarity.embeddingNearDup(em).count()),
      "attribution" -> ((e, _, _, _, _) => operators.Events.attribution(e).count()),
      "cohort" -> ((e, _, _, _, _) => operators.Events.cohortRetention(e).count()),
      "resample_ffill" -> ((e, _, _, _, _) => operators.FinAnalytics.resampleFfill(e).count()),
      "corr_pairs" -> ((e, _, _, _, _) => operators.FinAnalytics.corrPairs(e).count()),
      "range_day_sum" -> ((e, _, _, _, _) => operators.FinAnalytics.rangeDaySum(e).count()),
      "macd" -> ((e, _, _, _, _) => operators.FinAnalytics.macd(e).count()),
      "gap_quantiles" -> ((e, _, _, _, _) => operators.Events.gapQuantiles(e).count()),
      "session_quantiles" -> ((e, _, _, _, _) => operators.Events.sessionQuantiles(e).count()),
      "repetition" -> ((_, d, _, _, _) => operators.TextOps.repetition(d).count()),
      // first-occurrence passage/substring dedup (round-17 packed-
      // decimal hash aggregates + round-18 winner retrieval): the
      // exploded window frame is n·tokens/w resp. n/stride rows, so
      // these rows pin that the first-occurrence aggregation stays
      // ~linear (no corpus-scale sort re-entering through a refactor)
      "dedup_passages" -> ((_, d, _, _, _) => operators.Dedup.passages(d).count()),
      "dedup_substring" -> ((_, d, _, _, _) => operators.Dedup.substrings(d).count()),
      "vocab_by_lang" -> ((_, d, _, _, _) => operators.TextOps.vocabByLangHeap(d).count()),
      // ArgminL2 kernel gate (round-18, VERDICT #6): the wide
      // (centroids-as-data) assignment at a FIXED FAISS-range k=400
      // — NOT the 4·mult corpus contract — so the row isolates the
      // per-row k·d argmin constant (iters=1 → two corpus argmin
      // passes: the Lloyd mean pass + the final assign). This is the
      // measurement that decides whether the interpreted
      // transform+array_min HOF binds at production nlist, or stays
      // inside scan noise.
      "argmin_wide_k400" -> ((_, _, _, em, _) =>
        operators.Similarity.semanticIndexBuildWide(em, k = 400, iters = 1)
          .assigned.count()),
      // same gate one shape up (IndexIVFFlat-range nlist): if the
      // k=400 row is flat and this one scales ∝k, the HOF constant
      // is visible — the kernel decision reads the k-slope between
      // the two rows, not either row alone.
      "argmin_wide_k2048" -> ((_, _, _, em, _) =>
        operators.Similarity.semanticIndexBuildWide(em, k = 2048, iters = 1)
          .assigned.count()),
      "token_budget" -> ((_, d, _, _, k) =>
        operators.Curation.tokenBudget(d, budget = 10000L * k).count()),
      "ann_pq" -> ((_, _, _, em, _) => operators.Similarity.annPq(em, fixedQ,
        queriesAreCorpusDerived = Some(true)).count()),
      "ridge" -> ((e, _, _, _, _) => operators.Ridge.predict(e).count()),
      "gbt" -> ((e, _, _, _, _) => operators.GradientBoost.predict(e).count()),
      "time_split" -> ((e, _, _, _, _) => operators.Curation.timeSplit(e).count()),
      "cv_eval" -> ((e, _, _, _, _) => operators.CvEval.ridgeCv(e).count()),
      "components" -> ((_, d, _, _, _) => operators.Dedup.components(d).count()),
      "surprisal" -> ((_, d, _, _, _) => operators.TextOps.surprisal(d).count()),
      "histogram" -> ((e, _, _, _, _) => operators.Events.histogram(e).count()),
      "vwap" -> ((e, _, _, _, _) => operators.FinAnalytics.vwap(e).count()),
      "stochastic" -> ((e, _, _, _, _) => operators.FinAnalytics.stochastic(e).count()),
      "obv" -> ((e, _, _, _, _) => operators.FinAnalytics.obv(e).count()),
      "atr" -> ((e, _, _, _, _) => operators.FinAnalytics.atr(e).count()),
      "info_snapshot" -> ((e, _, _, _, _) =>
        operators.FinAnalytics.infoSnapshot(e, src.customer).count()),
      "ann_ivfpq" -> ((_, _, _, em, _) => operators.Similarity.annIvfPq(em, fixedQ,
        queriesAreCorpusDerived = Some(true)).count()),
      "containment" -> ((_, d, _, _, _) => operators.Dedup.containment(d).count()),
      "debounce" -> ((e, _, _, _, _) => operators.Events.debounce(e).count()),
      "rolling_active" -> ((e, _, _, _, _) => operators.Events.rollingActive(e).count()),
      "shard" -> ((_, d, _, _, _) => operators.Curation.shardManifest(d).count()),
      "sharpe" -> ((e, _, _, _, _) => operators.FinAnalytics.sharpe(e).count()),
      "var_es" -> ((e, _, _, _, _) => operators.FinAnalytics.varEs(e).count()),
      "calmar" -> ((e, _, _, _, _) => operators.FinAnalytics.calmar(e).count()),
      "info_ratio" -> ((e, _, _, _, _) => operators.FinAnalytics.infoRatio(e).count()),
      "oversample" -> ((_, d, _, _, _) => operators.Curation.oversample(d).count()),
      // mm near-dup pair: both run over the histogram-decorrelated
      // documents_hist replicas (closure, not the `d` arg — the
      // renamed replicas are histogram-degenerate, see above).
      // mm_exact is Θ(n²) BY DEFINITION (the embed_neardup analog):
      // recorded next to its banded companion, never run at 100×.
      "mm_exact" -> ((_, _, _, _, k) => operators.Multimodal.payloadNearDup(
        if (k == 1L) src.documents else docsHistN).count()),
      "mm_banded" -> ((_, _, _, _, k) => operators.Multimodal.payloadNearDupBanded(
        if (k == 1L) src.documents else docsHistN).count()),
      // count() would prune the whole parse chain away (no shuffle
      // keeps it alive in this per-row query), and a FILTER on the
      // parsed fields gets predicate-pushed through the projections —
      // re-inlining the synthesized-payload expression once per field
      // and turning the probe into an 8.5 s driver-side plan-compile
      // measurement. An AGGREGATE over the fields does not push down:
      // the parse runs once per row in its own projection, which is
      // the work this probe exists to time.
      "mm_av" -> ((_, d, _, _, _) => operators.Multimodal.avMeta(d)
        .agg(sum(col("sample_rate") + col("channels") + col("bit_depth")
          + col("width") + col("height"))).collect()(0).getLong(0)),
      // Frozen-index serve probes: per-scale index dirs + on-disk
      // detection mean the FIRST timed run builds + saves (or loads a
      // prior sweep's index) and the second serves only — min-of-2
      // therefore reads the serve-only steady state, which is the
      // amortization claim these probes exist to verify at scale.
      // Query set is the same FIXED bounded one as the other ann*
      // probes, so serve-probe vs train-probe ratios are apples to
      // apples (the registered *_served queries differ only in using
      // the oracle gate's default query rule).
      "ann_ivfpq_residual" -> ((_, _, _, em, _) => operators.Similarity.annIvfPqResidual(
        em, fixedQ, queriesAreCorpusDerived = Some(true)).count()),
      // aggregate forcing, like mm_av: count() would prune the regex
      // chain away in this per-row query
      "pii_scrub" -> ((_, d, _, _, _) => operators.TextOps.piiScrub(d)
        .agg(sum(col("n_urls") + col("n_emails") + col("n_phones") + col("n_ips")
          + col("clean_len"))).collect()(0).getLong(0)),
      "ann_pq_served" -> ((_, _, _, em, k) => {
        val dir = s"/tmp/graft_scale${k}_${recipeVersion}_pq_index"
        val (params, n) = ("pq;m=8;cb=8;it=3", em.count())
        val meta = operators.Similarity.buildIfAbsent(spark, dir, params, n, operators.Similarity.pqIndexVersion) { staging =>
          operators.Similarity.pqIndexSave(operators.Similarity.pqIndexBuild(em), staging,
            params, n)
        }
        operators.Similarity.pqSearch(
          operators.Similarity.pqIndexLoad(spark, dir, em, Some(meta)), fixedQ.get,
          excludeSelf = true).count()
      }),
      // SQ8 serve probe: like flat PQ, the ADC scan is linear in the
      // corpus (no cell pruning) — the probe documents that slope;
      // the IVF layouts are the scale path when it matters.
      "ann_sq_served" -> ((_, _, _, em, k) => {
        val dir = s"/tmp/graft_scale${k}_${recipeVersion}_sq_index"
        val (params, n) = ("sq8", em.count())
        val meta = operators.Similarity.buildIfAbsent(spark, dir, params, n, operators.Similarity.sqIndexVersion) { staging =>
          operators.Similarity.sqIndexSave(operators.Similarity.sqIndexBuild(em), staging,
            params, n)
        }
        operators.Similarity.sqSearch(
          operators.Similarity.sqIndexLoad(spark, dir, em, Some(meta)), fixedQ.get,
          excludeSelf = true).count()
      }),
      // BQ serve probe: the Hamming scan is linear in the corpus
      // like flat PQ/SQ, but at 1 bit/dim it reads 16× fewer
      // signature bytes than the raw vectors (and 8× fewer than SQ8)
      // — the probe documents how far that pushes the linear class.
      "ann_bq_served" -> ((_, _, _, em, k) => {
        val dir = s"/tmp/graft_scale${k}_${recipeVersion}_bq_index"
        val (params, n) = ("bq;w=32", em.count())
        val meta = operators.Similarity.buildIfAbsent(spark, dir, params, n, operators.Similarity.bqIndexVersion) { staging =>
          operators.Similarity.bqIndexSave(operators.Similarity.bqIndexBuild(em), staging,
            params, n)
        }
        operators.Similarity.bqSearch(
          operators.Similarity.bqIndexLoad(spark, dir, em, Some(meta)), fixedQ.get,
          excludeSelf = true).count()
      }),
      // IVF-SQ serve probe: the cell prune should hold the serve
      // cost ~flat like the IVF-PQ layouts (the codes scanned per
      // query batch are nprobe/nlist of the corpus at dim B/vector).
      "ann_ivfsq_served" -> ((_, _, _, em, k) => {
        val dir = s"/tmp/graft_scale${k}_${recipeVersion}_ivfsq_index"
        val (params, n) = ("ivfsq;nlist=8;ivfIt=3", em.count())
        val meta = operators.Similarity.buildIfAbsent(spark, dir, params, n, operators.Similarity.ivfSqIndexVersion) { staging =>
          operators.Similarity.ivfSqIndexSave(operators.Similarity.ivfSqIndexBuild(em),
            staging, params, n)
        }
        operators.Similarity.ivfSqSearch(
          operators.Similarity.ivfSqIndexLoad(spark, dir, em, Some(meta)), fixedQ.get,
          nprobe = 2, excludeSelf = true).count()
      }),
      "ann_ivfpq_served" -> ((_, _, _, em, k) => {
        val dir = s"/tmp/graft_scale${k}_${recipeVersion}_ivfpq_index"
        val (params, n) = ("ivfpq;nlist=8;ivfIt=3;m=8;cb=8;pqIt=3", em.count())
        val meta = operators.Similarity.buildIfAbsent(spark, dir, params, n, operators.Similarity.ivfPqIndexVersion) { staging =>
          operators.Similarity.ivfPqIndexSave(operators.Similarity.ivfPqIndexBuild(em),
            staging, params, n)
        }
        operators.Similarity.ivfPqSearch(
          operators.Similarity.ivfPqIndexLoad(spark, dir, em, Some(meta)), fixedQ.get,
          excludeSelf = true).count()
      }),
      // add() probe: append a FIXED-size delta (the 1x fixed query
      // set, re-keyed to fresh ids) into a frozen index built over
      // the scaled corpus. The first timed run pays the one-off base
      // build (min-of-2 discards it); later runs time ONLY the
      // frozen-model encode + append — which must stay ~flat as the
      // corpus grows (the claim: append cost ∝ |delta|, not corpus).
      // Detection here matches params/version but IGNORES n, because
      // every append bumps meta n by design; repeated appends into
      // this timing-only dir are harmless (append never reads codes).
      "ann_ivfpq_append" -> ((_, _, _, em, k) => {
        val dir = s"/tmp/graft_scale${k}_${recipeVersion}_ivfpq_add_ix"
        val params = "ivfpq;nlist=8;ivfIt=3;m=8;cb=8;pqIt=3;probe=append"
        val ok = try {
          val m = spark.read.parquet(s"$dir/meta.parquet").collect()(0)
          m.getAs[Int]("version") == operators.Similarity.ivfPqIndexVersion &&
            m.getAs[String]("params") == params
        } catch { case _: Exception => false }
        if (!ok) operators.Similarity.ivfPqIndexSave(
          operators.Similarity.ivfPqIndexBuild(em), dir, params, em.count())
        val delta = fixedQ.get.select((col("vec_id") + lit(10000000000L)).as("vec_id"),
          col("embedding"))
        operators.Similarity.ivfPqIndexAppend(spark, dir, delta)
      }),
      // remove_ids() probe: tombstone ~0.1% of the scaled corpus out
      // of a frozen index. Every run pays one anti-join + codes
      // rewrite (∝ corpus codes at 9 bytes/vector; the second run's
      // tombstones match nothing but the rewrite still runs, so
      // min-of-2 times the steady compaction cost). The claim this
      // measures: delete is a narrow-table rewrite, never the
      // 19.7×-at-100× retrain curve.
      "ann_ivfpq_remove" -> ((_, _, _, em, k) => {
        val dir = s"/tmp/graft_scale${k}_${recipeVersion}_ivfpq_rm_ix"
        val params = "ivfpq;nlist=8;ivfIt=3;m=8;cb=8;pqIt=3;probe=remove"
        val ok = try {
          val m = spark.read.parquet(s"$dir/meta.parquet").collect()(0)
          m.getAs[Int]("version") == operators.Similarity.ivfPqIndexVersion &&
            m.getAs[String]("params") == params
        } catch { case _: Exception => false }
        if (!ok) operators.Similarity.ivfPqIndexSave(
          operators.Similarity.ivfPqIndexBuild(em), dir, params, em.count())
        operators.Similarity.ivfPqIndexRemove(spark, dir,
          em.filter(col("vec_id") % 1000 === 7).select(col("vec_id")))
      }),
      // SemDeDup probe: k tracks the corpus (k = 4·mult) so the
      // per-cluster pair budget stays constant — the documented scale
      // contract (total work O(n · cluster_budget), linear in n). A
      // FIXED k would re-square the pair space and measure nothing
      // but the baseline's Θ(n²) again.
      "dedup_semantic" -> ((_, _, _, em, k) =>
        operators.Similarity.dedupSemantic(em, k = 4 * k.toInt).count()),
      // Hierarchical SemDeDup probe: k₁=k₂=⌈√(4·mult)⌉ keeps total
      // clusters ∝ corpus (the flat probe's contract) while each
      // assignment level stays within the plan-literal kernel budget
      // — at 100× that is 20×20=400 effective clusters where the
      // flat operator cannot go (its 100× row is deliberately
      // unprobed; this is the operator that replaces it there).
      "dedup_semantic_hier" -> ((_, _, _, em, k) => {
        val side = math.ceil(math.sqrt(4.0 * k)).toInt
        operators.Similarity.dedupSemanticHier(em, k1 = side, k2 = side).count()
      }),
      // Grouped fine trainer at the same k₁=k₂ sizing: identical
      // answers (spec-pinned), but each fine Lloyd iteration is ONE
      // dataframe program instead of k₁ sequential train() calls —
      // at 100× (side 20) that is 3 assignment jobs total vs the
      // loop's ~60 job-groups of fixed scheduling latency. This row
      // measures what that buys in wall-clock.
      "dedup_sem_hier_grp" -> ((_, _, _, em, k) => {
        val side = math.ceil(math.sqrt(4.0 * k)).toInt
        operators.Similarity.dedupSemanticHierGrouped(em, k1 = side, k2 = side).count()
      }),
      // Ingestion-time SemDeDup serve from the FROZEN on-disk index:
      // fixed query batch, corpus (and k = 4·mult with it) scales —
      // the probe measures what the cluster-partitioned assignment
      // layout buys at serve time (the probe join reads toward only
      // the batch's cells' partitions; with k ∝ n each cell holds a
      // constant row budget, so the serve should stay ~flat, the
      // semantic analog of the ann_*_served rows). 10× ONLY: the
      // probe's one-time index build uses the FLAT trainer, and
      // k = 400 plan-literal kernels at 100× is exactly the cap the
      // hier operator documents — measured here as a JIT code-cache
      // exhaustion (53k nmethods, compilation disabled, interpreted
      // crawl), so the guard fails fast instead of melting the JVM.
      // The 100× build path is the hier/grouped trainer (#25d/#25f);
      // a two-level probe-side assignment would be its serve mate.
      "sem_probe_served" -> ((_, _, _, em, k) => {
        val dir = s"/tmp/graft_scale${k}_${recipeVersion}_sem_index"
        val kk = 4 * k.toInt
        require(kk <= 64, s"sem_probe_served: flat k=$kk exceeds the plan-literal kernel " +
          "budget (~64) — the hier trainer is the build path past 10×; see the probe comment")
        val (params, n) = (s"sem;k=$kk;it=3;src=${operators.Similarity.sourceStamp(em)}", em.count())
        val meta = operators.Similarity.buildIfAbsent(spark, dir, params, n, operators.Similarity.semanticIndexVersion) { staging =>
          operators.Similarity.semanticIndexSave(
            operators.Similarity.semanticIndexBuild(em, kk), staging, params, n)
        }
        operators.Similarity.semanticProbe(
          operators.Similarity.semanticIndexLoad(spark, dir, Some(meta)),
          fixedQ.get.select(col("vec_id") + 1000000000L as "vec_id", col("embedding")),
          threshold = 0.45).count()
      }),
      // The HANDOFF measurement (round-13 verdict #8): the flat serve
      // probe AT ITS k ≤ 64 plan-literal cap on whatever corpus it is
      // given. At 100× the SemDeDup contract wants k = 400; capped at
      // 64, each cell holds ~6× its budgeted rows, so the probe join
      // fans ~6× the pairs — this row records what the flat layout
      // degrades to exactly where the hier index takes over
      // (sem_probe_hier_served is the row that holds the contract
      // there). Index dir is cap-keyed so it never collides with the
      // uncapped 10× dir.
      "sem_probe_flat_cap" -> ((_, _, _, em, k) => {
        val dir = s"/tmp/graft_scale${k}_${recipeVersion}_semcap_index"
        val kk = math.min(4 * k.toInt, 64)
        val (params, n) = (s"semcap;k=$kk;it=3;src=${operators.Similarity.sourceStamp(em)}", em.count())
        val meta = operators.Similarity.buildIfAbsent(spark, dir, params, n, operators.Similarity.semanticIndexVersion) { staging =>
          operators.Similarity.semanticIndexSave(
            operators.Similarity.semanticIndexBuild(em, kk), staging, params, n)
        }
        operators.Similarity.semanticProbe(
          operators.Similarity.semanticIndexLoad(spark, dir, Some(meta)),
          fixedQ.get.select(col("vec_id") + 1000000000L as "vec_id", col("embedding")),
          threshold = 0.45).count()
      }),
      // The WIDE (centroids-as-data) flat trainer at the corpus
      // contract's k = 4·mult WITHOUT any cap — the run the
      // plan-literal trainer physically cannot make past k ≈ 64
      // (k = 400 melted the JIT code cache): plan size is O(1) in k,
      // so the only cost is the n×k assignment fan-out. This is the
      // single-level alternative to the hier factorization at the
      // second/third decade — both paths now carry measured rows.
      "dedup_semantic_wide" -> ((_, _, _, em, k) =>
        operators.Similarity.dedupSemanticWide(em, k = 4 * k.toInt).count()),
      // Grouped trainer at HIGH k₁ (round-13 verdict #8, after the
      // model-parameter aggregation pinning landed): k₁ = 64 (the
      // coarse plan-literal kernel budget — the honest ceiling; past
      // it the COARSE level needs the same centroids-as-data join the
      // fine level already uses, a documented residual), k₂ sized so
      // k₁·k₂ tracks the corpus contract. The looped trainer here
      // would serialize k₁ × iters ≈ 192 train job-groups; grouped
      // runs 3 assignment jobs per fine iteration regardless of k₁ —
      // this row records what that buys where it matters.
      "dedup_sem_hier_grp_wide" -> ((_, _, _, em, k) => {
        val k2 = math.max(1, math.ceil(4.0 * k / 64).toInt)
        operators.Similarity.dedupSemanticHierGrouped(em, k1 = 64, k2 = k2).count()
      }),
      // The WIDE serve probe: the frozen single-level index at the
      // UNCAPPED corpus-contract k (400 at 100×) — build once via
      // the shared detection (first timed run pays it; min-of-2
      // reads serve-only), each probe batch assigns through the
      // broadcast centroid frame (plan O(1) in k) and joins the
      // cluster-partitioned assignment. With k ∝ n each cell holds a
      // constant row budget, so the serve should stay ~flat — the
      // single-level counterpart of sem_probe_hier_served.
      "sem_probe_wide_served" -> ((_, _, _, em, k) => {
        val dir = s"/tmp/graft_scale${k}_${recipeVersion}_semwide_index"
        val kk = 4 * k.toInt
        val (params, n) = (s"semwide;k=$kk;it=3;src=${operators.Similarity.sourceStamp(em)}", em.count())
        val meta = operators.Similarity.buildIfAbsent(spark, dir, params, n, operators.Similarity.semanticIndexVersion) { staging =>
          operators.Similarity.semanticIndexSave(
            operators.Similarity.semanticIndexBuildWide(em, kk), staging, params, n)
        }
        operators.Similarity.semanticProbeWide(
          operators.Similarity.semanticIndexLoad(spark, dir, Some(meta)),
          fixedQ.get.select(col("vec_id") + 1000000000L as "vec_id", col("embedding")),
          threshold = 0.45).count()
      }),
      // The TWO-LEVEL serve probe — the one that CAN run at 100×:
      // k₁·k₂ tracks the corpus (side = ⌈√(4·mult)⌉ each) but the
      // probe-side plan stays O(k₁) kernels + one broadcast fine-
      // centroid join, and the one-time build is the grouped trainer
      // (1 assignment job per iteration). This row completes the
      // ingestion-serve claim sem_probe_served's flat build cannot
      // make past 10×.
      "sem_probe_hier_served" -> ((_, _, _, em, k) => {
        val dir = s"/tmp/graft_scale${k}_${recipeVersion}_semhier_index"
        val side = math.ceil(math.sqrt(4.0 * k)).toInt
        val (params, n) = (s"semhier;k1=$side;k2=$side;it=3;src=${operators.Similarity.sourceStamp(em)}", em.count())
        val meta = operators.Similarity.buildIfAbsent(spark, dir, params, n, operators.Similarity.hierIndexVersion) { staging =>
          operators.Similarity.semanticIndexSaveHier(
            operators.Similarity.semanticIndexBuildHier(em, side, side), staging, params, n)
        }
        operators.Similarity.semanticProbeHier(
          operators.Similarity.semanticIndexLoadHier(spark, dir, Some(meta)),
          fixedQ.get.select(col("vec_id") + 1000000000L as "vec_id", col("embedding")),
          threshold = 0.45).count()
      }),
      // Radius search: fixed bounded query set (like the other ann*
      // probes), windowless broadcast scan — expect the scan slope.
      "ann_range" -> ((_, _, _, em, _) =>
        operators.Similarity.annRange(em, fixedQ, threshold = 0.3,
          queriesAreCorpusDerived = Some(true)).count()),
      // IVF range search: the radius query paying only probed cells —
      // train dominates at small scale, the verify reads
      // nprobe/nlist of the corpus at 100×
      "ann_range_ivf" -> ((_, _, _, em, _) =>
        operators.Similarity.annRangeIvf(em, fixedQ, threshold = 0.3,
          queriesAreCorpusDerived = Some(true)).count()),
      // Radius search SERVED (round 14): the frozen IndexIVF loaded
      // from disk — the first timed run pays the one-off build
      // (min-of-2 discards it), so this row reads the SERVING cost
      // class the trained row buries under its per-run Lloyd.
      "ann_range_ivf_served" -> ((_, _, _, em, k) =>
        operators.Similarity.annRangeIvfServed(em,
          s"/tmp/graft_scale${k}_${recipeVersion}_rangeivf_index", fixedQ,
          threshold = 0.3, queriesAreCorpusDerived = Some(true)).count()),
      // Hier coarse PAST the kernel budget (round 14): k1 = 128
      // forces the coarse level onto the centroids-as-data path at
      // every scale (the third-decade residual closed this round —
      // dedup_sem_hier_grp_wide's k1 = 64 ceiling no longer binds);
      // k2 sized so k1·k2 tracks the corpus contract.
      "sem_hier_wide_coarse" -> ((_, _, _, em, k) => {
        val k2 = math.max(1, math.ceil(4.0 * k / 128).toInt)
        operators.Similarity.dedupSemanticHierGrouped(em, k1 = 128, k2 = k2).count()
      }),
      // Build-only half of the row above: isolates the wide-coarse
      // trainer + assignment from the within-cluster pair verify.
      "sem_hier_wide_build" -> ((_, _, _, em, k) => {
        val k2 = math.max(1, math.ceil(4.0 * k / 128).toInt)
        operators.Similarity.semanticIndexBuildHier(em, k1 = 128, k2 = k2).assigned.count()
      }),
      // Trained quality classifier (round 14): one tokenized corpus
      // checkpoint, three feature scans + doc_id joins, a 36-decimal
      // Gram collect, one scoring scan — expect ~linear in corpus
      // tokens (the curate_filter cost class plus the Gram pass).
      "quality_model" -> ((_, d, _, _, _) =>
        operators.QualityModel.score(d).count()),
      // Score-ranked token budget (round 14): budget tracks the
      // corpus like token_budget, so the probe measures scoring +
      // the bucketed prefix sum, not a fixed-size early cut.
      "quality_budget" -> ((_, d, _, _, k) =>
        operators.Curation.qualityBudget(d, budget = 10000L * k).count()),
      // Trained IVF with the coarse quantizer FORCED wide at a
      // FAISS-ish nlist (round 15): nlist = 128 sits past the
      // ~64-kernel budget at every scale, so this row reads the
      // centroids-as-data train + assign + top-nprobe probe slope —
      // the branch that is the ONLY one that runs at production
      // nlist ≈ 4√n.
      "ann_ivf_trained_wide" -> ((_, _, _, em, _) =>
        operators.Similarity.annIvfTrained(em, fixedQ, nlist = 128, iters = 1,
          nprobe = 2).count()),
      // FAISS-sized PQ codebooks (round 15): cb = 64 through the
      // codebooks-as-data path — train is iters scans with m
      // transform folds, encode one scan, ADC unchanged; expect the
      // ann_pq slope with a constant-factor bump from the 8x code
      // fan inside the transform.
      "ann_pq_wide" -> ((_, _, _, em, _) =>
        operators.Similarity.annPq(em, fixedQ, codebookSize = 64,
          queriesAreCorpusDerived = Some(true)).count()),
      // FAISS-DEFAULT shapes (round 17): cb = 256 (the nbits=8 every
      // FAISS IndexPQ ships with — the shape PqEncodeI64 was built
      // for) at m=8, and the (16, 256) doubled-subspace variant
      // (dsub=4; 16 codes/vector — FAISS's 64-dim default split).
      // Expect ann_pq_wide's slope with a ~4x kernel-constant bump
      // (m·cb·dsub doubles 4096 -> 16384/16384): the codebooks stay
      // ONE plan reference object (128 KB) either way.
      "ann_pq_faiss" -> ((_, _, _, em, _) =>
        operators.Similarity.annPq(em, fixedQ, codebookSize = 256,
          queriesAreCorpusDerived = Some(true)).count()),
      "ann_pq_faiss16" -> ((_, _, _, em, _) =>
        operators.Similarity.annPq(em, fixedQ, m = 16, codebookSize = 256,
          queriesAreCorpusDerived = Some(true)).count()),
      // OPQ (round 15): the rotated-PQ loop — two trainings + the
      // model-parameter-sized Procrustes aggregation per run.
      "ann_opq" -> ((_, _, _, em, _) =>
        operators.Similarity.annOpq(em, fixedQ,
          queriesAreCorpusDerived = Some(true)).count()),
      // CCNet stratification + action (round 15): surprisal scan +
      // per-language rank location + the hash-rate filter — expect
      // the surprisal cost class (linear in corpus tokens).
      "ppl_filter" -> ((_, d, _, _, _) =>
        operators.Curation.pplFilter(d).count()),
      // Caller-labeled quality fit (round 16): same Gram/solve as
      // quality_model plus the external grade column riding the
      // doc_id join — this row prices the labeled path's extra
      // grade-scan against the self-distilled fit's cost class.
      "quality_model_labeled" -> ((_, d, _, _, _) =>
        operators.QualityModel.score(d,
          label = Some((col("doc_id") % 2 === 0).cast("double"))).count()),
      // Frozen-CCNet serve steady state (round 16): the model (LM +
      // terciles) is fit on the SCALED corpus and memoized per scale
      // (first timed run pays the fit, min-of-2 reads serve-only);
      // the gated batch is the FIXED 1× corpus — the ann-family
      // fixed-query convention — so the row measures the
      // per-micro-batch serve cost of streaming/CurationStream
      // .pplGateServe as the frozen MODEL grows with its reference
      // corpus (the tf⋈freq join's freq side; note the replica
      // token-rename inflates vocabulary LINEARLY with scale —
      // Heaps-law natural corpora grow it far slower, so the slope
      // here upper-bounds the real one).
      "ppl_gate_serve" -> ((_, d, _, _, k) => {
        val model = pplModels.getOrElseUpdate(k, operators.Curation.pplModel(d))
        // fixed-size IN-VOCABULARY batch: replica 0's docs (ids
        // < 5000 at every scale; the 1× frame is exactly them)
        operators.Curation.pplGate(model, d.filter(col("doc_id") < 5000L)).count()
      }),
      // OPQ value claim at scale (round 16, stretch): the planted
      // ANISOTROPIC corpus (energy concentrated in dims 0..7 — the
      // OpqSpec construction, n ∝ scale) where the rotation is the
      // whole point; prints recall@5 flat-PQ vs OPQ at each scale so
      // the ≥ +0.1 spec win is a measured scale fact, and times the
      // OPQ train+search. Ground truth is the exact broadcast scan.
      // Corpus build + ground truth + the recall COMPARISON (the
      // flat-PQ build and an O(n·q·d) exact scan collected to the
      // driver) run once per scale and are memoized, so min-of-2's
      // second run — the recorded time — covers ONLY the OPQ
      // train+search the row claims to price (round-16 advisor: the
      // old body overstated it several-fold, with the exact-scan
      // share growing with scale).
      "ann_opq_aniso" -> ((_, _, _, _, k) => {
        val (aniso, qs) = anisoPrep(k)
        operators.Similarity.annOpq(aniso, Some(qs),
          queriesAreCorpusDerived = Some(true)).count()
      }),
      // the lever COMPOSITION itself, timed: rotation + FAISS-sized
      // codebooks on the anisotropic corpus (shared memoized prep —
      // the recall printout above carries its cb=64 column)
      "ann_opq_aniso_wide" -> ((_, _, _, _, k) => {
        val (aniso, qs) = anisoPrep(k)
        operators.Similarity.annOpq(aniso, Some(qs), codebookSize = 64,
          queriesAreCorpusDerived = Some(true)).count()
      }),
      "ann_ivfpq_residual_served" -> ((_, _, _, em, k) => {
        val dir = s"/tmp/graft_scale${k}_${recipeVersion}_ivfpq_res_index"
        val (params, n) = ("ivfpqres;nlist=8;ivfIt=3;m=8;cb=8;pqIt=3", em.count())
        val meta = operators.Similarity.buildIfAbsent(spark, dir, params, n, operators.Similarity.ivfPqIndexVersion) { staging =>
          operators.Similarity.ivfPqIndexSave(
            operators.Similarity.ivfPqResidualIndexBuild(em), staging, params, n)
        }
        operators.Similarity.ivfPqResidualSearch(
          operators.Similarity.ivfPqIndexLoad(spark, dir, em, Some(meta)), fixedQ.get,
          excludeSelf = true).count()
      }))

    val selected = probes.filter { case (n, _) => only.isEmpty || only.contains(n) }
    require(selected.nonEmpty, s"no probe matches $only")

    // min-of-N (default 2; SPARK_GRAFT_PROBE_RUNS=3 for the pinned
    // 100x protocol — the quality-family rows swung 77-234 s with
    // session memory/disk state under min-of-2, so the re-measured
    // §6 rows use min-of-3 over a pre-touched corpus).
    val probeRuns = sys.env.getOrElse("SPARK_GRAFT_PROBE_RUNS", "2").toInt
    def time(name: String)(f: => Long): Double = {
      def once(): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      val t = Seq.fill(probeRuns)(once()).min
      println(f"$name%-22s $t%7.2f s")
      t
    }

    // Pre-touch: stream every replica parquet byte through the OS
    // page cache BEFORE the timed pass, so the first timed run is
    // not charged for the session's first disk read of a multi-GB
    // corpus (at 100x the 3 GB first-touch was a dominant,
    // state-dependent term in the observed 77-234 s swings).
    def preTouch(dir: String): Unit = {
      val root = java.nio.file.Paths.get(dir)
      if (java.nio.file.Files.exists(root)) {
        val buf = new Array[Byte](1 << 20)
        var bytes = 0L
        java.nio.file.Files.walk(root).filter(java.nio.file.Files.isRegularFile(_))
          .forEach { p =>
            val in = java.nio.file.Files.newInputStream(p)
            try {
              var n = in.read(buf)
              while (n >= 0) { bytes += n; n = in.read(buf) }
            } finally in.close()
          }
        println(f"  [pre-touch] $dir: ${bytes / 1e9}%.2f GB")
      }
    }

    // 1× baselines on the same session for a fair ratio
    println("== 1x (sf0.1) ==")
    preTouch("/root/testdata/sf0.1")
    val b = selected.map { case (n, f) =>
      n -> time(n)(f(src.events, src.documents, src.lineitem, src.embeddings, 1L))
    }.toMap
    println(s"== ${replicas}x ==")
    preTouch(base)
    val s = selected.map { case (n, f) =>
      n -> time(n)(f(eventsN, docsN, liN, embN, replicas.toLong))
    }.toMap
    println(s"== scaling factor (${replicas}x data / 1x time; $replicas = linear) ==")
    b.keys.toSeq.sorted.foreach { k =>
      println(f"$k%-22s ${s(k) / b(k)}%6.1f x")
    }
    spark.stop()
  }
}
