package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.HonestCheckpoint._

/** Embedding similarity — near-dup pairs and nearest-neighbor search
  * over an `array<float>` column (SURVEY §2 #25-27).
  *
  * Scale design: the query side of every search broadcasts (queries
  * ≪ corpus); the corpus is scanned once, map-side, and only top-k
  * candidates reach a shuffle. The all-pairs near-dup variant prunes
  * with a codegen double cosine and verifies survivors with exact
  * decimal arithmetic — the expensive exact math touches only
  * near-threshold pairs.
  */
object Similarity {

  /** Default ANN/near-dup query set when the caller does not supply
    * one: every 100th vector. Production callers pass an explicit
    * (small) query DataFrame so the broadcast side is STRUCTURALLY
    * bounded — `vec_id % 100` of a growing corpus is 1% of corpus
    * bytes, which stops being broadcastable long before 100 TB.
    */
  private def defaultQueries(embeddings: DataFrame): DataFrame =
    embeddings.filter(col("vec_id") % 100 === 0)

  /** Value-based survivor cut for the two-phase (fast double prune →
    * exact decimal re-rank) top-k scans: keep every row whose fast
    * cosine ties the k-th fast value within 1e-6. A fixed rank margin
    * (k+c) silently drops true neighbors when > c corpus vectors sit
    * within double-vs-exact error of the k-th score (duplicate/near-
    * identical vectors); the value cut is immune. Margin budget: the
    * double summation itself is exact to ~1e-12, but the EXACT path
    * first quantizes each component through dec8 (up to 5e-9 absolute
    * per component), so across 64-dim dot/norm sums the double-vs-
    * exact cosine gap is really ~1e-7..4e-7 for the ~unit-norm
    * vectors admitted here — still below the 1e-6 cut, but by ~2.5×,
    * not the ~1000× a naive 1e-9 estimate suggests. If small-norm
    * vectors are ever admitted, the dec8 perturbation amplifies by
    * 1/‖v‖ and the margin must widen accordingly. NULL kth_fast
    * (fewer than k candidates) keeps everything.
    */
  private def keepFastSurvivors(df: DataFrame, k: Int): DataFrame = {
    val wFast = Window.partitionBy(col("query_id")).orderBy(col("fast").desc, col("vec_id"))
    val wAll = Window.partitionBy(col("query_id"))
    df.withColumn("rf", row_number().over(wFast))
      .withColumn("kth_fast", max(when(col("rf") === k, col("fast"))).over(wAll))
      .filter(col("kth_fast").isNull || col("fast") >= col("kth_fast") - 1e-6)
      .drop("rf", "kth_fast")
  }

  /** Near-duplicate pairs with exact-cosine ≥ threshold — the EXACT
    * pair join, distributed as a block-pair triangle join.
    *
    * Every vector gets a hash block id in [0, blocks); side A carries
    * each vector to every block pair (own, j ≥ own), side B to every
    * (i ≤ own, own); the equi-join on (bi, bj) then meets each
    * unordered pair in exactly one of the blocks(blocks+1)/2 shuffle
    * groups (the `a < b` residual halves the diagonal). The plan is a
    * plain shuffled equi-join — NO BroadcastNestedLoopJoin, no
    * cartesian node — so the Θ(n²) pair evaluations spread evenly
    * over ~blocks²/2 independent tasks instead of serializing behind
    * a full-corpus broadcast. Replication cost is (blocks+1)× the
    * corpus through one shuffle.
    *
    * Why not sketch-candidate generation (the sub-quadratic route):
    * at this threshold it cannot reproduce the exact result. The
    * corpus' true pairs sit at cosine 0.45-0.51 (measured) while
    * random pairs center on 0; a hyperplane agrees with a 0.45-pair
    * with p = 1 − acos(0.45)/π ≈ 0.65 vs 0.5 for noise — far too
    * small a gap for any band scheme to reach ~1e-8 miss probability
    * without admitting nearly all pairs as candidates. An exact
    * threshold join on dense vectors is inherently Θ(n²) work; the
    * sub-quadratic *approximate* companions are the sketch operators
    * (#22/#23) and [[annLsh]]. Per-pair cost stays cheap: codegen
    * double-cosine prefilter (1e-3 margin ≫ the ~1e-12 double-vs-
    * exact error), exact decimal verification only on survivors.
    *
    * Sizing `blocks` (the one knob a scaled-up caller must get
    * right, or discover by OOM): a join group holds ~n/blocks rows
    * of each side in executor memory, so blocks must GROW with the
    * corpus — `blocks = 0` (the default) auto-derives
    * `max(16, ceil(n / 200k))` from one cheap id-column count,
    * capping a group's side at ~200k vectors (~60 MB of 64-dim
    * floats) regardless of n. Under that rule the replicated
    * shuffle carries n²/200k rows total — each shuffled row
    * amortizes ~100k pair evaluations, so the shuffle never
    * dominates the (inherent) Θ(n²) compute, and group count
    * blocks²/2 grows fast enough to feed any executor fleet.
    * Results are invariant to `blocks`; it is purely physical
    * layout. Auto-sizing makes CONSTRUCTION EAGER: the count() runs
    * a one-column Spark job before the returned frame exists — a
    * deliberate trade (it is what makes the 100×-user's OOM knob
    * disappear), negligible next to the Θ(n²) evaluation it sizes,
    * and avoided entirely by passing `blocks` explicitly (catalog
    * stats row counts are not reliably populated without CBO, so a
    * lazy stats-based variant would silently fall back anyway).
    */
  def embeddingNearDup(embeddings: DataFrame, threshold: Double = 0.45,
                       blocks: Int = 0): DataFrame = {
    val b =
      if (blocks > 0) blocks
      else {
        val n = embeddings.select(col("vec_id")).count()
        math.max(16L, (n + 199999L) / 200000L).toInt
      }
    val e = embeddings.select(col("vec_id"), col("embedding"))
      .withColumn("blk", pmod(xxhash64(col("vec_id")), lit(b)).cast("int"))
    // Roles are BLOCK-ordered (side A = the lower block, side B = the
    // higher): group (p, q), p < q, meets each cross-block pair once;
    // only the diagonal (p = p) needs the id-order filter. Output ids
    // are then normalized with least/greatest (cosine is symmetric).
    val sideA = e.select(col("vec_id").as("ia"), col("embedding").as("ea"), col("blk").as("bi"))
      .withColumn("bj", explode(sequence(col("bi"), lit(b - 1))))
    val sideB = e.select(col("vec_id").as("ib"), col("embedding").as("eb"), col("blk").as("bj"))
      .withColumn("bi", explode(sequence(lit(0), col("bj"))))
    sideA.join(sideB, Seq("bi", "bj"))
      .filter(col("bi") =!= col("bj") || col("ia") < col("ib"))
      .filter(cosineFast(col("ea"), col("eb")) >= threshold - 1e-3)
      .withColumn("cosine",
        cosineExact(decDot(col("ea"), col("eb")), decNorm2(col("ea")), decNorm2(col("eb"))))
      .filter(col("cosine") >= threshold)
      .select(least(col("ia"), col("ib")).as("a"), greatest(col("ia"), col("ib")).as("b"), col("cosine"))
      .orderBy(col("a"), col("b"))
  }

  /** SemDeDup-style cluster-bounded semantic near-dup — the
    * SUB-QUADRATIC companion to [[embeddingNearDup]] (which is the
    * exact Θ(n²) baseline, documented as such). Following the public
    * SemDeDup recipe (Abbas et al. 2023, arXiv:2303.09540): k-means
    * the embedding space, then compare pairs ONLY within a cluster —
    * semantic duplicates are near each other, so they co-cluster,
    * and the pair space drops from n²/2 to Σᵢ nᵢ²/2 ≈ n²/(2k). At
    * 100 TB the caller grows k (nlist-style) with the corpus, making
    * per-cluster work constant: k = n/200k keeps every cluster's
    * pair block executor-sized, and total work O(n · 200k) — linear
    * in n for a fixed cluster budget, vs the baseline's quadratic.
    *
    * RECALL is the trade (like [[annLsh]]): a true pair straddling a
    * Voronoi boundary is missed. Every RETURNED pair is exact-verified
    * (same decimal cosine as the baseline), so precision is 1.0 by
    * construction and the result is always a subset of
    * [[embeddingNearDup]] at the same threshold — SimilaritySpec pins
    * both properties plus the measured recall floor on testdata.
    *
    * Deterministic end-to-end: the trainer is [[kmeans]]' exact
    * integer-units Lloyd (md5-seeded), so assignment — and therefore
    * the candidate pair set — is bit-identical on any engine, and the
    * whole operator carries a FULL DuckDB oracle (the unrolled Lloyd
    * CTE chain feeding a within-cluster exact-cosine self-join).
    *
    * Physical shape: the assignment scan materializes ONCE
    * (honestCheckpoint — both sides of the self-join read it, and the
    * join then plans on real sizes); within a cluster the pair space
    * is spread over block-pair triangle groups exactly like
    * [[embeddingNearDup]] (key = (cluster, bi, bj)), sized by the
    * LARGEST cluster (k-row aggregate — model-parameter-sized), so a
    * skewed cluster cannot concentrate its nᵢ²/2 pairs in one task.
    */
  def dedupSemantic(embeddings: DataFrame, k: Int = 8, iters: Int = 3,
                    threshold: Double = 0.45, blocks: Int = 0): DataFrame =
    withinClusterPairs(semanticIndexBuild(embeddings, k, iters).assigned,
      threshold, blocks)

  /** The frozen model half of the SemDeDup family: trained centroids
    * (driver-side model parameters) + the corpus assignment frame,
    * materialized ONCE (honestCheckpoint) — [[dedupSemantic]]'s
    * build step, and the index [[semanticProbe]] serves
    * ingestion-time queries from.
    */
  final case class SemanticIndex private[Similarity] (
      centroids: Seq[Array[Long]], assigned: DataFrame)

  def semanticIndexBuild(embeddings: DataFrame, k: Int = 8,
                         iters: Int = 3): SemanticIndex = {
    val (centroids, a) = trainAssignAuto(embeddings, k, iters, wide = Some(false))
    val assigned = a
      .select(col("vec_id"), col("embedding"), col("cluster"))
      .honestCheckpoint()
    SemanticIndex(centroids, assigned)
  }

  /** [[semanticIndexBuild]] with CENTROIDS AS DATA — the flat
    * trainer freed of its plan-literal kernel budget: [[train]] /
    * [[assignCells]] encode each centroid as a codegen kernel
    * literal, which caps k at ~64 (k = 400 measured as JIT
    * code-cache exhaustion — the reason the hier index exists for
    * the second decade). Here centroids live in a broadcast
    * (cluster, cu) frame — the grouped fine trainer's algebra with
    * one global cell — so plan size is O(1) in k and k can track the
    * corpus through the THIRD decade directly (k in the hundreds on
    * one level, the residual the round-13 wide-k₁ probe documented
    * at the coarse level). BIT-IDENTICAL to [[semanticIndexBuild]]
    * by construction (same md5-seeded init, same (du, cluster)
    * lexicographic argmin = assignCells' lowest-cluster tiebreak,
    * same sign-split half-up integer means, empty clusters keep
    * their previous centroid) — spec-pinned at overlapping k, and
    * `dedup_semantic_wide` shares dedup_semantic's FULL oracle.
    * Trade: the data join fans n×k rows through one shuffle-free
    * broadcast per iteration vs k codegen kernels per row — at small
    * k the kernels win (gate p50 texture), at k past the budget only
    * this path runs.
    */
  def semanticIndexBuildWide(embeddings: DataFrame, k: Int = 8,
                             iters: Int = 3): SemanticIndex = {
    // train + final assign share ONE spread, quantized checkpoint
    // (see corpusFrame) — the assign is a map pass over it.
    val (centroids, a) = trainAssignAuto(embeddings, k, iters, wide = Some(true))
    val assigned = a
      .select(col("vec_id"), col("embedding"), col("cluster"))
      .honestCheckpoint()
    SemanticIndex(centroids, assigned)
  }

  /** Repartition a corpus frame to the session's parallelism before
    * a per-row k-fold fan-out stage. Narrow inputs (a single compact
    * parquet split) otherwise serialize the amplified work on one
    * core; probe BATCHES skip this (they are broadcast-bound, not
    * fan-bound).
    */
  private def spreadForFan(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** SemDeDup pairs over the wide (centroids-as-data) build —
    * bit-identical to [[dedupSemantic]] at equal k (shared oracle);
    * the registration that keeps the unbounded-k path gate-checked.
    */
  def dedupSemanticWide(embeddings: DataFrame, k: Int = 8, iters: Int = 3,
                        threshold: Double = 0.45, blocks: Int = 0): DataFrame =
    withinClusterPairs(semanticIndexBuildWide(embeddings, k, iters).assigned,
      threshold, blocks)

  /** [[semanticProbe]] through the data-join assignment — the serve
    * mate for wide-k indexes where k plan-literal kernels per batch
    * row would rebuild the cap the wide trainer removed.
    */
  def semanticProbeWide(index: SemanticIndex, batch: DataFrame,
                        threshold: Double = 0.45,
                        excludeSelf: Boolean = false): DataFrame = {
    val nb = assignCellsData(batch.select(col("vec_id"), col("embedding")), index.centroids)
      .select(col("vec_id").as("new_id"), col("embedding").as("eb"), col("cluster"))
    index.assigned
      .select(col("vec_id").as("corpus_id"), col("embedding").as("ea"), col("cluster"))
      .join(broadcast(nb), Seq("cluster"))
      .filter(if (excludeSelf) col("corpus_id") =!= col("new_id") else lit(true))
      .filter(cosineFast(col("ea"), col("eb")) >= threshold - 1e-3)
      .withColumn("cosine",
        cosineExact(decDot(col("ea"), col("eb")), decNorm2(col("ea")), decNorm2(col("eb"))))
      .filter(col("cosine") >= threshold)
      .select(col("new_id"), col("corpus_id"), col("cluster"), col("cosine"))
      .orderBy(col("new_id"), col("corpus_id"))
  }

  /** One element of the centroid-ARRAY model literal: the whole model
    * travels as ONE `array<struct<cluster, cu>>` typedlit — plan DATA
    * in the references array (the [[pqCbData]] class: shipped once
    * per stage inside the task binary's own broadcast, deserialized
    * once per executor), so a data-path argmin is a per-row
    * `transform` + `array_min` over it with NO crossJoin and NO
    * BroadcastExchange sub-job. The previous one-row broadcast frame
    * cost a separate ~50-100 ms broadcast job per Lloyd iteration —
    * pure driver latency for a kilobyte-sized model.
    */
  private final case class CentEntry(cluster: Long, cu: Seq[Long])

  /** The centroid model as a typedlit array column (see [[CentEntry]]). */
  private def centsLit(centroids: Seq[Array[Long]]): Column =
    typedlit(centroids.zipWithIndex.map { case (cu, i) => CentEntry(i.toLong, cu.toSeq) })

  /** Per-coarse-cell slice of the hier fine-centroid model — the
    * broadcast side of the fine argmin: k₁ rows, each carrying that
    * cell's ≤ k₂ centroids as `array<struct<fine, cu>>`.
    */
  private final case class FineEntry(fine: Long, cu: Seq[Long])

  /** Lexicographic argmin over a centroid array column: one
    * [[graft.plans.IntegerUnits.l2Units]] kernel per element through
    * a `transform`, then `array_min` — `min(struct(du, id))` with the
    * lowest-id tiebreak, computed PER ROW in one map pass. This is
    * the shuffle-free replacement for the previous
    * crossJoin-then-`groupBy(vec_id).agg(min(struct))` shape: `min`
    * over a struct cannot use HashAggregate, so that shape planned a
    * full SortAggregate chain (sort n×k fanned rows carrying the
    * embedding payload, exchange by vec_id, sort again) — measured
    * 10-17 s of task time per Lloyd iteration on a 2000-row corpus.
    * Bit-identical (same struct ordering, nulls impossible).
    */
  private def argminOver(cents: Column, u: Column, idField: String): Column =
    array_min(transform(cents, c =>
      struct(graft.plans.IntegerUnits.l2Units(u, c.getField("cu")).as("du"),
        c.getField(idField).as(idField))))

  /** Nearest-centroid assignment against CENTROIDS AS DATA: the model
    * rides as one typedlit array ([[centsLit]]) and each input row
    * computes its own argmin ([[argminOver]]) — no row fan, no
    * aggregation, no shuffle, no broadcast sub-job; one map-stage
    * projection. Same output shape and bit-identical results as
    * [[assignCells]] (lowest-cluster tiebreak; spec-pinned).
    */
  private def assignCellsData(df: DataFrame, centroids: Seq[Array[Long]]): DataFrame =
    assignCellsDataPre(
      df.select(col("vec_id"), col("embedding"), units(col("embedding")).as("u")),
      centroids)

  /** [[assignCellsData]] over a frame that ALREADY carries the
    * quantized `u` column (a [[corpusFrame]] checkpoint) — skips the
    * re-quantize so shared-frame callers don't pay it per pass.
    */
  private def assignCellsDataPre(withU: DataFrame, centroids: Seq[Array[Long]]): DataFrame = {
    if (centroids.isEmpty)
      return withU
        .withColumn("cluster", lit(null).cast("long"))
        .withColumn("du", lit(null).cast("long"))
        .limit(0)
    // fused kernel, not the transform+array_min HOF: the HOF's
    // per-centroid lambda dispatch + struct boxing is ~230 ns/centroid
    // and linear in k (ScaleProbe argmin_wide_k400/k2048) — at
    // production nlist it IS the assignment cost. centsLit ids are
    // zipWithIndex, so index order == cluster id (the kernel contract).
    withU
      .select(col("vec_id"), col("embedding"), col("u"),
        graft.plans.ArgminL2.argminUnits(col("u"), centroids).as("p"))
      .select(col("vec_id"), col("embedding"), col("u"),
        col("p").getItem(1).as("cluster"), col("p").getItem(0).as("du"))
  }

  /** The TRAINING CORPUS as ONE materialized frame:
    * (vec_id, embedding, u), quantized once, spread once (the fan
    * paths), then localCheckpointed — so the Lloyd init, every
    * iteration's mean pass, and the final corpus assignment read the
    * materialized blocks instead of each re-running the source scan
    * (plus, on the spread path, the repartition exchange). Before
    * this, `trainData`'s lazily-recomputed `spreadForFan(...)` cost
    * iters× full corpus scans + spread exchanges per train — the
    * guide §2.4/§5 recompute-vs-materialize trade at its most
    * lopsided (the frame is reused iters+2 times per build). Eager
    * checkpoint cost: one corpus pass + (vec_id, embedding, u)
    * blocks; blocks are ContextCleaner-freed when the frame goes out
    * of scope.
    */
  private def corpusFrame(embeddings: DataFrame, spread: Boolean): DataFrame = {
    val base = embeddings.select(col("vec_id"), col("embedding"))
    (if (spread) spreadForFan(base) else base)
      .select(col("vec_id"), col("embedding"), units(col("embedding")).as("u"))
      .honestCheckpoint()
  }

  /** Train + corpus assignment sharing ONE [[corpusFrame]]
    * checkpoint: the budget-aware pairing of [[trainAuto]] +
    * [[assignCellsAuto]](spread = true) that every IVF-family build
    * previously spelled as two independent plans — each re-scanning
    * (and re-spreading) the source. Returns (centroids, assigned)
    * where `assigned` is [[assignCells]]' output shape
    * (vec_id, embedding, u, cluster, du), a pure per-row map over the
    * shared checkpoint. Bit-identical to the unshared pairing
    * (spec-pinned by the existing wide/literal parity harness).
    */
  private[graft] def trainAssignAuto(embeddings: DataFrame, k: Int, iters: Int,
                                     wide: Option[Boolean] = None): (Seq[Array[Long]], DataFrame) = {
    val w = wide.getOrElse(k > assignKernelBudget)
    val vecs = corpusFrame(embeddings, spread = w)
    val cents = if (w) trainDataOn(vecs, k, iters) else trainOn(vecs, k, iters)
    val assigned = if (w) assignCellsDataPre(vecs, cents) else assignCellsPre(vecs, cents)
    (cents, assigned)
  }

  /** Lloyd's loop over [[assignCellsData]] — [[train]]'s contract
    * (md5-seeded init, argmin with lowest-cluster tiebreak, sign-
    * split half-up integer means, empty clusters keep their previous
    * centroid; returns k×dim model parameters) with the broadcast
    * centroid frame in place of plan literals, so k is bounded by
    * broadcast size (k×dim longs — millions before it matters), not
    * by the JIT code cache. Bit-identical to [[train]] at any k both
    * can run (spec-pinned).
    */
  private def trainData(embeddings: DataFrame, k: Int, iters: Int): Seq[Array[Long]] =
    // spread BEFORE the per-row k-fold argmin: it runs inside the
    // scan task, so a compact parquet table (one 128 MB split holds
    // ~500k vectors) would put the whole k-times-amplified workload
    // on ONE core — measured as a single-threaded crawl at
    // 100×/k=400. The spread (and the quantize) now happen ONCE per
    // train ([[corpusFrame]]); iterations read the checkpoint.
    trainDataOn(corpusFrame(embeddings, spread = true), k, iters)

  /** [[trainData]]'s Lloyd loop over a pre-materialized
    * [[corpusFrame]] — every iteration reads the checkpointed
    * (vec_id, u) blocks instead of re-running the scan + spread
    * exchange (previously iters× corpus scans + exchanges per train).
    */
  private def trainDataOn(vecs: DataFrame, k: Int, iters: Int): Seq[Array[Long]] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    var cents: Seq[(Long, Seq[Long])] = vecs
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(k)
      .select(col("u"))
      .collect().zipWithIndex.map { case (r, i) => (i.toLong, r.getSeq[Long](0)) }.toSeq
    for (_ <- 1 to iters) {
      // ids are 0..k-1 from the init's zipWithIndex (means only ever
      // update existing keys), so the id-sorted model is index-ordered
      // — the fused kernel's contract (see assignCellsDataPre).
      val model = cents.sortBy(_._1).map(_._2.toArray)
      val means = vecs
        .select(graft.plans.ArgminL2.argminUnits(col("u"), model)
          .getItem(1).as("cluster"), col("u"))
        .select(col("cluster"), posexplode(col("u")).as(Seq("dim", "uu")))
        .groupBy(col("cluster"), col("dim"))
        .agg(sum(col("uu")).as("s"), count(lit(1)).as("n"))
        .select(col("cluster"), col("dim"),
          when(col("s") < 0, -expr("(2 * (-s) + n) DIV (2 * n)"))
            .otherwise(expr("(2 * s + n) DIV (2 * n)")).cast("long").as("m"))
        .repartition(modelAggPartitions, col("cluster"))
        .groupBy(col("cluster"))
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("ms"))
        .select(col("cluster"), col("ms.m").as("centroid"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      cents = cents.map { case (c, prev) => (c, means.getOrElse(c, prev)) }
    }
    cents.sortBy(_._1).map(_._2.toArray)
  }

  /** Persist a [[SemanticIndex]] — the same frozen-index contract as
    * the ANN family (meta written LAST as the commit marker, version
    * + params + corpus-count fingerprint), with one layout choice
    * that matters at serve time: the assignment table is written
    * `partitionBy(cluster)`, so a probe against the LOADED index
    * joins a cluster-partitioned fact with a broadcast batch side —
    * the shape Spark's dynamic partition pruning exists for — where
    * the in-memory checkpoint could only ever scan everything.
    */
  def semanticIndexSave(index: SemanticIndex, dir: String, params: String = "",
                        corpusCount: Long = -1L): Unit = {
    val spark = index.assigned.sparkSession
    import spark.implicits._
    index.assigned.write.mode("overwrite").partitionBy("cluster")
      .parquet(s"$dir/assigned.parquet")
    index.centroids.zipWithIndex.map { case (units, cell) => (cell, units.toSeq) }
      .toDF("cell", "units")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/centroids.parquet")
    // meta LAST = commit marker; last_batch is the streaming-ingest
    // high-water mark (same contract as the IVF-PQ meta): delta dirs
    // with a higher id are UNCOMMITTED and skipped by the loader.
    Seq((semanticIndexVersion, params, corpusCount, -1L))
      .toDF("version", "params", "n", "last_batch")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/meta.parquet")
  }

  def semanticIndexLoad(spark: org.apache.spark.sql.SparkSession, dir: String,
                        preReadMeta: Option[org.apache.spark.sql.Row] = None): SemanticIndex = {
    val meta = preReadMeta.getOrElse(
      spark.read.parquet(s"$dir/meta.parquet").collect()(0))
    require(meta.getAs[Int]("version") == semanticIndexVersion,
      s"index at $dir has layout version ${meta.getAs[Int]("version")}, expected $semanticIndexVersion")
    val cents = spark.read.parquet(s"$dir/centroids.parquet").collect()
      .map(r => (r.getInt(0), r.getSeq[Long](1).toArray)).sortBy(_._1).map(_._2).toSeq
    val base = spark.read.parquet(s"$dir/assigned.parquet")
      .select(col("vec_id"), col("embedding"), col("cluster").cast("long").as("cluster"))
    // committed streaming/append deltas join the scan (plain parquet,
    // cluster as a data column — the base table keeps its partition
    // pruning; deltas are micro-batch-sized until compaction folds
    // them into the partitioned base).
    val deltas = committedDeltaPaths(spark, dir, meta.getAs[Long]("last_batch"))
    val assigned =
      if (deltas.isEmpty) base
      else base.unionByName(spark.read.parquet(deltas: _*)
        .select(col("vec_id"), col("embedding"), col("cluster").cast("long").as("cluster")))
    SemanticIndex(cents, assigned)
  }

  /** The committed delta dirs of an incrementally-grown index:
    * `delta_<id>.parquet` with id ≤ meta's `last_batch` — the shared
    * listing logic of [[committedCodesPaths]], parameterized by dir.
    * An uncommitted delta (crashed writer: dir exists, meta rewrite
    * never ran) has id > last_batch and is skipped; its replay
    * overwrites it. One FS listing, no data read.
    */
  private def committedDeltaPaths(spark: org.apache.spark.sql.SparkSession,
                                  dir: String, lastBatch: Long): Seq[String] = {
    val base = new org.apache.hadoop.fs.Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val deltaRe = "delta_(\\d+)\\.parquet".r
    if (lastBatch < 0 || !fs.exists(base)) Seq.empty
    else fs.listStatus(base).toSeq.map(_.getPath.getName).collect {
      case name @ deltaRe(id) if id.toLong <= lastBatch => (id.toLong, name)
    }.sortBy(_._1).map { case (_, name) => s"$dir/$name" }
  }

  /** FAISS-style `add()` for the frozen semantic index — corpus
    * growth WITHOUT retraining: NEW vectors are assigned under the
    * FROZEN centroids (one scan, no Lloyd) and land in their own
    * `delta_<id>.parquet` dir; the meta rewrite (n += |delta|,
    * last_batch = id) is the commit, written LAST. Crash-safe: a
    * killed append leaves an UNCOMMITTED delta (id > last_batch)
    * that every loader skips and a retry overwrites — the round-12
    * advisor's orphan-rows hazard (the old partitioned-table
    * mode(append) was only safe for buildIfAbsent-gated readers).
    * Append cost ∝ the delta, never the corpus: the existing
    * partition files are byte-untouched.
    */
  def semanticIndexAppend(spark: org.apache.spark.sql.SparkSession, dir: String,
                          newVectors: DataFrame): Long = {
    val lock = servedBuildLocks.computeIfAbsent(dir, _ => new Object)
    lock.synchronized {
      val meta = spark.read.parquet(s"$dir/meta.parquet").collect()(0)
      semanticCommitDelta(spark, dir, meta, newVectors,
        meta.getAs[Long]("last_batch") + 1)
    }
  }

  /** Streaming `add()` for the semantic index — the exactly-once
    * micro-batch append [[graft.streaming.SimilarityStream.semanticNearDupIngest]]
    * calls from `foreachBatch`; the same idempotence contract as
    * [[ivfPqIndexStreamAppend]]: delta dirs are keyed by batchId and
    * written mode(overwrite) (an in-flight replay rewrites, never
    * double-appends), the meta rewrite is the commit (written LAST),
    * and a replayed ALREADY-COMMITTED batch (id ≤ last_batch) is
    * skipped outright. Batches must commit in increasing batchId
    * order — one streaming query per index dir. Returns the
    * committed corpus count.
    */
  def semanticIndexStreamAppend(spark: org.apache.spark.sql.SparkSession, dir: String,
                                batch: DataFrame, batchId: Long): Long = {
    require(batchId >= 0, s"batchId must be >= 0, got $batchId")
    val lock = servedBuildLocks.computeIfAbsent(dir, _ => new Object)
    lock.synchronized {
      val meta = spark.read.parquet(s"$dir/meta.parquet").collect()(0)
      if (batchId <= meta.getAs[Long]("last_batch")) meta.getAs[Long]("n") // committed replay
      else semanticCommitDelta(spark, dir, meta, batch, batchId)
    }
  }

  /** Shared delta-commit step of both semantic appends: frozen-model
    * assignment of the batch → `delta_<id>.parquet` (mode overwrite =
    * idempotent under replay) → meta rewrite LAST with the advanced
    * high-water mark. Caller holds the per-dir lock.
    */
  private def semanticCommitDelta(spark: org.apache.spark.sql.SparkSession,
                                  dir: String, meta: org.apache.spark.sql.Row,
                                  batch: DataFrame, batchId: Long): Long = {
    import spark.implicits._
    require(meta.getAs[Int]("version") == semanticIndexVersion,
      s"index at $dir has layout version ${meta.getAs[Int]("version")}, expected $semanticIndexVersion")
    val cnt = batch.count()
    // An EMPTY batch must still advance the high-water mark (so its
    // replay skips) but must NOT write a delta dir: an empty parquet
    // write is _SUCCESS with zero data files, and a later multi-path
    // read dies on schema inference — the loader's listing tolerates
    // a MISSING committed id, not a data-less one.
    if (cnt > 0) {
      val index = semanticIndexLoad(spark, dir, Some(meta))
      // budget-aware: a delta appended into a WIDE (k > kernel
      // budget) index must assign through the centroid frame, not k
      // plan-literal kernels — otherwise append/ingest re-enter the
      // JIT cap the wide trainer exists to avoid. spread=true: bulk
      // appends can be corpus-sized single-split frames.
      assignCellsAuto(batch.select(col("vec_id"), col("embedding")), index.centroids,
          spread = true)
        .select(col("vec_id"), col("embedding"), col("cluster"))
        .write.mode("overwrite").parquet(s"$dir/delta_$batchId.parquet")
    }
    val n = meta.getAs[Long]("n") + cnt
    stagedMetaWrite(spark, dir) { staging =>
      Seq((semanticIndexVersion, meta.getAs[String]("params"), n, batchId))
        .toDF("version", "params", "n", "last_batch")
        .repartition(1).write.mode("overwrite").parquet(staging)
    }
    n
  }

  /** Fold committed deltas into the cluster-partitioned base
    * assignment table — the semantic index's maintenance mate of
    * [[ivfPqIndexCompact]]: repeated appends otherwise accumulate one
    * plain-parquet dir per batch, each an FS listing + un-pruned scan
    * relation at probe time. The folded assignment is bit-identical
    * (same rows, one partitioned table — probes regain partition
    * pruning over the appended rows too); meta `n` AND `last_batch`
    * are PRESERVED so a replayed pre-compaction batch still reads as
    * committed and skips. No-op without committed deltas. Crash-safe
    * via [[stagedReplace]].
    */
  def semanticIndexCompact(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    val lock = servedBuildLocks.computeIfAbsent(dir, _ => new Object)
    lock.synchronized {
      val meta = spark.read.parquet(s"$dir/meta.parquet").collect()(0)
      require(meta.getAs[Int]("version") == semanticIndexVersion,
        s"index at $dir has layout version ${meta.getAs[Int]("version")}, expected $semanticIndexVersion")
      if (committedDeltaPaths(spark, dir, meta.getAs[Long]("last_batch")).nonEmpty) {
        val merged = semanticIndexLoad(spark, dir, Some(meta)).assigned.honestCheckpoint()
        stagedReplace(spark, dir) { staging =>
          merged.write.mode("overwrite").partitionBy("cluster")
            .parquet(s"$staging/assigned.parquet")
          spark.read.parquet(s"$dir/centroids.parquet")
            .repartition(1).write.mode("overwrite").parquet(s"$staging/centroids.parquet")
          import spark.implicits._
          Seq((semanticIndexVersion, meta.getAs[String]("params"),
              meta.getAs[Long]("n"), meta.getAs[Long]("last_batch")))
            .toDF("version", "params", "n", "last_batch")
            .repartition(1).write.mode("overwrite").parquet(s"$staging/meta.parquet")
        }
      }
    }
  }

  /** The frozen semantic lifecycle WITH corpus growth, as one oracled
    * query — build once on the BASE corpus (vec_id % 10 ≠ 0), append
    * the rest under the frozen model ([[semanticIndexAppend]] —
    * assignment-only, no retrain), then the usual within-cluster pair
    * verify over the FULL assignment. Deterministic end-to-end, so it
    * carries a full DuckDB oracle: the Lloyd chain trained on base
    * rows only, a_fin assigning the whole corpus under the final
    * centroids — exactly what build(base) + append(rest) materializes
    * on disk.
    */
  def dedupSemanticAppended(embeddings: DataFrame, indexDir: String, k: Int = 4,
                            iters: Int = 3, threshold: Double = 0.45,
                            blocks: Int = 0): DataFrame = {
    val spark = embeddings.sparkSession
    val base = embeddings.filter(col("vec_id") % 10 =!= 0)
    val fresh = embeddings.filter(col("vec_id") % 10 === 0)
    val params = s"sem;k=$k;it=$iters;base=mod10;src=${sourceStamp(embeddings)}"
    // ONE corpus scan for both counts (total + fresh split) — the
    // previous embeddings.count() + fresh.count() pair cost two.
    val cnts = embeddings
      .agg(count(lit(1)), count(when(col("vec_id") % 10 === 0, 1))).collect()(0)
    val n = cnts.getLong(0)
    val nFresh = cnts.getLong(1)
    val meta = buildIfAbsent(spark, indexDir, params, n, semanticIndexVersion) { staging =>
      semanticIndexSave(semanticIndexBuild(base, k, iters), staging, params, n - nFresh)
      semanticIndexAppend(spark, staging, fresh)
    }
    withinClusterPairs(semanticIndexLoad(spark, indexDir, Some(meta)).assigned,
      threshold, blocks)
  }

  /** Frozen-lifecycle SemDeDup pairs: build-if-absent → load → the
    * same within-cluster pair verify — bit-identical to
    * [[dedupSemantic]] (assignment survives the parquet round trip
    * exactly), so it shares dedup_semantic's oracle. The serve-side
    * win is [[semanticIndexSave]]'s cluster-partitioned layout plus
    * skipping the per-run Lloyd train.
    */
  def dedupSemanticServed(embeddings: DataFrame, indexDir: String, k: Int = 8,
                          iters: Int = 3, threshold: Double = 0.45,
                          blocks: Int = 0): DataFrame = {
    val spark = embeddings.sparkSession
    val params = s"sem;k=$k;it=$iters;src=${sourceStamp(embeddings)}"
    val n = embeddings.count()
    val meta = buildIfAbsent(spark, indexDir, params, n, semanticIndexVersion) { staging =>
      semanticIndexSave(semanticIndexBuild(embeddings, k, iters), staging, params, n)
    }
    withinClusterPairs(semanticIndexLoad(spark, indexDir, Some(meta)).assigned,
      threshold, blocks)
  }

  /** Probe a bounded batch of NEW vectors against a frozen
    * [[SemanticIndex]] — the ingestion-time half of SemDeDup ("is
    * this new document a semantic dup of anything already in the
    * corpus?"): each new vector is assigned to its cell under the
    * FROZEN centroids (no retrain) and exact-verified against that
    * cell's corpus members only. Same guarantees as the batch
    * operator: precision 1.0 by the exact verify; recall trades at
    * the cell boundary. The batch side broadcasts (caller-bounded —
    * a micro-batch), so the cost per probe is one corpus-assignment
    * scan with the codegen prefilter, the serving-scan class of
    * [[pqSearch]].
    *
    * `excludeSelf` mirrors [[notSelf]]'s policy (advisor round 12):
    * an ingestion batch carries its OWN id namespace, so the default
    * keeps a corpus row whose vec_id merely collides with a batch id
    * — pass `excludeSelf = true` only for corpus-derived batches,
    * where id equality really means "the same vector".
    */
  def semanticProbe(index: SemanticIndex, batch: DataFrame,
                    threshold: Double = 0.45,
                    excludeSelf: Boolean = false): DataFrame = {
    val nb = assignCells(batch.select(col("vec_id"), col("embedding")), index.centroids)
      .select(col("vec_id").as("new_id"), col("embedding").as("eb"), col("cluster"))
    index.assigned
      .select(col("vec_id").as("corpus_id"), col("embedding").as("ea"), col("cluster"))
      .join(broadcast(nb), Seq("cluster"))
      .filter(if (excludeSelf) col("corpus_id") =!= col("new_id") else lit(true))
      .filter(cosineFast(col("ea"), col("eb")) >= threshold - 1e-3)
      .withColumn("cosine",
        cosineExact(decDot(col("ea"), col("eb")), decNorm2(col("ea")), decNorm2(col("eb"))))
      .filter(col("cosine") >= threshold)
      .select(col("new_id"), col("corpus_id"), col("cluster"), col("cosine"))
      .orderBy(col("new_id"), col("corpus_id"))
  }

  /** Hierarchical SemDeDup — [[dedupSemantic]]'s SECOND-DECADE scale
    * path. The flat operator's contract grows k with the corpus so a
    * cluster's pair block stays bounded, but flat argmin assignment
    * is then Θ(n·k·d) = Θ(n²·d/200k) — quadratic again, one level
    * up — and its plan-literal centroid encoding caps k at ~tens of
    * codegen kernels per row anyway. The production recipe (what
    * SemDeDup-at-scale actually runs: coarse-quantized assignment)
    * factors k = k₁·k₂: ONE global Lloyd over k₁ coarse cells, then
    * an independent k₂-means INSIDE each coarse cell, so assignment
    * work is O(n·(k₁+k₂)·d) — with k₁ = k₂ = √k that's Θ(n^1.5·d)
    * total for k ∝ n, and each level stays within the plan-literal
    * kernel budget (√400 = 20 kernels where flat would need 400).
    *
    * Same guarantees as the flat operator, by the same construction:
    * every returned pair is exact-verified (precision 1.0, result ⊂
    * [[embeddingNearDup]]), md5-seeded determinism end-to-end, and a
    * FULL DuckDB oracle (the coarse Lloyd chain + one RESTRICTED
    * fine chain per coarse cell — the trainEx-restriction technique
    * the appended-index oracle introduced). RECALL trades twice (a
    * true pair can straddle a coarse OR a fine boundary); the spec
    * pins the measured floor next to the flat operator's.
    *
    * Physical shape: the coarse assignment materializes once
    * (honestCheckpoint) and each per-cell fine trainer filters that
    * frame — k₁ bounded driver-loop train calls (the MLlib pattern:
    * model parameters live on the driver), then one unioned
    * assignment frame feeds the same largest-cluster-sized
    * block-pair triangle as the flat operator. Empty coarse cells
    * (Lloyd can starve one) are skipped — they hold no vectors, so
    * they contribute no pairs.
    */
  def dedupSemanticHier(embeddings: DataFrame, k1: Int = 4, k2: Int = 4,
                        iters: Int = 3, threshold: Double = 0.45,
                        blocks: Int = 0): DataFrame = {
    // coarse train + assignment share one corpus checkpoint; the
    // coarse frame KEEPS `u` so the per-cell fine trains reuse the
    // quantization instead of re-deriving it per Lloyd pass.
    val (coarseCentroids, coarseA) = trainAssignAuto(embeddings, k1, iters, wide = Some(false))
    val coarse = coarseA
      .select(col("vec_id"), col("embedding"), col("u"), col("cluster").as("coarse"))
      .honestCheckpoint()
    val occupied = coarse.groupBy(col("coarse")).count()
      .collect().map(_.getLong(0)).sorted
    val fine = occupied.toSeq.map { c =>
      // materialize the CELL once: the per-cell Lloyd loop otherwise
      // re-filters the full coarse frame every iteration — k₁·(iters+1)
      // full-frame passes across the loop vs k₁ filter passes now.
      val cell = coarse.filter(col("coarse") === c)
        .select(col("vec_id"), col("embedding"), col("u"))
        .honestCheckpoint()
      val fc = trainOn(cell, k2, iters)
      assignCellsPre(cell, fc)
        .select(col("vec_id"), col("embedding"),
          (lit(c * k2) + col("cluster")).as("cluster"))
    }
    // reduceOption: an EMPTY corpus occupies no coarse cells — degrade
    // to the empty pair set like embeddingNearDup (advisor round 12).
    val assigned = fine.reduceOption(_ unionAll _)
      .getOrElse(coarse.select(col("vec_id"), col("embedding"), col("coarse").as("cluster")).limit(0))
      .honestCheckpoint()
    withinClusterPairs(assigned, threshold, blocks)
  }

  /** [[dedupSemanticHier]] with the fine level trained as ONE
    * dataframe program per Lloyd iteration instead of a k₁-iteration
    * driver loop of sequential `train()` calls — the documented scale
    * fix for k₁ in the hundreds, where the loop serializes k₁ × iters
    * job-group latencies. Every per-cell k₂-means runs CONCURRENTLY
    * inside a shared plan: fine centroids are DATA keyed by coarse
    * cell (a broadcast (coarse, fine, cu) frame — model parameters,
    * k₁·k₂·dim longs, collected once per iteration like the looped
    * trainer), assignment broadcast-joins each vector to its OWN
    * cell's centroid ARRAY and computes a per-row lexicographic
    * argmin ([[argminOver]] = [[assignCells]]' semantics with
    * lowest-index tiebreak), and the mean step is the same sign-split
    * integer half-up grouped by (coarse, fine, dim). Job count per
    * fine iteration: 1, independent of k₁.
    *
    * BIT-IDENTICAL to the looped operator by construction — same
    * md5-seeded per-cell init (row_number over the cell in
    * (md5(vec_id), vec_id) order vs the loop's orderBy+limit), same
    * exact-integer-units arithmetic, same empty-cluster-keeps-
    * previous rule (left join + coalesce vs getOrElse) — so it shares
    * dedup_semantic_hier's FULL DuckDB oracle, and the spec pins
    * grouped ≡ looped on the gate corpus.
    */
  def dedupSemanticHierGrouped(embeddings: DataFrame, k1: Int = 4, k2: Int = 4,
                               iters: Int = 3, threshold: Double = 0.45,
                               blocks: Int = 0,
                               wideCoarse: Option[Boolean] = None): DataFrame =
    withinClusterPairs(
      semanticIndexBuildHier(embeddings, k1, k2, iters, wideCoarse).assigned,
      threshold, blocks)

  /** The TWO-LEVEL frozen model of the SemDeDup family — what the
    * flat [[SemanticIndex]] cannot be past k ≈ tens (its centroids
    * are plan literals): coarse centroids stay literals (k₁ ≲ tens by
    * construction), fine centroids are DATA keyed by coarse cell
    * (k₁·k₂·dim longs — model parameters), so total clusters k₁·k₂
    * can track the corpus while every plan stays bounded. Built by
    * the grouped trainer ([[dedupSemanticHierGrouped]] is exactly
    * `withinClusterPairs` over this build — bit-identical to the
    * looped hier operator, spec-pinned).
    */
  final case class HierSemanticIndex private[Similarity] (
      coarse: Seq[Array[Long]],
      fine: Seq[(Long, Long, Seq[Long])],
      k2: Int, assigned: DataFrame)

  def semanticIndexBuildHier(embeddings: DataFrame, k1: Int = 4, k2: Int = 4,
                             iters: Int = 3,
                             wideCoarse: Option[Boolean] = None): HierSemanticIndex = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    // COARSE level is budget-aware (round-14 closure of the §6
    // third-decade residual): within the kernel budget it stays the
    // k₁ plan-literal chain; past it the coarse trainer/assigner run
    // centroids-as-data, so k₁ can grow past ~64 like the flat wide
    // index — the fine level was data-keyed all along. Bit-identical
    // either way (wideCoarse forces a side; spec-pinned parity).
    // Coarse train + coarse assignment share ONE corpus checkpoint
    // (trainAssignAuto); the assigned frame materializes again here
    // because every fine iteration (and the final assignment)
    // re-scans it WITH the coarse label.
    val (coarseCentroids, coarseA) = trainAssignAuto(embeddings, k1, iters, wideCoarse)
    val vecs = coarseA
      .select(col("vec_id"), col("embedding"), col("u"), col("cluster").as("coarse"))
      .honestCheckpoint()
    // Per-cell init: first ≤ k₂ vectors of each cell in md5 order —
    // the loop's train() init, all cells in one window pass.
    val w = Window.partitionBy(col("coarse"))
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
    var cents: Seq[(Long, Long, Seq[Long])] = vecs
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k2)
      .select(col("coarse"), (col("rn") - 1).cast("long").as("fine"), col("u"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2))).toSeq
    // fine centroids grouped per coarse cell as ONE map literal
    // (coarse → array<struct<fine, cu>> — model parameters, the
    // typedlit class of [[centsLit]]), so the fine argmin is a pure
    // per-row projection ([[argminOver]] over element_at) — no join,
    // no n×k₂ row fan, no min(struct) SortAggregate chain, no
    // broadcast sub-job per iteration.
    def fmap = typedlit(cents.groupBy(_._1).view.mapValues(fs =>
      fs.sortBy(_._2).map { case (_, f, cu) => FineEntry(f, cu) }).toMap)
    def assign = vecs
      .select(col("coarse"), col("vec_id"), col("embedding"), col("u"),
        argminOver(element_at(fmap, col("coarse")), col("u"), "fine").as("p"))
    for (_ <- 1 to iters) {
      val means = assign
        .select(col("coarse"), col("p.fine").as("fine"),
          posexplode(col("u")).as(Seq("dim", "uu")))
        .groupBy(col("coarse"), col("fine"), col("dim"))
        .agg(sum(col("uu")).as("s"), count(lit(1)).as("n"))
        .select(col("coarse"), col("fine"), col("dim"),
          when(col("s") < 0, -expr("(2 * (-s) + n) DIV (2 * n)"))
            .otherwise(expr("(2 * s + n) DIV (2 * n)")).cast("long").as("m"))
        // k₁·k₂·dim rows from here — model-parameter tail, pinned
        // (see modelAggPartitions; the p=2048 sweep texture)
        .repartition(modelAggPartitions, col("coarse"), col("fine"))
        .groupBy(col("coarse"), col("fine"))
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("ms"))
        .select(col("coarse"), col("fine"), col("ms.m").as("cu"))
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getSeq[Long](2))).toMap
      cents = cents.map { case (c, f, prev) => (c, f, means.getOrElse((c, f), prev)) }
    }
    val assigned = assign
      .select(col("vec_id"), col("embedding"),
        (col("coarse") * k2 + col("p.fine")).as("cluster"))
      .honestCheckpoint()
    HierSemanticIndex(coarseCentroids, cents, k2, assigned)
  }

  /** Ingestion-time probe against a [[HierSemanticIndex]] — the
    * two-level serve mate of [[semanticProbe]], and the reason the
    * hier index can serve where the flat one cannot: a batch vector
    * assigns through k₁ coarse plan-literal kernels and then a
    * broadcast JOIN against its own cell's ≤ k₂ fine centroids
    * (the grouped trainer's argmin algebra, applied to the bounded
    * batch), so probe-side plan size is O(k₁) kernels + one join —
    * never the O(k₁·k₂) literal chain that exhausted the JIT code
    * cache at k = 400 (§6). The verify half is identical to the flat
    * probe: the batch joins only its global cells' members (the
    * cluster-partitioned on-disk layout prunes the scan), exact
    * decimal cosine on survivors.
    */
  def semanticProbeHier(index: HierSemanticIndex, batch: DataFrame,
                        threshold: Double = 0.45,
                        excludeSelf: Boolean = false,
                        wideCoarse: Option[Boolean] = None): DataFrame = {
    // per-cell fine centroid map literal, the build's argmin shape
    // (see semanticIndexBuildHier / argminOver)
    val fmap = typedlit(index.fine.groupBy(_._1).view.mapValues(fs =>
      fs.sortBy(_._2).map { case (_, f, cu) => FineEntry(f, cu) }).toMap)
    // coarse assign is budget-aware like the build: k₁ past the
    // kernel budget probes through the centroid frame (batches are
    // broadcast-bound — no spread)
    val nb = assignCellsAuto(batch.select(col("vec_id"), col("embedding")), index.coarse,
        wideCoarse)
      .select(col("vec_id"), col("embedding"), col("u"), col("cluster").as("coarse"))
      // try_element_at, not element_at: a batch vector can assign to a
      // DEAD coarse cell (a centroid that ended training with zero
      // corpus members, so index.fine carries no entries for it).
      // Under Spark 4's default ANSI mode element_at on the map
      // literal would throw MAP_KEY_DOES_NOT_EXIST; try_element_at
      // yields null → null cluster → the inner equi-join below drops
      // the row — exactly the old broadcast-join drop semantics (a
      // dead cell has no candidates anyway). Build-side argmins keep
      // plain element_at: every coarse value there comes from the
      // checkpointed corpus assignment, whose cells all seeded ≥ 1
      // fine centroid.
      .select(col("vec_id").as("new_id"), col("embedding").as("eb"),
        (col("coarse") * index.k2 +
          argminOver(try_element_at(fmap, col("coarse")), col("u"), "fine")
            .getField("fine")).as("cluster"))
    index.assigned
      .select(col("vec_id").as("corpus_id"), col("embedding").as("ea"), col("cluster"))
      .join(broadcast(nb), Seq("cluster"))
      .filter(if (excludeSelf) col("corpus_id") =!= col("new_id") else lit(true))
      .filter(cosineFast(col("ea"), col("eb")) >= threshold - 1e-3)
      .withColumn("cosine",
        cosineExact(decDot(col("ea"), col("eb")), decNorm2(col("ea")), decNorm2(col("eb"))))
      .filter(col("cosine") >= threshold)
      .select(col("new_id"), col("corpus_id"), col("cluster"), col("cosine"))
      .orderBy(col("new_id"), col("corpus_id"))
  }

  /** Persist / load a [[HierSemanticIndex]] — the flat semantic
    * lifecycle ([[semanticIndexSave]]) extended with the fine
    * centroid table; the assignment keeps the cluster-partitioned
    * layout (the serve-side pruning shape) and meta (with k2) lands
    * LAST as the commit marker.
    */
  def semanticIndexSaveHier(index: HierSemanticIndex, dir: String,
                            params: String = "", corpusCount: Long = -1L): Unit = {
    val spark = index.assigned.sparkSession
    import spark.implicits._
    index.assigned.write.mode("overwrite").partitionBy("cluster")
      .parquet(s"$dir/assigned.parquet")
    index.coarse.zipWithIndex.map { case (units, cell) => (cell, units.toSeq) }
      .toDF("cell", "units")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/centroids.parquet")
    index.fine.toDF("coarse", "fine", "cu")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/fine_centroids.parquet")
    Seq((hierIndexVersion, index.k2, params, corpusCount))
      .toDF("version", "k2", "params", "n")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/meta.parquet")
  }

  def semanticIndexLoadHier(spark: org.apache.spark.sql.SparkSession, dir: String,
                            preReadMeta: Option[org.apache.spark.sql.Row] = None): HierSemanticIndex = {
    val meta = preReadMeta.getOrElse(
      spark.read.parquet(s"$dir/meta.parquet").collect()(0))
    require(meta.getAs[Int]("version") == hierIndexVersion,
      s"index at $dir has layout version ${meta.getAs[Int]("version")}, expected $hierIndexVersion")
    val coarse = spark.read.parquet(s"$dir/centroids.parquet").collect()
      .map(r => (r.getInt(0), r.getSeq[Long](1).toArray)).sortBy(_._1).map(_._2).toSeq
    val fine = spark.read.parquet(s"$dir/fine_centroids.parquet").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2))).sortBy(t => (t._1, t._2)).toSeq
    val assigned = spark.read.parquet(s"$dir/assigned.parquet")
      .select(col("vec_id"), col("embedding"), col("cluster").cast("long").as("cluster"))
    HierSemanticIndex(coarse, fine, meta.getAs[Int]("k2"), assigned)
  }

  /** Frozen-lifecycle hierarchical SemDeDup pairs — bit-identical to
    * [[dedupSemanticHierGrouped]] (assignment and centroids survive
    * the parquet round trip exactly), so it shares
    * dedup_semantic_hier's oracle.
    */
  def dedupSemanticHierServed(embeddings: DataFrame, indexDir: String,
                              k1: Int = 4, k2: Int = 4, iters: Int = 3,
                              threshold: Double = 0.45, blocks: Int = 0): DataFrame = {
    val spark = embeddings.sparkSession
    val params = s"semhier;k1=$k1;k2=$k2;it=$iters;src=${sourceStamp(embeddings)}"
    val n = embeddings.count()
    val meta = buildIfAbsent(spark, indexDir, params, n, hierIndexVersion) { staging =>
      semanticIndexSaveHier(semanticIndexBuildHier(embeddings, k1, k2, iters),
        staging, params, n)
    }
    withinClusterPairs(semanticIndexLoadHier(spark, indexDir, Some(meta)).assigned,
      threshold, blocks)
  }

  /** Shared verify stage of the SemDeDup family: the within-cluster
    * pair space of an (vec_id, embedding, cluster) frame, spread over
    * block-pair triangle groups keyed (cluster, bi, bj) and sized by
    * the LARGEST cluster (k-row aggregate — model-parameter-sized),
    * so a skewed cluster cannot concentrate its nᵢ²/2 pairs in one
    * task; codegen double-cosine prefilter, exact decimal verify.
    */
  private def withinClusterPairs(assigned: DataFrame, threshold: Double,
                                 blocks: Int): DataFrame = {
    val b =
      if (blocks > 0) blocks
      else {
        // coalesce: max(count) over an EMPTY assignment is NULL —
        // degrade to b=1 / empty output, not an NPE (advisor round 12).
        val maxN = assigned.groupBy(col("cluster")).count()
          .agg(coalesce(max(col("count")), lit(0L))).collect()(0).getLong(0)
        math.max(1L, (maxN + 199999L) / 200000L).toInt
      }
    val e = assigned.withColumn("blk", pmod(xxhash64(col("vec_id")), lit(b)).cast("int"))
    val sideA = e.select(col("cluster"), col("vec_id").as("ia"), col("embedding").as("ea"), col("blk").as("bi"))
      .withColumn("bj", explode(sequence(col("bi"), lit(b - 1))))
    val sideB = e.select(col("cluster"), col("vec_id").as("ib"), col("embedding").as("eb"), col("blk").as("bj"))
      .withColumn("bi", explode(sequence(lit(0), col("bj"))))
    sideA.join(sideB, Seq("cluster", "bi", "bj"))
      .filter(col("bi") =!= col("bj") || col("ia") < col("ib"))
      .filter(cosineFast(col("ea"), col("eb")) >= threshold - 1e-3)
      .withColumn("cosine",
        cosineExact(decDot(col("ea"), col("eb")), decNorm2(col("ea")), decNorm2(col("eb"))))
      .filter(col("cosine") >= threshold)
      .select(least(col("ia"), col("ib")).as("a"), greatest(col("ia"), col("ib")).as("b"),
        col("cluster"), col("cosine"))
      .orderBy(col("a"), col("b"))
  }

  /** Radius (range) search — every corpus vector with exact cosine ≥
    * `threshold` of each query, the FAISS `range_search` analog
    * (top-k's sibling: the caller wants ALL matches above a quality
    * bar, not a fixed count). Same two-phase shape as
    * [[annBruteForce]]: queries broadcast over ONE corpus scan, a
    * codegen double-cosine prefilter (1e-3 margin ≫ double-vs-exact
    * error) cuts the stream map-side, and only near-threshold
    * survivors pay the exact decimal verification. No window, no
    * top-k shuffle — the only exchange is the final presentation
    * sort, so the scan parallelizes embarrassingly at any corpus
    * size (the broadcast query set is the caller-bounded side).
    */
  def annRange(embeddings: DataFrame, queries: Option[DataFrame] = None,
               threshold: Double = 0.4,
               queriesAreCorpusDerived: Option[Boolean] = None): DataFrame = {
    val corpus = embeddings.select(col("vec_id"), col("embedding"))
    val qs = queries.getOrElse(defaultQueries(embeddings))
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    corpus.join(broadcast(qs),
        notSelf(queriesAreCorpusDerived.getOrElse(queries.isEmpty)))
      .filter(cosineFast(col("qe"), col("embedding")) >= threshold - 1e-3)
      .withColumn("cosine",
        cosineExact(decDot(col("qe"), col("embedding")), decNorm2(col("qe")), decNorm2(col("embedding"))))
      .filter(col("cosine") >= threshold)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cosine"))
      .orderBy(col("query_id"), col("neighbor_id"))
  }

  /** IVF range search — the FAISS `IndexIVF.range_search` analog and
    * [[annRange]]'s SCALE companion: the windowless broadcast scan is
    * linear in the corpus by definition (7.5× at 100×, §6), so at
    * scale the radius query should pay only its probed cells. The
    * trained Lloyd coarse quantizer assigns the corpus once; each
    * query probes its `nprobe` nearest cells ([[assignTopCells]] —
    * shuffle-free per-row sort+slice) and the exact-threshold verify
    * runs over those cells' members only (candidates ≈ nprobe/nlist
    * of the corpus). A corpus vector lives in exactly ONE cell, so no
    * result can duplicate across probed cells. RECALL trades at the
    * cell boundary like every IVF layout — nprobe buys it back, and
    * nprobe = nlist recovers [[annRange]] bit-for-bit (spec-pinned).
    * Same exact integer/decimal arithmetic end-to-end → FULL DuckDB
    * oracle (the Lloyd chain + q_probe gating the range verify).
    */
  def annRangeIvf(embeddings: DataFrame, queries: Option[DataFrame] = None,
                  threshold: Double = 0.4, nlist: Int = 8, ivfIters: Int = 3,
                  nprobe: Int = 2,
                  queriesAreCorpusDerived: Option[Boolean] = None): DataFrame = {
    // train + corpus assignment share one materialized corpus frame
    val (centroids, corpusA) = trainAssignAuto(embeddings, nlist, ivfIters)
    val corpus = corpusA
      .select(col("vec_id"), col("embedding"), col("cluster"))
    val qs = assignTopCellsAuto(
        queries.getOrElse(defaultQueries(embeddings)).select(col("vec_id"), col("embedding")),
        centroids, nprobe)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("cluster"))
    corpus.join(broadcast(qs), Seq("cluster"))
      .filter(notSelf(queriesAreCorpusDerived.getOrElse(queries.isEmpty)))
      .filter(cosineFast(col("qe"), col("embedding")) >= threshold - 1e-3)
      .withColumn("cosine",
        cosineExact(decDot(col("qe"), col("embedding")), decNorm2(col("qe")), decNorm2(col("embedding"))))
      .filter(col("cosine") >= threshold)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cosine"))
      .orderBy(col("query_id"), col("neighbor_id"))
  }

  /** Serve-from-frozen-index IVF range search — [[annRangeIvf]]'s
    * build/serve split, the family-standard move the trained variant
    * lacked (at gate SF the radius query is TRAIN-dominated: 2.89 s
    * vs flat ann_range's 0.43 — FAISS serves `range_search` from a
    * BUILT IndexIVF for exactly this reason). The frozen structure IS
    * the flat [[SemanticIndex]] — trained coarse centroids + the
    * cluster-PARTITIONED corpus assignment ([[semanticIndexSave]]'s
    * layout, so a probe joining on `cluster` prunes the scan to the
    * probed cells' partitions) — reused verbatim, which buys the
    * whole lifecycle for free: build-if-absent with the sourceStamp
    * fingerprint, crash-safe staged publish, delta append/ingest/
    * compact. Serve = [[assignTopCells]] over the LOADED centroids +
    * the same exact-threshold verify, so the result is bit-identical
    * to [[annRangeIvf]] at equal params (integer units survive the
    * parquet round trip) and it shares ann_range_ivf's FULL oracle.
    */
  def annRangeIvfServed(embeddings: DataFrame, indexDir: String,
                        queries: Option[DataFrame] = None,
                        threshold: Double = 0.4, nlist: Int = 8, ivfIters: Int = 3,
                        nprobe: Int = 2,
                        queriesAreCorpusDerived: Option[Boolean] = None): DataFrame = {
    val spark = embeddings.sparkSession
    val params = s"rangeivf;nlist=$nlist;ivfIt=$ivfIters;src=${sourceStamp(embeddings)}"
    val n = embeddings.count()
    val meta = buildIfAbsent(spark, indexDir, params, n, semanticIndexVersion) { staging =>
      semanticIndexSave(
        if (nlist > assignKernelBudget) semanticIndexBuildWide(embeddings, nlist, ivfIters)
        else semanticIndexBuild(embeddings, nlist, ivfIters),
        staging, params, n)
    }
    val index = semanticIndexLoad(spark, indexDir, Some(meta))
    val qs = assignTopCellsAuto(
        queries.getOrElse(defaultQueries(embeddings)).select(col("vec_id"), col("embedding")),
        index.centroids, nprobe)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("cluster"))
    index.assigned.join(broadcast(qs), Seq("cluster"))
      .filter(notSelf(queriesAreCorpusDerived.getOrElse(queries.isEmpty)))
      .filter(cosineFast(col("qe"), col("embedding")) >= threshold - 1e-3)
      .withColumn("cosine",
        cosineExact(decDot(col("qe"), col("embedding")), decNorm2(col("qe")), decNorm2(col("embedding"))))
      .filter(col("cosine") >= threshold)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cosine"))
      .orderBy(col("query_id"), col("neighbor_id"))
  }

  /** Self-match exclusion policy for the ann* family: when the query
    * set defaults to a CORPUS SUBSET, `query_id` and `vec_id` share
    * one id namespace and a query must not return itself — but an
    * EXTERNAL query frame has its own id namespace, where excluding
    * on id equality would silently drop a true neighbor whose corpus
    * id merely collides with a query id. So: exclude iff the query
    * set is corpus-derived (overridable where a caller derives its
    * own corpus-subset frame, e.g. [[annIvfTrained]]).
    */
  private def notSelf(corpusDerived: Boolean): Column =
    if (corpusDerived) col("vec_id") =!= col("query_id") else lit(true)

  /** Exact top-k cosine neighbors for the query set. Queries
    * broadcast over one corpus scan; ranking uses the exact cosine
    * with vec_id tiebreak so rank order is total.
    */
  def annBruteForce(embeddings: DataFrame, queries: Option[DataFrame] = None,
                    k: Int = 5): DataFrame = {
    val corpus = embeddings.select(col("vec_id"), col("embedding"))
    val qs = queries.getOrElse(defaultQueries(embeddings))
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    // Phase 1: native double cosine over the full scan, cut by VALUE
    // at the k-th fast score (see keepFastSurvivors). Phase 2: exact
    // decimal re-rank of the survivors only (the oracle-parity values).
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))
    val scanned = corpus.join(broadcast(qs), notSelf(corpusDerived = queries.isEmpty))
      .withColumn("fast", cosineFast(col("qe"), col("embedding")))
    keepFastSurvivors(scanned, k)
      .withColumn("cosine",
        cosineExact(decDot(col("qe"), col("embedding")), decNorm2(col("qe")), decNorm2(col("embedding"))))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Deterministic Lloyd's k-means over the embedding column — the
    * coarse-quantizer TRAINER for [[annIvf]] (label = trained
    * cluster instead of a given one).
    *
    * Distributed shape: centroids are model parameters (k×dim
    * integers — kilobytes), so they live in plan literals broadcast
    * with the closure; each iteration is ONE scan computing the
    * argmin-distance assignment (k fold expressions, no join, no
    * shuffle) plus one partial-aggregated per-cluster mean (shuffle
    * carries k×dim rows). Init is the first k vectors in
    * md5(vec_id) order — seeded, reproducible anywhere.
    *
    * ALL arithmetic is exact integer fixed-point (see [[units]]):
    * components quantize to 1e-8 units, squared distances and
    * half-up means stay in Long space, and the reported dist is an
    * integer half-up of du/1e16 at 6 dp — so training, assignment,
    * and output are bit-identical on any engine, and the iterative
    * trainer carries a FULL DuckDB oracle (the unrolled-iteration
    * CTE chain, the fin_ridge technique).
    */
  def kmeans(embeddings: DataFrame, k: Int = 8, iters: Int = 5): DataFrame =
    trainAssignAuto(embeddings, k, iters, wide = Some(false))._2
      .select(col("vec_id"), col("cluster"),
        (expr("(2 * du + 10000000000) DIV 20000000000").cast("double") / lit(1e6)
          + lit(0.0)).as("dist"))
      .orderBy(col("vec_id"))

  /** 1e-8 fixed-point quantization of a whole embedding — the
    * integer-units trick from [[annLsh]]: round(double(e) · 1e8) is
    * the same correctly-rounded double product and half-up round on
    * every engine, and everything downstream stays in exact integer
    * space. Bounds (|e| < 0.6 measured, dim = 64): |u| < 6e7,
    * squared diff < 1.5e16, per-vector distance < 1e18 — inside Long
    * with the kernels' Math.*Exact checks as the loud guard.
    *
    * One codegen kernel call per ROW (vs the per-component
    * `round(e · 1e8)` fold it replaced, which re-quantized inside
    * every centroid's HOF lambda — k×dim BigDecimal rounds per row,
    * the round-7 ann_kmeans 5.6× regression). Value parity with
    * Spark's `round` is argued in [[graft.plans.QuantizeUnitsI64]]
    * and pinned by SimilaritySpec + the DuckDB oracles.
    */
  private def units(e: Column): Column =
    graft.plans.IntegerUnits.quantizeUnits(e)

  /** Nearest-centroid assignment of any (vec_id, embedding) frame —
    * one scan: quantize once per row, then `centroids.size` codegen
    * integer-L2 kernels, argmin with lowest-cluster tiebreak (same
    * chain shape as langId). `du` is the squared distance in 1e-16
    * units; `u` (the quantized vector) rides along for the trainer's
    * mean step.
    */
  private def assignCells(df: DataFrame, centroids: Seq[Array[Long]]): DataFrame =
    assignCellsPre(
      df.select(col("vec_id"), col("embedding"), units(col("embedding")).as("u")),
      centroids)

  /** [[assignCells]] over a frame that ALREADY carries the quantized
    * `u` column (a [[corpusFrame]] checkpoint) — skips the
    * re-quantize so shared-frame callers don't pay it per pass.
    */
  private def assignCellsPre(withU: DataFrame, centroids: Seq[Array[Long]]): DataFrame = {
    import graft.plans.IntegerUnits.l2Units
    if (centroids.isEmpty)
      // no centroids ⇒ the training corpus was empty; degrade to an
      // empty assignment of the right shape instead of least() of
      // zero columns (advisor round 12: empty-input SemDeDup family).
      return withU
        .withColumn("cluster", lit(null).cast("long"))
        .withColumn("du", lit(null).cast("long"))
        .limit(0)
    val ds = centroids.indices.map(i => l2Units(col("u"), lit(centroids(i))).as(s"d$i"))
    val scored = withU.select(col("vec_id") +: col("embedding") +: col("u") +: ds: _*)
    val cluster = centroids.indices.init.foldRight(lit(centroids.size - 1)) { (i, rest) =>
      when(col(s"d$i") <= (i + 1 until centroids.size).map(j => col(s"d$j")).reduce(least(_, _)), i)
        .otherwise(rest)
    }
    scored.withColumn("cluster", cluster.cast("long"))
      .withColumn("du", least(centroids.indices.map(i => col(s"d$i")): _*))
      .select(col("vec_id"), col("embedding"), col("u"), col("cluster"), col("du"))
  }

  /** Top-`nprobe` nearest-centroid assignments — one row per probed
    * cell, (du, cluster) ascending, so nprobe=1 reduces exactly to
    * [[assignCells]]' argmin (same lowest-cluster tiebreak). This is
    * the IVF recall knob: imbalanced cells put true neighbors just
    * across a Voronoi boundary, and probing the next-nearest cells
    * buys recall back at candidate cost nprobe/nlist of the corpus.
    * Shuffle-free: the per-row (du, cluster) struct array sorts
    * lexicographically (du first) and slices — no window needed, so
    * probing a billion queries costs one map pass.
    */
  private def assignTopCells(df: DataFrame, centroids: Seq[Array[Long]], nprobe: Int): DataFrame = {
    import graft.plans.IntegerUnits.l2Units
    require(nprobe >= 1 && nprobe <= centroids.size,
      s"nprobe must be in [1, ${centroids.size}], got $nprobe")
    val withU = df.select(col("vec_id"), col("embedding"), units(col("embedding")).as("u"))
    val ds = centroids.indices.map(i => l2Units(col("u"), lit(centroids(i))).as(s"d$i"))
    val pairs = array(centroids.indices.map(i =>
      struct(col(s"d$i").as("du"), lit(i.toLong).as("cluster"))): _*)
    withU.select(col("vec_id") +: col("embedding") +: ds: _*)
      .select(col("vec_id"), col("embedding"),
        explode(slice(array_sort(pairs), 1, nprobe)).as("p"))
      .select(col("vec_id"), col("embedding"),
        col("p.cluster").as("cluster"), col("p.du").as("du"))
  }

  /** Lloyd's training loop — returns the trained centroids in 1e-8
    * units (k×dim model parameters; the only thing the driver ever
    * collects). Means are integer half-up (sign split so DIV only
    * ever sees nonnegative operands); an empty cluster keeps its
    * previous centroid.
    */
  private def train(embeddings: DataFrame, k: Int, iters: Int): Seq[Array[Long]] =
    trainOn(corpusFrame(embeddings, spread = false), k, iters)

  /** [[train]]'s Lloyd loop over a pre-materialized [[corpusFrame]] —
    * every iteration reads the checkpointed (vec_id, u) blocks
    * instead of re-running the source scan (previously iters+1
    * corpus scans per train: init + one per iteration).
    */
  private def trainOn(vecs: DataFrame, k: Int, iters: Int): Seq[Array[Long]] = {
    var centroids: Seq[Array[Long]] = vecs
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(k)
      .select(col("u"))
      .collect().map(_.getSeq[Long](0).toArray).toSeq
    for (_ <- 1 to iters) {
      val means = assignCellsPre(vecs, centroids)
        .select(col("cluster"), posexplode(col("u")).as(Seq("dim", "u")))
        .groupBy(col("cluster"), col("dim"))
        .agg(sum(col("u")).as("s"), count(lit(1)).as("n"))
        .select(col("cluster"), col("dim"),
          when(col("s") < 0, -expr("(2 * (-s) + n) DIV (2 * n)"))
            .otherwise(expr("(2 * s + n) DIV (2 * n)")).cast("long").as("m"))
        // the frame is k·dim rows (MODEL parameters) from here on —
        // pin the final fold to a few partitions instead of paying
        // spark.sql.shuffle.partitions-way task dispatch per
        // iteration (the p=2048 sweep texture; answers unchanged:
        // hash aggs are partitioning-agnostic)
        .repartition(modelAggPartitions, col("cluster"))
        .groupBy(col("cluster"))
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("ms"))
        .select(col("cluster"), col("ms.m").as("centroid"))
        .collect().map(r => r.getLong(0).toInt -> r.getSeq[Long](1).toArray).toMap
      centroids = centroids.indices.map(i => means.getOrElse(i, centroids(i)))
    }
    centroids
  }

  /** Partition count for MODEL-PARAMETER-sized aggregation tails
    * (k·dim / k₁·k₂·dim rows): small and fixed — these frames are
    * bounded by the model, not the corpus, so inheriting the
    * corpus-scale spark.sql.shuffle.partitions only buys scheduler
    * overhead per Lloyd iteration (measured 3.07× at p=2048 in the
    * round-12 partition sweep).
    */
  private val modelAggPartitions = 8

  /** Plan-literal kernel budget: the number of centroid L2 kernels a
    * single plan may encode before the JIT code cache becomes the
    * binding constraint (k = 400 measured as code-cache exhaustion,
    * SURVEY §6; 64 leaves headroom below the first observed cliff).
    * Past it, centroids travel as DATA ([[assignCellsData]] /
    * [[trainData]]) — bit-identical, plan size O(1) in k.
    */
  private[graft] val assignKernelBudget = 64

  /** Budget-aware assignment: the plan-literal kernels
    * ([[assignCells]]) within [[assignKernelBudget]], the broadcast
    * centroid frame ([[assignCellsData]]) past it — so every
    * lifecycle path (delta append, stream ingest, hier coarse level)
    * works on the wide (k > budget) indexes the wide trainer builds,
    * instead of re-entering the JIT cap it exists to avoid.
    * Bit-identical either way (spec-pinned). `wide` forces a side
    * (spec parity harness); `spread` pre-spreads a corpus-sized
    * input over the session's parallelism before the n×k fan
    * ([[spreadForFan]] — skip for broadcast-bound probe batches).
    */
  private[graft] def assignCellsAuto(df: DataFrame, centroids: Seq[Array[Long]],
                                     wide: Option[Boolean] = None,
                                     spread: Boolean = false): DataFrame =
    if (wide.getOrElse(centroids.size > assignKernelBudget))
      assignCellsData(if (spread) spreadForFan(df) else df, centroids)
    else assignCells(df, centroids)

  /** Budget-aware Lloyd trainer — [[train]] within the kernel
    * budget, [[trainData]] (centroids-as-data) past it; same
    * contract, bit-identical (spec-pinned).
    */
  private[graft] def trainAuto(embeddings: DataFrame, k: Int, iters: Int,
                               wide: Option[Boolean] = None): Seq[Array[Long]] =
    if (wide.getOrElse(k > assignKernelBudget)) trainData(embeddings, k, iters)
    else train(embeddings, k, iters)

  /** [[assignTopCells]] with CENTROIDS AS DATA — the top-`nprobe`
    * probe for nlist past [[assignKernelBudget]] (production FAISS
    * sizes nlist ≈ 4√n–16√n: 10⁴–10⁵ cells at 10⁹ vectors, three
    * decades past the ~64-kernel JIT budget). The centroid frame is
    * ONE broadcast row carrying `array<struct<cluster, cu>>`; each
    * input row maps that array through a `transform` lambda (a
    * single [[graft.plans.IntegerUnits.l2Units]] kernel evaluated
    * per element — plan size O(1) in nlist, vs nlist kernel
    * instantiations in the literal form), then the same
    * array_sort + slice as [[assignTopCells]]. No shuffle, no n×k
    * row fan: the per-row pairs array never leaves the map task, so
    * this keeps assignTopCells' "probing a billion queries costs one
    * map pass" property at any nlist. Bit-identical to the literal
    * form (struct(du, cluster) sorts lexicographically either way;
    * spec-pinned).
    */
  private def assignTopCellsData(df: DataFrame, centroids: Seq[Array[Long]],
                                 nprobe: Int): DataFrame = {
    import graft.plans.IntegerUnits.l2Units
    require(nprobe >= 1 && nprobe <= centroids.size,
      s"nprobe must be in [1, ${centroids.size}], got $nprobe")
    df.select(col("vec_id"), col("embedding"), units(col("embedding")).as("u"))
      .select(col("vec_id"), col("embedding"),
        explode(slice(array_sort(transform(centsLit(centroids), c =>
          struct(l2Units(col("u"), c.getField("cu")).as("du"),
            c.getField("cluster").as("cluster")))), 1, nprobe)).as("p"))
      .select(col("vec_id"), col("embedding"),
        col("p.cluster").as("cluster"), col("p.du").as("du"))
  }

  /** Budget-aware top-`nprobe` probe — [[assignTopCells]]' literal
    * kernels within [[assignKernelBudget]], the broadcast centroid
    * array ([[assignTopCellsData]]) past it; `wide` forces a side
    * (spec parity harness). Completes the wide dispatch family
    * ([[assignCellsAuto]]/[[trainAuto]]) for the IVF probe side.
    */
  private[graft] def assignTopCellsAuto(df: DataFrame, centroids: Seq[Array[Long]],
                                        nprobe: Int,
                                        wide: Option[Boolean] = None): DataFrame =
    if (wide.getOrElse(centroids.size > assignKernelBudget))
      assignTopCellsData(df, centroids, nprobe)
    else assignTopCells(df, centroids, nprobe)

  /** FULL IVF search: the coarse quantizer is the TRAINED k-means
    * model (vs [[annIvf]], which uses the pre-given label column as
    * its cell assignment). The trained centroids are plan literals:
    * the corpus is assigned in ONE scan, and the (small) query frame
    * is assigned independently against the same centroids — external
    * query vectors that are not corpus members work, and the corpus
    * assignment scan runs exactly once per action. Shares kmeans'
    * exact integer-units arithmetic, so the trained labels — and the
    * whole search — carry a full DuckDB oracle (the unrolled Lloyd
    * CTE chain feeding the ann_ivf ranking SQL); the spec also
    * asserts determinism and recall@k against the exact scan.
    *
    * `nprobe` probes the query's nearest `nprobe` cells
    * ([[assignTopCells]]): candidates grow to nprobe/nlist of the
    * corpus and recall@k is monotonically non-decreasing in nprobe
    * (candidate sets are nested — SimilaritySpec pins this, and that
    * nprobe = nlist recovers the exact brute-force result). Each
    * (query, neighbor) pair still appears once: a corpus vector lives
    * in exactly one cell. Output `label` is the NEIGHBOR's cell.
    *
    * The whole quantizer is BUDGET-AWARE ([[trainAuto]] /
    * [[assignCellsAuto]] / [[assignTopCellsAuto]]): nlist within
    * [[assignKernelBudget]] runs the plan-literal kernels, nlist past
    * it routes centroids as data — so FAISS-sized nlist (4√n–16√n:
    * tens of thousands at 10⁹ vectors) plans at O(1) size instead of
    * exhausting the JIT code cache. `wide` forces a side (the
    * `ann_ivf_trained_wide` registration + spec parity harness);
    * results are bit-identical either way.
    */
  def annIvfTrained(embeddings: DataFrame, queries: Option[DataFrame] = None,
                    k: Int = 5, nlist: Int = 8, iters: Int = 3,
                    nprobe: Int = 1, wide: Option[Boolean] = None): DataFrame = {
    // train + corpus assignment share one materialized corpus frame
    val (centroids, corpusA) = trainAssignAuto(embeddings, nlist, iters, wide)
    val corpus = corpusA
      .select(col("vec_id"), col("embedding"), col("cluster").as("label"))
    val qsBase = queries.getOrElse(defaultQueries(embeddings))
    val probed = assignTopCellsAuto(qsBase.select(col("vec_id"), col("embedding")),
        centroids, nprobe, wide)
      .select(col("vec_id"), col("embedding"), col("cluster").as("label"))
    // self-exclusion follows OUR caller's query provenance, not the
    // always-Some frame handed to annIvf (see notSelf)
    annIvf(corpus, Some(probed), k,
      queriesAreCorpusDerived = Some(queries.isEmpty))
  }

  /** Per-label centroids in long form (label, dim, mean) — the
    * coarse-quantizer training step for [[annIvf]], and the general
    * "cluster statistics over an embedding column" aggregation.
    * posexplode fans each vector into (dim, component) rows that
    * partial-aggregate map-side, so the shuffle carries only
    * labels × dims rows regardless of corpus size; means are exact
    * decimal sums divided in doubles (order-independent).
    */
  def labelCentroids(embeddings: DataFrame): DataFrame = {
    val comp = round(col("c").cast("double"), 8).cast("decimal(14,8)")
    embeddings
      .select(col("label").cast("long").as("label"), posexplode(col("embedding")).as(Seq("dim", "c")))
      .groupBy(col("label"), col("dim").cast("long").as("dim"))
      .agg(count(lit(1)).as("n"),
        (round(sum(comp).cast("double") / count(lit(1)), 6) + lit(0.0)).as("mean"))
      .orderBy(col("label"), col("dim"))
  }

  /** LSH-bucketed ANN: 8 bands × 3 random hyperplanes. A vector's
    * band signature is the sign pattern of its projections; a
    * candidate is any corpus vector sharing ≥ 1 band bucket with the
    * query, then exact top-k re-ranks candidates only. For neighbor
    * cosine ~0.5 the 3-plane band matches with p ≈ 0.3, so 8 bands
    * give ~95% recall while scanning ~⅛ of the corpus per band
    * bucket — the sublinear-candidate scale path (vs annBruteForce's
    * full scan, annIvf's cell prune).
    *
    * Signatures come from ONE call to the native [[graft.plans.BandSignatures]]
    * kernel per row (replacing 24 HOF dot-product lambdas), and its
    * fixed-point integer arithmetic is engine-exact — so although the
    * RESULT is approximate ANN, the COMPUTATION is deterministic and
    * fully SQL-replayable: the DuckDB oracle inlines the same scaled
    * plane constants and reproduces signatures, candidates, and exact
    * re-rank bit-for-bit.
    */
  def annLsh(embeddings: DataFrame, queries: Option[DataFrame] = None,
             k: Int = 5, queriesAreCorpusDerived: Option[Boolean] = None): DataFrame = {
    import graft.plans.GraftExpressions.bandSigs
    def banded(df: DataFrame, idCol: String): DataFrame =
      df.select(col(idCol), col("embedding"),
        posexplode(bandSigs(col("embedding"), LshPlanes.scaled, LshPlanes.rowsPerBand))
          .as(Seq("band", "sig")))
    val corpus = banded(embeddings.select(col("vec_id"), col("embedding")), "vec_id")
    val qBanded = banded(
      queries.getOrElse(defaultQueries(embeddings))
        .select(col("vec_id").as("query_id"), col("embedding")), "query_id")
      .withColumnRenamed("embedding", "qe")
      .withColumnRenamed("band", "qband").withColumnRenamed("sig", "qsig")
    // Candidate dedup on IDS ONLY: a band can match a (query, vector)
    // pair up to `bands` times, and the distinct is a shuffle — so it
    // must carry two longs per row, not two longs plus two 64-float
    // vectors (512 B/row; the same narrow-shuffle rule as the dedup
    // verify stage). Vectors re-attach AFTER the dedup: the query
    // side from the (small, broadcast) query frame, the corpus side
    // from a scan co-joined on vec_id.
    val cands = corpus.join(broadcast(qBanded),
        col("band") === col("qband") && col("sig") === col("qsig") &&
          notSelf(queriesAreCorpusDerived.getOrElse(queries.isEmpty)))
      .select(col("query_id"), col("vec_id")).distinct()
    val qVecs = queries.getOrElse(defaultQueries(embeddings))
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    // Two-phase re-rank like annBruteForce/annIvf: the candidate
    // window sorts on the CODEGEN double cosine (WindowGroupLimit
    // prepasses re-evaluate the sort key — on the interpreted decimal
    // fold that re-evaluation dominated the whole query), the value
    // cut keeps every possible true top-k member, and the exact
    // decimal cosine prices only the survivors.
    val scanned = cands
      .join(broadcast(qVecs), "query_id")
      .join(embeddings.select(col("vec_id"), col("embedding")), "vec_id")
      .withColumn("fast", cosineFast(col("qe"), col("embedding")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))
    keepFastSurvivors(scanned, k)
      .withColumn("cosine",
        cosineExact(decDot(col("qe"), col("embedding")), decNorm2(col("qe")), decNorm2(col("embedding"))))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Product-quantization ANN (PQ + asymmetric-distance scan) — the
    * memory-bound scale path: the corpus is compressed to `m` byte
    * codes per vector (64 float dims → 8 codes here, a 32× shrink),
    * and search reads CODES, not vectors.
    *
    * Train: the embedding splits into `m` contiguous subspaces; each
    * gets its own k-means codebook via [[train]] on the sliced frame
    * (deterministic seed, model = m×k×(dim/m) doubles — plan
    * literals, like the IVF centroids). Encode: ONE corpus scan
    * projects all m×k subspace distances and folds each subspace's
    * argmin into a code array. Search (ADC): each query precomputes
    * its m×k partial-distance table (tiny frame, broadcast); the
    * approximate distance of a corpus vector is m TABLE LOOKUPS —
    * the fused [[graft.plans.PqAdcSumI64]] codegen kernel, one
    * compiled loop over Σ_j qtable[j][codes[j]] — instead
    * of a dim-wide dot product. Top `rerank` candidates by ADC
    * distance then re-rank with the exact decimal cosine, so the
    * emitted scores are oracle-grade even though candidate selection
    * is approximate.
    *
    * At 100 TB the codes table is the only thing the scan touches
    * (raw vectors are fetched just for the ≤ rerank×queries
    * survivors), which is what makes billion-vector search feasible.
    *
    * Like [[kmeans]], every step up to the re-rank runs in EXACT
    * integer units, so the whole search — normalization, joint
    * codebook training, encoding, ADC candidate order — replays as a
    * DuckDB CTE chain and ann_pq carries a full value oracle:
    * normalization divides by the exact-decimal norm (a per-row
    * scalar chain of correctly-rounded IEEE ops — no fold-order
    * dependence), components quantize to 1e-8 units, and training
    * means are half-up integer division.
    */
  def annPq(embeddings: DataFrame, queries: Option[DataFrame] = None,
            k: Int = 5, m: Int = 8, codebookSize: Int = 8, iters: Int = 3,
            rerank: Int = 50, queriesAreCorpusDerived: Option[Boolean] = None): DataFrame = {
    val index = pqIndexBuild(embeddings, m, codebookSize, iters)
    pqSearch(index, queries.getOrElse(defaultQueries(embeddings)), k, rerank,
      excludeSelf = queriesAreCorpusDerived.getOrElse(queries.isEmpty))
  }

  /** A trained, materialized PQ index: the serving-side model. The
    * codebooks are plan literals (m×cb×dsub longs); `codes` is the
    * encoded corpus, checkpointed so repeated searches (a query
    * STREAM, a reused index) scan 9-byte codes without re-running the
    * encode — on a cluster this is the persisted codes table next to
    * the raw vectors.
    */
  final case class PqIndex private[Similarity] (
      codebooks: IndexedSeq[IndexedSeq[Array[Long]]],
      codes: DataFrame, corpus: DataFrame, m: Int)

  /** Train the codebooks and encode the corpus ONCE — the index-build
    * half of [[annPq]] (identical math; annPq composes this with
    * [[pqSearch]]).
    */
  def pqIndexBuild(embeddings: DataFrame, m: Int = 8, codebookSize: Int = 8,
                   iters: Int = 3): PqIndex = {
    val dsub = pqDsub(m)
    val corpusU = pqCorpusUnits(embeddings)
    val codebooks = pqTrainCodebooks(corpusU, m, codebookSize, iters, dsub)
    PqIndex(codebooks, pqEncode(corpusU, codebooks, dsub).honestCheckpoint(),
      embeddings.select(col("vec_id"), col("embedding")), m)
  }

  /** Search a trained [[PqIndex]] with any (vec_id, embedding) query
    * frame: ADC candidate cut over the codes scan, exact decimal
    * re-rank of the top `rerank`. `excludeSelf` only for
    * corpus-derived query frames (see [[notSelf]]).
    */
  def pqSearch(index: PqIndex, queries: DataFrame, k: Int = 5, rerank: Int = 50,
               excludeSelf: Boolean = false): DataFrame = {
    val qs = pqQueries(queries, index.codebooks, pqDsub(index.m))
    val cands = pqAdcCandidates(
      index.codes.join(broadcast(qs), notSelf(excludeSelf)), index.m, rerank)
    pqExactRerank(cands, index.corpus, k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** md5-seeded ±1 sign diagonal for the OPQ rotation — deterministic
    * on any engine (the oracle generator inlines the same values as
    * literals), no RNG state.
    */
  private[graft] def opqSigns(dim: Int): Seq[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until dim).map { j =>
      val h = md.digest(s"opq:$j".getBytes("UTF-8"))
      md.reset()
      if ((h(0) & 1) == 0) 1L else -1L
    }
  }

  /** Signed-permutation application `y[r] = s_r · x[π(r)]` — the
    * orthogonal rotation family the OPQ refinement optimizes over
    * (64 element_at projections: plan-constant positions, codegen).
    */
  private[graft] def permuteSigns(un: Column, perm: Array[Int], psign: Array[Long]): Column =
    array(perm.indices.map(r =>
      lit(psign(r)) * element_at(un, perm(r) + 1)): _*)

  /** The OPQ rotation-update step restricted to SIGNED PERMUTATIONS —
    * Ge et al. 2013's orthogonal Procrustes update (their eq. 7:
    * R* = argmax tr(R X Ŷᵀ)) searched over the signed-permutation
    * subgroup. Within that subgroup the SIGN is exact given the
    * permutation (s_r = sign(M[r][π(r)])), but choosing π itself —
    * maximizing Σ_r |M[r][π(r)]| — is a linear assignment problem;
    * we pick π with a deterministic GREEDY HEURISTIC (largest |M|
    * first, each row/col used once, (|m| DESC, r, c) tiebreak), not
    * the exact Hungarian argmax. The greedy is what's replayable as
    * a recursive SQL CTE (unlike an SVD or Hungarian), and the
    * oracle replays the same greedy, so parity is exact even where
    * the assignment is approximate.
    *
    * M[r][c] = Σ_v ŷ_v[r] · y_v[c] is NEVER materialized per row:
    * ŷ[r] is a codebook entry determined by the vector's subspace-
    * j(r) code, so M factors through the per-(subspace, code) GROUP
    * SUMS of the corpus — S[j,t,c] = Σ_{v: codes_v[j]=t} y_v[c] —
    * one m-fanned aggregation (n·m·d rows map-side partial-summed to
    * m·cb·d — model-parameter sized), then the m·cb·d × dsub
    * contraction runs driver-side in exact BigInteger. Decimal(38,0)
    * sums: components are ≤ 8e8 units, so Long sums would overflow
    * near 10¹⁰ rows — the 100 TB regime this targets.
    */
  private[graft] def opqProcrustes(corpusR: DataFrame,
                            books: IndexedSeq[IndexedSeq[Array[Long]]],
                            m: Int, dsub: Int): (Array[Int], Array[Long]) = {
    val dim = m * dsub
    val codes = pqEncode(corpusR, books, dsub)
    val sRows = corpusR.join(codes, "vec_id")
      .select(col("codes"), posexplode(col("un")).as(Seq("gdim", "u")))
      .select(explode(array((0 until m).map(j =>
          struct(lit(j).as("j"), element_at(col("codes"), j + 1).as("cl"))): _*)).as("a"),
        col("gdim"), col("u"))
      .groupBy(col("a.j").as("j"), col("a.cl").as("cl"), col("gdim"))
      .agg(sum(col("u").cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("s"))
      .collect()
    val sMap = sRows.map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) ->
      r.getDecimal(3).toBigInteger).toMap
    // M[r][c] = Σ_t cb[j(r)][t][r mod dsub] · S[j(r), t, c]
    val M = Array.tabulate(dim, dim) { (r, c) =>
      val j = r / dsub
      books(j).indices.map { t =>
        java.math.BigInteger.valueOf(books(j)(t)(r % dsub))
          .multiply(sMap.getOrElse((j, t, c), java.math.BigInteger.ZERO))
      }.reduce(_.add(_))
    }
    // greedy assignment on |M|: largest magnitude first, each row and
    // column used once; sign = sign(M) (zero reads +1)
    val perm = Array.fill(dim)(-1)
    val psign = Array.fill(dim)(1L)
    val usedR = Array.fill(dim)(false)
    val usedC = Array.fill(dim)(false)
    for (_ <- 0 until dim) {
      var best: (java.math.BigInteger, Int, Int) = null
      for (r <- 0 until dim if !usedR(r); c <- 0 until dim if !usedC(c)) {
        val a = M(r)(c).abs
        if (best == null || a.compareTo(best._1) > 0) best = (a, r, c)
      }
      val (_, r, c) = best
      usedR(r) = true; usedC(c) = true
      perm(r) = c
      psign(r) = if (M(r)(c).signum >= 0) 1L else -1L
    }
    (perm, psign)
  }

  /** OPQ — PQ behind a LEARNED orthogonal rotation (Ge et al. 2013,
    * "Optimized Product Quantization", public; FAISS's OPQ
    * pretransform): the rotation decorrelates dimensions and
    * balances per-subspace energy, which is exactly what caps flat
    * PQ's recall on anisotropic corpora. Init is the md5-SEEDED
    * randomized Hadamard transform ([[graft.plans.FwhtSignsI64]] —
    * H·D with D = seeded ±1 diag; unnormalized, so all distances
    * scale by exactly d and every argmin/rank is unchanged), then
    * `refineIters` rounds of the standard alternating optimization:
    * fit codebooks on the rotated corpus → re-solve the rotation
    * against the decoded vectors ([[opqProcrustes]] — exact over the
    * signed-permutation subgroup) → refit codebooks. Everything is
    * exact integer units end to end, so the WHOLE loop — rotation,
    * training, refinement, ADC, re-rank — carries a full DuckDB
    * oracle; the exact re-rank runs on the ORIGINAL embeddings
    * (cosine is rotation-invariant), so output schema and semantics
    * match [[annPq]] exactly.
    *
    * Scale shape: one kernel call per row for the rotation (FWHT is
    * d·log d adds), the [[pqTrainCodebooks]] joint trainer per
    * round, and one model-parameter-sized aggregation per refinement
    * ([[opqProcrustes]]); the rotation/permutation composition ships
    * with the closure as O(d) literals.
    */
  def annOpq(embeddings: DataFrame, queries: Option[DataFrame] = None,
             k: Int = 5, m: Int = 8, codebookSize: Int = 8, iters: Int = 3,
             rerank: Int = 50, refineIters: Int = 1,
             queriesAreCorpusDerived: Option[Boolean] = None): DataFrame = {
    val index = opqIndexBuild(embeddings, m, codebookSize, iters, refineIters)
    opqSearch(index, queries.getOrElse(defaultQueries(embeddings)), k, rerank,
      excludeSelf = queriesAreCorpusDerived.getOrElse(queries.isEmpty))
  }

  /** A trained, materialized OPQ index: the learned rotation (the
    * seeded Hadamard pre-signs + one signed permutation per
    * refinement round — O(d) model parameters), the rotated-space
    * codebooks, and the encoded corpus. The transform applied to a
    * query is the SAME composition the build applied to the corpus.
    */
  final case class OpqIndex private[Similarity] (
      signs: Seq[Long],
      perms: Seq[(Array[Int], Array[Long])],
      codebooks: IndexedSeq[IndexedSeq[Array[Long]]],
      codes: DataFrame, corpus: DataFrame, m: Int) {
    /** normalized units → the index's rotated working space. */
    private[Similarity] def rot(c: Column): Column =
      perms.foldLeft(graft.plans.FwhtSignsI64.fwhtSigns(c, signs)) {
        case (acc, (perm, psign)) => permuteSigns(acc, perm, psign)
      }
  }

  /** Train the OPQ model and encode the corpus ONCE — the index-build
    * half of [[annOpq]] (identical math; annOpq composes this with
    * [[opqSearch]]).
    */
  def opqIndexBuild(embeddings: DataFrame, m: Int = 8, codebookSize: Int = 8,
                    iters: Int = 3, refineIters: Int = 1): OpqIndex = {
    val dim = LshPlanes.dim
    val dsub = pqDsub(m)
    val signs = opqSigns(dim)
    var corpusR = embeddings
      .select(col("vec_id"),
        graft.plans.FwhtSignsI64.fwhtSigns(
          graft.plans.IntegerUnits.normalizeUnits(col("embedding")), signs).as("un"))
      .honestCheckpoint()
    var books = pqTrainCodebooks(corpusR, m, codebookSize, iters, dsub)
    var perms = Seq.empty[(Array[Int], Array[Long])]
    for (_ <- 1 to refineIters) {
      val (perm, psign) = opqProcrustes(corpusR, books, m, dsub)
      perms = perms :+ (perm, psign)
      corpusR = corpusR
        .select(col("vec_id"), permuteSigns(col("un"), perm, psign).as("un"))
        .honestCheckpoint()
      books = pqTrainCodebooks(corpusR, m, codebookSize, iters, dsub)
    }
    OpqIndex(signs, perms, books,
      pqEncode(corpusR, books, dsub).honestCheckpoint(),
      embeddings.select(col("vec_id"), col("embedding")), m)
  }

  /** Search a trained [[OpqIndex]]: rotate the queries into the
    * index's working space, then the shared ADC cut + exact decimal
    * re-rank — [[pqSearch]]'s contract.
    */
  def opqSearch(index: OpqIndex, queries: DataFrame, k: Int = 5, rerank: Int = 50,
                excludeSelf: Boolean = false): DataFrame = {
    val qs = pqQueries(queries, index.codebooks, pqDsub(index.m), index.rot)
    val cands = pqAdcCandidates(
      index.codes.join(broadcast(qs), notSelf(excludeSelf)), index.m, rerank)
    pqExactRerank(cands, index.corpus, k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** OPQ index layout version ([[opqIndexSave]]). */
  private[graft] val opqIndexVersion = 1

  /** Persist a trained [[OpqIndex]]: codes + codebooks like
    * [[pqIndexSave]], plus the rotation model as one small table —
    * step 0 rows carry the Hadamard pre-signs (idx = j, a = s_j),
    * step t ≥ 1 rows a refinement's signed permutation (idx = r,
    * a = π(r), b = sign_r). Meta (with refine_iters) LAST — its
    * _SUCCESS is the commit marker, like every frozen index here.
    */
  def opqIndexSave(index: OpqIndex, dir: String, params: String = "",
                   corpusCount: Long = -1L): Unit = {
    val spark = index.codes.sparkSession
    import spark.implicits._
    index.codes.write.mode("overwrite").parquet(s"$dir/codes.parquet")
    val cbRows = for {
      (subCbs, sub) <- index.codebooks.zipWithIndex
      (units, code) <- subCbs.zipWithIndex
    } yield (sub, code, units.toSeq)
    cbRows.toDF("subspace", "code", "units")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/codebooks.parquet")
    val rotRows =
      index.signs.zipWithIndex.map { case (s, j) => (0L, j.toLong, s, 0L) } ++
        index.perms.zipWithIndex.flatMap { case ((perm, psign), t) =>
          perm.indices.map(r => ((t + 1).toLong, r.toLong, perm(r).toLong, psign(r)))
        }
    rotRows.toDF("step", "idx", "a", "b")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/rotation.parquet")
    Seq((index.m, index.perms.size, opqIndexVersion, params, corpusCount))
      .toDF("m", "refine_iters", "version", "params", "n")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/meta.parquet")
  }

  /** Load a persisted OPQ index and re-bind it to its corpus. The
    * rotation model is O(d·(1+refine_iters)) rows — model parameters,
    * same collect class as the codebooks. Loaded results are
    * bit-exact equal to the fresh build (integer model through
    * parquet) — spec-gated.
    */
  def opqIndexLoad(spark: org.apache.spark.sql.SparkSession, dir: String,
                   corpus: DataFrame,
                   preReadMeta: Option[org.apache.spark.sql.Row] = None): OpqIndex = {
    val meta = preReadMeta.getOrElse(
      spark.read.parquet(s"$dir/meta.parquet").collect()(0))
    require(meta.getAs[Int]("version") == opqIndexVersion,
      s"index at $dir has layout version ${meta.getAs[Int]("version")}, expected $opqIndexVersion")
    val m = meta.getAs[Int]("m")
    val refineIters = meta.getAs[Int]("refine_iters")
    val rot = spark.read.parquet(s"$dir/rotation.parquet").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val signs = rot.filter(_._1 == 0L).sortBy(_._2).map(_._3).toSeq
    val perms = (1 to refineIters).map { t =>
      val rows = rot.filter(_._1 == t.toLong).sortBy(_._2)
      (rows.map(_._3.toInt).toArray, rows.map(_._4).toArray)
    }
    val cbs = spark.read.parquet(s"$dir/codebooks.parquet").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Long](2).toArray))
    val codebooks = cbs.groupBy(_._1).toIndexedSeq.sortBy(_._1)
      .map { case (_, rows) => rows.sortBy(_._2).map(_._3).toIndexedSeq }
    OpqIndex(signs, perms, codebooks, spark.read.parquet(s"$dir/codes.parquet"),
      corpus.select(col("vec_id"), col("embedding")), m)
  }

  /** Serve-from-frozen-index OPQ — the [[annPqServed]] lifecycle for
    * the rotated layout: build-if-absent decided on disk, then the
    * steady-state serving cost (codes scan + rotated-query ADC +
    * exact re-rank, no training). Bit-identical to [[annOpq]] at
    * equal params (the integer rotation model and codebooks survive
    * parquet), so it shares ann_opq's FULL oracle.
    */
  def annOpqServed(embeddings: DataFrame, indexDir: String, k: Int = 5,
                   m: Int = 8, codebookSize: Int = 8, iters: Int = 3,
                   rerank: Int = 50, refineIters: Int = 1): DataFrame = {
    val spark = embeddings.sparkSession
    val params = s"opq;m=$m;cb=$codebookSize;it=$iters;ref=$refineIters;src=${sourceStamp(embeddings)}"
    val n = embeddings.count()
    val meta = buildIfAbsent(spark, indexDir, params, n, opqIndexVersion) { staging =>
      opqIndexSave(opqIndexBuild(embeddings, m, codebookSize, iters, refineIters),
        staging, params, n)
    }
    val index = opqIndexLoad(spark, indexDir, embeddings, Some(meta))
    opqSearch(index, defaultQueries(embeddings), k, rerank, excludeSelf = true)
  }

  /** Persist a trained [[PqIndex]] — the frozen-index lifecycle's
    * write half. `codes` lands as a parquet table (the thing a
    * 100 TB deployment actually serves from: 9 bytes/vector next to
    * the raw corpus), the m×cb×dsub codebook units as a single-file
    * parquet of (subspace, code, units) rows, and `m` in a one-row
    * meta table. The raw corpus is NOT copied — it is the source
    * table, re-bound at load.
    */
  def pqIndexSave(index: PqIndex, dir: String, params: String = "",
                  corpusCount: Long = -1L): Unit = {
    val spark = index.codes.sparkSession
    import spark.implicits._
    index.codes.write.mode("overwrite").parquet(s"$dir/codes.parquet")
    val cbRows = for {
      (subCbs, sub) <- index.codebooks.zipWithIndex
      (units, code) <- subCbs.zipWithIndex
    } yield (sub, code, units.toSeq)
    cbRows.toDF("subspace", "code", "units")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/codebooks.parquet")
    // meta LAST: its _SUCCESS is the whole-index commit marker.
    // params/n are the build fingerprint frozenIndexComplete checks.
    Seq((index.m, pqIndexVersion, params, corpusCount))
      .toDF("m", "version", "params", "n")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/meta.parquet")
  }

  /** Load a persisted PQ index and re-bind it to its corpus table.
    * Codebooks are bounded model parameters (m×cb×dsub longs), so
    * the collect here is the same class as the training collects.
    * Results from a loaded index are BIT-EXACT equal to the freshly
    * built one (integer units end-to-end) — spec-gated.
    */
  def pqIndexLoad(spark: org.apache.spark.sql.SparkSession, dir: String,
                  corpus: DataFrame,
                  preReadMeta: Option[org.apache.spark.sql.Row] = None): PqIndex = {
    val meta = preReadMeta.getOrElse(
      spark.read.parquet(s"$dir/meta.parquet").collect()(0))
    require(meta.getAs[Int]("version") == pqIndexVersion,
      s"index at $dir has layout version ${meta.getAs[Int]("version")}, expected $pqIndexVersion")
    val m = meta.getAs[Int]("m")
    val cbs = spark.read.parquet(s"$dir/codebooks.parquet").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Long](2).toArray))
    val codebooks = cbs.groupBy(_._1).toIndexedSeq.sortBy(_._1)
      .map { case (_, rows) => rows.sortBy(_._2).map(_._3).toIndexedSeq }
    PqIndex(codebooks, spark.read.parquet(s"$dir/codes.parquet"),
      corpus.select(col("vec_id"), col("embedding")), m)
  }

  /** Serve-from-frozen-index batch ANN — the lifecycle composition
    * (train → save → load → serve) as one oracled query. Build-if-
    * absent is decided ON DISK ([[frozenIndexComplete]]): a fresh JVM
    * pointed at a dir holding a complete index LOADS it instead of
    * silently rebuilding over it — the lifecycle contract a
    * production consumer assumes — while a missing/partial/stale-
    * format dir triggers one build+save. Repeated calls (bench,
    * query streams) therefore read the steady-state serving cost:
    * parquet codes scan + ADC + exact re-rank, no training. Results
    * are bit-identical to [[annPq]] with the same parameters
    * (integer units survive the parquet round trip), so it shares
    * ann_pq's oracle.
    */
  def annPqServed(embeddings: DataFrame, indexDir: String, k: Int = 5,
                  m: Int = 8, codebookSize: Int = 8, iters: Int = 3,
                  rerank: Int = 50): DataFrame = {
    val spark = embeddings.sparkSession
    // build-parameter fingerprint (k/rerank are search-time knobs —
    // not part of the frozen model) + corpus row count (answered
    // from parquet footers — no data scan)
    val params = s"pq;m=$m;cb=$codebookSize;it=$iters;src=${sourceStamp(embeddings)}"
    val n = embeddings.count()
    val meta = buildIfAbsent(spark, indexDir, params, n, pqIndexVersion) { staging =>
      pqIndexSave(pqIndexBuild(embeddings, m, codebookSize, iters), staging, params, n)
    }
    val index = pqIndexLoad(spark, indexDir, embeddings, Some(meta))
    pqSearch(index, defaultQueries(embeddings), k, rerank, excludeSelf = true)
  }

  /** A trained SQ8 scalar-quantizer index — FAISS's OTHER production
    * compression layout (`ScalarQuantizer`, QT_8bit): one 8-bit code
    * per DIMENSION against per-dimension trained [min, max] bounds
    * (dim bytes/vector vs PQ's m bytes), no k-means — training is a
    * single min/max scan. Production systems reach for SQ when PQ
    * recall is not enough and memory allows a byte per dimension;
    * here it completes the quantizer family (flat PQ / IVF-PQ /
    * residual IVF-PQ / SQ8). The bounds are 2×dim longs — model
    * parameters in plan literals, same class as the PQ codebooks.
    */
  final case class SqIndex private[Similarity] (
      mins: Array[Long], spans: Array[Long],
      codes: DataFrame, corpus: DataFrame)

  /** Train the per-dimension bounds and encode the corpus ONCE. All
    * arithmetic is exact integer units (encode/decode semantics in
    * [[graft.plans.SqEncodeI64]]'s scaladoc), so the build replays in
    * DuckDB as a min/max GROUP BY plus one integer-division
    * projection — full oracle, no engine-divergent float math.
    */
  def sqIndexBuild(embeddings: DataFrame): SqIndex = {
    val corpusU = pqCorpusUnits(embeddings)
    val bounds = corpusU
      .select(posexplode(col("un")).as(Seq("dim", "u")))
      .groupBy("dim").agg(min("u").as("vmin"), max("u").as("vmax"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val codes = corpusU
      .select(col("vec_id"),
        graft.plans.ScalarQuant.sqEncode(col("un"),
          bounds.map(_._2), bounds.map(t => t._3 - t._2)).as("codes"))
      .honestCheckpoint()
    SqIndex(bounds.map(_._2), bounds.map(t => t._3 - t._2), codes,
      embeddings.select(col("vec_id"), col("embedding")))
  }

  /** Two-phase SQ search: the fused asymmetric integer distance
    * ([[graft.plans.SqAdcL2I64]] — decode inlined, nothing
    * materialized) ranks the codes scan, the top `rerank` survivors
    * get the exact decimal cosine re-rank. Same bounded-query-set
    * broadcast shape as [[pqSearch]]: at 100 TB the scan reads dim
    * bytes/vector of codes, never the raw corpus.
    */
  def sqSearch(index: SqIndex, queries: DataFrame, k: Int = 5, rerank: Int = 50,
               excludeSelf: Boolean = false): DataFrame = {
    val qs = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"),
      graft.plans.IntegerUnits.normalizeUnits(col("embedding")).as("qun"))
    val wS = Window.partitionBy(col("query_id")).orderBy(col("sdist"), col("vec_id"))
    val cands = index.codes.join(broadcast(qs), notSelf(excludeSelf))
      .withColumn("sdist",
        graft.plans.ScalarQuant.sqAdcL2(col("qun"), col("codes"), index.mins, index.spans))
      .withColumn("ra", row_number().over(wS))
      .filter(col("ra") <= rerank)
      .select(col("query_id"), col("qe"), col("vec_id"))
    pqExactRerank(cands, index.corpus, k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** SQ8 ANN as one query: train bounds + encode + two-phase search.
    * Deterministic integer units end-to-end → full DuckDB oracle.
    */
  def annSq(embeddings: DataFrame, queries: Option[DataFrame] = None,
            k: Int = 5, rerank: Int = 50,
            queriesAreCorpusDerived: Option[Boolean] = None): DataFrame = {
    val index = sqIndexBuild(embeddings)
    sqSearch(index, queries.getOrElse(defaultQueries(embeddings)), k, rerank,
      excludeSelf = queriesAreCorpusDerived.getOrElse(queries.isEmpty))
  }

  /** Persist / load / serve-from a frozen SQ8 index — the same
    * lifecycle contract as the PQ family: codes as the served parquet
    * table, the 2×dim bounds as a one-file parquet, meta written LAST
    * as the commit marker with the [[frozenIndexMeta]] fingerprint.
    */
  def sqIndexSave(index: SqIndex, dir: String, params: String = "",
                  corpusCount: Long = -1L): Unit = {
    val spark = index.codes.sparkSession
    import spark.implicits._
    index.codes.write.mode("overwrite").parquet(s"$dir/codes.parquet")
    index.mins.indices.map(d => (d, index.mins(d), index.spans(d)))
      .toDF("dim", "vmin", "span")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/bounds.parquet")
    Seq((sqIndexVersion, params, corpusCount))
      .toDF("version", "params", "n")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/meta.parquet")
  }

  def sqIndexLoad(spark: org.apache.spark.sql.SparkSession, dir: String,
                  corpus: DataFrame,
                  preReadMeta: Option[org.apache.spark.sql.Row] = None): SqIndex = {
    val meta = preReadMeta.getOrElse(
      spark.read.parquet(s"$dir/meta.parquet").collect()(0))
    require(meta.getAs[Int]("version") == sqIndexVersion,
      s"index at $dir has layout version ${meta.getAs[Int]("version")}, expected $sqIndexVersion")
    val b = spark.read.parquet(s"$dir/bounds.parquet").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    SqIndex(b.map(_._2), b.map(_._3), spark.read.parquet(s"$dir/codes.parquet"),
      corpus.select(col("vec_id"), col("embedding")))
  }

  /** Serve-from-frozen-index SQ8 — train → save → load → serve with
    * the shared build-if-absent lifecycle; bit-identical to [[annSq]]
    * (integer units survive the parquet round trip), so it shares
    * ann_sq's oracle.
    */
  def annSqServed(embeddings: DataFrame, indexDir: String, k: Int = 5,
                  rerank: Int = 50): DataFrame = {
    val spark = embeddings.sparkSession
    val params = s"sq8;src=${sourceStamp(embeddings)}"
    val n = embeddings.count()
    val meta = buildIfAbsent(spark, indexDir, params, n, sqIndexVersion) { staging =>
      sqIndexSave(sqIndexBuild(embeddings), staging, params, n)
    }
    sqSearch(sqIndexLoad(spark, indexDir, embeddings, Some(meta)),
      defaultQueries(embeddings), k, rerank, excludeSelf = true)
  }

  /** IVF-SQ — FAISS's `IndexIVFScalarQuantizer` (by_residual=false),
    * the remaining cell of the quantizer matrix (IVF × {flat, PQ,
    * residual-PQ, SQ}): the coarse Lloyd cell prune of [[annIvfPq]]
    * composed with the SQ8 per-dimension codes of [[annSq]]. The
    * corpus is assigned and SQ-encoded once; a query probes its
    * `nprobe` nearest cells and the fused asymmetric integer
    * distance ([[graft.plans.SqAdcL2I64]]) ranks ONLY those cells'
    * codes (candidates ≈ nprobe/nlist of the corpus — the cell prune
    * that removes flat SQ's linear ADC term), then the top `rerank`
    * survivors get the exact decimal re-rank. Where IVF-PQ spends m
    * bytes/vector for maximum compression, IVF-SQ spends dim
    * bytes/vector for SQ8's measured recall@5 = 1.000 — the layout
    * for corpora that need both the cell prune AND near-exact
    * candidate order. All-integer-units end-to-end → FULL DuckDB
    * oracle (Lloyd chain + q_probe + the SQ chain restricted to the
    * probed cells).
    */
  def annIvfSq(embeddings: DataFrame, queries: Option[DataFrame] = None,
               k: Int = 5, nlist: Int = 8, ivfIters: Int = 3,
               rerank: Int = 50, nprobe: Int = 1,
               queriesAreCorpusDerived: Option[Boolean] = None): DataFrame = {
    val index = ivfSqIndexBuild(embeddings, nlist, ivfIters)
    ivfSqSearch(index, queries.getOrElse(defaultQueries(embeddings)), k, rerank, nprobe,
      excludeSelf = queriesAreCorpusDerived.getOrElse(queries.isEmpty))
  }

  /** A trained, materialized IVF-SQ index: per-dimension SQ8 bounds
    * + coarse-quantizer centroids (both bounded driver-side model
    * parameters) and the cell-labeled codes table.
    */
  final case class IvfSqIndex private[Similarity] (
      mins: Array[Long], spans: Array[Long],
      centroids: Seq[Array[Long]],
      codes: DataFrame, corpus: DataFrame)

  /** Train the coarse quantizer + SQ8 bounds and encode/label the
    * corpus ONCE — the index-build half of [[annIvfSq]].
    */
  def ivfSqIndexBuild(embeddings: DataFrame, nlist: Int = 8,
                      ivfIters: Int = 3): IvfSqIndex = {
    val (centroids, corpusA) = trainAssignAuto(embeddings, nlist, ivfIters)
    val sq = sqIndexBuild(embeddings)
    val codes = sq.codes.join(
      corpusA.select(col("vec_id"), col("cluster").as("label")), "vec_id")
    IvfSqIndex(sq.mins, sq.spans, centroids, codes,
      embeddings.select(col("vec_id"), col("embedding")))
  }

  /** Search a trained [[IvfSqIndex]] — the serve half of
    * [[annIvfSq]], same math.
    */
  def ivfSqSearch(index: IvfSqIndex, queries: DataFrame, k: Int = 5,
                  rerank: Int = 50, nprobe: Int = 1,
                  excludeSelf: Boolean = false): DataFrame = {
    val qs = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        graft.plans.IntegerUnits.normalizeUnits(col("embedding")).as("qun"))
      .join(assignTopCellsAuto(queries.select(col("vec_id"), col("embedding")),
          index.centroids, nprobe)
        .select(col("vec_id").as("query_id"), col("cluster").as("qlabel")), "query_id")
    // rerank window cuts across all probed cells at once (a corpus
    // vector lives in exactly one cell, so no pair duplicates)
    val wS = Window.partitionBy(col("query_id")).orderBy(col("sdist"), col("vec_id"))
    val cands = index.codes.join(broadcast(qs),
        col("label") === col("qlabel") && notSelf(excludeSelf))
      .withColumn("sdist",
        graft.plans.ScalarQuant.sqAdcL2(col("qun"), col("codes"), index.mins, index.spans))
      .withColumn("ra", row_number().over(wS))
      .filter(col("ra") <= rerank)
      .select(col("query_id"), col("qe"), col("label"), col("vec_id"))
    pqExactRerank(cands, index.corpus, k, carry = Seq("label"))
      .select(col("query_id"), col("label"), col("vec_id").as("neighbor_id"),
        col("rank"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Persist / load / serve-from a frozen IVF-SQ index — the shared
    * lifecycle contract: cell-labeled codes + 2×dim bounds +
    * centroids as parquet, meta written LAST as the commit marker
    * with the [[frozenIndexMeta]] fingerprint.
    */
  def ivfSqIndexSave(index: IvfSqIndex, dir: String, params: String = "",
                     corpusCount: Long = -1L): Unit = {
    val spark = index.codes.sparkSession
    import spark.implicits._
    index.codes.write.mode("overwrite").parquet(s"$dir/codes.parquet")
    index.mins.indices.map(d => (d, index.mins(d), index.spans(d)))
      .toDF("dim", "vmin", "span")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/bounds.parquet")
    index.centroids.zipWithIndex.map { case (units, cell) => (cell, units.toSeq) }
      .toDF("cell", "units")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/centroids.parquet")
    Seq((ivfSqIndexVersion, params, corpusCount))
      .toDF("version", "params", "n")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/meta.parquet")
  }

  def ivfSqIndexLoad(spark: org.apache.spark.sql.SparkSession, dir: String,
                     corpus: DataFrame,
                     preReadMeta: Option[org.apache.spark.sql.Row] = None): IvfSqIndex = {
    val meta = preReadMeta.getOrElse(
      spark.read.parquet(s"$dir/meta.parquet").collect()(0))
    require(meta.getAs[Int]("version") == ivfSqIndexVersion,
      s"index at $dir has layout version ${meta.getAs[Int]("version")}, expected $ivfSqIndexVersion")
    val b = spark.read.parquet(s"$dir/bounds.parquet").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val cents = spark.read.parquet(s"$dir/centroids.parquet").collect()
      .map(r => (r.getInt(0), r.getSeq[Long](1).toArray)).sortBy(_._1).map(_._2).toSeq
    IvfSqIndex(b.map(_._2), b.map(_._3), cents,
      spark.read.parquet(s"$dir/codes.parquet"),
      corpus.select(col("vec_id"), col("embedding")))
  }

  /** Serve-from-frozen-index IVF-SQ — train → save → load → serve
    * with the shared build-if-absent lifecycle; bit-identical to
    * [[annIvfSq]] (integer units survive the parquet round trip), so
    * it shares ann_ivfsq's oracle.
    */
  def annIvfSqServed(embeddings: DataFrame, indexDir: String, k: Int = 5,
                     rerank: Int = 50, nprobe: Int = 1): DataFrame = {
    val spark = embeddings.sparkSession
    val params = s"ivfsq;nlist=8;ivfIt=3;src=${sourceStamp(embeddings)}"
    val n = embeddings.count()
    val meta = buildIfAbsent(spark, indexDir, params, n, ivfSqIndexVersion) { staging =>
      ivfSqIndexSave(ivfSqIndexBuild(embeddings), staging, params, n)
    }
    ivfSqSearch(ivfSqIndexLoad(spark, indexDir, embeddings, Some(meta)),
      defaultQueries(embeddings), k, rerank, nprobe, excludeSelf = true)
  }

  /** A binary-quantization index — the FAISS `IndexBinaryFlat`
    * analog, the quantizer family's 1-bit-per-dimension extreme
    * (PQ m bytes / SQ dim bytes / BQ dim BITS per vector): each
    * component contributes its SIGN bit, 32 bits packed per Long
    * word ([[graft.plans.SignPack32I64]] — why 32 and not 64 is an
    * oracle-portability argument in that kernel's scaladoc), and
    * candidates rank by Hamming distance (popcount of XOR — the
    * cheapest distance a scan can compute; at 64 dims a signature is
    * ONE 16-byte array row vs 256 bytes of floats, a 16× scan-byte
    * reduction before the exact re-rank). Production fit: binary
    * embeddings (sign of a random projection or of a learned
    * rotation) as the first-pass filter over billions of vectors.
    */
  final case class BqIndex private[Similarity] (
      sigs: DataFrame, corpus: DataFrame)

  /** Pack the corpus sign signatures ONCE — a single map pass, no
    * training (BQ has no trained parameters; the "model" is the
    * packing convention itself, frozen by the kernel + oracle).
    */
  def bqIndexBuild(embeddings: DataFrame): BqIndex = {
    import graft.plans.BinarySig.signPack
    BqIndex(
      embeddings.select(col("vec_id"), signPack(col("embedding")).as("sig"))
        .honestCheckpoint(),
      embeddings.select(col("vec_id"), col("embedding")))
  }

  /** Search a [[BqIndex]]: Hamming candidate cut over the signature
    * scan (rank by (hamming, vec_id) — total order, deterministic
    * candidate set, the pqAdcCandidates shape so Spark's
    * WindowGroupLimit keeps the top-rerank selection map-side
    * partial), then the family's exact decimal re-rank on the
    * original vectors.
    */
  def bqSearch(index: BqIndex, queries: DataFrame, k: Int = 5, rerank: Int = 20,
               excludeSelf: Boolean = false): DataFrame = {
    import graft.plans.BinarySig.{hammingPacked, signPack}
    val qs = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qe"), signPack(col("embedding")).as("qsig"))
    val wH = Window.partitionBy(col("query_id")).orderBy(col("hamming"), col("vec_id"))
    val cands = index.sigs.join(broadcast(qs), notSelf(excludeSelf))
      .withColumn("hamming", hammingPacked(col("sig"), col("qsig")))
      .withColumn("rh", row_number().over(wH))
      .filter(col("rh") <= rerank)
      .select(col("query_id"), col("qe"), col("vec_id"))
    pqExactRerank(cands, index.corpus, k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** One-shot build + search — the `ann_bq` query. */
  def annBq(embeddings: DataFrame, queries: Option[DataFrame] = None,
            k: Int = 5, rerank: Int = 20,
            queriesAreCorpusDerived: Option[Boolean] = None): DataFrame =
    bqSearch(bqIndexBuild(embeddings), queries.getOrElse(defaultQueries(embeddings)),
      k, rerank, excludeSelf = queriesAreCorpusDerived.getOrElse(queries.isEmpty))

  /** Persist a [[BqIndex]]: the signature table (the thing a serve
    * scans — dim/8 bytes per vector) + the meta commit marker. No
    * model tables: BQ's encode is parameter-free.
    */
  def bqIndexSave(index: BqIndex, dir: String, params: String = "",
                  corpusCount: Long = -1L): Unit = {
    val spark = index.sigs.sparkSession
    import spark.implicits._
    index.sigs.write.mode("overwrite").parquet(s"$dir/sigs.parquet")
    Seq((bqIndexVersion, params, corpusCount))
      .toDF("version", "params", "n")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/meta.parquet")
  }

  def bqIndexLoad(spark: org.apache.spark.sql.SparkSession, dir: String,
                  corpus: DataFrame,
                  preReadMeta: Option[org.apache.spark.sql.Row] = None): BqIndex = {
    val meta = preReadMeta.getOrElse(
      spark.read.parquet(s"$dir/meta.parquet").collect()(0))
    require(meta.getAs[Int]("version") == bqIndexVersion,
      s"index at $dir has layout version ${meta.getAs[Int]("version")}, expected $bqIndexVersion")
    BqIndex(spark.read.parquet(s"$dir/sigs.parquet"),
      corpus.select(col("vec_id"), col("embedding")))
  }

  /** Serve-from-frozen-index BQ — the shared build-if-absent
    * lifecycle; bit-identical to [[annBq]] (sign bits trivially
    * survive the parquet round trip), so it shares ann_bq's oracle.
    */
  def annBqServed(embeddings: DataFrame, indexDir: String, k: Int = 5,
                  rerank: Int = 20): DataFrame = {
    val spark = embeddings.sparkSession
    val params = s"bq;w=32;src=${sourceStamp(embeddings)}"
    val n = embeddings.count()
    val meta = buildIfAbsent(spark, indexDir, params, n, bqIndexVersion) { staging =>
      bqIndexSave(bqIndexBuild(embeddings), staging, params, n)
    }
    bqSearch(bqIndexLoad(spark, indexDir, embeddings, Some(meta)),
      defaultQueries(embeddings), k, rerank, excludeSelf = true)
  }

  /** A residual binary-quantization index — the recall fix for flat
    * BQ's 1-bit-per-dim floor (recall@5 0.64 vs SQ8's 1.00): TWO
    * rounds of scaled sign quantization plus ASYMMETRIC scoring.
    * Round 1 approximates the units vector as α·σ1 (σ1 = sign bits,
    * α = the integer half-up mean |u|); round 2 sign-quantizes the
    * integer residual r = u − α·σ1 as β·σ2. A candidate's score
    * against a FULL-PRECISION query is the exact integer dot with
    * the reconstruction α·σ1 + β·σ2 = α·Σσ1ᵢqᵢ + β·Σσ2ᵢqᵢ — two
    * [[graft.plans.SignDotPackedI64]] kernel calls per scanned row
    * (the query is never quantized: the asymmetric-distance
    * refinement of Gordo et al., the same move ADC makes for PQ).
    * Storage: 2 bits/dim + two Longs — 32 bytes/vector at 64 dims vs
    * BQ's 16 and SQ8's 64. Everything is exact integer units, so the
    * whole search carries a FULL DuckDB oracle, and the recall spec
    * pins residual-BQ > flat BQ at equal rerank on the gate corpus.
    *
    * Overflow proof (engine-wide bound |e| < 0.6 → |u| < 6e7,
    * dim = 64): |Σσq| ≤ 64·6e7 = 3.9e9; α < 6e7 so α·Σσ1q < 2.4e17;
    * |r| ≤ |u| + α < 1.2e8 so β·Σσ2q < 4.7e17; the two-term sum is
    * < 1e18, inside Long by a 9× margin.
    */
  final case class BqResidualIndex private[Similarity] (
      sigs: DataFrame, corpus: DataFrame)

  /** Encode the corpus ONCE — one scan: quantize to units, derive
    * (α, σ1, r, β, σ2) per row. The per-row means/residuals are
    * interpreted HOF lambdas, which is fine HERE (one encode pass at
    * build time, dim-bounded work per row) — the SERVE path touches
    * only the packed words + two scales through codegen kernels.
    */
  def bqResidualIndexBuild(embeddings: DataFrame): BqResidualIndex = {
    import graft.plans.BinarySig.signPackUnits
    val enc = embeddings
      .select(col("vec_id"), units(col("embedding")).as("u"))
      .withColumn("alpha", halfUpMeanAbs("u"))
      .withColumn("r", transform(col("u"),
        x => x - when(x >= 0, col("alpha")).otherwise(-col("alpha"))))
      .withColumn("beta", halfUpMeanAbs("r"))
      .select(col("vec_id"), signPackUnits(col("u")).as("s1"),
        signPackUnits(col("r")).as("s2"), col("alpha"), col("beta"))
      .honestCheckpoint()
    BqResidualIndex(enc, embeddings.select(col("vec_id"), col("embedding")))
  }

  /** Integer half-up mean of |xᵢ| over an array<long> — the scale
    * step of both residual-BQ rounds (nonnegative numerator, so the
    * sign-split DIV form degenerates to one branch; matches the
    * oracle's `(2*s + d) // (2*d)` exactly).
    */
  private def halfUpMeanAbs(name: String): Column =
    expr(s"(2 * aggregate($name, CAST(0 AS BIGINT), (acc, x) -> acc + abs(x))" +
      s" + size($name)) DIV (2 * CAST(size($name) AS BIGINT))")

  /** Search a [[BqResidualIndex]]: asymmetric two-term integer score
    * over the signature scan, (score DESC, vec_id) candidate cut,
    * then the family's exact decimal re-rank.
    */
  def bqResidualSearch(index: BqResidualIndex, queries: DataFrame, k: Int = 5,
                       rerank: Int = 20, excludeSelf: Boolean = false): DataFrame = {
    import graft.plans.BinarySig.signDotPacked
    val qs = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qe"), units(col("embedding")).as("qu"))
    val wS = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("vec_id"))
    val cands = index.sigs.join(broadcast(qs), notSelf(excludeSelf))
      .withColumn("score",
        col("alpha") * signDotPacked(col("qu"), col("s1")) +
          col("beta") * signDotPacked(col("qu"), col("s2")))
      .withColumn("rs", row_number().over(wS))
      .filter(col("rs") <= rerank)
      .select(col("query_id"), col("qe"), col("vec_id"))
    pqExactRerank(cands, index.corpus, k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** One-shot build + search — the `ann_bq_residual` query. */
  def annBqResidual(embeddings: DataFrame, queries: Option[DataFrame] = None,
                    k: Int = 5, rerank: Int = 20,
                    queriesAreCorpusDerived: Option[Boolean] = None): DataFrame =
    bqResidualSearch(bqResidualIndexBuild(embeddings),
      queries.getOrElse(defaultQueries(embeddings)), k, rerank,
      excludeSelf = queriesAreCorpusDerived.getOrElse(queries.isEmpty))

  /** A trained IVF-BQ index — the quantizer matrix's binary cell
    * (FAISS `IndexBinaryIVF` in spirit: coarse cells prune the scan,
    * binary signatures rank within the probed cells): trained float-
    * space Lloyd centroids for the cell assignment (the same coarse
    * quantizer every IVF layout here shares) + the cell-labeled
    * signature table. Candidates per query ≈ nprobe/nlist of the
    * corpus at dim/8 BYTES per scanned row — the cheapest candidate
    * scan any layout in the family can run.
    */
  final case class IvfBqIndex private[Similarity] (
      centroids: Seq[Array[Long]],
      sigs: DataFrame, corpus: DataFrame)

  /** Train the coarse quantizer and pack/label the corpus ONCE. */
  def ivfBqIndexBuild(embeddings: DataFrame, nlist: Int = 8,
                      ivfIters: Int = 3): IvfBqIndex = {
    import graft.plans.BinarySig.signPack
    val (centroids, corpusA) = trainAssignAuto(embeddings, nlist, ivfIters)
    val sigs = corpusA
      .select(col("vec_id"), signPack(col("embedding")).as("sig"),
        col("cluster").as("label"))
      .honestCheckpoint()
    IvfBqIndex(centroids, sigs, embeddings.select(col("vec_id"), col("embedding")))
  }

  /** Search a trained [[IvfBqIndex]]: query-side top-`nprobe` cell
    * assignment, Hamming rank within the probed cells' signatures
    * (one rerank window across all probed cells — a corpus vector
    * lives in exactly one cell, so no pair duplicates), then the
    * family's shared exact decimal re-rank with the label carried.
    */
  def ivfBqSearch(index: IvfBqIndex, queries: DataFrame, k: Int = 5,
                  rerank: Int = 20, nprobe: Int = 1,
                  excludeSelf: Boolean = false): DataFrame = {
    import graft.plans.BinarySig.{hammingPacked, signPack}
    val qs = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        signPack(col("embedding")).as("qsig"))
      .join(assignTopCellsAuto(queries.select(col("vec_id"), col("embedding")),
          index.centroids, nprobe)
        .select(col("vec_id").as("query_id"), col("cluster").as("qlabel")), "query_id")
    val wH = Window.partitionBy(col("query_id")).orderBy(col("hamming"), col("vec_id"))
    val cands = index.sigs.join(broadcast(qs),
        col("label") === col("qlabel") && notSelf(excludeSelf))
      .withColumn("hamming", hammingPacked(col("sig"), col("qsig")))
      .withColumn("rh", row_number().over(wH))
      .filter(col("rh") <= rerank)
      .select(col("query_id"), col("qe"), col("label"), col("vec_id"))
    pqExactRerank(cands, index.corpus, k, carry = Seq("label"))
      .select(col("query_id"), col("label"), col("vec_id").as("neighbor_id"),
        col("rank"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** One-shot build + search — the `ann_ivfbq` query. */
  def annIvfBq(embeddings: DataFrame, queries: Option[DataFrame] = None,
               k: Int = 5, nlist: Int = 8, ivfIters: Int = 3,
               rerank: Int = 20, nprobe: Int = 1,
               queriesAreCorpusDerived: Option[Boolean] = None): DataFrame =
    ivfBqSearch(ivfBqIndexBuild(embeddings, nlist, ivfIters),
      queries.getOrElse(defaultQueries(embeddings)), k, rerank, nprobe,
      excludeSelf = queriesAreCorpusDerived.getOrElse(queries.isEmpty))

  /** Persist / load / serve-from a frozen IVF-BQ index — the shared
    * lifecycle contract (cell-labeled signatures + centroids, meta
    * written LAST).
    */
  def ivfBqIndexSave(index: IvfBqIndex, dir: String, params: String = "",
                     corpusCount: Long = -1L): Unit = {
    val spark = index.sigs.sparkSession
    import spark.implicits._
    index.sigs.write.mode("overwrite").parquet(s"$dir/sigs.parquet")
    index.centroids.zipWithIndex.map { case (units, cell) => (cell, units.toSeq) }
      .toDF("cell", "units")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/centroids.parquet")
    Seq((ivfBqIndexVersion, params, corpusCount))
      .toDF("version", "params", "n")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/meta.parquet")
  }

  def ivfBqIndexLoad(spark: org.apache.spark.sql.SparkSession, dir: String,
                     corpus: DataFrame,
                     preReadMeta: Option[org.apache.spark.sql.Row] = None): IvfBqIndex = {
    val meta = preReadMeta.getOrElse(
      spark.read.parquet(s"$dir/meta.parquet").collect()(0))
    require(meta.getAs[Int]("version") == ivfBqIndexVersion,
      s"index at $dir has layout version ${meta.getAs[Int]("version")}, expected $ivfBqIndexVersion")
    val cents = spark.read.parquet(s"$dir/centroids.parquet").collect()
      .map(r => (r.getInt(0), r.getSeq[Long](1).toArray)).sortBy(_._1).map(_._2).toSeq
    IvfBqIndex(cents, spark.read.parquet(s"$dir/sigs.parquet"),
      corpus.select(col("vec_id"), col("embedding")))
  }

  /** Serve-from-frozen-index IVF-BQ — bit-identical to [[annIvfBq]]
    * (sign bits and Lloyd labels survive the parquet round trip), so
    * it shares ann_ivfbq's oracle.
    */
  def annIvfBqServed(embeddings: DataFrame, indexDir: String, k: Int = 5,
                     rerank: Int = 20, nprobe: Int = 1): DataFrame = {
    val spark = embeddings.sparkSession
    val params = s"ivfbq;nlist=8;ivfIt=3;w=32;src=${sourceStamp(embeddings)}"
    val n = embeddings.count()
    val meta = buildIfAbsent(spark, indexDir, params, n, ivfBqIndexVersion) { staging =>
      ivfBqIndexSave(ivfBqIndexBuild(embeddings), staging, params, n)
    }
    ivfBqSearch(ivfBqIndexLoad(spark, indexDir, embeddings, Some(meta)),
      defaultQueries(embeddings), k, rerank, nprobe, excludeSelf = true)
  }

  /** Frozen-index layout versions, persisted in every index's meta
    * table and checked at detection/load time: an index written by an
    * incompatible layout (or a pre-version save) reads as ABSENT, so
    * the serve path rebuilds instead of mis-decoding it.
    *
    * PER FAMILY, not engine-wide: the round-13 engine-wide 4→5 bump
    * (the semantic meta gained last_batch) also invalidated every
    * on-disk PQ/SQ/BQ/IVF index whose bytes had not changed — at
    * 100 TB a silent full-fleet rebuild, not a hiccup. Each family
    * now versions independently; all sit at 5 today (the value their
    * current on-disk metas carry), and the next layout change bumps
    * only the family whose layout changed.
    */
  private[graft] val semanticIndexVersion = 5 // flat SemanticIndex (+ annRangeIvfServed reuse)
  private[graft] val hierIndexVersion = 5
  private[graft] val pqIndexVersion = 5
  private[graft] val sqIndexVersion = 5
  private[graft] val bqIndexVersion = 5
  private[graft] val ivfSqIndexVersion = 5
  private[graft] val ivfBqIndexVersion = 5
  private[graft] val ivfPqIndexVersion = 5

  /** On-disk completeness check for a frozen index dir. The meta
    * table is written LAST in every save, so its `_SUCCESS` marker
    * implies the codes/codebooks/centroids tables all committed —
    * a partial save (killed writer) never reads as complete. Beyond
    * the layout version, the check compares the BUILD-PARAMETER
    * fingerprint and the corpus row count recorded at save time: an
    * index built with different hyperparameters, or over a corpus
    * that has since changed size (regenerated data, grown table),
    * reads as absent and is rebuilt rather than silently served.
    * Every served entry additionally folds [[sourceStamp]] — the
    * corpus files' (path, length, mtime) digest, answered from FS
    * metadata with no data scan — into its params, so an EQUAL-COUNT
    * regenerated corpus also rebuilds (previously the documented
    * residual); what remains is only an in-place rewrite preserving
    * every file's byte length AND mtime, which no parquet writer
    * performs.
    */
  private[graft] def frozenIndexComplete(spark: org.apache.spark.sql.SparkSession,
                                         dir: String, params: String, corpusCount: Long,
                                         version: Int): Boolean =
    frozenIndexMeta(spark, dir, params, corpusCount, version).isDefined

  /** Zero-scan content stamp of a frame's file-backed source: an MD5
    * over the sorted (path, byte length, modification time) of its
    * input files — FS metadata only, no data read. Served entries
    * fold this into their build-parameter fingerprint so a
    * regenerated corpus with an unchanged ROW COUNT still reads as
    * index drift and rebuilds instead of serving stale. Non-file
    * sources (an in-memory frame) stamp as "mem" — for those the
    * count check is the only corpus guard, as before.
    */
  private[graft] def sourceStamp(df: DataFrame): String = {
    val files = df.inputFiles
    if (files.isEmpty) "mem"
    else {
      val conf = df.sparkSession.sparkContext.hadoopConfiguration
      val parts = files.sorted.map { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        val st = p.getFileSystem(conf).getFileStatus(p)
        s"$f:${st.getLen}:${st.getModificationTime}"
      }
      java.security.MessageDigest.getInstance("MD5")
        .digest(parts.mkString("\n").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(16)
    }
  }

  /** The one meta read every serve pays: the collected meta ROW of a
    * complete, matching index dir, or None if the dir is missing, a
    * partial save (meta is written LAST — no `_SUCCESS`, no index),
    * a pre-version layout, or a fingerprint/corpus-count mismatch.
    * Callers thread the returned row into the load so meta.parquet
    * is read exactly once per serve (it carries m + the residual
    * flag the loaders need).
    */
  private[graft] def frozenIndexMeta(spark: org.apache.spark.sql.SparkSession,
                                     dir: String, params: String, corpusCount: Long,
                                     version: Int): Option[org.apache.spark.sql.Row] = {
    val marker = new org.apache.hadoop.fs.Path(s"$dir/meta.parquet/_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) None
    else {
      val meta = spark.read.parquet(s"$dir/meta.parquet")
      if (!Seq("version", "params", "n").forall(meta.columns.contains)) None
      else meta.collect().headOption.filter { r =>
        r.getAs[Int]("version") == version &&
          r.getAs[String]("params") == params && r.getAs[Long]("n") == corpusCount
      }
    }
  }

  /** Build-if-absent with an ATOMIC cross-process publish: the build
    * writes the whole index into a staging dir (`<dir>.tmp-<pid>-…`,
    * unique per attempt) and the completed tree is RENAMEd into
    * place — a concurrent second builder can no longer interleave
    * mode(overwrite) parquet writes into a mixed dir; whichever
    * rename lands first wins and the loser's staging tree is
    * deleted (its build was bit-identical anyway — the training is
    * deterministic). The per-dir lock additionally makes
    * check-then-build atomic WITHIN this JVM, and the final re-read
    * returns the meta row so the serve path reads meta.parquet
    * exactly once.
    */
  private[graft] def buildIfAbsent(spark: org.apache.spark.sql.SparkSession, dir: String,
                                   params: String, corpusCount: Long, version: Int)
                                  (build: String => Unit): org.apache.spark.sql.Row = {
    val lock = servedBuildLocks.computeIfAbsent(dir, _ => new Object)
    lock.synchronized {
      frozenIndexMeta(spark, dir, params, corpusCount, version).getOrElse {
        val dest = new org.apache.hadoop.fs.Path(dir)
        val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val staging = new org.apache.hadoop.fs.Path(
          s"$dir.tmp-${ProcessHandle.current.pid}-${System.nanoTime}")
        build(staging.toString)
        // publish: clear any stale/partial dest (it failed the meta
        // check above), then rename. A rename race with another
        // process is settled by one more meta check: if a complete
        // matching index appeared, serve it and drop our staging.
        if (fs.exists(dest)) fs.delete(dest, true)
        if (!fs.rename(staging, dest)) {
          val theirs = frozenIndexMeta(spark, dir, params, corpusCount, version)
          fs.delete(staging, true)
          theirs.getOrElse(sys.error(
            s"failed to publish index to $dir and no complete index is present"))
        } else frozenIndexMeta(spark, dir, params, corpusCount, version).getOrElse(
          sys.error(s"index published to $dir failed its own completeness check"))
      }
    }
  }
  private val servedBuildLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** IVF-PQ composite search — the billion-vector layout: the trained
    * Lloyd coarse quantizer ([[train]], raw-vector integer units)
    * restricts each query to its own cell (1/nlist of the corpus),
    * and within the cell ranking reads PQ CODES only (global
    * codebooks on normalized vectors, like [[annPq]]) before the
    * exact decimal re-rank. At 100 TB the scan touches `codes`+`label`
    * (9 bytes/vector) for nprobe/nlist of the corpus — the two
    * pruning axes compose multiplicatively, and `nprobe` (the
    * [[assignTopCells]] recall knob) trades candidate volume back
    * for recall when cells are imbalanced. (Production refinement — per-cell
    * RESIDUAL codebooks — changes the trained model, not the plan
    * shape.)
    *
    * Every stage is exact integer units, so the whole search replays
    * as the Lloyd CTE chain + the PQ CTE chain joined on the cell
    * filter → full DuckDB oracle.
    */
  def annIvfPq(embeddings: DataFrame, queries: Option[DataFrame] = None,
               k: Int = 5, nlist: Int = 8, ivfIters: Int = 3,
               m: Int = 8, codebookSize: Int = 8, pqIters: Int = 3,
               rerank: Int = 50, nprobe: Int = 1,
               queriesAreCorpusDerived: Option[Boolean] = None): DataFrame = {
    val index = ivfPqIndexBuild(embeddings, nlist, ivfIters, m, codebookSize, pqIters)
    ivfPqSearch(index, queries.getOrElse(defaultQueries(embeddings)), k, rerank, nprobe,
      excludeSelf = queriesAreCorpusDerived.getOrElse(queries.isEmpty))
  }

  /** A trained, materialized IVF-PQ index: coarse quantizer
    * centroids + PQ codebooks (both bounded driver-side model
    * parameters) and the labeled codes table — the full
    * billion-vector serving layout. `residual = true` marks the
    * [[ivfPqResidualIndexBuild]] layout (normalized-units cells,
    * codebooks trained on per-cell residuals): the two layouts share
    * storage but DECODE differently, so the flag rides the index —
    * and its persisted meta — and each search half requires the
    * layout it understands.
    */
  final case class IvfPqIndex private[Similarity] (
      codebooks: IndexedSeq[IndexedSeq[Array[Long]]],
      centroids: Seq[Array[Long]],
      codes: DataFrame, corpus: DataFrame, m: Int,
      residual: Boolean = false)

  /** Train the coarse quantizer + codebooks and encode/label the
    * corpus ONCE — the index-build half of [[annIvfPq]].
    */
  def ivfPqIndexBuild(embeddings: DataFrame, nlist: Int = 8, ivfIters: Int = 3,
                      m: Int = 8, codebookSize: Int = 8, pqIters: Int = 3): IvfPqIndex = {
    val dsub = pqDsub(m)
    val (centroids, corpusA) = trainAssignAuto(embeddings, nlist, ivfIters)
    val corpusU = pqCorpusUnits(embeddings)
    val codebooks = pqTrainCodebooks(corpusU, m, codebookSize, pqIters, dsub)
    val codes = pqEncode(corpusU, codebooks, dsub)
      .join(corpusA.select(col("vec_id"), col("cluster").as("label")), "vec_id")
    IvfPqIndex(codebooks, centroids, codes,
      embeddings.select(col("vec_id"), col("embedding")), m)
  }

  /** Search a trained [[IvfPqIndex]] with any (vec_id, embedding)
    * query frame — the serve half of [[annIvfPq]], same math.
    */
  def ivfPqSearch(index: IvfPqIndex, queries: DataFrame, k: Int = 5,
                  rerank: Int = 50, nprobe: Int = 1,
                  excludeSelf: Boolean = false): DataFrame = {
    require(!index.residual,
      "this index holds residual codebooks — search it with ivfPqResidualSearch")
    val dsub = pqDsub(index.m)
    // nprobe rows per query (assignTopCells): the ADC scan reads
    // codes from the query's nprobe nearest cells; the per-query
    // rerank window then cuts across all probed cells at once.
    val qs = pqQueries(queries, index.codebooks, dsub)
      .join(assignTopCellsAuto(queries.select(col("vec_id"), col("embedding")),
          index.centroids, nprobe)
        .select(col("vec_id").as("query_id"), col("cluster").as("qlabel")), "query_id")
    val cands = pqAdcCandidates(
      index.codes.join(broadcast(qs),
        col("label") === col("qlabel") && notSelf(excludeSelf)),
      index.m, rerank, carry = Seq("label"))
    pqExactRerank(cands, index.corpus, k, carry = Seq("label"))
      .select(col("query_id"), col("label"), col("vec_id").as("neighbor_id"),
        col("rank"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Residual IVF-PQ — the refinement production IVF-PQ systems
    * actually ship (FAISS's IndexIVFPQ default): PQ codebooks are
    * trained on RESIDUALS r = u − c(u) (the normalized vector minus
    * its cell centroid) instead of raw vectors. Residuals concentrate
    * near the origin with far less cross-cell variance, so the same
    * 8×8 codebook budget spends its resolution on WITHIN-cell
    * structure — the quantization error that actually decides
    * candidate order inside a probed cell. The coarse quantizer here
    * trains on the NORMALIZED units too (cosine ranking truth —
    * residuals must live in the same space as the PQ codes), unlike
    * [[annIvfPq]]'s raw-vector cells.
    *
    * Search: each (query, probed cell) pair builds its OWN ADC table
    * from the query's residual against that cell — nprobe small
    * tables per query, the standard residual-IVFPQ query cost. The
    * exact-decimal re-rank then prices survivors on the ORIGINAL
    * embeddings, so emitted scores are oracle-grade as everywhere.
    *
    * Every stage stays in exact integer units (residual subtraction
    * is Long arithmetic; |r| ≤ 4e8 keeps 8-dim squared sums below
    * 1.3e18 ≪ Long.Max), so the whole search replays as a DuckDB
    * CTE chain: normalized Lloyd → per-cell residuals → the joint
    * PQ chain over residuals → per-(query, cell) ADC tables.
    */
  def annIvfPqResidual(embeddings: DataFrame, queries: Option[DataFrame] = None,
                       k: Int = 5, nlist: Int = 8, ivfIters: Int = 3,
                       m: Int = 8, codebookSize: Int = 8, pqIters: Int = 3,
                       rerank: Int = 50, nprobe: Int = 1,
                       queriesAreCorpusDerived: Option[Boolean] = None): DataFrame = {
    val index = ivfPqResidualIndexBuild(embeddings, nlist, ivfIters, m, codebookSize, pqIters)
    ivfPqResidualSearch(index, queries.getOrElse(defaultQueries(embeddings)), k, rerank,
      nprobe, excludeSelf = queriesAreCorpusDerived.getOrElse(queries.isEmpty))
  }

  /** Cell centroid as a label-dispatched plan literal (nlist × dim
    * longs — bounded model parameters, like the codebooks).
    */
  private def centroidOf(centroids: Seq[Array[Long]], label: Column): Column =
    centroids.indices.init.foldRight(lit(centroids.last)) { (i, rest) =>
      when(label === i, lit(centroids(i))).otherwise(rest)
    }

  /** Train the residual layout ONCE — the index-build half of
    * [[annIvfPqResidual]]: normalized-units Lloyd cells, per-cell
    * residual subtraction, joint PQ codebooks over residuals, codes
    * labeled with their cell. Same math as the composed operator —
    * the split exists so the trained model can freeze to disk
    * ([[ivfPqIndexSave]]) and serve without retraining.
    */
  def ivfPqResidualIndexBuild(embeddings: DataFrame, nlist: Int = 8, ivfIters: Int = 3,
                              m: Int = 8, codebookSize: Int = 8,
                              pqIters: Int = 3): IvfPqIndex = {
    val dsub = pqDsub(m)
    val corpusU = pqCorpusUnits(embeddings)
    val centroids = trainUnitsFrame(corpusU, nlist, ivfIters)
    val labeled = assignUnitsCells(corpusU, centroids)
      .select(col("vec_id"), col("cluster").as("label"))
    // residual frame, materialized once: the zip_with subtraction is
    // an interpreted HOF and every training scan references the
    // residual column m×cb times — same rationale as pqCorpusUnits.
    val rx = corpusU.join(labeled, "vec_id")
      .select(col("vec_id"),
        zip_with(col("un"), centroidOf(centroids, col("label")), (a, b) => a - b).as("un"),
        col("label"))
      .honestCheckpoint()
    val books = pqTrainCodebooks(rx.select(col("vec_id"), col("un")), m, codebookSize,
      pqIters, dsub)
    val codes = pqEncode(rx.select(col("vec_id"), col("un")), books, dsub)
      .join(labeled, "vec_id")
    IvfPqIndex(books, centroids, codes,
      embeddings.select(col("vec_id"), col("embedding")), m, residual = true)
  }

  /** Search a residual-trained [[IvfPqIndex]] — the serve half of
    * [[annIvfPqResidual]]: each (query, probed cell) pair builds its
    * OWN ADC table from the query's residual against that cell's
    * centroid (the standard residual-IVFPQ query cost), then the
    * usual exact decimal re-rank on the original embeddings.
    */
  def ivfPqResidualSearch(index: IvfPqIndex, queries: DataFrame, k: Int = 5,
                          rerank: Int = 50, nprobe: Int = 1,
                          excludeSelf: Boolean = false): DataFrame = {
    require(index.residual,
      "this index holds raw-vector codebooks — search it with ivfPqSearch")
    val dsub = pqDsub(index.m)
    val books = index.codebooks
    val qU = queries.select(col("vec_id"), col("embedding"),
      graft.plans.IntegerUnits.normalizeUnits(col("embedding")).as("un"))
    // one row per (query, probed cell), each with its OWN residual
    // ADC table against that cell's centroid
    val qProbe = assignTopCellsUnits(qU, index.centroids, nprobe)
      .select(col("vec_id"), col("embedding"), col("un"), col("cluster").as("qlabel"))
      .withColumn("qres",
        zip_with(col("un"), centroidOf(index.centroids, col("qlabel")), (a, b) => a - b))
    val qtable = array(books.indices.map(j =>
      array(books(j).indices.map(c =>
        graft.plans.IntegerUnits.l2Units(
          slice(col("qres"), j * dsub + 1, dsub), lit(books(j)(c)))): _*)): _*)
    val qs = qProbe.select(col("vec_id").as("query_id"), col("embedding").as("qe"),
      col("qlabel"), qtable.as("qtable"))
    val cands = pqAdcCandidates(
      index.codes.join(broadcast(qs),
        col("label") === col("qlabel") && notSelf(excludeSelf)),
      index.m, rerank, carry = Seq("label"))
    pqExactRerank(cands, index.corpus, k, carry = Seq("label"))
      .select(col("query_id"), col("label"), col("vec_id").as("neighbor_id"),
        col("rank"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Serve-from-frozen-index residual IVF-PQ — [[annIvfPqResidual]]
    * through the build-if-absent-on-disk lifecycle (see
    * [[annPqServed]]). Bit-identical to the direct operator (integer
    * units survive the parquet round trip), so it shares
    * ann_ivfpq_residual's oracle.
    */
  def annIvfPqResidualServed(embeddings: DataFrame, indexDir: String, k: Int = 5,
                             nprobe: Int = 1, rerank: Int = 50): DataFrame = {
    val spark = embeddings.sparkSession
    val params = s"ivfpqres;nlist=8;ivfIt=3;m=8;cb=8;pqIt=3;src=${sourceStamp(embeddings)}" // ivfPqResidualIndexBuild defaults
    val n = embeddings.count()
    val meta = buildIfAbsent(spark, indexDir, params, n, ivfPqIndexVersion) { staging =>
      ivfPqIndexSave(ivfPqResidualIndexBuild(embeddings), staging, params, n)
    }
    val index = ivfPqIndexLoad(spark, indexDir, embeddings, Some(meta))
    ivfPqResidualSearch(index, defaultQueries(embeddings), k, rerank, nprobe,
      excludeSelf = true)
  }

  /** Lloyd's loop over a precomputed (vec_id, un) units frame — the
    * [[train]] math (md5-order init, lowest-index argmin, sign-split
    * half-up integer means, empty cells keep their centroid) applied
    * to NORMALIZED units, for quantizers that must live in the same
    * space as PQ residuals.
    */
  private def trainUnitsFrame(unitsDf: DataFrame, k: Int, iters: Int): Seq[Array[Long]] = {
    import graft.plans.IntegerUnits.l2Units
    var centroids: Seq[Array[Long]] = unitsDf
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(k)
      .collect().map(_.getSeq[Long](1).toArray).toSeq
    for (_ <- 1 to iters) {
      val ds = centroids.indices.map(i => l2Units(col("un"), lit(centroids(i))).as(s"d$i"))
      val scored = unitsDf.select(col("vec_id") +: col("un") +: ds: _*)
      val cluster = centroids.indices.init.foldRight(lit(centroids.size - 1)) { (i, rest) =>
        when(col(s"d$i") <= (i + 1 until centroids.size).map(j => col(s"d$j")).reduce(least(_, _)), i)
          .otherwise(rest)
      }
      val means = scored.withColumn("cluster", cluster.cast("long"))
        .select(col("cluster"), posexplode(col("un")).as(Seq("dim", "u")))
        .groupBy(col("cluster"), col("dim"))
        .agg(sum(col("u")).as("s"), count(lit(1)).as("n"))
        .select(col("cluster"), col("dim"),
          when(col("s") < 0, -expr("(2 * (-s) + n) DIV (2 * n)"))
            .otherwise(expr("(2 * s + n) DIV (2 * n)")).cast("long").as("m"))
        .groupBy(col("cluster"))
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("ms"))
        .select(col("cluster"), col("ms.m").as("centroid"))
        .collect().map(r => r.getLong(0).toInt -> r.getSeq[Long](1).toArray).toMap
      centroids = centroids.indices.map(i => means.getOrElse(i, centroids(i)))
    }
    centroids
  }

  /** [[assignCells]]' argmin over a units frame (single cell). */
  private def assignUnitsCells(unitsDf: DataFrame, centroids: Seq[Array[Long]]): DataFrame = {
    import graft.plans.IntegerUnits.l2Units
    val ds = centroids.indices.map(i => l2Units(col("un"), lit(centroids(i))).as(s"d$i"))
    val scored = unitsDf.select(col("vec_id") +: col("un") +: ds: _*)
    val cluster = centroids.indices.init.foldRight(lit(centroids.size - 1)) { (i, rest) =>
      when(col(s"d$i") <= (i + 1 until centroids.size).map(j => col(s"d$j")).reduce(least(_, _)), i)
        .otherwise(rest)
    }
    scored.withColumn("cluster", cluster.cast("long"))
      .select(col("vec_id"), col("un"), col("cluster"))
  }

  /** [[assignTopCells]] over a units frame: top-`nprobe`
    * (du, cluster)-ordered cells per row, shuffle-free.
    */
  private def assignTopCellsUnits(unitsDf: DataFrame, centroids: Seq[Array[Long]],
                                  nprobe: Int): DataFrame = {
    import graft.plans.IntegerUnits.l2Units
    require(nprobe >= 1 && nprobe <= centroids.size,
      s"nprobe must be in [1, ${centroids.size}], got $nprobe")
    val ds = centroids.indices.map(i => l2Units(col("un"), lit(centroids(i))).as(s"d$i"))
    val pairs = array(centroids.indices.map(i =>
      struct(col(s"d$i").as("du"), lit(i.toLong).as("cluster"))): _*)
    unitsDf.select(col("vec_id") +: col("embedding") +: col("un") +: ds: _*)
      .select(col("vec_id"), col("embedding"), col("un"),
        explode(slice(array_sort(pairs), 1, nprobe)).as("p"))
      .select(col("vec_id"), col("embedding"), col("un"),
        col("p.cluster").as("cluster"), col("p.du").as("du"))
  }

  /** Persist / load / serve-from a frozen IVF-PQ index — the
    * [[pqIndexSave]]/[[pqIndexLoad]]/[[annPqServed]] lifecycle for
    * the composite layout. The centroids ride a third small parquet
    * next to codebooks + labeled codes; results are bit-identical to
    * [[annIvfPq]] (integer units end-to-end), so `ann_ivfpq_served`
    * shares ann_ivfpq's oracle.
    */
  def ivfPqIndexSave(index: IvfPqIndex, dir: String, params: String = "",
                     corpusCount: Long = -1L, lastBatch: Long = -1L): Unit = {
    val spark = index.codes.sparkSession
    import spark.implicits._
    index.codes.write.mode("overwrite").parquet(s"$dir/codes.parquet")
    val cbRows = for {
      (subCbs, sub) <- index.codebooks.zipWithIndex
      (units, code) <- subCbs.zipWithIndex
    } yield (sub, code, units.toSeq)
    cbRows.toDF("subspace", "code", "units")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/codebooks.parquet")
    index.centroids.zipWithIndex.map { case (units, cell) => (cell, units.toSeq) }
      .toDF("cell", "units")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/centroids.parquet")
    // meta LAST: its _SUCCESS is the whole-index commit marker. The
    // residual flag persists WITH the index so a loader can never
    // decode residual codes through the raw-vector search (or vice
    // versa) — the layout is self-describing. params/n are the build
    // fingerprint frozenIndexComplete checks; last_batch is the
    // streaming-ingest high-water mark ([[ivfPqIndexStreamAppend]]) —
    // delta dirs with a higher id are UNCOMMITTED and ignored by the
    // loader.
    Seq((index.m, index.residual, ivfPqIndexVersion, params, corpusCount, lastBatch))
      .toDF("m", "residual", "version", "params", "n", "last_batch")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/meta.parquet")
  }

  /** The codes paths a loader may read: the base `codes.parquet`
    * plus every COMMITTED streaming delta (`delta_<id>.parquet` with
    * id ≤ meta's last_batch). An uncommitted delta — a crashed
    * [[ivfPqIndexStreamAppend]] that wrote its dir but died before
    * the meta rewrite — has id > last_batch and is skipped; the
    * replayed batch overwrites it idempotently. One FS listing per
    * load, no data read.
    */
  private def committedCodesPaths(spark: org.apache.spark.sql.SparkSession,
                                  dir: String, lastBatch: Long): Seq[String] =
    s"$dir/codes.parquet" +: committedDeltaPaths(spark, dir, lastBatch)

  def ivfPqIndexLoad(spark: org.apache.spark.sql.SparkSession, dir: String,
                     corpus: DataFrame,
                     preReadMeta: Option[org.apache.spark.sql.Row] = None): IvfPqIndex = {
    val meta = preReadMeta.getOrElse(
      spark.read.parquet(s"$dir/meta.parquet").collect()(0))
    require(meta.getAs[Int]("version") == ivfPqIndexVersion,
      s"index at $dir has layout version ${meta.getAs[Int]("version")}, expected $ivfPqIndexVersion")
    val cbs = spark.read.parquet(s"$dir/codebooks.parquet").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Long](2).toArray))
    val codebooks = cbs.groupBy(_._1).toIndexedSeq.sortBy(_._1)
      .map { case (_, rows) => rows.sortBy(_._2).map(_._3).toIndexedSeq }
    val centroids = spark.read.parquet(s"$dir/centroids.parquet").collect()
      .map(r => (r.getInt(0), r.getSeq[Long](1).toArray)).sortBy(_._1).map(_._2).toSeq
    val codePaths = committedCodesPaths(spark, dir, meta.getAs[Long]("last_batch"))
    IvfPqIndex(codebooks, centroids, spark.read.parquet(codePaths: _*),
      corpus.select(col("vec_id"), col("embedding")), meta.getAs[Int]("m"),
      residual = meta.getAs[Boolean]("residual"))
  }

  /** Encode new vectors under a FROZEN model — the shared `add()`
    * math for both IVF-PQ layouts: cell assignment with the frozen
    * coarse quantizer, then PQ encode with the frozen codebooks
    * (residual layout subtracts the cell centroid first, exactly as
    * [[ivfPqResidualIndexBuild]] does at train time). No training
    * state is touched, so the emitted (vec_id, codes, label) rows
    * are bit-identical to what a build over (old ∪ new) WITH the old
    * model would emit for the new rows.
    */
  private def ivfPqEncodeWith(index: IvfPqIndex, newVectors: DataFrame): DataFrame = {
    val dsub = pqDsub(index.m)
    val delta =
      if (index.residual) {
        val u = pqCorpusUnits(newVectors)
        val labeled = assignUnitsCells(u, index.centroids)
          .select(col("vec_id"), col("cluster").as("label"))
        // materialized: pqEncode references `un` m×cb times and the
        // zip_with subtraction is an interpreted HOF — same barrier
        // rationale as the build's residual frame
        val rx = u.join(labeled, "vec_id")
          .select(col("vec_id"),
            zip_with(col("un"), centroidOf(index.centroids, col("label")), (a, b) => a - b).as("un"))
          .honestCheckpoint()
        pqEncode(rx, index.codebooks, dsub).join(labeled, "vec_id")
      } else {
        pqEncode(pqCorpusUnits(newVectors), index.codebooks, dsub)
          .join(assignCellsAuto(newVectors.select(col("vec_id"), col("embedding")),
              index.centroids)
            .select(col("vec_id"), col("cluster").as("label")), "vec_id")
      }
    delta.select(col("vec_id"), col("codes"), col("label"))
  }

  /** FAISS-style `add()`, in memory: a NEW index whose model
    * (centroids + codebooks) is FROZEN from `index` and whose
    * codes/corpus are extended with the new vectors — no retrain.
    * This is the reference semantics the on-disk
    * [[ivfPqIndexAppend]] is spec-pinned against. Caller guarantees
    * vec_ids don't collide with the existing corpus.
    */
  def ivfPqIndexExtended(index: IvfPqIndex, newVectors: DataFrame): IvfPqIndex =
    index.copy(
      codes = index.codes.select(col("vec_id"), col("codes"), col("label"))
        .unionByName(ivfPqEncodeWith(index, newVectors)),
      corpus = index.corpus.unionByName(
        newVectors.select(col("vec_id"), col("embedding"))))

  /** Incremental index append — the lifecycle step between a frozen
    * index and a full retrain, for BOTH IVF-PQ layouts (the residual
    * flag rides the on-disk meta): encode ONLY the new vectors with
    * the frozen model ([[ivfPqEncodeWith]]), append the delta rows
    * to the codes table, and bump meta `n`. Without this, ANY corpus
    * growth fails the corpus-count fingerprint and forces a retrain;
    * with it, growth costs ∝ |delta| — the corpus is never rescanned
    * and no training runs (measured in SURVEY §6).
    *
    * Crash safety: meta is rewritten LAST (the commit marker), so a
    * killed append leaves either uncommitted task files (ignored by
    * readers) or committed codes with the OLD `n` — and the next
    * serve's corpus-count check reads that as absent and rebuilds
    * rather than serving a torn index. Appends are serialized per
    * dir within this JVM (same lock as [[buildIfAbsent]]);
    * cross-process append exclusion is the caller's to arrange, as
    * with any shared-table append. Returns the new corpus count
    * recorded in meta.
    */
  def ivfPqIndexAppend(spark: org.apache.spark.sql.SparkSession, dir: String,
                       newVectors: DataFrame): Long = {
    val lock = servedBuildLocks.computeIfAbsent(dir, _ => new Object)
    lock.synchronized {
      val meta = spark.read.parquet(s"$dir/meta.parquet").collect()(0)
      require(meta.getAs[Int]("version") == ivfPqIndexVersion,
        s"index at $dir has layout version ${meta.getAs[Int]("version")}, expected $ivfPqIndexVersion")
      val index = ivfPqIndexLoad(spark, dir,
        newVectors.select(col("vec_id"), col("embedding")), Some(meta))
      ivfPqEncodeWith(index, newVectors)
        .write.mode("append").parquet(s"$dir/codes.parquet")
      val n = meta.getAs[Long]("n") + newVectors.count()
      rewriteMeta(spark, dir, meta, n, meta.getAs[Long]("last_batch"))
      n
    }
  }

  /** Meta rewrite with the model columns carried through unchanged —
    * the commit step of every incremental lifecycle op (append /
    * stream-append / remove / compact): only `n` and `last_batch`
    * move; m/residual/params/version describe the FROZEN model and
    * never change without a retrain.
    */
  private def rewriteMeta(spark: org.apache.spark.sql.SparkSession, dir: String,
                          meta: org.apache.spark.sql.Row, n: Long,
                          lastBatch: Long): Unit = {
    import spark.implicits._
    stagedMetaWrite(spark, dir) { staging =>
      Seq((meta.getAs[Int]("m"), meta.getAs[Boolean]("residual"), ivfPqIndexVersion,
          meta.getAs[String]("params"), n, lastBatch))
        .toDF("m", "residual", "version", "params", "n", "last_batch")
        .repartition(1).write.mode("overwrite").parquet(staging)
    }
  }

  /** Replace `<dir>/meta.parquet` — the commit marker every append
    * advances — via a staged write + rename, so the window in which a
    * CROSS-PROCESS reader can catch the meta mid-rewrite shrinks from
    * an entire Spark write job (the old delete-then-write
    * mode(overwrite)) to two FS metadata operations. Not fully
    * atomic on a raw filesystem (rename cannot land on an existing
    * dir): a reader in those two ops sees a MISSING meta dir and
    * fails loudly — never a partial one — and same-JVM
    * appender/loader pairs are already serialized by
    * [[servedBuildLocks]]. A crashed writer leaves only a one-row
    * `meta_staging-*` orphan dir that no loader or delta listing ever
    * matches.
    */
  private def stagedMetaWrite(spark: org.apache.spark.sql.SparkSession, dir: String)
                             (write: String => Unit): Unit = {
    val dest = new org.apache.hadoop.fs.Path(s"$dir/meta.parquet")
    val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new org.apache.hadoop.fs.Path(
      s"$dir/meta_staging-${ProcessHandle.current.pid}-${System.nanoTime}.parquet")
    write(staging.toString)
    if (fs.exists(dest)) fs.delete(dest, true)
    if (!fs.rename(staging, dest))
      sys.error(s"failed to publish meta to $dir")
  }

  /** Streaming `add()` — the exactly-once micro-batch append a
    * `foreachBatch` ingest loop calls ([[graft.streaming.SimilarityStream.ivfPqIngest]]).
    * Structured Streaming replays the in-flight batch after a
    * restart, so unlike [[ivfPqIndexAppend]] (caller-serialized, no
    * replay) this must be IDEMPOTENT per (dir, batchId):
    *
    *   - the delta codes land in their own `delta_<batchId>.parquet`
    *     dir, written mode(overwrite) — a replay REWRITES the same
    *     dir instead of double-appending into the shared codes table
    *     (the failure a plain append suffers: nothing distinguishes
    *     the two copies afterwards);
    *   - the meta rewrite (n += |delta|, last_batch = batchId) is the
    *     commit, written LAST. A crash between delta write and meta
    *     rewrite leaves id > last_batch, which every loader skips
    *     ([[committedCodesPaths]]) and the replay overwrites;
    *   - a replayed ALREADY-COMMITTED batch (id ≤ last_batch) is
    *     skipped outright.
    *
    * Batches must commit in increasing batchId order — exactly what
    * one streaming query per index dir provides. Returns the
    * committed corpus count.
    */
  def ivfPqIndexStreamAppend(spark: org.apache.spark.sql.SparkSession, dir: String,
                             batch: DataFrame, batchId: Long): Long = {
    require(batchId >= 0, s"batchId must be >= 0, got $batchId")
    val lock = servedBuildLocks.computeIfAbsent(dir, _ => new Object)
    lock.synchronized {
      val meta = spark.read.parquet(s"$dir/meta.parquet").collect()(0)
      require(meta.getAs[Int]("version") == ivfPqIndexVersion,
        s"index at $dir has layout version ${meta.getAs[Int]("version")}, expected $ivfPqIndexVersion")
      val lastBatch = meta.getAs[Long]("last_batch")
      if (batchId <= lastBatch) meta.getAs[Long]("n") // replay of a committed batch
      else {
        val cnt = batch.count()
        // empty batch: advance the high-water mark only — a data-less
        // delta dir would break every later multi-path codes read
        // (schema inference over zero files); the committed-paths
        // listing tolerates a missing id (see semanticCommitDelta).
        if (cnt > 0) {
          val index = ivfPqIndexLoad(spark, dir,
            batch.select(col("vec_id"), col("embedding")), Some(meta))
          ivfPqEncodeWith(index, batch)
            .write.mode("overwrite").parquet(s"$dir/delta_$batchId.parquet")
        }
        val n = meta.getAs[Long]("n") + cnt
        rewriteMeta(spark, dir, meta, n, batchId)
        n
      }
    }
  }

  /** Unconditional staged republish of an index dir — the write
    * pattern [[ivfPqIndexRemove]] and [[ivfPqIndexCompact]] share:
    * unlike [[buildIfAbsent]] the destination EXISTS and is complete;
    * the rewritten tree is staged and RENAMEd over it so readers in
    * other processes see either the old complete index or the new
    * one, never a mix.
    */
  private def stagedReplace(spark: org.apache.spark.sql.SparkSession, dir: String)
                           (write: String => Unit): Unit = {
    val dest = new org.apache.hadoop.fs.Path(dir)
    val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new org.apache.hadoop.fs.Path(
      s"$dir.tmp-${ProcessHandle.current.pid}-${System.nanoTime}")
    write(staging.toString)
    if (fs.exists(dest)) fs.delete(dest, true)
    if (!fs.rename(staging, dest))
      sys.error(s"failed to republish index to $dir")
  }

  /** FAISS-style `remove_ids` — the delete half of the incremental
    * lifecycle: drop tombstoned vectors from a frozen index WITHOUT
    * retraining (the model is per-vector independent: the surviving
    * codes are bit-identical to encoding the surviving corpus under
    * the same frozen model, so search-after-remove ≡ search over an
    * in-memory index with those rows filtered — spec-pinned).
    * `removeIds` is a (vec_id) FRAME, not a driver list: at 100 TB a
    * tombstone set is itself a table, and the anti-join keeps the
    * whole rewrite distributed. Physical compaction is inherent
    * (like FAISS): the codes tables are rewritten once, ∝ corpus —
    * streaming deltas fold into the new base codes table in the same
    * pass. Crash-safe via [[stagedReplace]]. Returns the new corpus
    * count recorded in meta.
    */
  def ivfPqIndexRemove(spark: org.apache.spark.sql.SparkSession, dir: String,
                       removeIds: DataFrame): Long = {
    val lock = servedBuildLocks.computeIfAbsent(dir, _ => new Object)
    lock.synchronized {
      val meta = spark.read.parquet(s"$dir/meta.parquet").collect()(0)
      require(meta.getAs[Int]("version") == ivfPqIndexVersion,
        s"index at $dir has layout version ${meta.getAs[Int]("version")}, expected $ivfPqIndexVersion")
      val paths = committedCodesPaths(spark, dir, meta.getAs[Long]("last_batch"))
      val kept = spark.read.parquet(paths: _*)
        .join(removeIds.select(col("vec_id")), Seq("vec_id"), "left_anti")
        .honestCheckpoint() // counted once, then written — don't re-run the anti-join
      val n = kept.count()
      stagedReplace(spark, dir) { staging =>
        kept.write.mode("overwrite").parquet(s"$staging/codes.parquet")
        copyModelTables(spark, dir, staging)
        rewriteMeta(spark, staging, meta, n, meta.getAs[Long]("last_batch"))
      }
      n
    }
  }

  /** Fold committed streaming deltas into the base codes table — the
    * maintenance pass that keeps a long-running ingest from
    * accumulating one parquet dir per micro-batch (each is an FS
    * listing + scan-relation entry at serve time). Search results are
    * bit-identical before and after (same rows, one table);
    * `last_batch` is PRESERVED so a replayed pre-compaction batch
    * still reads as committed and skips. No-op when nothing is
    * committed beyond the base. Crash-safe via [[stagedReplace]].
    */
  def ivfPqIndexCompact(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    val lock = servedBuildLocks.computeIfAbsent(dir, _ => new Object)
    lock.synchronized {
      val meta = spark.read.parquet(s"$dir/meta.parquet").collect()(0)
      require(meta.getAs[Int]("version") == ivfPqIndexVersion,
        s"index at $dir has layout version ${meta.getAs[Int]("version")}, expected $ivfPqIndexVersion")
      val paths = committedCodesPaths(spark, dir, meta.getAs[Long]("last_batch"))
      if (paths.length > 1) {
        val merged = spark.read.parquet(paths: _*).honestCheckpoint()
        stagedReplace(spark, dir) { staging =>
          merged.write.mode("overwrite").parquet(s"$staging/codes.parquet")
          copyModelTables(spark, dir, staging)
          rewriteMeta(spark, staging, meta, meta.getAs[Long]("n"),
            meta.getAs[Long]("last_batch"))
        }
      }
    }
  }

  /** Rewrite the bounded model tables (codebooks + centroids) from
    * `src` into `staging` — the republish steps never change the
    * frozen model, only the codes/meta.
    */
  private def copyModelTables(spark: org.apache.spark.sql.SparkSession,
                              src: String, staging: String): Unit =
    Seq("codebooks.parquet", "centroids.parquet").foreach { t =>
      spark.read.parquet(s"$src/$t")
        .repartition(1).write.mode("overwrite").parquet(s"$staging/$t")
    }

  /** The frozen lifecycle WITH corpus growth — the sequence
    * [[ivfPqIndexAppend]] exists for, as one oracled query: build
    * once over the BASE corpus (vec_id % 10 ≠ 0), `add()` the
    * remaining tenth with the frozen model (no retrain), publish
    * atomically, serve the full corpus. Deterministic end-to-end
    * (the base split, the seeded trainer, and the frozen-model
    * encode are all exact integer units), so the whole sequence
    * carries a full DuckDB oracle: the training CTE chains read only
    * the base rows while assignment/encode/search run over
    * everything. Results intentionally differ from [[annIvfPq]] —
    * the model never saw the appended tenth; that is the add()
    * contract being tested.
    */
  def annIvfPqAppended(embeddings: DataFrame, indexDir: String, k: Int = 5,
                       nprobe: Int = 1, rerank: Int = 50): DataFrame = {
    val spark = embeddings.sparkSession
    val base = embeddings.filter(col("vec_id") % 10 =!= 0)
    val fresh = embeddings.filter(col("vec_id") % 10 === 0)
    val params = s"ivfpq;nlist=8;ivfIt=3;m=8;cb=8;pqIt=3;base=mod10;src=${sourceStamp(embeddings)}"
    val n = embeddings.count()
    val meta = buildIfAbsent(spark, indexDir, params, n, ivfPqIndexVersion) { staging =>
      ivfPqIndexSave(ivfPqIndexBuild(base), staging, params, n - fresh.count())
      ivfPqIndexAppend(spark, staging, fresh)
    }
    val index = ivfPqIndexLoad(spark, indexDir, embeddings, Some(meta))
    ivfPqSearch(index, defaultQueries(embeddings), k, rerank, nprobe, excludeSelf = true)
  }

  /** The frozen lifecycle WITH tombstones — [[ivfPqIndexRemove]] as
    * one oracled query: build once over the FULL corpus, remove the
    * tombstoned fifth (vec_id % 5 = 2) from the frozen index — codes
    * filtered, model untouched, no retrain — publish, serve.
    * Deterministic end-to-end, so the sequence carries a full DuckDB
    * oracle: ann_ivfpq's training chains verbatim (the model saw the
    * whole corpus) with the candidate scan restricted to surviving
    * codes. Removed ids are unreachable by construction — they have
    * no code rows to rank. The build-if-absent fingerprint is the
    * KEPT count: repeated runs (bench, fresh JVMs) load the
    * tombstoned index and read the steady serve-only cost.
    */
  def annIvfPqRemoved(embeddings: DataFrame, indexDir: String, k: Int = 5,
                      nprobe: Int = 1, rerank: Int = 50): DataFrame = {
    val spark = embeddings.sparkSession
    val tombstones = embeddings.filter(col("vec_id") % 5 === 2).select(col("vec_id"))
    val params = s"ivfpq;nlist=8;ivfIt=3;m=8;cb=8;pqIt=3;rm=mod5eq2;src=${sourceStamp(embeddings)}"
    val nAll = embeddings.count()
    val meta = buildIfAbsent(spark, indexDir, params, nAll - tombstones.count(), ivfPqIndexVersion) { staging =>
      ivfPqIndexSave(ivfPqIndexBuild(embeddings), staging, params, nAll)
      ivfPqIndexRemove(spark, staging, tombstones)
    }
    val index = ivfPqIndexLoad(spark, indexDir, embeddings, Some(meta))
    ivfPqSearch(index, defaultQueries(embeddings), k, rerank, nprobe, excludeSelf = true)
  }

  /** Serve-from-frozen-index batch IVF-PQ — train → save → load →
    * serve as one oracled query, with the same build-if-absent-on-
    * disk lifecycle as [[annPqServed]] so a repeated-measure bench
    * (and any later JVM) reads the steady serve-only cost.
    */
  def annIvfPqServed(embeddings: DataFrame, indexDir: String, k: Int = 5,
                     nprobe: Int = 1, rerank: Int = 50): DataFrame = {
    val spark = embeddings.sparkSession
    val params = s"ivfpq;nlist=8;ivfIt=3;m=8;cb=8;pqIt=3;src=${sourceStamp(embeddings)}" // ivfPqIndexBuild defaults
    val n = embeddings.count()
    val meta = buildIfAbsent(spark, indexDir, params, n, ivfPqIndexVersion) { staging =>
      ivfPqIndexSave(ivfPqIndexBuild(embeddings), staging, params, n)
    }
    val index = ivfPqIndexLoad(spark, indexDir, embeddings, Some(meta))
    ivfPqSearch(index, defaultQueries(embeddings), k, rerank, nprobe, excludeSelf = true)
  }

  private def pqDsub(m: Int): Int = {
    val dim = LshPlanes.dim
    require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    dim / m
  }

  /** PQ working set: (vec_id, un) with `un` the L2-NORMALIZED vector
    * in 1e-8 integer units.
    *
    * PQ quantizes L2 space, but the ranking truth is COSINE — on
    * normalized vectors ‖u−v‖² = 2 − 2·cos(u,v) makes the ADC order
    * the cosine order. Without this the two orders disagree and
    * recall collapses (recall@5 measured 0.28 unnormalized → 0.56
    * normalized on the weakly-structured test corpus).
    *
    * Exactness: ‖e‖² is the order-free decimal sum; sqrt, the
    * division, the float narrowing, and the 1e-8 half-up quantize are
    * all correctly-rounded scalar ops — deterministic on any
    * partitioning and bit-replayable in SQL. One codegen kernel per
    * row ([[graft.plans.NormalizeUnitsI64]]; the interpreted
    * decimal-HOF chain it replaced was ~5 ms/row — the whole ann_pq
    * budget); IntegerUnitsSpec pins the kernel to the reference chain
    * value-for-value.
    *
    * MATERIALIZED once (localCheckpoint): `un` is referenced by all
    * m×cb distance columns — without a hard barrier CollapseProject
    * inlines the kernel into every reference and every training scan
    * re-runs it. The units frame is the PQ working set (n × dim
    * longs — 512 B/row); an iterative trainer would persist exactly
    * this projection on a cluster too.
    */
  private def pqCorpusUnits(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id"), graft.plans.IntegerUnits.normalizeUnits(col("embedding")).as("un"))
      .honestCheckpoint()

  /** Shared projection/argmin machinery: every subspace distance is
    * projected ONCE (no re-evaluation inside the fold), and the fold
    * picks the lowest index on ties (same rule as assignCells).
    */
  private def pqDistCols(books: IndexedSeq[IndexedSeq[Array[Long]]], u: String, dsub: Int) = {
    import graft.plans.IntegerUnits.l2Units
    for (j <- books.indices; c <- books(j).indices)
      yield l2Units(slice(col(u), j * dsub + 1, dsub), lit(books(j)(c))).as(s"d${j}_$c")
  }
  private def pqArgmin(j: Int, codebookSize: Int): Column =
    (0 until codebookSize - 1).foldRight(lit(codebookSize - 1)) { (c, rest) =>
      when(col(s"d${j}_$c") <=
        (c + 1 until codebookSize).map(cc => col(s"d${j}_$cc")).reduce(least(_, _)), c)
        .otherwise(rest)
    }

  /** PQ dispatch: the fused codebooks-as-data kernels
    * ([[graft.plans.PqQuant]]) now run at EVERY shape. The literal
    * path ([[pqDistCols]]/[[pqArgmin]]) plans m·cb l2 kernels plus m
    * O(cb²) when/least argmin folds even at the SMALLEST registered
    * codebook (m=8, cb=8 → 64 kernels, ~512-ref folds), and since
    * the trainer re-plans that tree every Lloyd iteration, its
    * analyzer + codegen cost measured 24-26% of whole-query wall
    * (sf0.1 min-of-2 A/B: ann_pq 2.53 → 1.93 s, ann_ivfpq
    * 3.25 → 2.44 s, ann_ivfpq_residual 2.74 → 2.04 s, ann_opq
    * 3.71 → 2.80 s) — on top of the JIT-ceiling argument that
    * forced FAISS-standard cb = 256 to the fused side all along.
    * The literal path remains as the independent parity reference,
    * spec-pinned bit-identical via wide = Some(false).
    */
  private val pqWide: Boolean = true

  /** Codebook j AS DATA: one array<struct<cl, cu>> literal in code
    * order (zipWithIndex) — plan DATA (a single Literal in the
    * references array), not code, so cb never touches the JIT
    * budget. m·cb·dsub longs ≤ ~128 KB at (16, 256, 8) — far below
    * where a broadcast frame would win over a plan literal.
    */
  private def pqCbData(books: IndexedSeq[IndexedSeq[Array[Long]]], j: Int): Column =
    typedlit(books(j).zipWithIndex.map { case (cu, c) => (c.toLong, cu.toSeq) })

  /** argmin code of subspace j against a codebook-as-data array —
    * ONE l2 kernel evaluated per element inside `transform`, then
    * the lexicographic (du, cl) sort-head: the same lowest-code
    * tiebreak as [[pqArgmin]], bit-identical (spec-pinned).
    *
    * RETAINED AS THE REFERENCE SEMANTICS ONLY: the corpus-sized wide
    * paths ([[pqEncode]]/[[pqTrainCodebooks]]) now run the fused
    * [[graft.plans.PqEncodeI64]] codegen kernel — the per-element
    * `transform` lambda here is interpreted (m·cb dispatches per
    * row), which priced the 100 TB encode pass; the spec pins the
    * kernel bit-identical to this path. Still serves the query-side
    * ADC table ([[pqQueries]]), where rows are query-count sized.
    */
  private[graft] def pqCodeData(un: Column, books: IndexedSeq[IndexedSeq[Array[Long]]],
                         j: Int, dsub: Int): Column = {
    import graft.plans.IntegerUnits.l2Units
    element_at(array_sort(transform(pqCbData(books, j), e =>
      struct(l2Units(slice(un, j * dsub + 1, dsub), e.getField("_2")).as("du"),
        e.getField("_1").as("cl")))), 1).getField("cl").cast("int")
  }

  /** JOINT per-subspace k-means: all m codebooks advance in ONE scan
    * + one (m×k×dsub)-row shuffle per iteration. Training each
    * subspace through [[train]] would cost m×iters full scans and m
    * init collects for the identical math (same md5-order init rows,
    * same argmin tie rule, same mean update) — measured 35.9 s vs
    * ~4 s at bench SF for no result difference.
    */
  private[graft] def pqTrainCodebooks(corpusU: DataFrame, m: Int, codebookSize: Int,
                               iters: Int, dsub: Int,
                               wide: Option[Boolean] = None): IndexedSeq[IndexedSeq[Array[Long]]] = {
    def sub(u: Column, j: Int): Column = slice(u, j * dsub + 1, dsub)
    val useWide = wide.getOrElse(pqWide)
    val initRows = corpusU.orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(codebookSize).collect()
      .map(_.getSeq[Long](1).toArray)
    require(initRows.nonEmpty, "annPq needs a non-empty corpus")
    // a corpus smaller than the codebook pads by reuse: duplicate
    // centroids never win the lowest-index argmin, so they are
    // permanently-empty cells rather than a driver crash
    var books = IndexedSeq.tabulate(m, codebookSize)((j, c) =>
      initRows(c % initRows.length).slice(j * dsub, (j + 1) * dsub))
    for (_ <- 1 to iters) {
      // the kernels/data regimes differ ONLY in how the per-subspace
      // argmin is computed (m×cb codegen kernels vs m transform
      // folds over codebook-as-data) — init, tiebreak, and the mean
      // step are shared, so the two are bit-identical (spec-pinned)
      val assigned =
        if (useWide) corpusU
          .select(col("un"),
            graft.plans.PqQuant.pqEncodeCodes(col("un"), books, dsub).as("codes"))
          .select((0 until m).map(j =>
            struct(element_at(col("codes"), j + 1).as("cl"),
              sub(col("un"), j).as("sv")).as(s"a$j")): _*)
        else corpusU
          .select(col("un") +: pqDistCols(books, "un", dsub): _*)
          .select((0 until m).map(j =>
            struct(pqArgmin(j, codebookSize).as("cl"), sub(col("un"), j).as("sv")).as(s"a$j")): _*)
      val means = assigned
        .select(posexplode(array((0 until m).map(j => col(s"a$j")): _*)).as(Seq("j", "a")))
        .select(col("j"), col("a.cl").as("cl"), posexplode(col("a.sv")).as(Seq("dim", "u")))
        .groupBy(col("j"), col("cl"), col("dim"))
        .agg(sum(col("u")).as("s"), count(lit(1)).as("n"))
        // half-up integer mean, sign-split like train()
        .select(col("j"), col("cl"), col("dim"),
          when(col("s") < 0, -expr("(2 * (-s) + n) DIV (2 * n)"))
            .otherwise(expr("(2 * s + n) DIV (2 * n)")).cast("long").as("mu"))
        .groupBy(col("j"), col("cl"))
        .agg(array_sort(collect_list(struct(col("dim"), col("mu")))).as("ms"))
        .select(col("j"), col("cl"), col("ms.mu").as("centroid"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Long](2).toArray).toMap
      // empty cells keep their previous centroid (like train())
      books = IndexedSeq.tabulate(m, codebookSize)((j, c) => means.getOrElse((j, c), books(j)(c)))
    }
    books
  }

  /** One corpus scan → (vec_id, codes): per-subspace argmin code.
    * Auto-dispatches on the codebook shape: plan-literal l2 kernels
    * within the JIT budget, the fused codebooks-as-data kernel
    * ([[graft.plans.PqEncodeI64]] — one compiled m×cb×dsub loop,
    * plan size O(1) in cb) past it — bit-identical either way
    * (spec-pinned).
    */
  private[graft] def pqEncode(corpusU: DataFrame, books: IndexedSeq[IndexedSeq[Array[Long]]],
                       dsub: Int, wide: Option[Boolean] = None): DataFrame =
    if (wide.getOrElse(pqWide))
      corpusU.select(col("vec_id"),
        graft.plans.PqQuant.pqEncodeCodes(col("un"), books, dsub).as("codes"))
    else corpusU
      .select(col("vec_id") +: col("un") +: pqDistCols(books, "un", dsub): _*)
      .select(col("vec_id"),
        array(books.indices.map(j => pqArgmin(j, books(j).size)): _*).as("codes"))

  /** Query frame with its ADC table (m×cb longs) and the ORIGINAL
    * embedding `qe` for the exact re-rank. `rot` maps the normalized
    * units into the codebooks' working space (identity for flat PQ;
    * the learned rotation for [[annOpq]] — queries must enter the
    * SAME space the codebooks were trained in).
    */
  private[graft] def pqQueries(qs: DataFrame, books: IndexedSeq[IndexedSeq[Array[Long]]],
                        dsub: Int,
                        rot: Column => Column = identity): DataFrame = {
    import graft.plans.IntegerUnits.l2Units
    // past the kernel budget the whole m×cb table is ONE fused
    // kernel with the codebooks as a reference object
    // (plans/PqQuant.PqQTableI64): the previous per-subspace
    // `transform` over a typedlit codebook literal embedded m·cb
    // struct literals in the plan — 2048 at FAISS cb=256, ~2 s of
    // analysis/serialization per execution before any row moved.
    // Work is query-count sized either way; the kernel is
    // bit-identical to both table builds (same exact long Σ(Δ²),
    // same (j, c) order — spec-pinned).
    val qtable =
      if (pqWide)
        graft.plans.PqQuant.pqQTable(col("qun"), books, dsub)
      else array(books.indices.map(j =>
        array(books(j).indices.map(c =>
          l2Units(slice(col("qun"), j * dsub + 1, dsub), lit(books(j)(c)))): _*)): _*)
    qs.select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        rot(graft.plans.IntegerUnits.normalizeUnits(col("embedding"))).as("qun"))
      .withColumn("qtable", qtable)
      .drop("qun")
  }

  /** ADC candidate cut: rank the joined (codes × queries) frame by
    * the asymmetric distance and keep the top `rerank` per query.
    *
    * The ADC distance Σ_j qtable[j][codes[j]] is ONE fused codegen
    * kernel ([[graft.plans.PqAdcSumI64]] — a compiled m-iteration
    * loop reading both arrays once), replacing the static m-term
    * `element_at(element_at(...))` chain (m separate two-level
    * ArrayData walks per scanned code row; bit-identical, spec-
    * pinned). This is the corpus-sized scan of the SERVING path —
    * at 100 TB the codes table is all the scan touches, so its
    * per-row constant is the family's deployment cost. All-Long
    * sums — exact in any order.
    */
  private def pqAdcCandidates(joined: DataFrame, m: Int, rerank: Int,
                              carry: Seq[String] = Nil): DataFrame = {
    val adist = graft.plans.PqQuant.pqAdcSum(col("codes"), col("qtable"), m)
    val wA = Window.partitionBy(col("query_id")).orderBy(col("adist"), col("vec_id"))
    joined
      .withColumn("adist", adist)
      .withColumn("ra", row_number().over(wA))
      .filter(col("ra") <= rerank)
      .select((Seq("query_id", "qe", "vec_id") ++ carry).map(col): _*)
  }

  /** Exact decimal re-rank of the ≤ rerank×queries survivors only —
    * on the ORIGINAL vectors (cosine is scale-invariant, and the
    * other ann_* oracles share this exact form). Output is the
    * explicit (query_id, vec_id, rank, cosine) + `carry` projection,
    * so carried columns (e.g. annIvfPq's label) survive by contract
    * rather than by the absence of a select.
    */
  private def pqExactRerank(cands: DataFrame, embeddings: DataFrame, k: Int,
                            carry: Seq[String] = Nil): DataFrame = {
    val wC = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))
    cands.join(embeddings.select(col("vec_id"), col("embedding")), "vec_id")
      .withColumn("cosine",
        cosineExact(decDot(col("qe"), col("embedding")), decNorm2(col("qe")), decNorm2(col("embedding"))))
      .withColumn("rank", row_number().over(wC).cast("long"))
      .filter(col("rank") <= k)
      .select((Seq("query_id", "vec_id", "rank", "cosine") ++ carry).map(col): _*)
  }

  /** IVF-style search: the coarse quantizer assignment is the
    * pre-computed `label` column (in a full IVF build this is the
    * nearest-centroid id); search scans only the query's own cell —
    * the 1/nlist scan-pruning that makes ANN tractable at 100 TB.
    */
  def annIvf(embeddings: DataFrame, queries: Option[DataFrame] = None,
             k: Int = 5, queriesAreCorpusDerived: Option[Boolean] = None): DataFrame = {
    val corpus = embeddings.select(col("vec_id"), col("embedding"), col("label"))
    val qs = queries.getOrElse(defaultQueries(embeddings))
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("label").as("qlabel"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))
    val scanned = corpus.join(broadcast(qs),
        col("label") === col("qlabel") &&
          notSelf(queriesAreCorpusDerived.getOrElse(queries.isEmpty)))
      .withColumn("fast", cosineFast(col("qe"), col("embedding")))
    keepFastSurvivors(scanned, k)
      .withColumn("cosine",
        cosineExact(decDot(col("qe"), col("embedding")), decNorm2(col("qe")), decNorm2(col("embedding"))))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("label"), col("vec_id").as("neighbor_id"), col("rank"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }
}

/** The ann_lsh hyperplane family — seeded, fixed-point (×1e4,
  * HALF_UP), shared verbatim between the Spark kernel
  * ([[graft.plans.BandSignatures]]) and the generated DuckDB oracle
  * SQL in [[graft.SparkEntry.oracleSql]], which inlines these exact
  * longs as literals. 8 bands × 3 rows over 64 dims.
  */
object LshPlanes {
  val bands = 8
  val rowsPerBand = 3
  val dim = 64
  lazy val scaled: Array[Array[Long]] = {
    val rng = new scala.util.Random(0xA55)
    Array.fill(bands * rowsPerBand, dim)(math.round(rng.nextGaussian() * 10000))
  }
}
