package graft.operators

import graft.functions.Hashing._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.plans.HonestCheckpoint._

/** Document deduplication — the LLM-training-pipeline operators
  * (SURVEY §2 #21-24), generalizing the reference's key-based dedup
  * (finanalyzer sql/redundancy.sql) to content-based near-dup
  * detection.
  *
  * Scale design: every variant is candidate-generation (banding /
  * pigeonhole chunks / prefix filtering — near-linear shuffles on
  * derived keys) followed by exact verification ONLY on candidates.
  * Nothing here is all-pairs; at 100 TB the candidate sets stay
  * proportional to the true duplicate count, and the verify joins
  * are hash joins on doc ids.
  *
  * All hashing is md5-based (engine-parity, SURVEY §5).
  */
object Dedup {

  /** Training-set decontamination: flag every TRAIN document that
    * shares at least one w-token shingle with the EVAL set — the
    * benchmark-leakage sweep every LLM data pipeline runs before
    * training. Output is (contaminated doc, #distinct shared
    * shingles); docs shorter than w tokens have no shingles and
    * cannot be flagged.
    *
    * Scale shape: eval sets are benchmark-sized (≪ corpus), so the
    * distinct eval-shingle set BROADCASTS and the train side is one
    * scan + shingle explode + map-side-combined count; nothing
    * corpus-sized crosses a shuffle except the contaminated doc ids.
    * The token array is projected before [[shinglesOf]] (the HOF
    * lambda-inlining rule — re-splitting the doc per offset is
    * O(n²)).
    */
  def decontaminate(documents: DataFrame, evalSource: String = "src0", w: Int = 8): DataFrame = {
    val sh = documents
      .select(col("doc_id"), col("source"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("source"),
        explode(array_distinct(shinglesOf(col("toks"), w))).as("shingle"))
    val evalSh = sh.filter(col("source") === evalSource).select(col("shingle")).distinct()
    sh.filter(col("source") =!= evalSource)
      .join(broadcast(evalSh), "shingle")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("shingle")).as("n_shared"))
      .orderBy(col("doc_id"))
  }

  /** Passage-level exact dedup: chunk every doc into NON-overlapping
    * `w`-token passages (trailing partial chunk dropped — both
    * engines agree on ⌊n/w⌋ full chunks), hash each, and report
    * passages occurring more than once with doc/occurrence counts and
    * the canonical first location. This is the chunk-granularity
    * dedup sweep LLM pipelines run between document-level exact dedup
    * and shingle near-dup: it catches boilerplate shared across
    * otherwise-distinct documents. One hash-partitioned aggregation
    * over (passage hash) — no sort, no all-pairs anything; the
    * explode fans out ~n/w rows per doc on the scan side.
    */
  def passages(documents: DataFrame, w: Int = 20): DataFrame = {
    val parallelism = documents.sparkSession.sparkContext.defaultParallelism
    val chunks = documents.repartition(parallelism, col("doc_id"))
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      // guard: sequence(0, -1) DESCENDS in Spark, it is not empty —
      // short docs must map to an explicit empty array
      .select(col("doc_id"), posexplode(
        when(size(col("toks")) >= w,
          transform(sequence(lit(0), (size(col("toks")) / w).cast("int") - 1),
            i => concat_ws(" ", slice(col("toks"), i * w + 1, lit(w)))))
          .otherwise(array().cast("array<string>"))).as(Seq("chunk_idx", "passage")))
    chunks
      .groupBy(md5(col("passage")).as("passage_hash"))
      // lexicographic (doc_id, chunk_idx) min PACKED as one decimal:
      // min over a struct is not a mutable agg-buffer type, so the
      // struct form planned a SortAggregate — a full sort of the
      // exploded per-window frame (n·tokens/w rows) where everything
      // else here is hash-based. doc_id is a nonnegative long (≤ 19
      // digits) and chunk_idx a posexplode int (< 2³¹ < 10¹⁰), so
      // doc_id·10¹⁰ + chunk_idx fits decimal(29,0), orders exactly
      // like the struct, and decimal min IS hash-aggregable.
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occurrences"),
        min(col("doc_id").cast(org.apache.spark.sql.types.DecimalType(38, 0))
          * lit(10000000000L) + col("chunk_idx")).as("firstp"))
      .filter(col("n_occurrences") >= 2)
      // pmod-based unpack: DIV/% truncate toward zero, which
      // mis-decodes a NEGATIVE doc_id (-1 packs order-correctly but
      // would unpack as (0, -9999999995)); floor-division via pmod is
      // total — identical to DIV/% for the nonnegative ids the gate
      // corpus carries, correct for any future hashed/negative source
      // (pinned by DedupSpec's negative-id decode test).
      .select(col("passage_hash"), col("n_docs"), col("n_occurrences"),
        expr("CAST((firstp - pmod(firstp, 10000000000)) DIV 10000000000 AS BIGINT)").as("first_doc"),
        expr("CAST(pmod(firstp, 10000000000) AS BIGINT)").as("first_chunk"))
      .orderBy(col("passage_hash"))
  }

  /** OVERLAPPING-window repeated-substring sweep — the alignment-
    * robust strengthening of [[passages]] (the move of Lee et al.
    * 2021's exact-substring dedup, windowed): non-overlapping chunks
    * miss a shared w-token sequence whenever it straddles a chunk
    * boundary or starts at a different offset in each doc; sliding
    * windows at `stride` catch it at any alignment within stride−1
    * tokens (stride = 1 is exact; the default trades 5× fewer rows
    * for a ≤ 4-token alignment slack). Same scale shape as passages —
    * one hash-partitioned aggregation over window hashes, explode
    * fans ~n/stride rows per doc, no sort, no pairs.
    *
    * INTRA-DOC self-matches: unlike chunk-aligned [[passages]],
    * overlapping windows of ONE periodic document (a token run of
    * length ≥ w + stride, e.g. "x x x …") are textually identical at
    * consecutive strides, so a hit can read n_occurrences ≥ 2 with
    * n_docs = 1 — repetition INSIDE a doc, not duplication across
    * docs. That is a real signal (it is exactly what
    * [[graft.operators.TextOps.repetition]] flags), but a
    * CROSS-DOCUMENT dedup consumer must gate on `minDocs = 2`
    * (advisor round 14); the default keeps both classes visible like
    * passages' n_occurrences contract.
    */
  def substrings(documents: DataFrame, w: Int = 20, stride: Int = 5,
                 minDocs: Int = 1): DataFrame = {
    val parallelism = documents.sparkSession.sparkContext.defaultParallelism
    val wins = documents.repartition(parallelism, col("doc_id"))
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), posexplode(
        when(size(col("toks")) >= w,
          transform(sequence(lit(0), ((size(col("toks")) - w) / stride).cast("int")),
            i => concat_ws(" ", slice(col("toks"), i * stride + 1, lit(w)))))
          .otherwise(array().cast("array<string>"))).as(Seq("win_idx", "win")))
    wins
      .groupBy(md5(col("win")).as("window_hash"))
      // packed lexicographic min — the [[passages]] decimal trick
      // (hash-aggregable; the struct form sort-aggregated the
      // n/stride-per-doc exploded window frame)
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occurrences"),
        min(col("doc_id").cast(org.apache.spark.sql.types.DecimalType(38, 0))
          * lit(10000000000L) + col("win_idx")).as("firstp"))
      .filter(col("n_occurrences") >= 2 && col("n_docs") >= minDocs)
      // pmod unpack — negative-doc_id-safe, see [[passages]]
      .select(col("window_hash"), col("n_docs"), col("n_occurrences"),
        expr("CAST((firstp - pmod(firstp, 10000000000)) DIV 10000000000 AS BIGINT)").as("first_doc"),
        expr("CAST(pmod(firstp, 10000000000) AS BIGINT)").as("first_win"))
      .orderBy(col("window_hash"))
  }

  /** Exact dedup groups: md5(text) → keeper = min(doc_id), group
    * size. One hash-partitioned aggregation; no sort.
    */
  def exact(documents: DataFrame): DataFrame =
    documents.groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
      .orderBy(col("text_hash"))

  /** Distinct w-token shingles, one row per (doc_id, shingle).
    *
    * Dedup within a doc is `array_distinct` BEFORE the explode — a
    * per-row operation, not a 260M-row global `distinct()` shuffle.
    * The repartition on doc_id (a) parallelizes the explode even when
    * the scan yields few input splits, and (b) establishes the hash
    * partitioning that every downstream groupBy(doc_id) /
    * Window(doc_id) in the sketch pipelines reuses shuffle-free —
    * text moves once, pre-explosion, at ~1/5 the shingle volume.
    */
  private def shingleRows(documents: DataFrame, w: Int): DataFrame = {
    // Explicit partition count: hashing/shingling is CPU-bound on
    // narrow rows, and AQE's byte-based coalescing would shrink a
    // small-byte shuffle to ~1 partition and serialize it. A
    // user-numbered repartition is exempt from AQE coalescing.
    val parallelism = documents.sparkSession.sparkContext.defaultParallelism
    documents.repartition(parallelism, col("doc_id"))
      // tokens projected into its own column so the shingle lambda
      // references an attribute (inline, the regex split would rerun
      // once per shingle offset — O(n²) per doc).
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(array_distinct(shinglesOf(col("toks"), w))).as("s"))
  }

  /** Batch reconciliation for STREAMING near-dup candidates: exact
    * shingle-set Jaccard over the flagged (a, b) pairs only — the
    * closing step of the streaming pipeline, whose bucket-keyed state
    * can do sketch-level verification but not exact set intersection
    * ([[graft.streaming.DedupStream.nearDupCandidates]]). Work is
    * proportional to the candidate count, never the corpus pair
    * count: the shingle sets of referenced docs join in by id.
    */
  def verifyPairs(documents: DataFrame, pairs: DataFrame,
                  threshold: Double = 0.8, w: Int = 3): DataFrame =
    verifyJaccard(pairs.select(col("a"), col("b")).distinct(),
      shingleRows(documents, w).honestCheckpoint(), threshold)

  /** Exact Jaccard verification of candidate (a, b) pairs against the
    * full shingle sets; emits pairs with round(j, 6) ≥ threshold.
    *
    * Count-based, NOT set-shipping: a collect_set verify would
    * materialize every candidate doc's whole shingle set into one
    * array row and replicate it per candidate pair — row width
    * unbounded, so one 10 MB document becomes a skew amplifier at
    * 100 TB. Instead the candidate pairs join to the NARROW
    * (doc_id, shingle) rows: shingles of `a` fan out per pair, the
    * (b, s) equi-join keeps exactly the shared shingles, and a
    * count per pair is the intersection size. Every shuffled row is
    * a few dozen bytes regardless of document size; total work stays
    * candidate-bounded (the LSH / pigeonhole / prefix-filter
    * guarantee). Union sizes come from per-doc shingle counts.
    */
  private def verifyJaccard(cands: DataFrame, sh: DataFrame, threshold: Double): DataFrame = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    // LEFT joins throughout (not an inner join + re-join of cands,
    // which would reference the candidate frame twice — unresolvable
    // on streaming memory-sink plans) so a disjoint pair still
    // aggregates to inter=0 and gets its J=0 verdict (verifyPairs is
    // called with threshold 0 by the streaming reconciliation tests).
    // That includes the SIZE joins: a candidate doc with < w tokens
    // has zero shingles and no sizes row, so an inner join would
    // silently drop the pair instead of scoring it — left join +
    // coalesce(n, 0) keeps it, and J is defined 0 when the union is
    // empty. Join strategy is left to size statistics: at bench SF
    // the checkpointed shingle frame's stats are small, so it rides
    // the BUILD side of BroadcastHashJoins (no shuffle at all); at
    // corpus scale the stats grow past the broadcast threshold and
    // the same plan degrades to shuffled equi-joins — linear either
    // way, and never a nested-loop (DedupPlanSpec pins both the
    // bench-SF broadcast shape and the equi-join-only guarantee). An
    // explicit candidate-id semi-prune of sh was measured SLOWER at
    // bench SF (two extra materialization jobs) — revisit only if a
    // profile shows the (b, s) join shuffling at scale.
    scoredPairCounts(cands, sh, sizes)
      .withColumn("jaccard",
        when(col("na") + col("nb") - col("inter") === 0, lit(0.0))
          .otherwise(round(col("inter").cast("double")
            / (col("na") + col("nb") - col("inter")), 6) + lit(0.0)))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
      .orderBy(col("a"), col("b"))
  }

  /** The shared count-based pair-intersection core behind
    * [[verifyJaccard]] and [[containment]]'s verify: candidate
    * (a, b) pairs → (a, b, inter, na, nb) via the narrow-row
    * shingle joins described above. Scoring (Jaccard vs overlap
    * coefficient) stays at the call site; the join/agg machinery and
    * its left-join/coalesce conventions live in exactly one place.
    */
  private def scoredPairCounts(cands: DataFrame, sh: DataFrame,
                               sizes: DataFrame): DataFrame =
    cands
      .join(sh.select(col("doc_id").as("a"), col("s")), Seq("a"), "left")
      .join(sh.select(col("doc_id").as("b2"), col("s").as("s2")),
        col("b") === col("b2") && col("s") === col("s2"), "left")
      .groupBy(col("a"), col("b"))
      .agg(sum(when(col("s2").isNotNull, 1L).otherwise(0L)).as("inter"))
      .join(sizes.select(col("doc_id").as("a"), col("n").as("na")), Seq("a"), "left")
      .join(sizes.select(col("doc_id").as("b"), col("n").as("nb")), Seq("b"), "left")
      .withColumn("na", coalesce(col("na"), lit(0L)))
      .withColumn("nb", coalesce(col("nb"), lit(0L)))

  /** MinHash + LSH near-dup pairs (w=3 shingles, 32 permutations,
    * 16 bands × 2 rows, exact-Jaccard verify ≥ 0.8).
    *
    * Miss probability for a true pair at j = 0.8 is (1−j²)¹⁶ ≈ 9e−8,
    * so the verified output equals the brute-force answer (the test
    * suite asserts this); the oracle is the brute-force all-pairs
    * query.
    */
  def minhashLsh(documents: DataFrame, numHashes: Int = 32, bands: Int = 16,
                 threshold: Double = 0.8): DataFrame = {
    val rows = numHashes / bands
    // The shingle frame feeds the signature aggregation AND three
    // verify-stage references (both candidate sides + per-doc sizes);
    // materializing it once (eager localCheckpoint, ContextCleaner-
    // freed, MEMORY_AND_DISK so 100 TB spills rather than OOMs) turns
    // four corpus tokenize+explode scans into one.
    val sh = shingleRows(documents, 3).honestCheckpoint()
    // Signatures are internal (the oracle is the brute-force Jaccard
    // answer, not the sketch), so use codegen'd seeded xxhash64 —
    // hᵢ = xxhash64(i, s) — instead of 32 md5 rounds per shingle.
    // No arithmetic derivation: wrapping long math would trip ANSI
    // overflow checks (Spark 4 default), and xxhash64 with a literal
    // seed column is just as cheap inside whole-stage codegen.
    def hi(i: Int): Column = xxhash64(lit(i), col("s"))
    val sigs = sh.groupBy(col("doc_id")).agg(
      min(hi(0)).as("h0"),
      (1 until numHashes).map(i => min(hi(i)).as(s"h$i")): _*)
      // One row per doc (32 longs). The banded frame feeds BOTH sides
      // of the candidate self-join; without materializing, each side
      // recomputes the 32-min signature aggregation from the shingle
      // blocks (round-6 plan audit: 12 RDD-block reads).
      .honestCheckpoint()
    val bandCols = (0 until bands).map { j =>
      struct(lit(j).as("band_id"),
        xxhash64((0 until rows).map(r => col(s"h${j * rows + r}")): _*).as("bh"))
    }
    val banded = sigs.select(col("doc_id"), explode(array(bandCols: _*)).as("band"))
      .select(col("doc_id"), col("band.band_id"), col("band.bh"))
    val cands = banded.as("x").join(banded.as("y"),
        col("x.band_id") === col("y.band_id") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")).distinct()
    verifyJaccard(cands, sh, threshold)
  }

  /** SimHash near-dup pairs: 60-bit signature over w=3 shingles,
    * candidate generation by pigeonhole chunking, exact Hamming
    * verify.
    *
    * Default budget is Hamming ≤ 3 → 4 chunks of 15 bits (the
    * classic Manku-et-al configuration): each chunk key carries 15
    * bits, so random-signature collisions are ~2⁻¹⁵ per chunk and
    * the candidate join stays linear in the true near-dup count.
    * (A loose budget like ≤ 8 forces 9 chunks of only 6-7 bits —
    * 1/64-selective buckets whose candidate set grows ~N²/64: fine
    * on thousands of docs, catastrophic at 100 TB.)
    */
  def simhash(documents: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sh = shingleRows(documents, 3)
    val h = sh.select(col("doc_id"), hex60(col("s")).as("h"))
    // Per-bit balance: +1 when bit set, −1 otherwise, summed per doc.
    val bitSums = (0 until 60).map(i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$i"))
    val sig = h.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 60).map(i => when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(0L))
          .reduce(_.bitwiseOR(_)).as("sig"))
      // One row per doc (16 bytes) — materialize before the pigeonhole
      // self-join. Inline, both join sides replay the full
      // shingle→hash→60-bit-sum chain (one under a BroadcastExchange,
      // so ReuseExchange can't fire — round-6 plan audit: two complete
      // tokenize chains). Checkpointing makes the corpus scan run ONCE.
      .honestCheckpoint()
    // Pigeonhole: split 60 bits into maxHamming+1 chunks; any pair
    // within the Hamming budget must agree on at least one chunk.
    val nChunks = maxHamming + 1
    val bounds = (0 to nChunks).map(c => c * 60 / nChunks)
    val chunkCols = (0 until nChunks).map { c =>
      val off = bounds(c); val width = bounds(c + 1) - bounds(c)
      struct(lit(c).as("chunk_id"),
        shiftright(col("sig"), off).bitwiseAND((1L << width) - 1).as("cv"))
    }
    val chunked = sig.select(col("doc_id"), col("sig"), explode(array(chunkCols: _*)).as("ch"))
      .select(col("doc_id"), col("sig"), col("ch.chunk_id"), col("ch.cv"))
    chunked.as("x").join(chunked.as("y"),
        col("x.chunk_id") === col("y.chunk_id") && col("x.cv") === col("y.cv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        bit_count(col("x.sig").bitwiseXOR(col("y.sig"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("a"), col("b"))
  }

  /** Duplicate-cluster resolution: connected components over the
    * near-dup pair graph by min-label propagation, so every doc in a
    * transitive dup cluster maps to one canonical keeper (the min
    * doc_id). This is the step that turns pairwise dedup output into
    * an actionable keep/drop list.
    *
    * Distributed CC the standard way: labels start as node ids; each
    * round every node takes the min label among itself and its
    * neighbors; converged when nothing changes. Rounds = component
    * diameter — tiny for dup clusters (pairs are near-cliques), so
    * the loop is 2-3 shuffle rounds of |E| rows. The driver only
    * ever sees one change-count per round, never data.
    */
  def components(documents: DataFrame, threshold: Double = 0.8): DataFrame =
    componentsFromPairs(minhashLsh(documents, threshold = threshold))

  /** Connected components over an explicit near-dup pair frame
    * (columns `a`, `b`) — the reusable second stage of [[components]],
    * so a pipeline that already materialized its candidate pairs (or
    * wants SimHash/PPJoin pairs instead of MinHash) doesn't re-run
    * candidate generation to cluster them.
    *
    * Job-count design: label propagation runs TWO rounds per
    * materialized job, and the convergence check reads only the
    * second round's change flag. Dup clusters are near-cliques
    * (diameter ≤ 2 is the overwhelming case: every member collides
    * with the keeper), so round 1 reaches the fixpoint and round 2
    * proves it — the whole loop is typically ONE cluster job, where
    * the round-per-job version paid 2-3 sequential cache+count jobs
    * of fixed scheduler latency each (the round-5 bench-gate spike).
    * Longer chains still converge: the loop keeps double-stepping
    * until a quiet round.
    */
  def componentsFromPairs(pairs: DataFrame): DataFrame = {
    val p = pairs.select(col("a"), col("b"))
    val edges = p.unionByName(p.select(col("b").as("a"), col("a").as("b"))).cache()
    def propagate(labels: DataFrame): DataFrame = {
      val viaNeighbors = labels.join(edges, col("node") === col("a"))
        .groupBy(col("b")).agg(min(col("comp")).as("ncomp"))
        .select(col("b").as("node"), col("ncomp"))
      // Carry the previous label through the update so the
      // convergence check is a filter over the cached frame, not a
      // second labels⋈next join per round.
      labels.select(col("node"), col("comp")).join(viaNeighbors, Seq("node"), "left")
        .select(col("node"), col("comp").as("prev"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"))
    }
    var labels = edges.select(col("a").as("node")).distinct()
      .select(col("node"), col("node").as("comp"))
    var cached: DataFrame = null
    var changed = 1L
    while (changed > 0) {
      val next = propagate(propagate(labels)).cache()
      changed = next.filter(col("comp") =!= col("prev")).count()
      if (cached != null) cached.unpersist()
      cached = next
      labels = next.select(col("node"), col("comp"))
    }
    edges.unpersist()
    // Hand back a lineage-free frame and release the loop cache: the
    // shared CacheManager is keyed by plan and never auto-evicts, so
    // leaving the final label frame cached would accumulate one
    // corpus-sized cache entry per components() call in a session.
    // localCheckpoint blocks are ContextCleaner-managed — freed once
    // the returned frame is unreferenced.
    val out = labels.honestCheckpoint()
    cached.unpersist()
    out.orderBy(col("node"))
  }

  /** Apply the near-dup verdicts to the corpus — the step that turns
    * [[components]]' cluster labels into the deduplicated dataset:
    * every doc maps to its cluster's canonical keeper (min doc_id),
    * docs outside any cluster keep themselves, and `kept` marks the
    * rows that survive. Component labels are cluster-sized (≪
    * corpus), so both the label join and the keeper join ride
    * hash(doc_id)-style equi-joins with broadcastable right sides at
    * any scale where dup clusters are sparse.
    */
  def applyDedup(documents: DataFrame, threshold: Double = 0.8): DataFrame =
    applyDedupWith(documents, components(documents, threshold))

  /** [[applyDedup]] with PRECOMPUTED cluster labels — the overload a
    * pipeline uses when it already ran [[components]] (keep/drop
    * lists and cluster reports come from the same labels; re-running
    * the LSH candidate chain to apply verdicts it already computed
    * doubles the most expensive stage of the whole dedup family).
    * Only the two label-sized joins remain here.
    */
  def applyDedupWith(documents: DataFrame, comps: DataFrame): DataFrame =
    labelCore(documents, comps).orderBy(col("doc_id"))

  /** The unsorted verdict labels behind [[applyDedupWith]] — reused
    * by [[writeCurated]], whose bucketed write clusters by keeper_id
    * and would waste the presentation sort.
    */
  private def labelCore(documents: DataFrame, comps: DataFrame): DataFrame = {
    val keepers = comps.groupBy(col("comp")).agg(min(col("node")).as("keeper"))
    documents.select(col("doc_id"))
      .join(comps.select(col("node").as("doc_id"), col("comp")), Seq("doc_id"), "left")
      .join(keepers, Seq("comp"), "left")
      .select(col("doc_id"),
        coalesce(col("keeper"), col("doc_id")).as("keeper_id"),
        (coalesce(col("keeper"), col("doc_id")) === col("doc_id")).as("kept"))
  }

  /** Write the dedup verdicts joined back onto the full document
    * rows as a BUCKETED table keyed on keeper_id — "write the
    * pipeline output the way the next job wants to read it". Every
    * downstream per-cluster pass (cluster reports, keeper rollups,
    * per-cluster quality stats, the keeper⋈member self-join) then
    * scans pre-hash-partitioned storage and plans with ZERO
    * exchanges; at 100 TB that deletes a full corpus shuffle from
    * every consumer of the curated output. Labels come precomputed
    * (the [[applyDedupWith]] contract — never re-run the LSH chain
    * to apply verdicts it already produced); the payload join is a
    * plain doc_id equi-join with a label-sized right side.
    */
  def writeCurated(documents: DataFrame, comps: DataFrame,
                   table: String, buckets: Int = 16): Unit =
    graft.sources.Bucketed.write(
      documents.join(labelCore(documents, comps), Seq("doc_id")),
      table, "keeper_id", buckets)

  /** Exact n-gram (w=4) Jaccard self-join with prefix filtering:
    * order shingles by global frequency (rarest first), keep only the
    * first n − ⌈t·n⌉ + 1 per doc as join keys — any pair with
    * J ≥ t must collide on a prefix element (PPJoin bound), so the
    * output is exactly the all-pairs answer without the all-pairs
    * join.
    */
  def ngramJaccard(documents: DataFrame, threshold: Double = 0.5): DataFrame = {
    // w=4: a 4-token shingle space keeps bucket sizes near-uniform
    // even on a tiny vocabulary, so the prefix-filter join stays
    // near-linear (w=2 on a 40-word vocab put hundreds of docs in
    // every bucket → a quadratic candidate join).
    // Five consumers (freq, the ranked join, and three verify-stage
    // references) — one materialized scan, same rationale as
    // [[minhashLsh]].
    val sh = shingleRows(documents, 4).honestCheckpoint()
    // Prefix ordering only has to be SOME consistent total order —
    // the PPJoin bound holds for any — so exact global counts are
    // only needed where they differ from 1. The repeated-shingle
    // table (count ≥ 2) is bounded by the duplicate mass, not the
    // corpus: broadcast it and default unseen shingles to f=1. This
    // keeps sh's doc_id partitioning intact straight into the
    // row_number window (no shuffle on s for the corpus side).
    val freq = sh.groupBy(col("s")).agg(count(lit(1)).as("f")).filter(col("f") >= 2)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("f"), col("s"))
    val ranked = sh.join(freq, Seq("s"), "left")
      .withColumn("f", coalesce(col("f"), lit(1L)))
      .withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))))
    // ceil over a double product can over-round (0.8*5 =
    // 4.0000000000000002 → ceil 5) and shorten the prefix below the
    // PPJoin bound, silently dropping true pairs. Subtracting an ulp
    // margin before ceil only ever LENGTHENS the prefix — safe.
    val prefix = ranked.filter(
      col("rk") <= col("n") - ceil(lit(threshold) * col("n") - lit(1e-9)) + 1)
      // Prefix rows are a (1−t) fraction of the shingle frame, narrow
      // (s, doc_id, f, rk, n). Both self-join sides consume it;
      // without materializing, each replays the broadcast-freq join +
      // ranking window (round-6 plan audit: 16 block reads).
      .honestCheckpoint()
    val cands = prefix.as("x").join(prefix.as("y"),
        col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")).distinct()
    verifyJaccard(cands, sh, threshold)
  }

  /** Asymmetric containment pairs: overlap coefficient
    * C = |A∩B| / min(|A|,|B|) ≥ threshold over w=4 shingle sets —
    * the quote-inclusion detector. A short document pasted inside a
    * long one scores C ≈ 1 but Jaccard ≈ |A|/|B| ≈ 0, so the
    * symmetric near-dup passes ([[ngramJaccard]], [[minhashLsh]])
    * structurally cannot see it; containment is the standard
    * companion pass in web-scale dedup.
    *
    * Candidate generation is the ONE-SIDED prefix filter: order
    * shingles rarest-first (same broadcast-freq ranking as
    * [[ngramJaccard]]), keep the first n − ⌈t·n⌉ + 1 per doc, and
    * join that prefix against the FULL inverted index restricted to
    * docs at least as large. Completeness: with |A| ≤ |B|, C ≥ t
    * needs ≥ ⌈t·|A|⌉ shared shingles; if none sat in A's prefix the
    * intersection would fit in the remaining ⌈t·|A|⌉ − 1 slots —
    * contradiction, so the prefix of the SMALLER side always hits
    * the intersection. (Probing the full index, not prefix×prefix,
    * is what the asymmetric bound costs: a one-sided filter is
    * inherent to containment, which is why this stays a separate
    * operator instead of a threshold knob on ngramJaccard.)
    * Candidate volume stays near-linear because the prefix holds the
    * doc's globally RAREST shingles — small inverted-index buckets —
    * and the size constraint (nx ≤ ny) halves the probe space.
    * Verification is the same count-based narrow-row join as
    * [[verifyJaccard]], scored as inter/min instead of inter/union.
    */
  def containment(documents: DataFrame, threshold: Double = 0.8): DataFrame = {
    val sh = shingleRows(documents, 4).honestCheckpoint()
    val freq = sh.groupBy(col("s")).agg(count(lit(1)).as("f")).filter(col("f") >= 2)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("f"), col("s"))
    val ranked = sh.join(freq, Seq("s"), "left")
      .withColumn("f", coalesce(col("f"), lit(1L)))
      .withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))))
      .honestCheckpoint()
    // Same ulp-guarded ceil as ngramJaccard: the margin only ever
    // lengthens the prefix, never shortens it below the bound.
    val prefix = ranked.filter(
      col("rk") <= col("n") - ceil(lit(threshold) * col("n") - lit(1e-9)) + 1)
    // Probe side x = the prefix (smaller-or-equal doc), index side y =
    // ALL shingle rows of docs with ny ≥ nx. Ties in n keep both
    // orientations eligible; least/greatest + distinct collapses them.
    val cands = prefix.as("x").join(ranked.as("y"),
        col("x.s") === col("y.s") && col("x.doc_id") =!= col("y.doc_id") &&
          col("x.n") <= col("y.n"))
      .select(least(col("x.doc_id"), col("y.doc_id")).as("a"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("b"))
      .distinct()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    scoredPairCounts(cands, sh, sizes)
      .withColumn("containment",
        round(col("inter").cast("double") / least(col("na"), col("nb")), 6) + lit(0.0))
      .filter(col("containment") >= threshold)
      .select(col("a"), col("b"), col("containment"))
      .orderBy(col("a"), col("b"))
  }
}
