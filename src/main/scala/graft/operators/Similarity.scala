package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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

  /** Near-duplicate pairs with exact-cosine ≥ threshold.
    * Two-phase: double-cosine prefilter with a 1e-3 margin (≫ the
    * ~1e-12 double-vs-exact error), then exact decimal verification —
    * output is identical to brute-force exact, at prune-phase cost.
    */
  def embeddingNearDup(embeddings: DataFrame, threshold: Double = 0.45): DataFrame = {
    val e = embeddings.select(col("vec_id"), col("embedding"))
    val pairs = e.select(col("vec_id").as("a"), col("embedding").as("ea"))
      .join(e.select(col("vec_id").as("b"), col("embedding").as("eb")), col("a") < col("b"))
      .filter(cosineFast(col("ea"), col("eb")) >= threshold - 1e-3)
    pairs
      .withColumn("cosine",
        cosineExact(decDot(col("ea"), col("eb")), decNorm2(col("ea")), decNorm2(col("eb"))))
      .filter(col("cosine") >= threshold)
      .select(col("a"), col("b"), col("cosine"))
      .orderBy(col("a"), col("b"))
  }

  /** Exact top-k cosine neighbors for the query set (vec_id ≡ 0 mod
    * 100). Queries broadcast over one corpus scan; ranking uses the
    * exact cosine with vec_id tiebreak so rank order is total.
    */
  def annBruteForce(embeddings: DataFrame, k: Int = 5): DataFrame = {
    val corpus = embeddings.select(col("vec_id"), col("embedding"))
    val queries = corpus.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    // Phase 1: native double cosine over the full scan, per-query
    // top-(k+20) — double vs exact differ < 1e-9, so the true top-k
    // always survives this cut. Phase 2: exact decimal re-rank of
    // the survivors only (the oracle-parity values).
    val wFast = Window.partitionBy(col("query_id")).orderBy(col("fast").desc, col("vec_id"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))
    corpus.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .withColumn("fast", cosineFast(col("qe"), col("embedding")))
      .withColumn("rf", row_number().over(wFast))
      .filter(col("rf") <= k + 20)
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
    * doubles — kilobytes), so they live in plan literals broadcast
    * with the closure; each iteration is ONE scan computing the
    * argmin-distance assignment (k fold expressions, no join, no
    * shuffle) plus one partial-aggregated per-cluster mean (shuffle
    * carries k×dim rows). Init is the first k vectors in
    * md5(vec_id) order — seeded, reproducible anywhere.
    *
    * Iterative and driver-coordinated by nature (like every
    * production k-means) → rows-only gate; the spec asserts
    * determinism and monotone objective.
    */
  def kmeans(embeddings: DataFrame, k: Int = 8, iters: Int = 5): DataFrame = {
    val vecs = embeddings.select(col("vec_id"), col("embedding"))
    // Native codegen kernel — k of these run per row per iteration.
    def l2(centroid: Array[Double]): Column =
      graft.plans.GraftExpressions.l2F64(col("embedding"), lit(centroid))
    def assignTo(centroids: Seq[Array[Double]]): DataFrame = {
      val ds = centroids.indices.map(i => l2(centroids(i).toArray).as(s"d$i"))
      val scored = vecs.select(col("vec_id") +: col("embedding") +: ds: _*)
      // argmin with lowest-cluster tiebreak (same chain shape as langId)
      val cluster = centroids.indices.init.foldRight(lit(centroids.size - 1)) { (i, rest) =>
        when(col(s"d$i") <= (i + 1 until centroids.size).map(j => col(s"d$j")).reduce(least(_, _)), i)
          .otherwise(rest)
      }
      scored.withColumn("cluster", cluster.cast("long"))
        .withColumn("dist", least(centroids.indices.map(i => col(s"d$i")): _*))
    }
    var centroids: Seq[Array[Double]] = vecs
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(k)
      .collect().map(_.getSeq[Float](1).map(_.toDouble).toArray).toSeq
    var assigned = assignTo(centroids)
    for (_ <- 1 to iters) {
      val means = assigned
        .select(col("cluster"), posexplode(col("embedding")).as(Seq("dim", "c")))
        .groupBy(col("cluster"), col("dim"))
        .agg(avg(col("c").cast("double")).as("m"))
        .groupBy(col("cluster"))
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("ms"))
        .select(col("cluster"), col("ms.m").as("centroid"))
        .collect().map(r => r.getLong(0).toInt -> r.getSeq[Double](1).toArray).toMap
      centroids = centroids.indices.map(i => means.getOrElse(i, centroids(i)))
      assigned = assignTo(centroids)
    }
    assigned.select(col("vec_id"), col("cluster"),
        (round(col("dist"), 6) + lit(0.0)).as("dist"))
      .orderBy(col("vec_id"))
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
    * query, then exact top-k re-ranks candidates only. Hyperplanes
    * are seeded-deterministic, so results are reproducible across
    * runs/clusters. For neighbor cosine ~0.5 the 3-plane band
    * matches with p ≈ 0.3, so 8 bands give ~95% recall while
    * scanning ~⅛ of the corpus per band bucket — the
    * sublinear-candidate scale path (vs annBruteForce's full scan,
    * annIvf's cell prune).
    *
    * Approximate by design → no SQL oracle (rows-only gate); the
    * spec asserts recall@k against the exact scan.
    */
  def annLsh(embeddings: DataFrame, k: Int = 5, bands: Int = 8, rowsPerBand: Int = 3,
             dim: Int = 64): DataFrame = {
    val rng = new scala.util.Random(0xA55)
    val planes = Array.fill(bands * rowsPerBand, dim)(rng.nextGaussian())
    def bandSig(vec: Column, b: Int): Column =
      (0 until rowsPerBand).map { r =>
        val h = lit(planes(b * rowsPerBand + r))
        when(aggregate(zip_with(vec, h, (x, y) => x.cast("double") * y),
          lit(0.0), (acc, v) => acc + v) >= 0, 1L << r).otherwise(0L)
      }.reduce(_.bitwiseOR(_))
    def banded(df: DataFrame, idCol: String): DataFrame =
      df.select(col(idCol), col("embedding"),
          explode(array((0 until bands).map(b =>
            struct(lit(b).as("band"), bandSig(col("embedding"), b).as("sig"))): _*)).as("bb"))
        .select(col(idCol), col("embedding"), col("bb.band"), col("bb.sig"))
    val corpus = banded(embeddings.select(col("vec_id"), col("embedding")), "vec_id")
    val queries = banded(
      embeddings.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("query_id"), col("embedding")), "query_id")
      .withColumnRenamed("embedding", "qe")
      .withColumnRenamed("band", "qband").withColumnRenamed("sig", "qsig")
    val cands = corpus.join(broadcast(queries),
        col("band") === col("qband") && col("sig") === col("qsig") &&
          col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("qe"), col("vec_id"), col("embedding")).distinct()
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))
    cands
      .withColumn("cosine",
        cosineExact(decDot(col("qe"), col("embedding")), decNorm2(col("qe")), decNorm2(col("embedding"))))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF-style search: the coarse quantizer assignment is the
    * pre-computed `label` column (in a full IVF build this is the
    * nearest-centroid id); search scans only the query's own cell —
    * the 1/nlist scan-pruning that makes ANN tractable at 100 TB.
    */
  def annIvf(embeddings: DataFrame, k: Int = 5): DataFrame = {
    val corpus = embeddings.select(col("vec_id"), col("embedding"), col("label"))
    val queries = corpus.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("label").as("qlabel"))
    val wFast = Window.partitionBy(col("query_id")).orderBy(col("fast").desc, col("vec_id"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))
    corpus.join(broadcast(queries),
        col("label") === col("qlabel") && col("vec_id") =!= col("query_id"))
      .withColumn("fast", cosineFast(col("qe"), col("embedding")))
      .withColumn("rf", row_number().over(wFast))
      .filter(col("rf") <= k + 20)
      .withColumn("cosine",
        cosineExact(decDot(col("qe"), col("embedding")), decNorm2(col("qe")), decNorm2(col("embedding"))))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("label"), col("vec_id").as("neighbor_id"), col("rank"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }
}
