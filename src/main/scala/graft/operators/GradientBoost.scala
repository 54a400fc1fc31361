package graft.operators

import java.math.{BigDecimal => JBigDecimal}

import graft.functions.Exact._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Histogram gradient-boosted regression stumps — the distributed
  * analog of the reference demo's second model,
  * `HistGradientBoostingRegressor` over ordinal-encoded time features
  * (finanalyzer/regressors/to_review/plot_cyclical_feature_engineering.py:203-214).
  *
  * Scale design — ONE aggregation job for the WHOLE fit: every split
  * feature is a low-cardinality ordinal (hour 24 × dow 7 × month 12),
  * so the full cross-product histogram — per (hour, dow, month) cell,
  * exact Σy and n, ≤ 2016 cells regardless of corpus size — is a
  * COMPLETE sufficient statistic for every boosting iteration: the
  * model's prediction is itself a function of (hour, dow, month)
  * only, so any iteration's per-(feature, bin) residual sum is
  * Σ_cells (Σy − pred(cell)·n), computable on the driver from the
  * cells. The cluster therefore runs a single map-side-combined
  * groupBy scan (a few KB over the shuffle); ALL boosting rounds run
  * driver-side over the collected cell array — model-parameter work
  * only, the same legitimate exception as k-means / ridge.
  *
  * Determinism / oracle replay — the ann_kmeans integer-units
  * technique: per-cell Σy is an exact DECIMAL(18,6) sum carried as
  * 1e-6-unit integers, base score and leaf values are half-up
  * integer divisions onto the SAME 1e-6 grid (lr enters as the exact
  * rational `valueOf(lr)`), and per-cell predictions accumulate as
  * integers — so the entire boosting loop is integer arithmetic,
  * independent of partition and collect() order, and replayable
  * bit-for-bit by an unrolled SQL CTE chain (SparkEntry.gbtOracle).
  * The ONLY doubles are the split scores S_L²/n_L + S_R²/n_R,
  * computed from Long-ranged sums with correctly-rounded casts —
  * identical IEEE ops in any engine; ties break by (feature,
  * threshold) iteration order, which an `ORDER BY score DESC, fidx,
  * thr LIMIT 1` reproduces (first strict max = lowest-ordered
  * tie-winner). A marginal residual sum outside Long (|Σresid| ≥
  * 9.2e12 after the 1e-6 scaling) fails loudly rather than rounding
  * twice — the addExact policy, same as plans/IntegerUnits.
  *
  * Degenerate lattice (no admissible split: a single populated cell)
  * stops the Scala loop early with fewer stumps; the SQL replay does
  * not model that branch — unreachable on any corpus with ≥ 2
  * populated feature bins.
  */
object GradientBoost {

  /** One threshold stump: x[feature] <= threshold → left else right.
    * Leaf deltas in 1e-6 integer units (exact grid values).
    */
  final case class Stump(feature: String, threshold: Int, leftU: Long, rightU: Long) {
    def left: Double = leftU / 1e6
    def right: Double = rightU / 1e6
  }

  /** feature name → ordered candidate bins (inclusive domain). */
  private val featureBins: Seq[(String, Range)] =
    Seq("hour" -> (0 to 23), "dow" -> (0 to 6), "month" -> (1 to 12))

  private def featFrame(events: DataFrame): DataFrame =
    events.filter(col("value").isNotNull).select(
      col("event_id"),
      hour(col("ts")).cast("int").as("hour"),
      (dayofweek(col("ts")) - 1).cast("int").as("dow"),
      month(col("ts")).cast("int").as("month"),
      col("value").cast("double").as("y"))

  /** One histogram cell: the exact Σy of one (hour, dow, month)
    * lattice point in 1e-6 integer units, its row count, and the
    * model's running integer-unit prediction (updated per round).
    */
  private final class Cell(val hour: Int, val dow: Int, val month: Int,
                           val syU: BigInt, val n: Long) {
    var predU: BigInt = BigInt(0)
    /** Exact residual mass Σ (y − pred) over the cell, 1e-6 units. */
    def residualU: BigInt = syU - predU * n
  }

  /** Half-up rounding of the exact rational x/d (d > 0) — the Lloyd
    * sign-split form so `/` only sees nonnegative operands.
    */
  private def divHalfUp(x: BigInt, d: BigInt): BigInt =
    if (x.signum < 0) -(((-x) * 2 + d) / (d * 2)) else (x * 2 + d) / (d * 2)

  private def toLongLoud(x: BigInt, what: String): Long = {
    require(x.isValidLong, s"gbt: $what = $x exceeds the Long exact-replay bound")
    x.toLong
  }

  /** Fit the base score F₀ and `iters` shrunk stumps, all on the
    * 1e-6 integer grid. Returns (baseU, stumps).
    */
  def fitUnits(events: DataFrame, iters: Int = 10, lr: Double = 0.1): (Long, Seq[Stump]) = {
    // lr as an exact rational: valueOf renders the double's shortest
    // decimal (0.1 → 1/10), so lr·S/n is one exact integer division.
    val lrBd = JBigDecimal.valueOf(lr)
    require(lrBd.signum > 0, s"gbt: lr must be positive, got $lr")
    val lrNum =
      if (lrBd.scale >= 0) BigInt(lrBd.unscaledValue)
      else BigInt(lrBd.unscaledValue) * BigInt(10).pow(-lrBd.scale)
    val lrDen = BigInt(10).pow(lrBd.scale max 0)

    // The single cluster job: cross-bin cells of (Σ dec6(y), n).
    // dec6 overflows DECIMAL(18,6) to null for |y| ≥ ~1e12 AFTER the
    // isNotNull filter admitted the row — a silent sum/count mismatch
    // — so out-of-domain values fail loudly instead (same guard as
    // FinAnalytics.moments).
    val guardedY = when(abs(col("y")) < 1e11, dec6(col("y")))
      .otherwise(raise_error(concat(
        lit("gbt: |value| >= 1e11 overflows the exact residual sums: "), col("y"))))
    val cells = featFrame(events)
      .groupBy(col("hour"), col("dow"), col("month"))
      .agg(sum(guardedY).as("sy"), count(lit(1)).as("n"))
      .collect()
      .map(r => new Cell(r.getInt(0), r.getInt(1), r.getInt(2),
        BigInt(r.getDecimal(3).setScale(6).unscaledValue), r.getLong(4)))
    require(cells.nonEmpty, "gbt: no non-null rows to fit on")

    val totalN = cells.map(_.n).sum
    val totalSy = cells.map(_.syU).sum
    val baseU = divHalfUp(totalSy, BigInt(totalN))
    cells.foreach(_.predU = baseU)

    // Bin populations never change across iterations.
    def binOf(c: Cell, f: String): Int = f match {
      case "hour" => c.hour; case "dow" => c.dow; case _ => c.month
    }
    val nByBin: Map[(String, Int), Long] = featureBins.flatMap { case (f, bins) =>
      bins.map(b => (f, b) -> cells.filter(binOf(_, f) == b).map(_.n).sum)
    }.toMap

    val stumps = Seq.newBuilder[Stump]
    var stumpCount = 0
    while (stumpCount < iters) {
      // Marginal residual histograms for this iteration, folded from
      // the cells in exact integer units (collect()-order independent).
      val sByBin: Map[(String, Int), BigInt] = featureBins.flatMap { case (f, bins) =>
        bins.map(b => (f, b) -> cells.filter(binOf(_, f) == b).map(_.residualU).sum)
      }.toMap
      // Best split maximizes S_L²/n_L + S_R²/n_R (the SSE-reduction
      // surrogate for squared loss); scores are doubles built from
      // Long-ranged exact sums (loud on overflow), deterministic
      // (feature, threshold) iteration order breaks exact ties.
      var best: (Double, Stump) = null
      featureBins.foreach { case (f, bins) =>
        val sTot = bins.map(b => sByBin((f, b))).sum
        val nTot = bins.map(b => nByBin((f, b))).sum
        var sL = BigInt(0); var nL = 0L
        bins.init.foreach { t =>
          sL += sByBin((f, t)); nL += nByBin((f, t))
          val nR = nTot - nL; val sR = sTot - sL
          if (nL > 0 && nR > 0) {
            val sLd = toLongLoud(sL, s"S_L($f<=$t)").toDouble
            val sRd = toLongLoud(sR, s"S_R($f<=$t)").toDouble
            val score = sLd * sLd / nL + sRd * sRd / nR
            if (best == null || score > best._1) {
              val leftU = divHalfUp(lrNum * sL, lrDen * nL)
              val rightU = divHalfUp(lrNum * sR, lrDen * nR)
              best = (score, Stump(f, t,
                toLongLoud(leftU, "left leaf"), toLongLoud(rightU, "right leaf")))
            }
          }
        }
      }
      if (best == null) stumpCount = iters // degenerate lattice: stop
      else {
        val st = best._2
        stumps += st
        cells.foreach { c =>
          c.predU += (if (binOf(c, st.feature) <= st.threshold) st.leftU else st.rightU)
        }
        stumpCount += 1
      }
    }
    (toLongLoud(baseU, "base score"), stumps.result())
  }

  /** Double-view convenience over [[fitUnits]] (grid values / 1e6). */
  def fit(events: DataFrame, iters: Int = 10, lr: Double = 0.1): (Double, Seq[Stump]) = {
    val (baseU, stumps) = fitUnits(events, iters, lr)
    (baseU / 1e6, stumps)
  }

  /** Evaluate a fitted model as pure Column algebra — an exact Long
    * fold over the stump deltas, one double division at the end.
    */
  private def scoreU(baseU: Long, stumps: Seq[Stump]): Column =
    stumps.foldLeft(lit(baseU): Column) { (acc, st) =>
      acc + when(col(st.feature) <= st.threshold, lit(st.leftU)).otherwise(lit(st.rightU))
    }

  /** Fit + full-corpus predictions/residuals (one extra scan; the
    * model is plan literals, so inference is shuffle-free).
    */
  def predict(events: DataFrame, iters: Int = 10, lr: Double = 0.1): DataFrame = {
    val (baseU, stumps) = fitUnits(events, iters, lr)
    featFrame(events)
      .select(col("event_id"), col("y").as("value"),
        (scoreU(baseU, stumps).cast("double") / lit(1e6)).as("prediction"))
      .withColumn("residual", round(col("value") - col("prediction"), 6) + lit(0.0))
      .orderBy(col("event_id"))
  }
}
