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
  * only, the same legitimate exception as k-means / ridge. (The
  * previous design re-scanned a cached projection once per iteration:
  * correct, but 12 sequential jobs whose fixed latency dominated
  * wall-time; at cluster scale that is scheduler overhead per round.)
  *
  * Determinism: per-cell Σy is an exact DECIMAL(18,6) sum, and the
  * driver folds cells with exact BigDecimal arithmetic — addition of
  * exact decimals is associative/commutative, so split choice and
  * leaf values are independent of both partition order and collect()
  * order (ties broken by (feature, threshold) iteration order).
  * Squared-loss leaf value = shrunk mean residual. Iterative
  * trainer → rows-only gate + GradientBoostSpec.
  */
object GradientBoost {

  /** One threshold stump: x[feature] <= threshold → left else right. */
  final case class Stump(feature: String, threshold: Int, left: Double, right: Double)

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

  /** One histogram cell: the exact 6-dp-quantized Σy and row count of
    * one (hour, dow, month) lattice point, plus the model's running
    * prediction for the cell (updated driver-side per iteration).
    */
  private final class Cell(val hour: Int, val dow: Int, val month: Int,
                           val sy: JBigDecimal, val n: Long) {
    var pred: Double = 0.0
    /** Exact residual mass Σ (y − pred) over the cell's rows. */
    def residualSum: JBigDecimal =
      sy.subtract(new JBigDecimal(pred).multiply(JBigDecimal.valueOf(n)))
  }

  /** Fit the base score F₀ (global mean) and `iters` shrunk stumps. */
  def fit(events: DataFrame, iters: Int = 10, lr: Double = 0.1): (Double, Seq[Stump]) = {
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
        r.getDecimal(3).stripTrailingZeros, r.getLong(4)))
    require(cells.nonEmpty, "gbt: no non-null rows to fit on")

    val totalN = cells.map(_.n).sum
    val totalSy = cells.map(_.sy).reduce(_ add _)
    val base = totalSy.doubleValue() / totalN
    cells.foreach(_.pred = base)

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
      // the cells in exact decimal (collect()-order independent).
      val sByBin: Map[(String, Int), Double] = featureBins.flatMap { case (f, bins) =>
        bins.map { b =>
          val hits = cells.filter(binOf(_, f) == b)
          val s = if (hits.isEmpty) JBigDecimal.ZERO
                  else hits.map(_.residualSum).reduce(_ add _)
          (f, b) -> s.doubleValue()
        }
      }.toMap
      // Best split maximizes S_L²/n_L + S_R²/n_R (the SSE-reduction
      // surrogate for squared loss); deterministic (feature,
      // threshold) iteration order breaks exact ties.
      var best: (Double, Stump) = null
      featureBins.foreach { case (f, bins) =>
        val sTot = bins.map(b => sByBin((f, b))).sum
        val nTot = bins.map(b => nByBin((f, b))).sum
        var sL = 0.0; var nL = 0L
        bins.init.foreach { t =>
          sL += sByBin((f, t)); nL += nByBin((f, t))
          val nR = nTot - nL; val sR = sTot - sL
          if (nL > 0 && nR > 0) {
            val score = sL * sL / nL + sR * sR / nR
            if (best == null || score > best._1) {
              best = (score, Stump(f, t, lr * sL / nL, lr * sR / nR))
            }
          }
        }
      }
      if (best == null) stumpCount = iters // degenerate lattice: stop
      else {
        val st = best._2
        stumps += st
        cells.foreach { c =>
          c.pred += (if (binOf(c, st.feature) <= st.threshold) st.left else st.right)
        }
        stumpCount += 1
      }
    }
    (base, stumps.result())
  }

  /** Evaluate a fitted model as pure Column algebra. */
  private def score(base: Double, stumps: Seq[Stump]): Column =
    stumps.foldLeft(lit(base): Column) { (acc, st) =>
      acc + when(col(st.feature) <= st.threshold, lit(st.left)).otherwise(lit(st.right))
    }

  /** Fit + full-corpus predictions/residuals (one extra scan; the
    * model is plan literals, so inference is shuffle-free).
    */
  def predict(events: DataFrame, iters: Int = 10, lr: Double = 0.1): DataFrame = {
    val (base, stumps) = fit(events, iters, lr)
    featFrame(events)
      .select(col("event_id"), col("y").as("value"),
        (round(score(base, stumps), 6) + lit(0.0)).as("prediction"))
      .withColumn("residual", round(col("value") - col("prediction"), 6) + lit(0.0))
      .orderBy(col("event_id"))
  }
}
