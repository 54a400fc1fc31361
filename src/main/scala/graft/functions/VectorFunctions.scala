package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Vector algebra over `array<float>` embedding columns.
  *
  * Two tiers (SURVEY §5/§6):
  *  - `cosineFast`: double fold, whole-stage-codegen friendly — the
  *    hot path for candidate pruning at scale. Not engine-portable at
  *    the last ulp, so never used for final thresholding/ranking.
  *  - `decDot`/`decNorm`: exact DECIMAL accumulation (float → 9
  *    fractional digits is lossless enough for parity, and decimal
  *    sums are order-independent) — used for every value that
  *    crosses the oracle boundary.
  */
object VectorFunctions {
  private val Dec8 = DecimalType(14, 8)
  private val DecAcc = DecimalType(30, 16)

  /** float → DECIMAL(14,8), tie-proof: a float times 1e8 is exact in
    * a double (24+27 significand bits < 53), so round(…,8) sees the
    * true value in every engine and HALF_UP agrees; the cast of the
    * already-8-decimal double is then lossless.
    */
  private def dec8(c: Column): Column = round(c.cast("double"), 8).cast(Dec8)

  /** Exact decimal dot product Σ aᵢ·bᵢ — the codegen kernel
    * ([[graft.plans.DecDotF32]]), bit-equal to [[decDotFold]] (the
    * HOF reference the spec pins it against). The fold ran its
    * lambdas interpreted and was re-evaluated by WindowGroupLimit
    * prepasses in every exact re-rank's ranking stage.
    */
  def decDot(a: Column, b: Column): Column =
    graft.plans.IntegerUnits.decDotKernel(a, b)

  /** Exact decimal squared norm Σ aᵢ² (= decDot(a, a)). */
  def decNorm2(a: Column): Column =
    graft.plans.IntegerUnits.decDotKernel(a, a)

  /** Reference HOF implementation of [[decDot]] — kept for the
    * kernel-equivalence spec. The merge result is cast back to the
    * accumulator type (same scale — lossless), which Spark's
    * `aggregate` requires to typecheck.
    */
  def decDotFold(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => dec8(x) * dec8(y)),
      lit(0).cast(DecAcc), (acc, v) => (acc + v).cast(DecAcc))

  /** Reference HOF implementation of [[decNorm2]]. */
  def decNorm2Fold(a: Column): Column =
    aggregate(transform(a, x => dec8(x) * dec8(x)),
      lit(0).cast(DecAcc), (acc, v) => (acc + v).cast(DecAcc))

  /** Engine-parity cosine from precomputed exact moments:
    * round(dot / sqrt(na·nb), 6), −0.0-normalized.
    */
  def cosineExact(dot: Column, na2: Column, nb2: Column): Column =
    round(dot.cast("double") / sqrt(na2.cast("double") * nb2.cast("double")), 6) + lit(0.0)

  /** Fast double-fold cosine for pruning (NOT oracle-safe) — the
    * native codegen kernel.
    */
  def cosineFast(a: Column, b: Column): Column =
    graft.plans.GraftExpressions.cosineF64(a, b)

  /** Reference implementation of [[cosineFast]] via higher-order
    * functions — kept for the equivalence test of the native kernel.
    */
  def cosineFold(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val nb = aggregate(transform(b, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    dot / sqrt(na * nb)
  }
}
