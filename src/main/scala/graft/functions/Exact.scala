package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exact-arithmetic helpers.
  *
  * Engine-parity rule (SURVEY §5): aggregating doubles is
  * order-dependent, and Spark's partition order differs from any
  * single-node oracle — so every sum/avg/moment casts to DECIMAL
  * first. Decimal arithmetic is exact integer math, identical on any
  * engine and any partitioning, which also means results are stable
  * when the same query runs on a 1000-executor cluster.
  */
object Exact {
  /** Money/value columns: 2 fractional digits, narrow enough that a
    * three-way product stays under DECIMAL(38).
    */
  def dec2(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Higher-resolution cast for ratios/returns feeding moment sums.
    * Rounds in double first: engines disagree on double→decimal CAST
    * at exact ties (DuckDB's cast is multiply-based and can land on
    * either side), but round() is HALF_UP in both — so round, then
    * cast the already-6-decimal double losslessly.
    */
  def dec6(c: Column): Column = round(c, 6).cast(DecimalType(18, 6))

  /** Order-independent average: exact decimal sum, double division. */
  def avgExact(c: Column): Column = sum(dec2(c)).cast("double") / count(lit(1))

  /** Final-output form for exact-decimal results. Engines render
    * DECIMAL asymmetrically (trailing zeros: `3599.70` vs `3599.7`),
    * so no query may emit a raw DECIMAL column — emit a double.
    *
    * The rounding happens IN DECIMAL SPACE (exact integer math,
    * HALF_UP in every engine — no double can ever sit at a half
    * boundary), and only then casts to double. Order matters at
    * scale: rounding the double instead (round(cast(x AS DOUBLE), s))
    * is only parity-safe while |x|·10^s < 2^53 — DuckDB's double
    * round is a multiply/divide that drifts an ulp past that, and
    * q1-style sums cross it near sf1. After the decimal round the
    * remaining constraint is the decimal→double CAST itself
    * (correctly rounded in both engines), so callers keep
    * |x|·10^s < 2^53 by choosing a coarse output scale (money → 2).
    * `+ 0.0` normalizes −0.0. Oracle mirror:
    * `round(CAST(x AS DOUBLE), s) + 0.0` becomes
    * `CAST(round(x, s) AS DOUBLE) + 0.0` on a decimal x.
    */
  def outD(c: Column, s: Int): Column = round(c, s).cast("double") + lit(0.0)
}
