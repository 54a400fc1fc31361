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
    * so no query may emit a raw DECIMAL column. Emit the value as a
    * double instead, rounded AT THE DECIMAL'S OWN SCALE — a no-op on
    * the value (there are no digits past scale `s` to round, so no
    * engine can disagree at a half boundary) that exists only to pin
    * the double through each engine's round(), with −0.0 normalized
    * by the `+ 0.0`. Oracle mirror: `round(CAST(x AS DOUBLE), s) + 0.0`.
    */
  def outD(c: Column, s: Int): Column = round(c.cast("double"), s) + lit(0.0)
}
