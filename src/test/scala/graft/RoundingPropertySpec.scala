package graft

import org.scalatest.funsuite.AnyFunSuite

/** The tie-exact rounding scheme used by every exact-quotient metric
  * (SURVEY §5): (2·a·10⁶ + b) DIV (2·b) must equal HALF_UP rounding
  * of a/b at 6 decimals for ALL non-negative integer inputs —
  * including the power-of-two denominators whose binary-exact ties
  * split engines under double round() (the fin_vwap bug class).
  */
class RoundingPropertySpec extends AnyFunSuite {

  private def intHalfUp(a: Long, b: Long): Long = (2 * a * 1000000L + b) / (2 * b)

  private def bigDecimalHalfUp(a: Long, b: Long): Long =
    ((BigDecimal(a) / BigDecimal(b)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      * BigDecimal(1000000)).toLongExact

  test("integer half-up equals BigDecimal HALF_UP on random non-negative quotients") {
    val rng = new scala.util.Random(20260813L)
    for (_ <- 1 to 100000) {
      val a = math.abs(rng.nextLong()) % 4000000000L
      val b = 1L + math.abs(rng.nextLong()) % 100000L
      assert(intHalfUp(a, b) === bigDecimalHalfUp(a, b), s"a=$a b=$b")
    }
  }

  test("power-of-two denominators (the engine-splitting tie class) are exact") {
    // a/128 with odd a has exactly 7 fractional digits ending in 5 —
    // the true tie double round() can't resolve portably
    for (k <- 0 to 20; a <- Seq(1L, 127L, 129L, 999999L, 12345677L)) {
      val b = 1L << k
      assert(intHalfUp(a, b) === bigDecimalHalfUp(a, b), s"a=$a b=$b")
    }
  }

  test("the documented overflow bound holds below 4.6e12 numerators") {
    val a = 4600000000000L - 1
    assert(2 * a * 1000000L > 0, "no Long overflow at the documented bound")
    assert(intHalfUp(a, 1L) === bigDecimalHalfUp(a, 1L))
  }
}
