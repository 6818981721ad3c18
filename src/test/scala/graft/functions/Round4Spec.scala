package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Round4.halfUp]] bit-identical to the BigDecimal formulation it
  * replaced in every block kernel and codebook reference object (r20):
  * `BigDecimal.valueOf(x).setScale(4, HALF_UP).doubleValue()` with
  * NaN/Inf passing through. The fast path's soundness window (fall back
  * within 4·ulp+1e-12 of a half-integer boundary of x·1e4) is exercised
  * with adversarially constructed boundary values, not just random
  * sweeps.
  */
class Round4Spec extends AnyFunSuite {

  private def reference(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  private def check(x: Double): Unit = {
    val fast = Round4.halfUp(x)
    val slow = reference(x)
    assert(java.lang.Double.doubleToRawLongBits(fast) ==
      java.lang.Double.doubleToRawLongBits(slow) ||
      (fast.isNaN && slow.isNaN),
      s"halfUp($x) = $fast, BigDecimal = $slow")
  }

  test("NaN and infinities pass through") {
    assert(Round4.halfUp(Double.NaN).isNaN)
    assert(Round4.halfUp(Double.PositiveInfinity).isPosInfinity)
    assert(Round4.halfUp(Double.NegativeInfinity).isNegInfinity)
  }

  test("signed zero and tiny magnitudes normalize to +0.0") {
    Seq(0.0, -0.0, 1e-300, -1e-300, Double.MinPositiveValue,
      -Double.MinPositiveValue, 4.9e-5, -4.9e-5).foreach(check)
    // BigDecimal yields an unsigned zero; the fast path must too
    assert(java.lang.Double.doubleToRawLongBits(Round4.halfUp(-1e-9)) ==
      java.lang.Double.doubleToRawLongBits(0.0))
  }

  test("adversarial half-integer boundaries at every scale") {
    // values whose x·1e4 sits ON or within ulps of m + 0.5 — the exact
    // window where naive floor(x·1e4 + 0.5) diverges from the shortest-
    // decimal rounding BigDecimal.valueOf performs
    val ms = Seq(0L, 1L, 3L, 7L, 12L, 999L, 10000L, 123456L, 99999999L,
      123456789012L)
    for (m <- ms; s <- Seq(1, -1)) {
      val base = s * (m + 0.5) / 1e4
      var v = base
      for (_ <- 0 until 6) { check(v); v = Math.nextUp(v) }
      v = base
      for (_ <- 0 until 6) { check(v); v = Math.nextDown(v) }
    }
    // exact 4-decimal lattice points and their neighborhoods
    for (m <- ms; s <- Seq(1, -1)) {
      val base = s * m.toDouble / 1e4
      var v = base
      for (_ <- 0 until 4) { check(v); v = Math.nextUp(v) }
      v = base
      for (_ <- 0 until 4) { check(v); v = Math.nextDown(v) }
    }
  }

  test("large magnitudes (fallback region) and typical kernel ranges") {
    Seq(3.4e9, 3.6e9, 1e12, 3.4e13, 3.6e13, 1e15, 4.4e15, 4.6e15, 1e18,
      -3.6e13, -4.6e15, 1.7e308, -1.7e308).foreach(check)
  }

  test("dense deterministic random sweep matches BigDecimal bit-for-bit") {
    val rnd = new java.util.Random(0xC0FFEE)
    var i = 0
    while (i < 2000000) {
      // cosine-like range, distance-like range, and wide exponents
      check(rnd.nextDouble() * 2 - 1)
      check(rnd.nextDouble() * 2000)
      check(java.lang.Double.longBitsToDouble(rnd.nextLong()) match {
        case d if d.isNaN || d.isInfinite => rnd.nextDouble()
        case d => d
      })
      i += 1
    }
  }
}
