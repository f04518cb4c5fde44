package graft.ext

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the pure-local sampling arithmetic (no
  * SparkSession — thousands of cases run cheaply).
  */
object SamplingProps extends Properties("Sampling") {

  // full non-negative long range, biased toward the boundaries where
  // FP sqrt rounding could lie: perfect squares ±1 and huge values
  private val genLong: Gen[Long] = Gen.frequency(
    3 -> Gen.choose(0L, 1L << 20),
    3 -> Gen.choose(0L, Long.MaxValue),
    4 -> Gen.choose(0L, 3037000499L).flatMap(r =>
      Gen.choose(-1L, 1L).map(d => (r * r + d).max(0L))))

  property("isqrt is the exact floor square root on any non-negative long") =
    forAll(genLong) { a =>
      val r = Sampling.isqrt(a)
      // r² ≤ a, and (r+1)² > a — guarded against (r+1)² overflow
      r >= 0 && r * r <= a &&
        (r >= 3037000499L || (r + 1) * (r + 1) > a)
    }
}
