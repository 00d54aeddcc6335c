package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering key — the multi-dimensional layout
  * optimization behind Delta/Iceberg `OPTIMIZE ZORDER BY`: interleaving
  * the bits of two bucketed dimensions gives a 1-d sort key whose
  * contiguous ranges are 2-d-local, so file-level min/max statistics
  * prune a 2-d box query in BOTH dimensions — a linear sort prunes only
  * its leading column (reference behavior: the Delta tables the
  * reference pipeline stores would be OPTIMIZE'd this way at scale;
  * `notebooks/bronze/01_ingest_bronze.py` partitions by one dimension
  * and leaves the second unclustered).
  *
  * The interleave is UNROLLED fixed-width column arithmetic
  * (shift/and/or per bit) — whole-stage-codegen'd, no UDF, no
  * higher-order lambda (the q246/q242 CodegenFallback lesson), and
  * bit-exact in any engine with integer shifts, which is what lets the
  * q366 gate hash-match a DuckDB replay of the same layout.
  */
object ZOrder {

  /** Morton-interleaves two `bits`-bit non-negative bucket columns into
    * a 2·bits-bit z-value: x occupies even bit positions, y odd. Inputs
    * outside [0, 2^bits) fold via masking (callers bucket first —
    * [[bucket]]). */
  def interleave2(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"interleave2: bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      val xi = shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
      val yi = shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
      xi.bitwiseOR(yi)
    }.reduce(_ bitwiseOR _)
  }

  /** Equi-width bucket of `v` into [0, 2^bits) given inclusive domain
    * bounds: integer `(v−lo)·2^bits div (hi−lo+1)`. The Column `/` on
    * longs is DOUBLE division, so the integer quotient is built from the
    * identity `a div b = (a − a mod b) / b` — the adjusted numerator is
    * exactly divisible, and an exact-integer quotient of doubles under
    * 2^53 is IEEE-exact, so the cast back to long is bit-stable and
    * matches any engine's integer division (the oracle uses `//`).
    * Callers must keep `(v−lo)·2^bits` under 2^53. */
  def bucket(v: Column, lo: Column, hi: Column, bits: Int): Column = {
    val num = (v - lo) * lit(1L << bits)
    val den = hi - lo + lit(1L)
    ((num - num % den) / den).cast("long")
  }
}
