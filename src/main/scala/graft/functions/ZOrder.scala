package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) curve encoding, composed ENTIRELY from built-in
  * shift/mask Column functions — the closed-form bit-spread needs no
  * custom expression, so the whole encode stays inside whole-stage
  * codegen (5 shifts + 5 masks per coordinate, all int64 registers).
  *
  * This is the write-side layout primitive behind multi-dimensional
  * clustering (Delta/Iceberg `OPTIMIZE ZORDER BY`): sort or
  * range-partition by `morton16(qx, qy)` and parquet min/max file
  * stats become effective for range predicates on EITHER dimension —
  * a 2-D query rectangle maps to a small set of covering Z-curve
  * segments instead of a full stripe of a single-column sort.
  * q166 measures exactly that effect; ZOrderSpec pins the bit-level
  * contract against a reference interleave.
  *
  * Reference semantics: the reference engine processes records in
  * arrival order and has no storage-layout operator at all; this is
  * part of the EXT surface a 100-TB batch store needs.
  */
object ZOrder {

  /** Spreads the low 16 bits of `c` to the even bit positions of a
    * 32-bit value: bit i moves to bit 2i. Values outside [0, 65535]
    * are masked to their low 16 bits (callers quantize first).
    */
  def spread16(c: Column): Column = {
    val v0 = c.cast("long").bitwiseAND(lit(0xFFFFL))
    val v1 = v0.bitwiseOR(shiftleft(v0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val v2 = v1.bitwiseOR(shiftleft(v1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val v3 = v2.bitwiseOR(shiftleft(v2, 2)).bitwiseAND(lit(0x33333333L))
    v3.bitwiseOR(shiftleft(v3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Interleaves two 16-bit quantized coordinates into a 32-bit
    * Morton code: x occupies even bits, y odd bits. Monotone along
    * the Z-curve; adjacent (x,y) cells differ in low bits, so equal-
    * width ranges of the code are axis-aligned rectangles-of-
    * rectangles — the property file-level min/max pruning exploits.
    */
  def morton16(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Pure-Scala reference implementation (spec oracle). */
  private[graft] def mortonRef(x: Int, y: Int): Long = {
    def spread(v: Long): Long = {
      var r = v & 0xFFFFL
      r = (r | (r << 8)) & 0x00FF00FFL
      r = (r | (r << 4)) & 0x0F0F0F0FL
      r = (r | (r << 2)) & 0x33333333L
      (r | (r << 1)) & 0x55555555L
    }
    spread(x.toLong) | (spread(y.toLong) << 1)
  }
}
