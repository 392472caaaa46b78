package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Count-Min sketch as a typed [[Aggregator]] — the
  * bounded-memory POINT-FREQUENCY estimator (Cormode & Muthukrishnan
  * 2005), completing the sketch family next to Misra-Gries (candidate
  * set, [[MisraGries]]), HLL (cardinality, q105), and Bloom (membership,
  * q51): d×w int64 counters; item x increments counter (j, h_j(x))
  * in each of the d rows; the estimate for x is the MIN over its d
  * counters, an upper bound on the true count (overcount ≤ εn with
  * probability 1-δ for w = e/ε, d = ln 1/δ).
  *
  * Unlike MG and HLL, every CMS state transition is a pure counter
  * ADD, so the sketch is merge-order-INDEPENDENT: any partitioning
  * yields bit-identical counters, which is why q170 can hash-gate the
  * estimates themselves (not just guarantee flags) against a DuckDB
  * replica of the counter matrix.
  *
  * Hashes are the library's portable md5 primitive (`Hashing.hash28`
  * — first 7 hex chars of md5("cm<j>:" ++ x) as int64, mod w), so the
  * oracle reproduces each bucket index exactly.
  *
  * Scale: O(d·w) state per partition regardless of input size,
  * combines map-side (vector add), final merge is d·w adds per
  * partition — the shape that estimates any key's frequency over a
  * 100-TB stream without a groupBy, and the batch twin of a streaming
  * frequency monitor's ValueState.
  */
class CountMin(d: Int, w: Int)
    extends Aggregator[String, Array[Long], Seq[Long]] {
  require(d > 0 && w > 1, s"CountMin needs d > 0 rows and w > 1 buckets, got d=$d w=$w")

  override def zero: Array[Long] = new Array[Long](d * w)

  override def reduce(b: Array[Long], x: String): Array[Long] = {
    var j = 0
    while (j < d) {
      b(j * w + CountMin.bucket(j, x, w)) += 1L
      j += 1
    }
    b
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def finish(b: Array[Long]): Seq[Long] = b.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object CountMin {

  /** Row-j bucket of x: the JVM replica of the Column/SQL-side
    * `Hashing.hash28(concat("cm<j>:", x)) % w` — first 7 hex chars of
    * md5 of the UTF-8 bytes, parsed base-16 (28 bits, so never
    * negative), mod w.
    */
  def bucket(j: Int, x: String, w: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest((s"cm$j:" + x).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 7 hex chars = 3.5 bytes: 3 full bytes + the high nibble
    val h = ((md(0) & 0xffL) << 20) | ((md(1) & 0xffL) << 12) |
      ((md(2) & 0xffL) << 4) | ((md(3) & 0xf0L) >> 4)
    (h % w).toInt
  }
}
