package graft

import org.apache.spark.sql.functions._

import graft.functions.ZOrder

/** Bit-level contract of the Morton encode (q166's kernel) and the
  * layout-effectiveness property it exists for.
  */
class ZOrderSpec extends SparkSpec {

  test("morton16 matches the reference interleave on edge and dense values") {
    val s = spark
    import s.implicits._
    // edges + a deterministic LCG sweep across the 16-bit domain
    val pts = Seq((0, 0), (65535, 65535), (0, 65535), (65535, 0), (1, 2)) ++
      (1 to 500).scanLeft((12345, 54321)) { case ((x, y), _) =>
        ((x * 1103515245 + 12345) & 0xFFFF, (y * 69069 + 1) & 0xFFFF)
      }
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        ZOrder.morton16(col("x"), col("y")).as("z"))
      .collect()
    got.foreach { r =>
      val (x, y, z) = (r.getInt(0), r.getInt(1), r.getLong(2))
      assert(z == ZOrder.mortonRef(x, y), s"($x,$y)")
    }
    // interleave identities: x fills even bits, y odd bits
    assert(ZOrder.mortonRef(0xFFFF, 0) == 0x55555555L)
    assert(ZOrder.mortonRef(0, 0xFFFF) == 0xAAAAAAAAL)
  }

  test("z-order buckets beat single-column sort for a 2-D rectangle") {
    val df = SparkEntry.queries("q166_zorder_layout")(spark, "/root/testdata/sf0.001")
    val rows = df.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (nmZ, touchedZ, totalZ) = rows("zorder")
    val (nmP, touchedP, _) = rows("price_sort")
    val (nmD, touchedD, _) = rows("date_sort")
    assert(nmZ == nmP && nmZ == nmD, "same predicate, same matches")
    assert(nmZ > 0, "predicate must be non-vacuous at sf0.001")
    // the whole point: the Z-layout touches fewer files than the
    // WORSE of the two single-column layouts (a 1/64-area rectangle
    // floods whichever dimension wasn't the sort key)
    assert(touchedZ < math.max(touchedP, touchedD),
      s"z=$touchedZ p=$touchedP d=$touchedD of $totalZ")
  }

  test("q166 plan: one scan, broadcast extremes, no UDF, partial agg") {
    val p = SparkEntry.queries("q166_zorder_layout")(spark, "/root/testdata/sf0.001")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    // base scan + extremes scan, each listed once in the plan tree
    assert("Location: InMemoryFileIndex".r.findAllIn(p).size == 2, p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.toLowerCase.contains("batchevalpython") && !p.contains("ScalaUDF"), p)
  }
}
