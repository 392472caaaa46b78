package graft

import org.apache.spark.sql.functions._

import graft.plans.ops

/** The native RangeJoin operator: sliding-window sweep semantics vs
  * the direct inequality join, edge cases, and plan shape.
  */
class RangeJoinSpec extends SparkSpec {

  test("matches the direct inequality join on random keyed data") {
    val n = 4000
    val ev = spark.range(n).select(
      (col("id") % 23).as("k"),
      pmod(col("id") * 2654435761L, lit(10000L)).as("t"),
      col("id").as("eid"))
    val native = ops.rangeJoin(ev, ev,
        Seq(ev("k")), Seq(ev("k")), ev("t"), ev("t"),
        lower = -50L, upper = 50L,
        payload = Seq((ev("eid"), "eid_b"), (ev("t"), "t_b")))
      .select("k", "eid", "eid_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val a = ev.alias("a")
    val b = ev.alias("b")
    val direct = a.join(b, col("a.k") === col("b.k") &&
        col("b.t") >= col("a.t") - 50 && col("b.t") <= col("a.t") + 50)
      .select(col("a.k"), col("a.eid"), col("b.eid"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(native.nonEmpty)
    assert(native == direct)
  }

  test("asymmetric bounds: only later rows within the window") {
    val s = spark; import s.implicits._
    val l = Seq((1L, 10L, "x"), (1L, 20L, "y")).toDF("k", "t", "tag")
    val r = Seq((1L, 5L, 100L), (1L, 12L, 200L), (1L, 25L, 300L), (2L, 11L, 400L))
      .toDF("k", "t", "rv")
    val out = ops.rangeJoin(l, r, Seq(l("k")), Seq(r("k")),
        l("t"), r("t"), lower = 1L, upper = 10L,
        payload = Seq((r("rv"), "rv")))
      .select("tag", "rv").collect()
      .map(x => (x.getString(0), x.getLong(1))).sorted.toSeq
    // x@10 -> window (11, 20] -> 200; y@20 -> (21, 30] -> 300
    assert(out == Seq(("x", 200L), ("y", 300L)))
  }

  test("NULL keys/times never join (inner-join semantics)") {
    val s = spark; import s.implicits._
    val l = Seq((Option(1L), Option(10L), "a"),
        (Option.empty[Long], Option(10L), "null_key"),
        (Option(1L), Option.empty[Long], "null_time"))
      .toDF("k", "t", "tag")
    val r = Seq((Option(1L), Option(12L), 100L),
        (Option.empty[Long], Option(12L), 666L), // null key: ignored
        (Option(1L), Option.empty[Long], 777L))  // null time: ignored
      .toDF("k", "t", "rv")
    val out = ops.rangeJoin(l, r, Seq(l("k")), Seq(r("k")),
        l("t"), r("t"), lower = -5L, upper = 5L,
        payload = Seq((r("rv"), "rv")))
      .select("tag", "rv").collect()
      .map(x => (x.getString(0), x.getLong(1))).toSeq
    assert(out == Seq(("a", 100L)))
  }

  test("empty right side yields no pairs") {
    val s = spark; import s.implicits._
    val l = Seq((1L, 10L)).toDF("k", "t")
    val r = Seq((1L, 10L, 1L)).toDF("k", "t", "rv").filter(col("k") < 0)
    val out = ops.rangeJoin(l, r, Seq(l("k")), Seq(r("k")),
      l("t"), r("t"), -5L, 5L, Seq((r("rv"), "rv")))
    assert(out.count() == 0)
  }

  test("composite string+long keys partition and compare correctly") {
    val s = spark; import s.implicits._
    val l = Seq(("a", 1L, 10L, "l1"), ("a", 2L, 10L, "l2"), ("b", 1L, 10L, "l3"))
      .toDF("g", "sub", "t", "tag")
    val r = Seq(("a", 1L, 12L, 100L), ("a", 2L, 30L, 200L), ("b", 1L, 8L, 300L))
      .toDF("g", "sub", "t", "rv")
    val out = ops.rangeJoin(l, r,
        Seq(l("g"), l("sub")), Seq(r("g"), r("sub")),
        l("t"), r("t"), -5L, 5L, Seq((r("rv"), "rv")))
      .select("tag", "rv").collect()
      .map(x => (x.getString(0), x.getLong(1))).sorted.toSeq
    // (a,1)@10 matches rv=100@12; (a,2)@10 misses 200@30; (b,1)@10 matches 300@8
    assert(out == Seq(("l1", 100L), ("l3", 300L)))
  }

  test("plan: native operator, co-partitioned, no bucket replication") {
    val s = spark; import s.implicits._
    val ev = Seq((1L, 10L, 1L)).toDF("k", "t", "eid")
    val df = ops.rangeJoin(ev, ev, Seq(ev("k")), Seq(ev("k")),
      ev("t"), ev("t"), -5L, 5L, Seq((ev("eid"), "eid_b")))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("RangeJoin"), p)
    assert(!p.contains("Generate"), p) // no explode-into-buckets stage
  }
}
