package graft

import org.apache.spark.sql.functions._

import graft.plans.ops

/** The native AsOfJoin operator: merge-sweep semantics vs a golden
  * scala fold, edge cases, and the plan shape (one exchange + sort per
  * side, no union/window).
  */
class AsOfJoinSpec extends SparkSpec {

  private def leftDf = {
    val s = spark; import s.implicits._
    Seq(
      // (key, time, tag)
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"),
      (2L, 5L, "d"), (2L, 6L, "e"),
      (3L, 100L, "f") // key with no right rows at all
    ).toDF("k", "t", "tag")
  }

  private def rightDf = {
    val s = spark; import s.implicits._
    Seq(
      // (key, time, v)
      (1L, 10L, 1.0), (1L, 25L, 2.5),
      (2L, 6L, 7.0)
    ).toDF("k", "t", "v")
  }

  test("non-strict: latest right with time <= left time") {
    val l = leftDf
    val r = rightDf
    val out = ops.asofJoin(l, r, Seq(l("k")), Seq(r("k")),
        l("t"), r("t"), Seq((r("v"), "v")), strict = false)
      .select("k", "t", "tag", "v")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getString(2),
        if (x.isNullAt(3)) null else x.getDouble(3)))
      .sortBy(x => (x._1, x._2)).toSeq
    assert(out == Seq(
      (1L, 10L, "a", 1.0), // equal time matches when non-strict
      (1L, 20L, "b", 1.0),
      (1L, 30L, "c", 2.5),
      (2L, 5L, "d", null),
      (2L, 6L, "e", 7.0),
      (3L, 100L, "f", null)))
  }

  test("strict: latest right with time < left time") {
    val l = leftDf
    val r = rightDf
    val out = ops.asofJoin(l, r, Seq(l("k")), Seq(r("k")),
        l("t"), r("t"), Seq((r("v"), "v")), strict = true)
      .select("k", "t", "v")
      .collect().map(x => (x.getLong(0), x.getLong(1),
        if (x.isNullAt(2)) null else x.getDouble(2)))
      .sortBy(x => (x._1, x._2)).toSeq
    assert(out == Seq(
      (1L, 10L, null), // equal time excluded when strict
      (1L, 20L, 1.0),
      (1L, 30L, 2.5),
      (2L, 5L, null),
      (2L, 6L, null),
      (3L, 100L, null)))
  }

  test("empty right side yields all-null payload") {
    val l = leftDf
    val r = rightDf.filter(col("k") < 0)
    val out = ops.asofJoin(l, r, Seq(l("k")), Seq(r("k")),
        l("t"), r("t"), Seq((r("v"), "v")))
      .select("v").collect()
    assert(out.length == 6 && out.forall(_.isNullAt(0)))
  }

  test("matches the window form on random data") {
    val n = 5000
    val l = spark.range(n).select(
      (col("id") % 37).as("k"), pmod(col("id") * 2654435761L, lit(100000L)).as("t"),
      col("id").as("lid"))
    // t = 3*id mod 100000 is injective for id < 100000 (gcd(3,1e5)=1),
    // so right-side (k,t) pairs are tie-free and the golden fold is
    // deterministic
    val r = spark.range(n / 5).select(
      (col("id") % 37).as("k"), pmod(col("id") * 3L, lit(100000L)).as("t"),
      (col("id") % 1000).cast("double").as("v"))
    val native = ops.asofJoin(l, r, Seq(l("k")), Seq(r("k")),
        l("t"), r("t"), Seq((r("v"), "v")))
      .select("lid", "v")
      .collect().map(x => (x.getLong(0), if (x.isNullAt(1)) -1.0 else x.getDouble(1)))
      .sortBy(_._1).toSeq
    // golden: driver-side fold over the same inputs
    val rRows = r.collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(v => (v._2, v._3))).toMap
    val golden = l.collect().map { x =>
      val (k, t, lid) = (x.getLong(0), x.getLong(1), x.getLong(2))
      // non-strict: last right row with rt <= t; ties on rt keep the
      // LATER sweep arrival, which is the (rt, v)-sorted last element
      val m = rRows.get(k).flatMap(_.takeWhile(_._2 <= t).lastOption)
      (lid, m.map(_._3).getOrElse(-1.0))
    }.sortBy(_._1).toSeq
    assert(native == golden)
  }

  test("composite string+long keys sweep correctly") {
    val s = spark; import s.implicits._
    val l = Seq(("a", 1L, 10L, "l1"), ("a", 2L, 10L, "l2"), ("b", 1L, 10L, "l3"))
      .toDF("g", "sub", "t", "tag")
    val r = Seq(("a", 1L, 5L, 1.5), ("a", 1L, 9L, 2.5), ("b", 1L, 11L, 9.9))
      .toDF("g", "sub", "t", "v")
    val out = ops.asofJoin(l, r,
        Seq(l("g"), l("sub")), Seq(r("g"), r("sub")),
        l("t"), r("t"), Seq((r("v"), "v")))
      .select("tag", "v").collect()
      .map(x => (x.getString(0), if (x.isNullAt(1)) -1.0 else x.getDouble(1)))
      .sorted.toSeq
    // (a,1): latest of {5,9} <= 10 -> 2.5; (a,2): no rows; (b,1): 11 > 10
    assert(out == Seq(("l1", 2.5), ("l2", -1.0), ("l3", -1.0)))
  }

  test("self-as-of on the SAME frame (shared expression ids)") {
    val s = spark; import s.implicits._
    val ev = Seq((1L, 10L, 1.0), (1L, 20L, 2.0), (1L, 30L, 3.0))
      .toDF("k", "t", "v")
    val out = ops.asofJoin(ev, ev, Seq(ev("k")), Seq(ev("k")),
        ev("t"), ev("t"), Seq((ev("v"), "prev_v")), strict = true)
      .select("t", "prev_v").collect()
      .map(x => (x.getLong(0), if (x.isNullAt(1)) -1.0 else x.getDouble(1)))
      .sorted.toSeq
    assert(out == Seq((10L, -1.0), (20L, 1.0), (30L, 2.0)))
  }

  test("NULL keys/times never match (SQL join semantics)") {
    val s = spark; import s.implicits._
    // left rows with a NULL key or time pass through with NULL payload;
    // right rows with a NULL key or time are never taken as a match
    val l = Seq((Option(1L), Option(10L), "a"),
        (Option.empty[Long], Option(10L), "null_key"),
        (Option(1L), Option.empty[Long], "null_time"))
      .toDF("k", "t", "tag")
    val r = Seq((Option(1L), Option(5L), 1.0),
        (Option.empty[Long], Option(1L), 666.0), // null key: ignored
        (Option(1L), Option.empty[Long], 777.0)) // null time: ignored
      .toDF("k", "t", "v")
    val out = ops.asofJoin(l, r, Seq(l("k")), Seq(r("k")),
        l("t"), r("t"), Seq((r("v"), "v")))
      .select("tag", "v").collect()
      .map(x => (x.getString(0), if (x.isNullAt(1)) -1.0 else x.getDouble(1)))
      .sorted.toSeq
    assert(out == Seq(("a", 1.0), ("null_key", -1.0), ("null_time", -1.0)))
  }

  test("duplicate (key, rightTime) rows: survivor is the payload maximum, deterministically") {
    val s = spark; import s.implicits._
    val l = Seq((1L, 10L, "a")).toDF("k", "t", "tag")
    // requiredChildOrdering extends to the payload, so among tied
    // (key, time) rows the sweep's last-in-order survivor is the
    // payload-wise max — independent of shuffle arrival order
    val r = Seq((1L, 5L, 3.0), (1L, 5L, 9.0), (1L, 5L, 1.0)).toDF("k", "t", "v")
    (1 to 3).foreach { i =>
      val out = ops.asofJoin(l, r.repartition(i * 2), Seq(l("k")), Seq(r("k")),
          l("t"), r("t"), Seq((r("v"), "v")))
        .select("v").collect().map(_.getDouble(0)).toSeq
      assert(out == Seq(9.0))
    }
  }

  test("plan: co-partitioned exchanges, no window, no union") {
    val l = leftDf
    val r = rightDf
    val df = ops.asofJoin(l, r, Seq(l("k")), Seq(r("k")),
      l("t"), r("t"), Seq((r("v"), "v")))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("Union"), p)
  }

  test("mismatched key or time types fail loudly at construction") {
    val s = spark
    import s.implicits._
    // custom nodes bypass ImplicitTypeCasts: an int-vs-long key would
    // silently compare garbage bytes without the constructor guard
    val l = Seq((1, 10L, 1.0)).toDF("k", "t", "x")
    val r = Seq((1L, 5L, 9.0)).toDF("k", "t", "v")
    val eKey = intercept[IllegalArgumentException] {
      ops.asofJoin(l, r, Seq(l("k")), Seq(r("k")),
        l("t"), r("t"), Seq((r("v"), "v")))
    }
    assert(eKey.getMessage.contains("key types"), eKey.getMessage)
    val r2 = Seq((1, 5, 9.0)).toDF("k", "t", "v") // int time vs long time
    val eTime = intercept[IllegalArgumentException] {
      ops.asofJoin(l, r2, Seq(l("k")), Seq(r2("k")),
        l("t"), r2("t"), Seq((r2("v"), "v")))
    }
    assert(eTime.getMessage.contains("time types"), eTime.getMessage)
  }
}
