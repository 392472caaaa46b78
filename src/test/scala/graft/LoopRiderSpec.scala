package graft

import org.apache.spark.sql.functions._

/** Pins the graft.Loop stop-check rider: the moved-count metric must
  * (a) be CORRECT in both delivery modes and (b) actually ride the
  * checkpoint job's listener event in this Spark build — if every
  * call fell back to the second job, the round-7 item-7 optimization
  * would silently not exist.
  */
class LoopRiderSpec extends SparkSpec {

  test("ckCount counts moved rows and preserves the frame") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 1L), (2L, 3L), (4L, 5L), (6L, 6L))
      .toDF("old", "new")
    val (ck, moved) = Loop.ckCount(df, col("old") =!= col("new"))
    assert(moved == 2L)
    assert(ck.count() == 4L)
    assert(ck.columns.toSeq == Seq("old", "new")) // observe adds no column
    graft.Ck.release(ck)
    val (ck2, none) = Loop.ckCount(df.filter(col("old") === col("new")),
      col("old") =!= col("new"))
    assert(none == 0L)
    graft.Ck.release(ck2)
  }

  test("ckIsEmpty answers emptiness on the checkpoint job") {
    val s = spark
    import s.implicits._
    val (ckA, emptyA) = Loop.ckIsEmpty(Seq(1L).toDF("x").filter(lit(false)))
    assert(emptyA)
    graft.Ck.release(ckA)
    val (ckB, emptyB) = Loop.ckIsEmpty(Seq(1L, 2L).toDF("x"))
    assert(!emptyB)
    assert(ckB.count() == 2L)
    graft.Ck.release(ckB)
  }

  test("the metric rides the checkpoint job (listener delivers), not the fallback") {
    val s = spark
    import s.implicits._
    val r0 = Loop.rides.get()
    val f0 = Loop.fallbacks.get()
    (1 to 5).foreach { i =>
      val (ck, n) = Loop.ckCount(
        s.range(100L * i).toDF("id"), col("id") % 2 === 0)
      assert(n == 50L * i)
      graft.Ck.release(ck)
    }
    val rides = Loop.rides.get() - r0
    val fallbacks = Loop.fallbacks.get() - f0
    // the async bus may race an individual call, but if ALL five fell
    // back the rider is dead code in this Spark build — fail loudly
    assert(rides >= 1L, s"all $fallbacks calls took the fallback path")
  }
}
