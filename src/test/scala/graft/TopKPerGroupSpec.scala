package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.plans.ops

/** The native TopKPerGroup operator: equivalence with the window
  * row_number form, plan shape (two heap stages around one exchange,
  * no sort), and edge cases.
  */
class TopKPerGroupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("matches the window row_number form on lineitem") {
    val l = Tables.lineitem(spark, dir)
    val native = ops.topKPerGroup(l,
        groupCols = Seq(col("l_returnflag")),
        orderCols = Seq(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"), col("l_quantity")),
        k = 7)
      .select("l_returnflag", "l_orderkey", "l_extendedprice")
      .orderBy(col("l_returnflag"), col("l_extendedprice").desc, col("l_orderkey"))
      .collect().toSeq
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    val windowed = l.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 7)
      .select("l_returnflag", "l_orderkey", "l_extendedprice")
      .orderBy(col("l_returnflag"), col("l_extendedprice").desc, col("l_orderkey"))
      .collect().toSeq
    assert(native == windowed)
  }

  test("float group keys collapse -0.0/0.0 like built-in aggregates") {
    val s = spark
    import s.implicits._
    // without planning-time NormalizeFloatingNumbers, -0.0 and 0.0
    // have different UnsafeRow bytes and would form TWO groups
    val df = Seq((0.0, 1L), (-0.0, 2L), (0.0, 3L), (1.5, 4L)).toDF("g", "id")
    val out = ops.topKPerGroup(df, Seq(col("g")), Seq(col("id")), k = 2)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 2L, 4L), s"got $out") // one zero-group, top-2 = ids 1,2
  }

  test("partial phase flushes at the group cap without losing true top-k rows") {
    val s = spark
    import s.implicits._
    // > 2^17 distinct groups in one partition forces at least one
    // mid-stream partial flush; equivalence with the window form pins
    // that flushed partials merge correctly in the final phase
    val n = (1 << 17) + 5000
    val df = s.range(0, n.toLong, 1, 1)
      .select((col("id") % (n / 2)).as("g"), col("id"))
    val native = ops.topKPerGroup(df, Seq(col("g")), Seq(col("id")), k = 1)
      .agg(count(lit(1)), sum(col("id"))).collect().head
    val w = Window.partitionBy(col("g")).orderBy(col("id"))
    val windowed = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 1)
      .agg(count(lit(1)), sum(col("id"))).collect().head
    assert(native == windowed)
  }

  test("plan has two heap stages, an exchange, and no sort before output") {
    val df = ops.topKPerGroup(Tables.orders(spark, dir),
      Seq(col("o_orderpriority")), Seq(col("o_totalprice").desc, col("o_orderkey")), 3)
    df.collect() // materialize so the adaptive plan is final
    val plan = df.queryExecution.executedPlan.toString
    assert("TopKPerGroup".r.findAllIn(plan).size >= 2, plan)
    assert(plan.contains("Exchange") || plan.contains("ShuffleQueryStage"), plan)
    assert(!plan.contains("Sort "), plan)
  }

  test("property: random data matches the window form for random k") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(13)
    (1 to 3).foreach { trial =>
      val n = 500 + rnd.nextInt(1500)
      val data = Seq.fill(n)((rnd.nextInt(7), rnd.nextInt(100), rnd.nextLong()))
      val df = data.toDF("g", "v", "uid") // uid: unique-ish tiebreak
      val k = 1 + rnd.nextInt(10)
      val native = ops.topKPerGroup(df, Seq(col("g")),
          Seq(col("v").desc, col("uid")), k)
        .orderBy("g", "v", "uid").collect().toSeq
      val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("uid"))
      val windowed = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k).drop("rn")
        .orderBy("g", "v", "uid").collect().toSeq
      assert(native == windowed, s"trial $trial k=$k n=$n")
    }
  }

  test("k larger than group size returns whole groups") {
    val df = spark.range(10).toDF("id")
      .withColumn("g", col("id") % 2)
    val out = ops.topKPerGroup(df, Seq(col("g")), Seq(col("id").desc), 100)
    assert(out.count() == 10)
  }

  test("k = 1 returns exactly one row per group") {
    val df = Tables.orders(spark, dir)
    val out = ops.topKPerGroup(df, Seq(col("o_orderpriority")),
      Seq(col("o_totalprice").desc, col("o_orderkey")), 1)
    val n = df.select("o_orderpriority").distinct().count()
    assert(out.count() == n)
  }
}
