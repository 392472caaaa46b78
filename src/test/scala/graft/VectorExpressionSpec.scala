package graft

import org.apache.spark.sql.functions._

import graft.functions.vec

/** The native ArrayDotProduct expression: interpreted eval, codegen
  * eval, null handling, and agreement with the higher-order-function
  * formulation it replaces.
  */
class VectorExpressionSpec extends SparkSpec {

  test("array_dot matches manual dot product (codegen path)") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.0, 0.0), Seq(1.0, 1.0)),
      (Seq(-1.5, 2.5), Seq(2.0, 4.0))).toDF("a", "b")
    val got = df.select(vec.arrayDot(col("a"), col("b")).as("d"))
      .as[Double].collect().toSeq
    assert(got == Seq(32.0, 0.0, 7.0))
  }

  test("array_dot agrees with the higher-order aggregate/zip_with form") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(50)((Seq.fill(64)(rnd.nextDouble()), Seq.fill(64)(rnd.nextDouble())))
    val df = rows.toDF("a", "b")
    val hof = df.select(aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x).as("d")).as[Double].collect()
    val native = df.select(vec.arrayDot(col("a"), col("b")).as("d"))
      .as[Double].collect()
    hof.zip(native).foreach { case (h, n) => assert(math.abs(h - n) < 1e-12) }
  }

  test("array_dot propagates nulls") {
    val s = spark
    import s.implicits._
    val df = Seq((Some(Seq(1.0)), None: Option[Seq[Double]]))
      .toDF("a", "b")
    val got = df.select(vec.arrayDot(col("a"), col("b")).as("d"))
      .collect()
    assert(got.head.isNullAt(0))
  }

  test("array_dot is NULL on length mismatch and null elements (HOF parity)") {
    val s = spark
    import s.implicits._
    val mismatch = Seq((Seq(1.0), Seq(1.0, 2.0))).toDF("a", "b")
      .select(vec.arrayDot(col("a"), col("b"))).collect()
    assert(mismatch.head.isNullAt(0))
    val withNullElem = Seq((Seq(Some(1.0), None), Seq(Some(1.0), Some(1.0))))
      .toDF("a", "b")
      .select(vec.arrayDot(col("a").cast("array<double>"),
        col("b").cast("array<double>"))).collect()
    assert(withNullElem.head.isNullAt(0))
    // the HOF form agrees on both cases
    val hof = Seq((Seq(1.0), Seq(1.0, 2.0))).toDF("a", "b")
      .select(aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)).collect()
    assert(hof.head.isNullAt(0))
  }

  test("array_dot rejects non-double arrays at analysis") {
    val s = spark
    import s.implicits._
    val df = Seq((Seq(1, 2), Seq("x", "y"))).toDF("a", "b")
    intercept[Exception] {
      df.select(vec.arrayDot(col("a"), col("b"))).collect()
    }
  }
}
