package graft

import org.apache.spark.sql.functions._

import graft.functions.setcard

/** The native set-cardinality expressions must be drop-in equal to
  * size(array_intersect)/size(array_union) on every input shape:
  * duplicates, null elements (counted as one value; intersect only
  * when BOTH sides hold null), empty arrays, and NULL inputs.
  */
class SetCardExpressionSpec extends SparkSpec {

  test("intersect/union sizes match the builtin composition on random arrays") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(5)
    val vocab = Vector("a", "b", "c", "d", "e", null)
    val rows = (1 to 300).map { i =>
      def arr() = Vector.fill(rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size)))
      (i, arr(), arr())
    }
    val df = rows.toDF("id", "x", "y")
      .withColumn("bi", size(array_intersect(col("x"), col("y"))))
      .withColumn("bu", size(array_union(col("x"), col("y"))))
      .withColumn("ni", setcard.intersectSize(col("x"), col("y")))
      .withColumn("nu", setcard.unionSize(col("x"), col("y")))
    val bad = df.filter(col("bi") =!= col("ni") || col("bu") =!= col("nu"))
    assert(bad.count() === 0, bad.collect().take(3).mkString("\n"))
  }

  test("NULL inputs yield NULL (matching the non-legacy size of a null array)") {
    val s = spark
    import s.implicits._
    val df = Seq((Some(Seq("a")), None: Option[Seq[String]]))
      .toDF("x", "y")
    val r = df.select(setcard.intersectSize(col("x"), col("y")).as("i"),
      setcard.unionSize(col("x"), col("y")).as("u")).head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("optimizer rule rewrites size(array_intersect) under extensions") {
    // reuse the extensions session pattern: the rule only installs via
    // withExtensions, so build the plan there
    val ext = GraftExtensionsSpec.extSession
    // non-literal inputs: constant folding would otherwise collapse
    // the whole projection into a LocalRelation before we can look
    val df = ext.range(3).selectExpr(
      "array(cast(id as string), 'b') AS x", "array('b', 'c') AS y")
      .select(size(array_intersect(col("x"), col("y"))).as("i"),
        size(array_union(col("x"), col("y"))).as("u"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("array_intersect_size"), optimized)
    assert(optimized.contains("array_union_size"), optimized)
    // and the values survive the substitution (legacy -1 guard intact)
    val r = df.collect()
    assert(r.map(_.getInt(0)).toSeq === Seq(1, 1, 1))
    assert(r.map(_.getInt(1)).toSeq === Seq(3, 3, 3))
  }

  test("array_intersect_size / array_union_size callable from SQL") {
    val ext = GraftExtensionsSpec.extSession
    val r = ext.sql(
      """SELECT array_intersect_size(array('a','b','b'), array('b','c')) AS i,
        |       array_union_size(array('a','b','b'), array('b','c')) AS u""".stripMargin)
      .head
    assert(r.getInt(0) === 1 && r.getInt(1) === 3)
  }
}
