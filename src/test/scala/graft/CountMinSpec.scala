package graft

import org.apache.spark.sql.functions._

import graft.functions.CountMin
import graft.queries.Hashing

/** The Count-Min sketch: upper-bound estimates, merge-order
  * independence (the property q170's exact hash gate relies on), and
  * the JVM-vs-Column hash-replication contract.
  */
class CountMinSpec extends SparkSpec {

  private val items: Seq[String] =
    Seq.tabulate(500)(i => s"tok${i % 37}") // skewed: 37 keys, varied counts

  private def sketchOf(xs: Seq[String], d: Int, w: Int): Array[Long] = {
    val agg = new CountMin(d, w)
    xs.foldLeft(agg.zero)(agg.reduce)
  }

  test("estimate is an upper bound on the true count for every key") {
    val d = 3; val w = 8 // narrow on purpose: collisions guaranteed
    val sk = sketchOf(items, d, w)
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong)
    truth.foreach { case (x, cnt) =>
      val est = (0 until d)
        .map(j => sk(j * w + CountMin.bucket(j, x, w))).min
      assert(est >= cnt, s"$x: est $est < true $cnt")
    }
  }

  test("merge is order-independent: counters are bit-identical") {
    val agg = new CountMin(4, 16)
    val parts = items.grouped(7).toSeq.map(p => p.foldLeft(agg.zero)(agg.reduce))
    def mergeAll(ps: Seq[Array[Long]]): Seq[Long] =
      ps.map(_.clone).reduce(agg.merge).toSeq
    assert(mergeAll(parts) == mergeAll(parts.reverse))
    assert(mergeAll(parts) == mergeAll(scala.util.Random.shuffle(parts)))
    // and equals the single-pass sketch
    assert(mergeAll(parts) == sketchOf(items, 4, 16).toSeq)
  }

  test("JVM bucket replicates the portable Column-side hash28 % w") {
    val s = spark
    import s.implicits._
    val w = 16
    val samples = Seq("join", "hash", "tok7", "ünïcode", "a b", "")
    val colSide = samples.toDF("x")
      .select(col("x") +: (0 until 4).map(j =>
        (Hashing.hash28(concat(lit(s"cm$j:"), col("x"))) % w).cast("int")
          .as(s"b$j")): _*)
      .collect()
      .map(r => r.getString(0) -> (1 to 4).map(r.getInt))
      .toMap
    samples.foreach { x =>
      val jvm = (0 until 4).map(j => CountMin.bucket(j, x, w))
      assert(jvm == colSide(x), s"bucket mismatch for '$x'")
    }
  }

  test("construction rejects degenerate dimensions") {
    intercept[IllegalArgumentException](new CountMin(0, 16))
    intercept[IllegalArgumentException](new CountMin(4, 1))
  }

  test("typed aggregation over a Dataset matches the local sketch") {
    val s = spark
    import s.implicits._
    val ds = items.toDS().repartition(8) // any partitioning: same counters
    val viaSpark = ds.select(new CountMin(4, 16).toColumn.name("cm")).head()
    assert(viaSpark == sketchOf(items, 4, 16).toSeq)
  }
}
