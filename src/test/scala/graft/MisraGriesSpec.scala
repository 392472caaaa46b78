package graft

import scala.util.Random

import graft.functions.MisraGries

/** The Misra-Gries guarantees the q102 gate relies on, checked
  * directly on the aggregator (no Spark needed for the core
  * properties) plus one distributed run.
  */
class MisraGriesSpec extends SparkSpec {

  private def trueCounts(xs: Seq[String]): Map[String, Long] =
    xs.groupBy(identity).view.mapValues(_.size.toLong).toMap

  private def runPartitioned(mg: MisraGries, xs: Seq[String],
      parts: Int): Map[String, Long] = {
    val chunks = xs.grouped(math.max(1, xs.size / parts)).toSeq
    chunks.map(_.foldLeft(mg.zero)(mg.reduce)).reduce(mg.merge)
  }

  test("superset + undercount guarantees hold under any partitioning") {
    val rnd = new Random(42)
    // zipf-ish: item i appears ~ 2000/i times
    val xs = rnd.shuffle((1 to 50).flatMap(i =>
      Seq.fill(2000 / i)(s"w$i")))
    val n = xs.size.toLong
    val k = 20
    val mg = new MisraGries(k)
    val exact = trueCounts(xs)
    for (parts <- Seq(1, 3, 8, 17)) {
      val sk = runPartitioned(mg, xs, parts)
      assert(sk.size <= k, s"parts=$parts size=${sk.size}")
      exact.foreach { case (w, c) =>
        if (c > n / (k + 1)) {
          assert(sk.contains(w), s"parts=$parts missing heavy hitter $w ($c)")
          assert(c - sk(w) <= n / (k + 1),
            s"parts=$parts est too low for $w: ${sk(w)} vs $c")
        }
        // never overcounts
        sk.get(w).foreach(est => assert(est <= c, s"$w overcounted"))
      }
    }
  }

  test("distributed aggregation keeps the candidate-superset guarantee") {
    val s = spark
    import s.implicits._
    val rnd = new Random(7)
    val xs = rnd.shuffle((1 to 30).flatMap(i => Seq.fill(600 / i)(s"t$i")))
    val ds = s.createDataset(xs).repartition(8)
    val sk = ds.select(new MisraGries(16).toColumn).head()
    val n = xs.size.toLong
    trueCounts(xs).foreach { case (w, c) =>
      if (c > n / 17) assert(sk.contains(w), s"missing $w ($c) in $sk")
    }
  }

  test("non-positive capacity is rejected at construction") {
    // k <= 0 would otherwise yield a silently-empty sketch forever
    intercept[IllegalArgumentException] { new graft.functions.MisraGries(0) }
    intercept[IllegalArgumentException] { new graft.functions.MisraGries(-3) }
  }
}
