package graft

import org.apache.spark.sql.functions._

import graft.api.ops

/** ops.semDedup on planted vectors: cluster-blocked pruning must keep
  * exactly one exemplar (min id) per semantic component, never pair
  * across cells, and report a census whose kept_id_sum pins the
  * survivor set. The oracle-gated q222 covers the real corpus; this
  * pins the semantics on a hand-checkable instance.
  */
class SemDedupSpec extends SparkSpec {

  private def centroids2 = {
    val s = spark
    import s.implicits._
    Seq((0, Seq(1.0, 0.0, 0.0, 0.0)), (1, Seq(0.0, 1.0, 0.0, 0.0)))
      .toDF("label", "c")
  }

  // cell 0: 1-2-7 form a cosine-0.95+ triangle, 3 is an in-cell
  // singleton (cos 0.8 to the axis); cell 1: 4-5 pair, 6 singleton
  private def planted = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, Seq(10.0, 0.0, 0.0, 0.0)),
      (2L, Seq(9.9, 0.1, 0.0, 0.0)),
      (7L, Seq(10.0, 0.5, 0.0, 0.0)),
      (3L, Seq(0.8, 0.0, 0.6, 0.0)),
      (4L, Seq(0.0, 10.0, 0.0, 0.0)),
      (5L, Seq(0.0, 9.8, 0.2, 0.0)),
      (6L, Seq(0.0, 0.7, 0.7, 0.0)),
    ).toDF("vid", "v")
  }

  test("semDedup keeps one exemplar per component and blocks by cell") {
    val (kept, census, _) =
      ops.semDedup(planted, centroids2, "vid", "v", 0.95)
    val keptIds = kept.select(col("vid")).collect().map(_.getLong(0)).toSet
    assert(keptIds == Set(1L, 3L, 4L, 6L), s"kept: $keptIds")
    val rows = census.collect().map(r => (r.getInt(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
      r.getLong(6)))
    assert(rows.toSeq == Seq(
      // cell, n_vecs, n_pairs, n_dup_vecs, n_components, n_removed,
      // kept_id_sum
      (0, 4L, 3L, 3L, 1L, 2L, 4L),  // {1,2,7} triangle; 3 singleton
      (1, 3L, 1L, 2L, 1L, 1L, 10L), // {4,5} pair; 6 singleton
    ), rows.mkString(", "))
    Ck.release(kept); Ck.release(census)
  }

  test("semDedup with an unreachable threshold keeps everything") {
    val (kept, census, _) =
      ops.semDedup(planted, centroids2, "vid", "v", 1.5)
    assert(kept.count() == 7L)
    val rows = census.collect().map(r => (r.getInt(0), r.getLong(1),
      r.getLong(2), r.getLong(5)))
    assert(rows.toSeq == Seq((0, 4L, 0L, 0L), (1, 3L, 0L, 0L)),
      rows.mkString(", "))
    Ck.release(kept); Ck.release(census)
  }

  test("semDedup matches a brute-force driver oracle on random vectors") {
    // the q222 oracle covers the real corpus; this walks random
    // geometry — including centroid-assignment ties and components
    // that chain across the cosine threshold — against a full
    // brute-force replay (assignment, in-cell pairs, union-find,
    // min-id survivors) computed in driver code
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(1234)
    (1 to 5).foreach { trial =>
      val dim = 4
      val k = 2 + rnd.nextInt(3)
      val cents = (0 until k).map(c =>
        (c, Seq.tabulate(dim)(d => if (d == c % dim) 1.0 else 0.0)))
      val n = 12 + rnd.nextInt(20)
      // vectors clustered loosely around random centroid directions,
      // quantized to a coarse grid so neither engine sits within an
      // ulp of the assignment or cosine boundaries
      val vecs = (1 to n).map { i =>
        val c = rnd.nextInt(k)
        val v = Seq.tabulate(dim) { d =>
          val base = if (d == c % dim) 4.0 else 0.0
          base + (rnd.nextInt(9) - 4) * 0.25
        }
        (i.toLong, v)
      }
      val tau = 0.90
      // ---- brute force ----
      def d2(a: Seq[Double], b: Seq[Double]) =
        math.rint(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
          * 1e6) / 1e6
      def cos(a: Seq[Double], b: Seq[Double]) = {
        val dot = a.zip(b).map { case (x, y) => x * y }.sum
        math.rint(dot / math.sqrt(a.map(x => x * x).sum)
          / math.sqrt(b.map(x => x * x).sum) * 1e4) / 1e4
      }
      val cell = vecs.map { case (id, v) =>
        id -> cents.minBy { case (c, cv) => (d2(v, cv), c) }._1
      }.toMap
      val bf = vecs.map { case (id, v) => (id, v) }.toMap
      val pairs = for {
        (i, vi) <- vecs; (j, vj) <- vecs
        if i < j && cell(i) == cell(j) && cos(vi, vj) >= tau
      } yield (i, j)
      val parent = scala.collection.mutable.Map(
        vecs.map(v => v._1 -> v._1): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      pairs.foreach { case (i, j) =>
        val (ri, rj) = (find(i), find(j))
        if (ri != rj) parent(math.max(ri, rj)) = math.min(ri, rj)
      }
      val removed = vecs.map(_._1).filter(id => find(id) != id).toSet
      val wantKept = vecs.map(_._1).toSet -- removed
      // ---- engine ----
      val (kept, census, _) = ops.semDedup(
        vecs.toDF("vid", "v"), cents.toDF("label", "c"), "vid", "v", tau)
      val gotKept = kept.select(col("vid")).collect().map(_.getLong(0)).toSet
      val gotRemoved = census.agg(sum(col("n_removed"))).head().getLong(0)
      Ck.release(kept); Ck.release(census)
      assert(gotKept == wantKept,
        s"trial $trial: kept diverges; missing=${wantKept -- gotKept} " +
          s"extra=${gotKept -- wantKept} vecs=$vecs")
      assert(gotRemoved == removed.size.toLong,
        s"trial $trial: census n_removed $gotRemoved != ${removed.size}")
    }
  }
}
