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
}
