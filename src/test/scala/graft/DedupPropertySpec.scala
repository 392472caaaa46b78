package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.api.ops

/** Randomized equivalence guard for the full-CDC dedup day
  * (ops.nearDupDedupDelta, the machinery under q219/q221/corpusDay):
  * on arbitrary small corpora with planted duplicate groups, a warm
  * day — random base/insert split, random takedowns drawn from the
  * WHOLE base (cluster members, cluster minima, singletons alike) —
  * must produce exactly the cold pipeline's survivors and labels on
  * the surviving union. IncrementalDedupSpec pins the planted shapes
  * (bridge split, vanish, relabel); this spec walks the random
  * combinations those shapes can't enumerate: takedowns deleting a
  * whole cluster, deltas merging two old clusters through a shared
  * text, empty deltas, near-empty survivor sets.
  */
class DedupPropertySpec extends SparkSpec {

  private def forAllSamples[A](n: Int, g: Gen[A])(check: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(100L + i.toLong)).foreach(check)
    }

  // planted text groups: identical texts pair (Jaccard 1); distinct
  // groups share no vocabulary, so cross-group pairs are impossible
  private def groupText(g: Int): String =
    (1 to 8).map(i => s"dpz${g}w$i").mkString(" ")

  // a corpus sample: docId -> text-group assignment, plus which docs
  // are inserts (delta) and which base docs are taken down
  private val corpusGen: Gen[(Seq[(Long, Int)], Set[Long], Set[Long])] = for {
    n <- Gen.choose(6, 18)
    nGroups <- Gen.choose(1, 5)
    groups <- Gen.listOfN(n, Gen.choose(0, nGroups - 1))
    deltaBits <- Gen.listOfN(n, Gen.oneOf(false, false, true))
    docs = groups.zipWithIndex.map { case (g, i) => (i.toLong * 3 + 1, g) }
    delta = docs.zip(deltaBits).collect { case ((id, _), true) => id }.toSet
    delIdx <- Gen.listOfN(3, Gen.choose(0, n - 1))
    dels = delIdx.map(i => docs(i)._1).toSet -- delta // takedowns hit the BASE
  } yield (docs, delta, dels)

  private def idSet(df: DataFrame): Set[Long] =
    df.select(col("doc_id")).collect().map(_.getLong(0)).toSet

  private def labelSet(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("warm full-CDC day equals the cold pipeline on random corpora/changelogs") {
    val s = spark
    import s.implicits._
    forAllSamples(10, corpusGen) { case (docs, delta, dels) =>
      val all = docs.map { case (id, g) => (id, groupText(g)) }
        .toDF("doc_id", "text")
      val base = all.filter(!col("doc_id").isin(delta.toSeq: _*))
      val deltaDf = all.filter(col("doc_id").isin(delta.toSeq: _*))
      val (lab0, _) = ops.nearDupLabels(base, "doc_id", "text")
      val deleted = dels.toSeq.toDF("doc_id")
      val (kept, lab1, _) = ops.nearDupDedupDelta(
        base, deltaDf, deleted, "doc_id", "text", lab0)
      // cold truth on the surviving union
      val surviving = all.filter(!col("doc_id").isin(dels.toSeq: _*))
      val cold = ops.nearDupDedup(surviving, "doc_id", "text")
      val (coldLab, _) = ops.nearDupLabels(surviving, "doc_id", "text")
      val (gotKept, wantKept) = (idSet(kept), idSet(cold))
      val (gotLab, wantLab) = (labelSet(lab1), labelSet(coldLab))
      Ck.release(lab0); Ck.release(lab1); Ck.release(coldLab)
      assert(gotKept == wantKept,
        s"kept diverges: docs=$docs delta=$delta dels=$dels " +
          s"missing=${wantKept -- gotKept} extra=${gotKept -- wantKept}")
      assert(gotLab == wantLab,
        s"labels diverge: docs=$docs delta=$delta dels=$dels")
    }
  }
}
