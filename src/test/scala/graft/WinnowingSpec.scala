package graft

import org.apache.spark.sql.functions._

/** The native winnowing kernel (functions.TextHashing.winnowFps /
  * the WinnowFps expression) against its independent declarative twin
  * (queries.Dedup.winnowFpsDeclarative — the pre-round-6 corpus
  * path), plus the kernel corners the corpus can't be trusted to
  * cover. q176's DuckDB oracle gates end-to-end values; this suite
  * pins that swapping the kernel changed NOTHING semantically.
  */
class WinnowingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("native kernel == declarative twin on the whole sf0.001 corpus, array-exact") {
    val both = Tables.documents(spark, dir)
      .select(col("doc_id"),
        queries.Dedup.winnowFps(col("text")).as("nat"),
        queries.Dedup.winnowFpsDeclarative(col("text")).as("dec"))
    // exact equality INCLUDING first-occurrence order, not set equality
    val diff = both.filter(not(col("nat") <=> col("dec")))
    assert(diff.isEmpty, diff.limit(3).collect().mkString("\n"))
    // and the corpus genuinely exercises the kernel (non-empty outputs)
    assert(both.filter(size(col("nat")) > 0).count() > 0)
  }

  test("kernel corners: short docs, exact boundaries, repeated grams") {
    val s = spark
    import s.implicits._
    // k=3, w=4: selection needs >= k words to gram, >= w+k-1 = 6
    // words to window
    val rows = Seq(
      (1L, ""),                                   // 1 empty token -> 0 grams
      (2L, "a b"),                                // < k words
      (3L, "a b c"),                              // 1 gram < w
      (4L, "a b c d e"),                          // 3 grams < w
      (5L, "a b c d e f"),                        // exactly w grams -> 1 window
      (6L, "a b c d e f g"),                      // 2 windows
      (7L, "x x x x x x x x x x"),                // all grams identical -> 1 distinct fp
      (8L, "a b c d e f a b c d e f")             // repeated content, distinct set
    ).toDF("doc_id", "text")
      .select(col("doc_id"), queries.Dedup.winnowFps(col("text")).as("fps"),
        queries.Dedup.winnowFpsDeclarative(col("text")).as("dec"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Long](1), r.getSeq[Long](2))))
      .toMap

    rows.foreach { case (id, (nat, dec)) =>
      assert(nat == dec, s"doc $id: native $nat != declarative $dec")
    }
    assert(rows(1L)._1.isEmpty && rows(2L)._1.isEmpty)
    assert(rows(3L)._1.isEmpty && rows(4L)._1.isEmpty)
    assert(rows(5L)._1.length == 1)
    assert(rows(6L)._1.nonEmpty && rows(6L)._1.length <= 2)
    assert(rows(7L)._1.length == 1)
    // every fingerprint is a 28-bit md5 prefix: non-negative, < 2^28
    assert(rows.values.flatMap(_._1).forall(f => f >= 0L && f < (1L << 28)))
  }

  test("sliding minimum matches a brute-force window scan on random hash sequences") {
    // the deque is the only nontrivial kernel logic — fuzz it against
    // min-of-slice directly at several (k, w) shapes via SQL literals
    val s = spark
    import s.implicits._
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val rnd = new scala.util.Random(176)
    val vocab = Array("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val docs = (0 until 50).map(i =>
      (i.toLong, Seq.fill(3 + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.length)))
        .mkString(" ")))
    for ((k, w) <- Seq((1, 1), (1, 3), (2, 2), (3, 4), (4, 7))) {
      val out = docs.toDF("doc_id", "text")
        .selectExpr("doc_id", "text", s"winnow_fps(text, $k, $w) AS fps")
        .collect().map(r => (r.getString(1), r.getSeq[Long](2))).toSeq
      out.foreach { case (text, fps) =>
        val ws = text.split(" ", -1)
        val grams = (0 to ws.length - k).map(i =>
          ws.slice(i, i + k).mkString(" ")).map { g =>
          val d = java.security.MessageDigest.getInstance("MD5")
            .digest(g.getBytes("UTF-8"))
          java.lang.Long.parseLong(
            d.map("%02x".format(_)).mkString.substring(0, 7), 16)
        }
        val expect =
          if (grams.length < w) Seq.empty[Long]
          else (0 to grams.length - w).map(j => grams.slice(j, j + w).min)
            .distinct
        assert(fps == expect, s"k=$k w=$w text='$text'")
      }
    }
  }
}
