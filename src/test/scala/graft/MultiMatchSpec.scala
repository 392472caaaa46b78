package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{scrub, MultiMatchKernel}

/** The Aho-Corasick multi-pattern kernel: all-occurrence counting
  * (overlaps included), nested-needle independence via the fail-link
  * output closure, and the brute-force position-scan equivalence the
  * q173 oracle depends on.
  */
class MultiMatchSpec extends SparkSpec {

  private def cnt(text: String, needles: String*): Seq[Long] = {
    val arr = MultiMatchKernel.count(UTF8String.fromString(text),
      new MultiMatchKernel.Automaton(needles))
    (0 until arr.numElements()).map(arr.getLong)
  }

  test("plain occurrences, boundaries included") {
    assert(cnt("hash join beats hash join", "hash join") == Seq(2))
    assert(cnt("join", "join") == Seq(1))
    assert(cnt("no match here", "join") == Seq(0))
    assert(cnt("", "join") == Seq(0))
  }

  test("overlapping occurrences all count") {
    assert(cnt("aaa", "aa") == Seq(2))
    assert(cnt("aaaa", "aa") == Seq(3))
    assert(cnt("scan scan scan", "scan scan") == Seq(2))
  }

  test("nested needles count independently (fail-link output closure)") {
    // matching "hash join" must ALSO emit the contained "join"
    assert(cnt("hash join", "hash join", "join") == Seq(1, 1))
    assert(cnt("a hash join and a join", "hash join", "join") == Seq(1, 2))
    // a needle that is a suffix of another through fail links only
    assert(cnt("xabc", "xabc", "abc", "bc", "c") == Seq(1, 1, 1, 1))
  }

  test("shared-prefix needles diverge correctly") {
    assert(cnt("sort merge sort out", "sort merge", "sort out")
      == Seq(1, 1))
  }

  test("brute-force position-scan equivalence on random word soup") {
    val vocab = Array("key", "agg", "scan", "slow", "fast", "a")
    val rnd = new scala.util.Random(7)
    val needles = Seq("fast scan", "scan", "a a", "slow agg key")
    (0 until 40).foreach { _ =>
      val text = Seq.fill(30)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
      val brute = needles.map { n =>
        (0 to text.length - n.length)
          .count(p => text.regionMatches(p, n, 0, n.length)).toLong
      }
      assert(cnt(text, needles: _*) == brute, s"text=$text")
    }
  }

  test("streaming twin: live blocklist counts accumulate across micro-batches") {
    // the stateless kernel composes with Structured Streaming as-is:
    // a per-needle running aggregate in update mode is q173's live
    // monitor — counts must carry across the micro-batch boundary
    val s = spark
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val needles = Seq("fast scan", "scan")
    val agg = in.toDS().toDF("text")
      .select(scrub.multiMatchCount(col("text"), needles).as("c"))
      .select(
        element_at(col("c"), 1).as("m0"), element_at(col("c"), 2).as("m1"))
      .agg(sum(col("m0")).as("s0"), sum(col("m1")).as("s1"))
    val sink = s"mm_${System.nanoTime()}"
    val q = agg.writeStream.format("memory").queryName(sink)
      .outputMode("complete")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("chk").toString)
      .start()
    try {
      in.addData("fast scan here")
      q.processAllAvailable()
      in.addData("scan then fast scan then scan")
      q.processAllAvailable()
      val r = s.table(sink).collect().map(x => (x.getLong(0), x.getLong(1)))
      assert(r.toSeq == Seq((2L, 4L)), r.mkString(","))
    } finally q.stop()
  }

  test("expression runs under codegen in a DataFrame plan") {
    val s = spark
    import s.implicits._
    val df = Seq("fast scan now", "slow query fast scan fast scan", "nothing")
      .toDF("text")
      .select(scrub.multiMatchCount(col("text"),
        Seq("fast scan", "scan")).as("c"))
    assert(df.collect().map(_.getSeq[Long](0)).toSeq ==
      Seq(Seq(1L, 1L), Seq(2L, 2L), Seq(0L, 0L)))
  }
}
