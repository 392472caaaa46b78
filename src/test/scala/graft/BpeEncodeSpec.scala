package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{BpeKernel, tokenizer}

/** The BPE tokenizer-apply kernel: greedy lowest-rank-first merging,
  * leftmost non-overlap fusion, and the equivalence property the q162
  * oracle depends on (with char-pair merges, greedy priority order ==
  * sequential by-rank application).
  */
class BpeEncodeSpec extends SparkSpec {

  private def enc(word: String, merges: (String, String)*): Seq[String] = {
    val arr = BpeKernel.encode(UTF8String.fromString(word),
      new BpeKernel.Table(merges))
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  test("no applicable merges: single-codepoint tokens") {
    assert(enc("abc", ("x", "y")) == Seq("a", "b", "c"))
    assert(enc("a") == Seq("a"))
  }

  test("leftmost non-overlap: 'aaa' with merge (a,a) gives [aa, a]") {
    assert(enc("aaa", ("a", "a")) == Seq("aa", "a"))
    assert(enc("aaaa", ("a", "a")) == Seq("aa", "aa"))
  }

  test("priority: the lower-rank pair wins a shared character") {
    // "abc": (b,c) at rank 0 beats (a,b) at rank 1
    assert(enc("abc", ("b", "c"), ("a", "b")) == Seq("a", "bc"))
    assert(enc("abc", ("a", "b"), ("b", "c")) == Seq("ab", "c"))
  }

  test("multi-level merges chain into longer tokens") {
    // (a,b)->ab then (ab,c)->abc: table keys are token pairs, not chars
    assert(enc("abcabc", ("a", "b"), ("ab", "c")) == Seq("abc", "abc"))
  }

  test("greedy == sequential-by-rank for char-pair merges (oracle equivalence)") {
    // with single-char pairs, a merge never creates a new single-char
    // token, so applying ranks in order matches greedy lowest-first
    val merges = Seq(("e", "r"), ("i", "n"), ("s", "t"), ("a", "l"), ("t", "e"))
    def sequential(word: String): Seq[String] = {
      var toks: Seq[String] = word.map(_.toString)
      merges.foreach { case (l, r) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < toks.length) {
          if (i < toks.length - 1 && toks(i) == l && toks(i + 1) == r &&
              toks(i).length == 1 && toks(i + 1).length == 1) {
            out += (l + r); i += 2
          } else { out += toks(i); i += 1 }
        }
        toks = out.toSeq
      }
      toks
    }
    val words = Seq("interstellar", "alternate", "streaming", "erin",
      "ttte", "stst", "a", "in", "realist")
    words.foreach { w =>
      assert(enc(w, merges: _*) == sequential(w), s"word $w")
    }
  }

  test("column form is codegen'd end-to-end") {
    val s = spark; import s.implicits._
    val df = Seq("stream", "state", "x").toDF("w")
      .select(tokenizer.bpeEncode(col("w"),
        Seq(("s", "t"), ("e", "a"), ("a", "m"))).as("toks"))
    val got = df.as[Seq[String]].collect().toSeq
    assert(got == Seq(Seq("st", "r", "ea", "m"), Seq("st", "a", "t", "e"),
      Seq("x")))
  }
}
