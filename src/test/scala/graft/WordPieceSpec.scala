package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{tokenizer, WordPieceKernel}

/** The WordPiece tokenizer-apply kernel: greedy longest-match
  * segmentation with an unconditional single-code-point fallback —
  * the corners the q169 oracle's recursive-CTE replay depends on.
  */
class WordPieceSpec extends SparkSpec {

  private def enc(word: String, vocab: String*): Seq[String] = {
    val arr = WordPieceKernel.encode(UTF8String.fromString(word),
      new WordPieceKernel.Vocab(vocab))
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  test("empty vocab: every code point is its own token") {
    assert(enc("abc") == Seq("a", "b", "c"))
    assert(enc("a") == Seq("a"))
  }

  test("longest match wins at each position") {
    // "abc" with both "ab" and "abc": the trigram is taken whole
    assert(enc("abc", "ab", "abc") == Seq("abc"))
    // without the trigram the bigram matches, then the fallback
    assert(enc("abc", "ab") == Seq("ab", "c"))
  }

  test("greedy is left-to-right, not globally optimal") {
    // greedy takes "ab" first, leaving c+d singles even though
    // "a"+"bcd" would segment into two pieces — the WordPiece rule
    assert(enc("abcd", "ab", "bcd") == Seq("ab", "c", "d"))
  }

  test("single code points segment without being in the vocab") {
    assert(enc("xyz", "ab") == Seq("x", "y", "z"))
  }

  test("match restarts after an unmatched position") {
    assert(enc("xabx", "ab") == Seq("x", "ab", "x"))
  }

  test("supplementary characters count as one position") {
    val g = "😀" // U+1F600, two UTF-16 chars, one code point
    assert(enc(s"${g}ab", "ab") == Seq(g, "ab"))
    // a piece containing the supplementary char matches as 2 code points
    assert(enc(s"${g}ab", s"${g}a") == Seq(s"${g}a", "b"))
  }

  test("column form encodes through codegen") {
    val s = spark
    import s.implicits._
    val out = Seq("stale", "test").toDF("w")
      .select(tokenizer.wordpieceEncode(col("w"), Seq("st", "ale", "te")).as("t"))
      .as[Seq[String]].collect().toSeq
    assert(out == Seq(Seq("st", "ale"), Seq("te", "st")))
  }

  test("longest-first across mixed piece lengths") {
    // at position 4, "ing" (3) outranks "in" (2)
    assert(enc("string", "in", "ing", "str") == Seq("str", "ing"))
    assert(enc("string", "in", "str") == Seq("str", "in", "g"))
  }
}
