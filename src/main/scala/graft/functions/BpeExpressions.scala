package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy BPE (byte-pair-encoding) tokenizer APPLY — the most-executed
  * text operator in a training pipeline: encode every word of a corpus
  * with a TRAINED merge table. No Spark built-in exists; per the
  * reference's function surface this is a scalar string->array kernel,
  * so it lands as a codegen'd Catalyst expression beside
  * [[WordShingles]] (TextHashExpressions.scala), never a per-row UDF.
  *
  * Algorithm (the standard tokenizer-apply loop, e.g. the GPT-2
  * reference implementation): start from single-codepoint tokens;
  * repeatedly find the adjacent token pair with the LOWEST merge rank
  * and fuse every leftmost non-overlapping occurrence of that pair;
  * stop when no adjacent pair is in the table.
  *
  * Scale notes: the merge table is a trained artifact (~50k entries
  * for a real tokenizer, 15 in q162's oracle-gated form). It is
  * parsed ONCE at expression construction into a flat hash map held
  * as a codegen reference object — shipped to executors inside the
  * serialized task, looked up O(1) per adjacent pair, zero per-row
  * parse and zero joins. Applying over the DISTINCT-word vocabulary
  * (q111's classic BPE optimization) keeps the kernel off the corpus
  * hot path entirely: the corpus is tokenized by word lookup, the
  * kernel runs |V| times, not |corpus| times.
  */
object BpeKernel {

  /** Merge table: (left, right) -> rank, keyed by left + ' ' + right
    * (tokens come from whitespace-split words, so no token contains a
    * space and the key is unambiguous). Lower rank = higher priority.
    */
  final class Table(merges: Seq[(String, String)]) extends Serializable {
    val ranks = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      ranks.putIfAbsent(l + " " + r, Integer.valueOf(i))
    }
  }

  /** Split into code points (NOT UTF-16 chars — a supplementary
    * character must be one base token, matching DuckDB's
    * character-indexed substr).
    */
  private def codePointTokens(s: String): Array[String] = {
    val out = new Array[String](s.codePointCount(0, s.length))
    var i = 0
    var k = 0
    while (i < s.length) {
      val cc = Character.charCount(s.codePointAt(i))
      out(k) = s.substring(i, i + cc)
      i += cc
      k += 1
    }
    out
  }

  /** Greedy encode of one word. Termination: every merge shrinks the
    * token count by >= 1, so the loop runs at most len-1 times.
    */
  def encode(word: UTF8String, table: Table): ArrayData = {
    var toks = codePointTokens(word.toString)
    var n = toks.length
    var done = n < 2
    while (!done) {
      // lowest-rank adjacent pair present in the table
      var best = Int.MaxValue
      var bl: String = null
      var br: String = null
      var i = 0
      while (i < n - 1) {
        val r = table.ranks.get(toks(i) + " " + toks(i + 1))
        if (r != null && r.intValue() < best) {
          best = r.intValue(); bl = toks(i); br = toks(i + 1)
        }
        i += 1
      }
      if (bl == null) done = true
      else {
        // fuse every leftmost non-overlapping occurrence of (bl, br)
        val out = new Array[String](n)
        var k = 0
        i = 0
        while (i < n) {
          if (i < n - 1 && toks(i) == bl && toks(i + 1) == br) {
            out(k) = bl + br; i += 2
          } else {
            out(k) = toks(i); i += 1
          }
          k += 1
        }
        toks = out
        n = k
        done = n < 2
      }
    }
    val arr = new Array[AnyRef](n)
    var i = 0
    while (i < n) { arr(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(arr)
  }
}

/** `bpe_encode(word)` with a construction-time merge table: STRING ->
  * ARRAY<STRING>. Codegen'd; the parsed table rides along as a
  * reference object (one instance per task, not per row).
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  @transient private lazy val table = new BpeKernel.Table(merges)

  override protected def nullSafeEval(input: Any): Any =
    BpeKernel.encode(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("bpeTable", table,
      classOf[BpeKernel.Table].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeKernel.encode($c, $tableRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

/** Greedy longest-match subword segmentation — the WordPiece/
  * SentencePiece INFERENCE rule (without the continuation-prefix
  * bookkeeping): at each position take the longest vocab piece that
  * matches, else emit the single code point and advance. This is the
  * other standard tokenizer-apply family next to BPE's merge loop
  * ([[BpeKernel]]): BPE replays trained merges, WordPiece matches a
  * trained vocabulary directly — one left-to-right pass, O(len ·
  * maxPieceLen) per word, no backtracking.
  *
  * Scale notes mirror BpeKernel's: the vocabulary is a trained
  * artifact (~30k pieces real-world), parsed once at construction
  * into a hash set shipped as a codegen reference object — O(1)
  * membership per candidate, zero joins. Single code points always
  * fall back whether or not they are in the vocab, so segmentation
  * is total (no UNK loop).
  */
object WordPieceKernel {

  final class Vocab(pieces: Seq[String]) extends Serializable {
    val set = new java.util.HashSet[String](pieces.size * 2)
    /** Longest piece length in CODE POINTS (a supplementary character
      * counts 1, matching character-indexed oracle substr).
      */
    var maxLen = 1
    pieces.foreach { p =>
      set.add(p)
      maxLen = math.max(maxLen, p.codePointCount(0, p.length))
    }
  }

  /** Greedy longest-match encode of one word. */
  def encode(word: UTF8String, vocab: Vocab): ArrayData = {
    val s = word.toString
    val out = new scala.collection.mutable.ArrayBuffer[AnyRef](4)
    var i = 0 // UTF-16 char index
    while (i < s.length) {
      // longest match first: try maxLen code points down to 2, then
      // fall back to the single code point unconditionally
      var matched: String = null
      var cp = math.min(vocab.maxLen, s.codePointCount(i, s.length))
      while (matched == null && cp >= 2) {
        val end = s.offsetByCodePoints(i, cp)
        val cand = s.substring(i, end)
        if (vocab.set.contains(cand)) matched = cand
        else cp -= 1
      }
      if (matched == null)
        matched = s.substring(i, i + Character.charCount(s.codePointAt(i)))
      out += UTF8String.fromString(matched)
      i += matched.length
    }
    new GenericArrayData(out.toArray)
  }
}

/** `wordpiece_encode(word)` with a construction-time vocabulary:
  * STRING -> ARRAY<STRING>. Codegen'd; the parsed vocab rides along
  * as a reference object (one instance per task, not per row).
  */
case class WordPieceEncode(child: Expression, pieces: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "wordpiece_encode"

  @transient private lazy val vocab = new WordPieceKernel.Vocab(pieces)

  override protected def nullSafeEval(input: Any): Any =
    WordPieceKernel.encode(input.asInstanceOf[UTF8String], vocab)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vocabRef = ctx.addReferenceObj("wpVocab", vocab,
      classOf[WordPieceKernel.Vocab].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WordPieceKernel.encode($c, $vocabRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceEncode =
    copy(child = newChild)
}

/** Column-level entry point. */
object tokenizer {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Greedy BPE apply with a trained (left, right) merge list in
    * priority order.
    */
  def bpeEncode(c: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeEncode(Bridge.expression(c), merges))

  /** Greedy longest-match subword segmentation with a trained
    * vocabulary (single code points are always valid fallbacks).
    */
  def wordpieceEncode(c: Column, pieces: Seq[String]): Column =
    Bridge.column(WordPieceEncode(Bridge.expression(c), pieces))
}
