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

/** Column-level entry point. */
object tokenizer {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Greedy BPE apply with a trained (left, right) merge list in
    * priority order.
    */
  def bpeEncode(c: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeEncode(Bridge.expression(c), merges))
}
