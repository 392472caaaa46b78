package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho-Corasick multi-pattern matching — the blocklist/PII scrub scan
  * at corpus scale: count every occurrence of EVERY needle in one pass
  * over the text, instead of one regex/replace pass per needle (the
  * per-needle form re-reads the 100-TB corpus |needles| times; the
  * automaton reads it once at O(len + matches)).
  *
  * Semantics: ALL occurrences are counted, overlapping included, and
  * nested needles each count independently ("hash join" also hits
  * "join" via the automaton's fail-link output closure). The
  * occurrence set of a needle in a text is indexing-unit independent,
  * so the UTF-16 scan below agrees with a codepoint-indexed oracle
  * (`substr(text, p, len) = needle` over every p) for any well-formed
  * needle.
  *
  * Scale notes mirror [[BpeKernel]]: the needle set is config-sized
  * (a blocklist — hundreds to low thousands of entries), compiled ONCE
  * at expression construction into goto/fail/output arrays shipped as
  * a codegen reference object; per row the scan is a single
  * left-to-right pass, no joins, no per-row compilation, and the
  * (needle-count-sized) output array aggregates with a bounded
  * posexplode — the q130 shape — never a corpus self-join.
  */
object MultiMatchKernel {

  /** Compiled automaton: trie with BFS fail links and output lists
    * closed under fail links (each state lists every needle index
    * ending at it, directly or through a suffix).
    */
  final class Automaton(needles: Seq[String]) extends Serializable {
    val n: Int = needles.length
    private val children =
      scala.collection.mutable.ArrayBuffer(
        new java.util.HashMap[Character, Integer]())
    private val outBuf =
      scala.collection.mutable.ArrayBuffer(List.empty[Int])
    // trie
    needles.zipWithIndex.foreach { case (p, idx) =>
      require(p.nonEmpty, "empty needle")
      var st = 0
      p.foreach { ch =>
        val next = children(st).get(ch)
        if (next != null) st = next.intValue()
        else {
          children += new java.util.HashMap[Character, Integer]()
          outBuf += Nil
          children(st).put(ch, Integer.valueOf(children.size - 1))
          st = children.size - 1
        }
      }
      outBuf(st) = idx :: outBuf(st)
    }
    val fail: Array[Int] = new Array[Int](children.size)
    // BFS fail links + output closure
    private val queue = new java.util.ArrayDeque[Integer]()
    children(0).forEach { (_, s) => fail(s) = 0; queue.add(s) }
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      children(u).forEach { (ch, v) =>
        var f = fail(u)
        while (f != 0 && !children(f).containsKey(ch)) f = fail(f)
        val fc = children(f).get(ch)
        fail(v) = if (fc != null && fc.intValue() != v.intValue()) fc.intValue() else 0
        outBuf(v) = outBuf(v) ::: outBuf(fail(v))
        queue.add(v)
      }
    }
    val goto: Array[java.util.HashMap[Character, Integer]] = children.toArray
    val outs: Array[Array[Int]] = outBuf.map(_.toArray).toArray
  }

  /** One-pass count of every needle's occurrences. */
  def count(text: UTF8String, ac: Automaton): ArrayData = {
    val s = text.toString
    val counts = new Array[Long](ac.n)
    var st = 0
    var i = 0
    while (i < s.length) {
      val c = Character.valueOf(s.charAt(i))
      var cur = st
      var next = -1
      while (next == -1) {
        val m = ac.goto(cur).get(c)
        if (m != null) next = m.intValue()
        else if (cur == 0) next = 0
        else cur = ac.fail(cur)
      }
      st = next
      val o = ac.outs(st)
      var j = 0
      while (j < o.length) { counts(o(j)) += 1L; j += 1 }
      i += 1
    }
    new GenericArrayData(counts)
  }
}

/** `multi_match_count(text)` with a construction-time needle list:
  * STRING -> ARRAY<BIGINT> of per-needle occurrence counts (index i =
  * needle i). Codegen'd; the compiled automaton rides along as a
  * reference object (one instance per task, not per row).
  */
case class MultiMatchCount(child: Expression, needles: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "multi_match_count"

  @transient private lazy val automaton = new MultiMatchKernel.Automaton(needles)

  override protected def nullSafeEval(input: Any): Any =
    MultiMatchKernel.count(input.asInstanceOf[UTF8String], automaton)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[MultiMatchKernel.Automaton].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MultiMatchKernel.count($c, $acRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiMatchCount =
    copy(child = newChild)
}

/** Column-level entry point. */
object scrub {
  import org.apache.spark.sql.graftbridge.Bridge

  /** One-pass Aho-Corasick occurrence counts for a fixed needle list. */
  def multiMatchCount(c: Column, needles: Seq[String]): Column =
    Bridge.column(MultiMatchCount(Bridge.expression(c), needles))
}
