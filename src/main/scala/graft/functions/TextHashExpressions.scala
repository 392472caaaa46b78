package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernels behind [[SimHash60]] / [[MinHashSig]]. One MD5 per
  * word/shingle, all loops primitive — called once per ROW from
  * generated code, so the whole document signature is computed inside
  * the scan stage with zero shuffle. The declarative equivalents
  * (explode words/shingles → partial-aggregate per doc) shuffle the
  * entire tokenized corpus; at 100 TB that is the single largest
  * exchange in the dedup pipeline, and these kernels delete it.
  *
  * Hash definitions are IDENTICAL to graft.queries.Hashing (md5-prefix
  * integers, universal-hash MinHash permutations), so the DuckDB
  * oracles of q23/q24 keep matching bit-for-bit.
  */
object TextHashing {

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First `nHex` hex digits (nibbles) of md5(bytes) as a long
    * (nHex <= 15 keeps it positive in signed 64) — the JVM twin of
    * Hashing.hash28/hash60's conv(substring(md5(x),1,n),16,10).
    */
  private def md5Prefix(bytes: Array[Byte], nHex: Int): Long = {
    val d = md.get()
    d.reset()
    val h = d.digest(bytes)
    var v = 0L
    var i = 0
    while (i < nHex) {
      val b = h(i >> 1) & 0xff
      v = (v << 4) | (if ((i & 1) == 0) b >>> 4 else b & 0xf)
      i += 1
    }
    v
  }

  /** Split on single spaces keeping empty tokens — the exact token set
    * of Spark `split(text, " ")` (regex split, limit -1).
    */
  private def words(text: UTF8String): Array[String] =
    text.toString.split(" ", -1)

  /** 60-bit frequency-weighted SimHash of whitespace-tokenized text:
    * bit b is set iff strictly more tokens (with multiplicity) have
    * bit b set in their 60-bit md5-prefix hash than not — exactly
    * q24's explode + sum(+1/-1) + (sum > 0) definition.
    */
  def simhash60(text: UTF8String): Long = {
    val ws = words(text)
    val counts = new Array[Int](60)
    var i = 0
    while (i < ws.length) {
      val h = md5Prefix(ws(i).getBytes("UTF-8"), 15)
      var b = 0
      while (b < 60) {
        if (((h >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) {
      if (counts(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  /** MinHash permutation coefficients, taken from the single source of
    * truth shared with the DuckDB oracle SQL (Hashing.perm).
    */
  private val K = 12
  private val P = graft.queries.Hashing.P
  private val permA: Array[Long] =
    (0 until K).map(i => graft.queries.Hashing.perm(i)._1).toArray
  private val permB: Array[Long] =
    (0 until K).map(i => graft.queries.Hashing.perm(i)._2).toArray

  /** The 12-value universal-hash MinHash signature over distinct word
    * 3-gram shingles: min_i((a_i*h28(shingle) + b_i) mod P) — exactly
    * q23's shingles→hash28→minhashPerm aggregate chain.
    */
  def minhashSig(text: UTF8String): ArrayData = {
    val ws = words(text)
    val n = ws.length
    val last = math.max(n - 3, 0) // shingle start indices 0..last
    val seen = new java.util.HashSet[String]()
    val mins = Array.fill(K)(Long.MaxValue)
    var i = 0
    while (i <= last) {
      val end = math.min(i + 3, n)
      val sb = new java.lang.StringBuilder
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(ws(j))
        j += 1
      }
      val sh = sb.toString
      if (seen.add(sh)) {
        val h = md5Prefix(sh.getBytes("UTF-8"), 7)
        var k = 0
        while (k < K) {
          val v = (permA(k) * h + permB(k)) % P
          if (v < mins(k)) mins(k) = v
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Winnowing fingerprint selection (Schleimer-Wilkerson-Aiken 2003,
    * the MOSS sampler; reference analog: local fingerprint selection
    * over the event text stream) in ONE imperative pass: hash every
    * k-word gram to its 28-bit md5-prefix (identical to
    * Hashing.hash28, so q176's DuckDB oracle is unchanged), slide a
    * w-gram window over the hash sequence with a monotonic deque
    * (O(grams), independent of w), and keep each window's minimum,
    * distinct in first-occurrence order — exactly the declarative
    * split → transform/slice/md5 → transform/array_min/array_distinct
    * chain (Dedup.winnowFpsDeclarative), whose higher-order-function
    * tree is CodegenFallback AND cost a 36 s Janino cold-compile
    * spike at sf0.1. Docs with fewer than k words, or fewer than w
    * grams, select nothing (the guarantee needs >= w+k-1 words).
    */
  def winnowFps(text: UTF8String, k: Int, w: Int): ArrayData = {
    val ws = words(text)
    val n = ws.length
    val g = n - k + 1 // gram count; every gram is a FULL k words
    if (g < w) return new GenericArrayData(Array.empty[Any])
    val grams = new Array[Long](g)
    var i = 0
    while (i < g) {
      val sb = new java.lang.StringBuilder
      var j = i
      while (j < i + k) {
        if (j > i) sb.append(' ')
        sb.append(ws(j))
        j += 1
      }
      grams(i) = md5Prefix(sb.toString.getBytes("UTF-8"), 7)
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val dq = new Array[Int](g) // indices of candidate minima, increasing value
    var head = 0
    var tail = 0
    i = 0
    while (i < g) {
      while (tail > head && grams(dq(tail - 1)) >= grams(i)) tail -= 1
      dq(tail) = i
      tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) seen.add(grams(dq(head)))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var m = 0
    while (it.hasNext) {
      out(m) = it.next().longValue()
      m += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct word n-gram shingles in first-occurrence order — the
    * JVM twin of the declarative split → transform/slice/concat_ws →
    * array_distinct chain (Hashing.shingles). The declarative form is
    * a higher-order-function tree, and HOFs are CodegenFallback:
    * every row pays interpreted lambda dispatch plus an intermediate
    * non-distinct array allocation. This kernel builds the distinct
    * set in one pass and runs inside whole-stage codegen. Shares the
    * truncated-final-shingle rule with [[minhashSig]]: docs shorter
    * than n words yield one truncated shingle.
    */
  def wordShingles(text: UTF8String, n: Int): ArrayData = {
    val ws = words(text)
    val cnt = ws.length
    val last = math.max(cnt - n, 0)
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= last) {
      val end = math.min(i + n, cnt)
      val sb = new java.lang.StringBuilder
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(ws(j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) {
      out(k) = UTF8String.fromString(it.next())
      k += 1
    }
    new GenericArrayData(out)
  }
}

/** Codegen'd 60-bit SimHash of a string column (see [[TextHashing]]).
  * SURVEY.md §4.3 path (b): a scalar Expression — the signature is
  * computed inside the scan's whole-stage-codegen loop, replacing
  * q24's explode + 60 partial-aggregate shuffle of every word in the
  * corpus with a zero-shuffle map.
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${t.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override protected def nullSafeEval(input: Any): Any =
    TextHashing.simhash60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashing.simhash60($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

/** Codegen'd 12-value MinHash signature of a string column (see
  * [[TextHashing]]) — one array per document from the scan stage,
  * replacing q23's explode + 12 partial-aggregate shuffle of every
  * shingle in the corpus.
  */
case class MinHashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    TextHashing.minhashSig(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashing.minhashSig($c)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Codegen'd distinct word n-gram shingle array of a string column
  * (see [[TextHashing.wordShingles]]). `n` is a plan-time constant —
  * a parameter, not a child expression — so generated code inlines
  * it. Output order (first occurrence) and the truncated-short-doc
  * rule match the declarative array_distinct form bit-for-bit, which
  * the DuckDB-gated dedup queries rely on.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires n >= 1, got $n")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    TextHashing.wordShingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashing.wordShingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** Codegen'd winnowing fingerprint array of a string column (see
  * [[TextHashing.winnowFps]]). `k` (words per gram) and `w` (grams
  * per window) are plan-time constants inlined into generated code.
  * The selection rule, hash (md5-prefix hash28), short-doc cutoffs,
  * and first-occurrence distinct order match the declarative form
  * bit-for-bit — pinned by WinnowingSpec's equivalence test — so
  * q176's DuckDB oracle needs no change.
  */
case class WinnowFps(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k >= 1 && w >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires k >= 1 and w >= 1, got k=$k w=$w")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fps"

  override protected def nullSafeEval(input: Any): Any =
    TextHashing.winnowFps(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashing.winnowFps($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}

/** Column-level entry points for the native text-hash expressions. */
object texthash {
  import org.apache.spark.sql.graftbridge.Bridge

  /** 60-bit SimHash of a string column, codegen'd, zero-shuffle. */
  def simhash60(c: Column): Column =
    Bridge.column(SimHash60(Bridge.expression(c)))

  /** 12-value MinHash signature array of a string column. */
  def minhashSig(c: Column): Column =
    Bridge.column(MinHashSig(Bridge.expression(c)))

  /** Distinct word n-gram shingles, codegen'd. */
  def wordShingles(c: Column, n: Int): Column =
    Bridge.column(WordShingles(Bridge.expression(c), n))

  /** Winnowing (MOSS) fingerprint selection, codegen'd, one pass. */
  def winnowFps(c: Column, k: Int, w: Int): Column =
    Bridge.column(WinnowFps(Bridge.expression(c), k, w))
}
