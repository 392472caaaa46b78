package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, ArrayIntersect, ArrayUnion, Coalesce, Expression, ExpressionInfo, LambdaFunction, Literal, Multiply, NamedLambdaVariable, Size, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, StringType}

/** Rewrites the portable higher-order dot-product idiom
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (s, v) -> s + v)
  *
  * into the native codegen'd [[ArrayDotProduct]]. Users keep writing
  * the declarative HOF form (runs anywhere); sessions with graft
  * extensions installed execute the tight generated loop instead of
  * the interpreted fold — the optimizer-rule analog of what
  * `graft.functions.vec.arrayDot` gives the DataFrame API explicitly.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def isIdentityLambda(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      v.exprId == arg.exprId
    case _ => false
  }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(x1: NamedLambdaVariable, y1: NamedLambdaVariable, _),
                Seq(x2: NamedLambdaVariable, y2: NamedLambdaVariable), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(s1: NamedLambdaVariable, v1: NamedLambdaVariable, _),
              Seq(s2: NamedLambdaVariable, v2: NamedLambdaVariable), _),
            finish)
          if isDoubleArray(a) && isDoubleArray(b) &&
            ((x1.exprId == x2.exprId && y1.exprId == y2.exprId) ||
              (x1.exprId == y2.exprId && y1.exprId == x2.exprId)) &&
            ((s1.exprId == s2.exprId && v1.exprId == v2.exprId) ||
              (s1.exprId == v2.exprId && v1.exprId == s2.exprId)) &&
            isIdentityLambda(finish) =>
        ArrayDotProduct(a, b)
    }
}

/** Rewrites `size(array_intersect(a, b))` / `size(array_union(a, b))`
  * over string arrays into the native counting expressions
  * [[ArrayIntersectSize]] / [[ArrayUnionSize]] — the builtin
  * composition materializes the full intermediate array per row just
  * to read its length, which is the dominant allocation on the dedup
  * verify stages (one evaluation per candidate pair). Semantics are
  * preserved exactly, including `size`'s legacy -1-on-NULL mode
  * (a Coalesce to -1 when that mode is on).
  */
object RewriteSetSizes extends Rule[LogicalPlan] {

  private def isStringArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  private def substitute(counted: Expression, a: Expression,
      b: Expression, legacySizeOfNull: Boolean): Expression =
    // the counting expression is null exactly when an input is null,
    // so legacy -1-on-NULL is a Coalesce — unlike an If(IsNull(a)...)
    // guard, the children are evaluated ONCE (an expensive or
    // non-deterministic array expression must not run twice)
    if (legacySizeOfNull) Coalesce(Seq(counted, Literal(-1)))
    else counted

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ArrayIntersect(a, b), legacy)
          if isStringArray(a) && isStringArray(b) =>
        substitute(ArrayIntersectSize(a, b), a, b, legacy)
      case Size(ArrayUnion(a, b), legacy)
          if isStringArray(a) && isStringArray(b) =>
        substitute(ArrayUnionSize(a, b), a, b, legacy)
    }
}

/** The graft SQL function surface, shared by the two install paths:
  * [[GraftExtensions]] (SparkSessionExtensions, for sessions built
  * with `.withExtensions`) and [[GraftFunctions.ensureRegistered]]
  * (session-local registration for an already-created session — the
  * static `spark.sql.extensions` conf is ignored for second sessions
  * in one JVM).
  */
object GraftFunctions {
  import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
  import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "array_dot"),
      (args: Seq[Expression]) => {
        if (args.length != 2) {
          throw new IllegalArgumentException(
            s"array_dot requires exactly 2 arguments, got ${args.length}")
        }
        ArrayDotProduct(args(0), args(1))
      }),
    // Spark ships Bloom-filter expressions for its runtime join
    // filters but does not register them for SQL; expose them — the
    // Bloom pre-pass is the classic 100-TB existence-filter pattern
    // (build a compact filter from the small side, drop non-matching
    // rows before the exact join touches them).
    (FunctionIdentifier("bloom_build"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName, "bloom_build"),
      (args: Seq[Expression]) => args match {
        // honor the optional sizing args — silently defaulting them
        // would give a user asking for a 4M-item filter the default
        // capacity and a much higher false-positive rate
        case Seq(child) => new BloomFilterAggregate(child)
        case Seq(child, items) => new BloomFilterAggregate(child, items)
        case Seq(child, items, bits) => new BloomFilterAggregate(child, items, bits)
        case _ =>
          throw new IllegalArgumentException(
            s"bloom_build requires 1 to 3 arguments, got ${args.length}")
      }),
    (FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName, "bloom_might_contain"),
      (args: Seq[Expression]) => {
        if (args.length != 2) {
          throw new IllegalArgumentException(
            s"bloom_might_contain requires exactly 2 arguments, got ${args.length}")
        }
        BloomFilterMightContain(args(0), args(1))
      }),
    (FunctionIdentifier("simhash60"),
      new ExpressionInfo(classOf[SimHash60].getName, "simhash60"),
      (args: Seq[Expression]) => {
        if (args.length != 1) {
          throw new IllegalArgumentException(
            s"simhash60 requires exactly 1 argument, got ${args.length}")
        }
        SimHash60(args(0))
      }),
    (FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) => {
        if (args.length != 1) {
          throw new IllegalArgumentException(
            s"minhash_sig requires exactly 1 argument, got ${args.length}")
        }
        MinHashSig(args(0))
      }),
    (FunctionIdentifier("ppm_synth"),
      new ExpressionInfo(classOf[PpmSynth].getName, "ppm_synth"),
      (args: Seq[Expression]) => {
        if (args.length != 1) {
          throw new IllegalArgumentException(
            s"ppm_synth requires exactly 1 argument, got ${args.length}")
        }
        PpmSynth(args(0))
      }),
    (FunctionIdentifier("ppm_decode"),
      new ExpressionInfo(classOf[PpmDecode].getName, "ppm_decode"),
      (args: Seq[Expression]) => {
        if (args.length != 1) {
          throw new IllegalArgumentException(
            s"ppm_decode requires exactly 1 argument, got ${args.length}")
        }
        PpmDecode(args(0))
      }),
    (FunctionIdentifier("wav_synth"),
      new ExpressionInfo(classOf[WavSynth].getName, "wav_synth"),
      (args: Seq[Expression]) => {
        if (args.length != 1) {
          throw new IllegalArgumentException(
            s"wav_synth requires exactly 1 argument, got ${args.length}")
        }
        WavSynth(args(0))
      }),
    (FunctionIdentifier("wav_stats"),
      new ExpressionInfo(classOf[WavStats].getName, "wav_stats"),
      (args: Seq[Expression]) => {
        if (args.length != 1) {
          throw new IllegalArgumentException(
            s"wav_stats requires exactly 1 argument, got ${args.length}")
        }
        WavStats(args(0))
      }),
    (FunctionIdentifier("avi_synth"),
      new ExpressionInfo(classOf[AviSynth].getName, "avi_synth"),
      (args: Seq[Expression]) => {
        if (args.length != 1) {
          throw new IllegalArgumentException(
            s"avi_synth requires exactly 1 argument, got ${args.length}")
        }
        AviSynth(args(0))
      }),
    (FunctionIdentifier("avi_stats"),
      new ExpressionInfo(classOf[AviStats].getName, "avi_stats"),
      (args: Seq[Expression]) => {
        if (args.length != 1) {
          throw new IllegalArgumentException(
            s"avi_stats requires exactly 1 argument, got ${args.length}")
        }
        AviStats(args(0))
      }),
    (FunctionIdentifier("png_synth"),
      new ExpressionInfo(classOf[PngSynth].getName, "png_synth"),
      (args: Seq[Expression]) => {
        if (args.length != 1) {
          throw new IllegalArgumentException(
            s"png_synth requires exactly 1 argument, got ${args.length}")
        }
        PngSynth(args(0))
      }),
    (FunctionIdentifier("png_stats"),
      new ExpressionInfo(classOf[PngStats].getName, "png_stats"),
      (args: Seq[Expression]) => {
        if (args.length != 1) {
          throw new IllegalArgumentException(
            s"png_stats requires exactly 1 argument, got ${args.length}")
        }
        PngStats(args(0))
      }),
    (FunctionIdentifier("winnow_fps"),
      new ExpressionInfo(classOf[WinnowFps].getName, "winnow_fps"),
      (args: Seq[Expression]) => {
        if (args.length != 3) {
          throw new IllegalArgumentException(
            s"winnow_fps requires exactly 3 arguments (text, k, w), got ${args.length}")
        }
        def intLit(e: Expression, name: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"winnow_fps $name must be an integer literal, got $other")
        }
        WinnowFps(args(0), intLit(args(1), "k"), intLit(args(2), "w"))
      }),
    (FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (args: Seq[Expression]) => {
        if (args.length != 2) {
          throw new IllegalArgumentException(
            s"word_shingles requires exactly 2 arguments (text, n), got ${args.length}")
        }
        val n = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"word_shingles n must be an integer literal, got $other")
        }
        WordShingles(args(0), n)
      }),
    (FunctionIdentifier("array_intersect_size"),
      new ExpressionInfo(classOf[ArrayIntersectSize].getName, "array_intersect_size"),
      (args: Seq[Expression]) => {
        if (args.length != 2) {
          throw new IllegalArgumentException(
            s"array_intersect_size requires exactly 2 arguments, got ${args.length}")
        }
        ArrayIntersectSize(args(0), args(1))
      }),
    (FunctionIdentifier("array_union_size"),
      new ExpressionInfo(classOf[ArrayUnionSize].getName, "array_union_size"),
      (args: Seq[Expression]) => {
        if (args.length != 2) {
          throw new IllegalArgumentException(
            s"array_union_size requires exactly 2 arguments, got ${args.length}")
        }
        ArrayUnionSize(args(0), args(1))
      }))

  /** Register the function surface into an existing session's registry
    * (idempotent; overwrites are same-definition re-registrations).
    */
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit =
    all.foreach { case (id, info, builder) =>
      org.apache.spark.sql.graftbridge.Bridge.registerFunction(spark, id, info, builder)
    }
}

/** Session extensions: `array_dot` as a SQL function and the
  * dot-product rewrite rule. Install with
  * `spark.sql.extensions=graft.functions.GraftExtensions` (SURVEY.md
  * §4.3's SparkSessionExtensions path).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => RewriteDotProduct)
    ext.injectOptimizerRule(_ => RewriteSetSizes)
  }
}
