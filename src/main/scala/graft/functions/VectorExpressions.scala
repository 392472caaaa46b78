package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the embedding dot product: a tight
  * whole-stage-codegen double loop over the two array columns, instead
  * of the interpreted higher-order `aggregate(zip_with(...))` chain
  * (which allocates a zipped array and folds it element-by-element in
  * the interpreter — ~10x slower on the quadratic pair stages of the
  * similarity operators).
  *
  * SURVEY.md §4.3's custom-expression path: (b) in the preference
  * order — a scalar Expression with doGenCode, no new plan nodes.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType

  // Can produce NULL even from non-null inputs (length mismatch, null
  // element) — must not inherit child nullability: a false
  // non-nullable claim makes nullSafeCodeGen emit `false = true;`
  // (Janino error -> silent interpreted fallback) and lets the
  // optimizer constant-fold IsNull over it.
  override def nullable: Boolean = true

  override def prettyName: String = "array_dot"

  /** NULL on length mismatch or any null element — the exact
    * semantics of the higher-order `aggregate(zip_with(a,b,*))` form
    * (zip_with pads with null and the sum propagates it), so the
    * optimizer rewrite below is a pure substitution.
    */
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |    } else {
         |      $s += $a.getDouble($i) * $b.getDouble($i);
         |    }
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry points for the native vector expressions. */
object vec {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Codegen'd dot product of two array<double> columns. */
  def arrayDot(a: Column, b: Column): Column =
    Bridge.column(ArrayDotProduct(Bridge.expression(a), Bridge.expression(b)))
}
