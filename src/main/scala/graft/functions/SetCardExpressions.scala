package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native set-cardinality expressions for string arrays:
  * `array_intersect_size(a, b)` ≡ `size(array_intersect(a, b))` and
  * `array_union_size(a, b)` ≡ `size(array_union(a, b))` — WITHOUT
  * materializing the intermediate array. The builtin composition
  * allocates and copies the full intersection/union per row just to
  * read its length; on the dedup verify stages (q25/q91/q120/q130/
  * q131: one evaluation per CANDIDATE PAIR) the throwaway array is
  * the dominant allocation. These count through hash sets instead —
  * same distinct/null-element semantics as the builtins:
  * null elements count as one value (present in the intersection only
  * if BOTH sides contain null), and a NULL input yields NULL.
  */
abstract class ArraySetCountBase extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<string> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = IntegerType
}

case class ArrayIntersectSize(left: Expression, right: Expression)
    extends ArraySetCountBase {

  override def prettyName: String = "array_intersect_size"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val rightSet = new java.util.HashSet[UTF8String]()
    var rightHasNull = false
    var i = 0
    val ny = y.numElements()
    while (i < ny) {
      if (y.isNullAt(i)) rightHasNull = true
      else rightSet.add(y.getUTF8String(i))
      i += 1
    }
    val seen = new java.util.HashSet[UTF8String]()
    var leftHasNull = false
    var count = 0
    i = 0
    val nx = x.numElements()
    while (i < nx) {
      if (x.isNullAt(i)) leftHasNull = true
      else {
        val v = x.getUTF8String(i)
        if (rightSet.contains(v) && seen.add(v)) count += 1
      }
      i += 1
    }
    if (leftHasNull && rightHasNull) count += 1
    count
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val rs = ctx.freshName("rightSet")
      val seen = ctx.freshName("seen")
      val rhn = ctx.freshName("rightHasNull")
      val lhn = ctx.freshName("leftHasNull")
      val cnt = ctx.freshName("cnt")
      val v = ctx.freshName("v")
      s"""
         |java.util.HashSet<org.apache.spark.unsafe.types.UTF8String> $rs =
         |  new java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>();
         |boolean $rhn = false;
         |for (int $i = 0; $i < $b.numElements(); $i++) {
         |  if ($b.isNullAt($i)) $rhn = true;
         |  else $rs.add($b.getUTF8String($i));
         |}
         |java.util.HashSet<org.apache.spark.unsafe.types.UTF8String> $seen =
         |  new java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>();
         |boolean $lhn = false;
         |int $cnt = 0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if ($a.isNullAt($i)) $lhn = true;
         |  else {
         |    org.apache.spark.unsafe.types.UTF8String $v = $a.getUTF8String($i);
         |    if ($rs.contains($v) && $seen.add($v)) $cnt++;
         |  }
         |}
         |if ($lhn && $rhn) $cnt++;
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayIntersectSize =
    copy(left = newLeft, right = newRight)
}

case class ArrayUnionSize(left: Expression, right: Expression)
    extends ArraySetCountBase {

  override def prettyName: String = "array_union_size"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val set = new java.util.HashSet[UTF8String]()
    var hasNull = false
    def addAll(arr: ArrayData): Unit = {
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        if (arr.isNullAt(i)) hasNull = true
        else set.add(arr.getUTF8String(i))
        i += 1
      }
    }
    addAll(a.asInstanceOf[ArrayData])
    addAll(b.asInstanceOf[ArrayData])
    set.size() + (if (hasNull) 1 else 0)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val set = ctx.freshName("set")
      val hn = ctx.freshName("hasNull")
      s"""
         |java.util.HashSet<org.apache.spark.unsafe.types.UTF8String> $set =
         |  new java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>();
         |boolean $hn = false;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if ($a.isNullAt($i)) $hn = true;
         |  else $set.add($a.getUTF8String($i));
         |}
         |for (int $i = 0; $i < $b.numElements(); $i++) {
         |  if ($b.isNullAt($i)) $hn = true;
         |  else $set.add($b.getUTF8String($i));
         |}
         |${ev.value} = $set.size() + ($hn ? 1 : 0);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayUnionSize =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry points for the native set-cardinality
  * expressions.
  */
object setcard {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Codegen'd `size(array_intersect(a, b))` without the array. */
  def intersectSize(a: Column, b: Column): Column =
    Bridge.column(ArrayIntersectSize(Bridge.expression(a), Bridge.expression(b)))

  /** Codegen'd `size(array_union(a, b))` without the array. */
  def unionSize(a: Column, b: Column): Column =
    Bridge.column(ArrayUnionSize(Bridge.expression(a), Bridge.expression(b)))
}
