package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native character n-grams: all `n`-char windows of a string, WITH
  * multiplicity — the unit of the char-LM scoring tier
  * ([[graft.ext.TextStats.lmScore]]).
  *
  * Replaces the HOF form (`transform(sequence(...), i => substr(...))`)
  * — `ArrayTransform` is a `CodegenFallback` expression, so the HOF kicks
  * its whole projection out of WholeStageCodegen AND re-walks the string
  * from the start on every `substr` call (O(len²) bytes touched per row
  * on multi-byte text). The kernel emits windows in one forward pass.
  * Semantics are identical to the HOF on every input (code-point
  * windows, length < n → empty) — property-asserted in NGramsExprSpec.
  *
  * Left: string. Right: FOLDABLE int n ≥ 1 (rejected at analysis
  * otherwise, same contract as [[NGramsExpr]]). */
case class CharNgramsExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case StringType if right.foldable && right.dataType == IntegerType =>
      right.eval() match {
        case i: Integer if i >= 1 => TypeCheckResult.TypeCheckSuccess
        case bad => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires n >= 1, got $bad")
      }
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, foldable int)")
  }

  override def prettyName: String = GraftFunctions.CharNgramsName

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val n: Int = right.eval().asInstanceOf[Int]

  override def nullSafeEval(text: Any, unused: Any): Any =
    CharNgramsExpr.compute(text.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val nRef = ctx.addReferenceObj("n", Integer.valueOf(n), "java.lang.Integer")
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"""${ev.value} = graft.functions.CharNgramsExpr$$.MODULE$$.compute(
         |  $t, $nRef.intValue());""".stripMargin)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object CharNgramsExpr {
  /** One forward pass over code points: windows [i, i+n) for
    * i ∈ [0, chars−n]. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val m = text.numChars()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[AnyRef](m - n + 1)
    var i = 0
    while (i <= m - n) {
      out(i) = text.substring(i, i + n)
      i += 1
    }
    new GenericArrayData(out)
  }
}
