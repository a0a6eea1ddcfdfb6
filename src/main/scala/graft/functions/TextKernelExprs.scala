package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** String-kernel expression base: a pure String→String graft kernel as
  * a codegen'd scalar (null in, null out), so corpus-wide cleanup
  * chains fuse into one scan projection instead of stacking typed-map
  * DeserializeToObject/SerializeFromObject pairs per stage — the r16
  * PlanAudit found q_pipeline_web paying TEN such boundaries for four
  * cleanup stages. The typed Dataset ops remain the registry-pinned
  * contracts; these call the SAME kernel functions, so the forms
  * cannot drift (spec-locked bit-identity). */
abstract class StringKernelExpr extends UnaryExpression {

  /** Fully-qualified static call target, e.g.
    * `graft.functions.NfcNormalizeExpr.apply1`. */
  protected def staticCall: String

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${t.sql}")
  }

  override def dataType: DataType = StringType

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$staticCall($c)")
}

/** [[graft.ext.Encoding.fixMojibake]]'s repaired text as a scalar
  * (the pass count stays on the typed op — curation chains gate on the
  * TEXT; accounting queries use the Dataset form). */
case class MojibakeRepairExpr(child: Expression) extends StringKernelExpr {
  override def prettyName: String = GraftFunctions.MojibakeName
  protected def staticCall: String =
    "graft.functions.MojibakeRepairExpr.apply1"
  protected override def nullSafeEval(input: Any): Any =
    MojibakeRepairExpr.apply1(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(
      newChild: Expression): MojibakeRepairExpr = copy(child = newChild)
}

object MojibakeRepairExpr {
  def apply1(s: UTF8String): UTF8String =
    UTF8String.fromString(
      graft.ext.Encoding.fixMojibake(s.toString).text)
}

/** Unicode NFC normalization (JDK Normalizer, same implementation as
  * [[graft.ext.Encoding.nfcNormalized]]) as a scalar. */
case class NfcNormalizeExpr(child: Expression) extends StringKernelExpr {
  override def prettyName: String = GraftFunctions.NfcName
  protected def staticCall: String =
    "graft.functions.NfcNormalizeExpr.apply1"
  protected override def nullSafeEval(input: Any): Any =
    NfcNormalizeExpr.apply1(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalizeExpr = copy(child = newChild)
}

object NfcNormalizeExpr {
  def apply1(s: UTF8String): UTF8String =
    UTF8String.fromString(graft.ext.Encoding.nfc(s.toString))
}
