package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd HTML→text extraction: [[graft.ext.Html.extractText]] as a
  * scalar expression, so the crawl→text path (HTTP entity → readable
  * document) runs inside the scan projection instead of behind a typed
  * map's DeserializeToObject/SerializeFromObject pair — the same
  * upgrade [[UrlPartExpr]] gave the host census (VERDICT r15 #5's
  * pattern applied to the OTHER per-record crawl kernel). Null in,
  * null out; one shared implementation, so the column form cannot
  * drift from the typed form the specs pin. */
case class HtmlTextExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${t.sql}")
  }

  override def prettyName: String = GraftFunctions.HtmlTextName

  override def dataType: DataType = StringType

  protected override def nullSafeEval(input: Any): Any =
    HtmlTextExpr.extract(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HtmlTextExpr.extract($c)")

  override protected def withNewChildInternal(
      newChild: Expression): HtmlTextExpr = copy(child = newChild)
}

object HtmlTextExpr {

  /** Public static (companion forwarder): generated code calls it. */
  def extract(html: UTF8String): UTF8String =
    UTF8String.fromString(graft.ext.Html.extractText(html.toString))
}
