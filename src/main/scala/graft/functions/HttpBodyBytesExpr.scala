package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Byte-domain HTTP entity slice: the bytes of a crawl `response`
  * payload AFTER the first CRLFCRLF (the HTTP/1.x header/entity
  * separator, RFC 9112 §2.1), or null when no separator exists.
  *
  * The string-domain twin ([[graft.sources.Warc.Http.body]]) decodes the
  * whole payload via a UTF-8 cast — right for HTML/text entities,
  * CORRUPTING for binary ones: a JPEG's bytes are not valid UTF-8, the
  * cast substitutes U+FFFD for every invalid sequence, and the image is
  * unrecoverable. This expression never decodes. The HTTP header block
  * is ASCII by spec, so the separator offset is computable directly on
  * bytes, and the entity comes back byte-exact — the bridge from crawl
  * archives ([[graft.sources.Warc]]) to the multimodal decode tier
  * ([[graft.ext.Multimodal]]). (Reference ingest tier:
  * `stream_generator.py:49-50`; this is its 100 TB multimodal analogue.)
  *
  * Codegen'd via a static call to [[HttpBodyBytesExpr.slice]], so the
  * slice rides the scan projection inside WholeStageCodegen — one
  * byte-scan per payload, one copy for the entity, no string
  * materialization of multi-MB image bodies.
  */
case class HttpBodyBytesExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary input, got ${t.sql}")
  }

  override def prettyName: String = GraftFunctions.HttpBodyBytesName

  override def dataType: DataType = BinaryType

  override def nullable: Boolean = true

  protected override def nullSafeEval(input: Any): Any =
    HttpBodyBytesExpr.slice(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.HttpBodyBytesExpr.slice($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): HttpBodyBytesExpr = copy(child = newChild)
}

object HttpBodyBytesExpr {

  /** Bytes strictly after the first `\r\n\r\n`; null when the payload
    * carries no header/entity separator (truncated or non-HTTP bytes —
    * the caller's filter drops the row). Public static (companion
    * forwarder): generated code calls it by name. */
  def slice(payload: Array[Byte]): Array[Byte] = {
    val n = payload.length
    var i = 0
    while (i + 3 < n) {
      if (payload(i) == '\r' && payload(i + 1) == '\n' &&
          payload(i + 2) == '\r' && payload(i + 3) == '\n')
        return java.util.Arrays.copyOfRange(payload, i + 4, n)
      i += 1
    }
    null
  }
}
