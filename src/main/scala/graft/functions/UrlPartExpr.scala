package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd URL canonicalization: one part (`scheme` / `host` /
  * `domain` / `path` / `query` / `canonical`) of
  * [[graft.ext.Urls.canonicalize]], fused into the plan as a scalar
  * expression. Null on malformed input (the row gates out, never
  * throws) — same contract as the typed form.
  *
  * Why an Expression and not the typed `flatMap` it replaces: the
  * flatMap form puts a DeserializeToObject/SerializeFromObject pair
  * around the kernel, so every crawl-census row pays a full
  * InternalRow⇄JVM-object round trip just to extract a host. As an
  * expression the extraction rides the scan projection inside
  * WholeStageCodegen (locked by PlanShapeSpec for q_warc_hosts) — the
  * same upgrade path the cosine kernel took
  * ([[CosineSimilarityExpr]]). Semantics are shared with the typed
  * path by construction: both call the ONE canonicalize
  * implementation, so the kernels cannot drift.
  */
case class UrlPartExpr(child: Expression, part: String)
    extends UnaryExpression {

  require(UrlPartExpr.codeOf.contains(part),
    s"unknown url part '$part' (expected one of " +
      s"${UrlPartExpr.codeOf.keys.toSeq.sorted.mkString(", ")})")

  private val code = UrlPartExpr.codeOf(part)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${t.sql}")
  }

  override def prettyName: String = GraftFunctions.UrlPartName

  override def dataType: DataType = StringType

  override def nullable: Boolean = true

  protected override def nullSafeEval(input: Any): Any =
    UrlPartExpr.extractPart(input.asInstanceOf[UTF8String], code)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.UrlPartExpr.extractPart($c, $code);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): UrlPartExpr = copy(child = newChild)
}

object UrlPartExpr {

  val codeOf: Map[String, Int] = Map("scheme" -> 0, "host" -> 1,
    "domain" -> 2, "path" -> 3, "query" -> 4, "canonical" -> 5)

  /** The selected part of the canonicalized URL; null on malformed
    * input or a null part (absent query). Public static (companion
    * forwarder): generated code calls it by name.
    *
    * Named `extractPart`, NOT `part`: the case class already has a
    * `part()` field accessor, and Scala suppresses the companion's
    * static forwarder when the class carries any same-named method —
    * janino then saw only the accessor and the WHOLE STAGE fell back
    * to the interpreted path on every crawl-census query (found by the
    * r17 bench codegen-fallback monitor; the r16 driver tail's
    * unattributed CodeGenerator stack was this). */
  def extractPart(s: UTF8String, code: Int): UTF8String = {
    if (s == null) return null
    graft.ext.Urls.canonicalize(s.toString) match {
      case None => null
      case Some(c) =>
        val out = code match {
          case 0 => c.scheme
          case 1 => c.host
          case 2 => graft.ext.Urls.domainOf(c.host)
          case 3 => c.path
          case 4 => if (c.query.isEmpty) null else c.query
          case _ => c.canonical
        }
        if (out == null) null else UTF8String.fromString(out)
    }
  }
}
