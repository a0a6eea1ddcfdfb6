package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd cosine similarity over two numeric array columns.
  *
  * The portable implementation ([[graft.ext.Vectors.cosine]]) folds with
  * `aggregate`/`zip_with` — higher-order functions evaluate interpreted
  * (one closure call per element, boxed lambda variables). This expression
  * compiles to a single fused Java loop accumulating dot product and both
  * norms in one pass over the arrays — no allocation, JIT-vectorizable —
  * and is the preferred kernel for corpus-scale similarity scans (the
  * custom-`Expression` tier of the build plan, SURVEY §7.3).
  *
  * Semantics match [[graft.ext.Vectors.cosine]] BIT-FOR-BIT: every product
  * is widened to double and every accumulator is a left-to-right double
  * fold, so swapping kernels cannot flip an oracle hash or a top-k order.
  * Null if either array is null; arrays shorter than the other are folded
  * to the common prefix (caller guarantees equal dims, as with the HOF).
  */
case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  private def okType(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left) && okType(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  override def prettyName: String = GraftFunctions.CosineName

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getL = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val getR = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.$getL($i);
         |  double $yi = (double) $b.$getR($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Runtime registration of the graft native functions into a session's
  * function registry — works on ANY session (including one the caller
  * built without `SparkSessionExtensions`), so library entry points can
  * self-register lazily. */
object GraftFunctions {

  val CosineName = "graft_cosine"
  val SignBucketName = "graft_signbucket"

  /** Spark's bloom-filter build/probe expressions (the machinery behind
    * Catalyst's runtime-filter injection) exposed as callable functions:
    * they are implemented and codegen'd in Spark but not registered in the
    * public FunctionRegistry, so library code that wants an EXPLICIT bloom
    * pre-filter (e.g. decontamination against a fixed eval set) registers
    * them here under graft names. Arguments follow the internal contract:
    * agg(xxhash64(key), estimatedItems, numBits) → binary;
    * probe(bloomBinary, xxhash64(key)) → boolean. The probe's bloom
    * argument must be foldable (a literal) or a scalar subquery. */
  val BloomAggName = "graft_bloom_agg"
  val BloomProbeName = "graft_might_contain"
  val NGramsName = "graft_ngrams"
  val NGramsAllName = "graft_ngrams_all"
  val CharNgramsName = "graft_char_ngrams"
  val HttpBodyBytesName = "graft_http_body_bytes"
  val UrlPartName = "graft_url_part"
  val HtmlTextName = "graft_html_text"
  val MojibakeName = "graft_fix_mojibake"
  val NfcName = "graft_nfc"

  /** The function table, shared by the lazy runtime path ([[register]])
    * and the `spark.sql.extensions` path ([[GraftExtensions]]). */
  val all: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier(CosineName),
      new ExpressionInfo(classOf[CosineSimilarityExpr].getName, CosineName),
      (children: Seq[Expression]) =>
        CosineSimilarityExpr(children(0), children(1))),
    (FunctionIdentifier(SignBucketName),
      new ExpressionInfo(classOf[SignBucketExpr].getName, SignBucketName),
      (children: Seq[Expression]) =>
        SignBucketExpr(children(0), children(1))),
    (FunctionIdentifier(BloomAggName),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        BloomAggName),
      (children: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          children(0), children(1), children(2))),
    (FunctionIdentifier(BloomProbeName),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        BloomProbeName),
      (children: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children(0), children(1))),
    (FunctionIdentifier(NGramsName),
      new ExpressionInfo(classOf[NGramsExpr].getName, NGramsName),
      (children: Seq[Expression]) =>
        NGramsExpr(children(0), children(1), distinct = true)),
    (FunctionIdentifier(NGramsAllName),
      new ExpressionInfo(classOf[NGramsExpr].getName, NGramsAllName),
      (children: Seq[Expression]) =>
        NGramsExpr(children(0), children(1), distinct = false)),
    (FunctionIdentifier(CharNgramsName),
      new ExpressionInfo(classOf[CharNgramsExpr].getName, CharNgramsName),
      (children: Seq[Expression]) =>
        CharNgramsExpr(children(0), children(1))),
    (FunctionIdentifier(HttpBodyBytesName),
      new ExpressionInfo(classOf[HttpBodyBytesExpr].getName,
        HttpBodyBytesName),
      (children: Seq[Expression]) => HttpBodyBytesExpr(children(0))),
    (FunctionIdentifier(UrlPartName),
      new ExpressionInfo(classOf[UrlPartExpr].getName, UrlPartName),
      // part argument must be a string literal (folded at build time);
      // a column ref / null / non-string literal used to surface as an
      // unbound-attribute error or ClassCastException from eval(null)
      // (ADVICE r16) — validate first and name the function in the error
      (children: Seq[Expression]) => {
        val part = children(1)
        if (!part.foldable ||
            part.dataType != org.apache.spark.sql.types.StringType)
          throw new org.apache.spark.sql.AnalysisException(
            "USER_RAISED_EXCEPTION",
            Map("errorMessage" -> (s"$UrlPartName: the part argument " +
              "must be a string literal (one of host/path/query/" +
              "scheme), got " + part.sql)))
        val v = part.eval(null)
        if (v == null)
          throw new org.apache.spark.sql.AnalysisException(
            "USER_RAISED_EXCEPTION",
            Map("errorMessage" ->
              s"$UrlPartName: the part argument must not be NULL"))
        UrlPartExpr(children(0), v.toString)
      }),
    (FunctionIdentifier(HtmlTextName),
      new ExpressionInfo(classOf[HtmlTextExpr].getName, HtmlTextName),
      (children: Seq[Expression]) => HtmlTextExpr(children(0))),
    (FunctionIdentifier(MojibakeName),
      new ExpressionInfo(classOf[MojibakeRepairExpr].getName,
        MojibakeName),
      (children: Seq[Expression]) => MojibakeRepairExpr(children(0))),
    (FunctionIdentifier(NfcName),
      new ExpressionInfo(classOf[NfcNormalizeExpr].getName, NfcName),
      (children: Seq[Expression]) => NfcNormalizeExpr(children(0))))

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    all.foreach { case (ident, info, builder) =>
      if (!registry.functionExists(ident))
        registry.registerFunction(ident, info, builder)
    }
  }
}

/** The `spark.sql.extensions` entry point: deploy the graft native
  * functions cluster-wide with
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`), making
  * `graft_cosine` / `graft_signbucket` / the bloom pair first-class SQL
  * functions in every session the cluster serves — no library call
  * needed. The lazy [[GraftFunctions.register]] path stays for sessions
  * built without extension configs; both install the same table. */
class GraftExtensions
    extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}
