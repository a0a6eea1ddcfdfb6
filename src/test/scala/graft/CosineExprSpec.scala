package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Vectors
import graft.functions.GraftFunctions

/** Native codegen'd cosine expression: bit-identical to the portable HOF
  * fold (same left-to-right double accumulation), null-safe, and usable
  * from SQL after runtime registration. */
class CosineExprSpec extends AnyFunSuite with SparkTestSupport {

  private def vecs = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, Array(0.1f, -2.3f, 4.5f, 0.007f), Array(1.1f, 2.2f, -3.3f, 9.9f)),
      (2L, Array(1f, 0f, 0f, 0f), Array(1f, 0f, 0f, 0f)),
      (3L, Array(0.33f, 0.77f, 1e-7f, 123.456f), Array(-0.01f, 55f, 2f, 0.5f)))
      .toDF("id", "a", "b")
  }

  test("bit-identical to the portable fold kernel") {
    val got = vecs.select(col("id"),
        Vectors.cosineNative(spark, col("a"), col("b")).as("nat"),
        Vectors.cosine(col("a"), col("b")).as("hof"))
      .collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"id=${r.getLong(0)}: ${r.getDouble(1)} != ${r.getDouble(2)}")
    }
  }

  test("null array → null result") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Option.empty[Array[Float]], Some(Array(1f, 2f))))
      .toDF("id", "a", "b")
    val r = df.select(Vectors.cosineNative(spark, col("a"), col("b"))).head()
    assert(r.isNullAt(0))
  }

  test("registered function is callable from SQL text") {
    GraftFunctions.register(spark)
    vecs.createOrReplaceTempView("cos_vecs")
    val r = spark.sql(
      "SELECT graft_cosine(a, b) FROM cos_vecs WHERE id = 2").head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
  }

  test("double-element arrays accepted (mixed float/double)") {
    val s = spark
    import s.implicits._
    val df = Seq((Array(1.0, 2.0), Array(1f, 2f))).toDF("a", "b")
    val r = df.select(Vectors.cosineNative(spark, col("a"), col("b"))).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
  }

  test("GraftExtensions injects the same function table (spark.sql.extensions path)") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext)
    val registry = org.apache.spark.sql.GraftExtensionsTestAccess
      .buildRegistry(ext,
        org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin.clone())
    GraftFunctions.all.foreach { case (ident, _, _) =>
      assert(registry.functionExists(ident), ident.funcName)
    }
    // the injected builder produces the real expression
    val e = registry.lookupFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier(GraftFunctions.CosineName),
      Seq(org.apache.spark.sql.catalyst.expressions.Literal.create(
          Array(1.0, 0.0), org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)),
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          Array(1.0, 0.0), org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType))))
    assert(e.isInstanceOf[graft.functions.CosineSimilarityExpr])
  }
}
