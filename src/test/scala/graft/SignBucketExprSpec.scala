package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Vectors

/** Native sign-bucket expression: bit-identical to the portable fold. */
class SignBucketExprSpec extends AnyFunSuite with SparkTestSupport {

  test("native bucket equals fold bucket for every table on random vectors") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val df = (0 until 50).map(i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat)))
      .toDF("id", "v")
    val hyper = Vectors.hyperplanes(seed = 42L, tables = 3, planes = 8, dim = 16)
    (0 until 3).foreach { t =>
      val got = df.select(
          Vectors.signBucketNative(spark, col("v"), hyper, t).as("nat"),
          Vectors.signBucket(col("v"), hyper, t).as("fold"))
        .collect()
      got.foreach(r => assert(r.getLong(0) == r.getLong(1), s"table $t"))
    }
  }

  test("null vector → null bucket") {
    val s = spark
    import s.implicits._
    val hyper = Vectors.hyperplanes(1L, 1, 4, 4)
    val df = Seq(Option.empty[Array[Float]]).toDF("v")
    assert(df.select(Vectors.signBucketNative(spark, col("v"), hyper, 0))
      .head().isNullAt(0))
  }
}
