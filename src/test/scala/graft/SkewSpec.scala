package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Skew

/** Salted two-phase aggregation must be EXACTLY equivalent to the plain
  * groupBy for algebraic aggregates, for any salt count. */
class SkewSpec extends AnyFunSuite with SparkTestSupport {

  private def skewed = {
    val s = spark
    import s.implicits._
    // one hot key (90% of rows) + a tail
    ((1 to 900).map(i => ("hot", i.toDouble)) ++
      (1 to 50).map(i => ("warm", i * 2.0)) ++
      Seq(("cold", 7.0)))
      .toDF("k", "v")
  }

  test("saltedStats equals plain groupBy stats for every key") {
    val expect = skewed.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("sum"),
        min("v").as("min"), max("v").as("max"))
      .withColumn("avg", col("sum") / col("n"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    for (buckets <- Seq(1, 8, 64)) {
      val got = Skew.saltedStats(skewed, Seq("k"), "v", buckets)
        .collect().map(r => r.getAs[String]("k") ->
          ((r.getAs[Long]("n"), r.getAs[Double]("sum"),
            r.getAs[Double]("min"), r.getAs[Double]("max")))).toMap
      assert(got == expect, s"buckets=$buckets")
    }
  }

  test("phase-1 actually splits the hot key across salt groups") {
    val phase1Groups = skewed
      .withColumn("__salt",
        pmod(spark_partition_id() + monotonically_increasing_id(), lit(16)))
      .filter(col("k") === "hot")
      .select("__salt").distinct().count()
    assert(phase1Groups > 1, "hot key not split")
  }

  test("saltedJoin equals the plain inner join, row for row") {
    val s = spark
    import s.implicits._
    val dim = Seq(("hot", "H"), ("warm", "W"), ("never", "N"))
      .toDF("k", "label") // 'cold' missing → inner join drops it
    val expect = skewed.join(dim, Seq("k"))
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    for (buckets <- Seq(1, 4, 32)) {
      val got = Skew.saltedJoin(skewed, dim, Seq("k"), buckets)
        .select("k", "v", "label")
        .collect().map(_.toSeq).sortBy(_.mkString("|"))
      assert(got.length == expect.length, s"buckets=$buckets")
      assert(got.toSeq == expect.toSeq, s"buckets=$buckets")
    }
  }

  test("saltedJoin spreads a hot key's rows across salt buckets") {
    val s = spark
    import s.implicits._
    val dim = Seq(("hot", "H")).toDF("k", "label")
    val bigS = skewed.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(16))
        .cast("int"))
    val saltsUsed = bigS.filter(col("k") === "hot")
      .select("__salt").distinct().count()
    assert(saltsUsed > 1, "hot key rows all carry one salt")
    // and the replicated dim covers every bucket
    val dimS = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(15))))
    assert(dimS.count() == 16L)
  }
}
