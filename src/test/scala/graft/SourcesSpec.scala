package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Sources
import graft.ops.Serving

/** S1 CSV dialect (reference `stream_generator.py:49-50`) + F13. */
class SourcesSpec extends AnyFunSuite with SparkTestSupport {

  test("headerless CSV with quote/escape dialect and declared schema") {
    val dir = Files.createTempDirectory("graft-csv")
    val f = dir.resolve("reviews.csv")
    // quoted field with embedded comma; backslash-escaped quote inside text
    Files.writeString(f,
      "0,10,\"Game, The\",100,english,\"great \\\"game\\\"\",1600000000," +
        "1600000001,true,1,0,0.5,0,true,false,false,7656,5,2,100.0,10.0,60.0,1.5,0.9\n")
    val df = Sources.readReviewsCsv(spark, f.toString)
    val r = df.head()
    assert(r.getAs[String]("app_name") == "Game, The")
    assert(r.getAs[String]("review") == "great \"game\"")
    assert(r.getAs[Long]("timestamp_created") == 1600000000L)
    assert(r.getAs[String]("recommended") == "true")
    // file sources force nullable=true; compare names + types
    assert(df.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      graft.model.Review.schema.fields.map(f => (f.name, f.dataType)).toSeq)
  }

  test("ORC round-trip preserves schema and values (incl. binary)") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-orc").resolve("t").toString
    val df = Seq(
      (1L, "alpha", Array[Byte](1, 2, 3), 0.5),
      (2L, "beta", Array[Byte](), -1.0))
      .toDF("id", "name", "blob", "score")
    Sources.writeOrc(df, dir)
    val back = Sources.readOrc(spark, dir)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val rows = back.orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(rows(0).getAs[Array[Byte]]("blob").toSeq == Seq[Byte](1, 2, 3))
    // ORC pushes the predicate to stripe level — plan must carry it
    val filtered = Sources.readOrc(spark, dir).filter($"id" === 2L)
    assert(filtered.count() == 1)
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") || scan.contains("pushedFilters"),
      s"expected ORC pushdown in plan:\n$scan")
  }

  test("jsonl quarantine splits clean rows from corrupt lines") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft-jsonl")
    val f = dir.resolve("docs.jsonl")
    Files.writeString(f,
      """{"id": 1, "text": "good row"}
        |{"id": 2 "text": "missing comma"}
        |{"id": 3, "text": "another good row"}
        |not json at all""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    val (good, bad) = Sources.readJsonlWithQuarantine(spark, schema, f.toString)
    assert(good.collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    val badLines = bad.collect().map(_.getString(0))
    assert(badLines.length == 2)
    assert(badLines.exists(_.contains("missing comma")) &&
      badLines.contains("not json at all"))
  }

  test("prettyMetric display labels") {
    assert(Serving.prettyMetric("A_sentiment") == "Average sentiment")
    assert(Serving.prettyMetric("T_reviews") == "Total reviews")
  }
  test("unionEvolving: drifted schemas align by NAME, absent columns null") {
    val s = spark
    import s.implicits._
    // columns deliberately in CLASHING positions: a positional union
    // would transpose lang under source
    val v1 = Seq((1L, "en", "t1")).toDF("id", "lang", "text")
    val v2 = Seq((2L, "web", "t2", 10L)).toDF("id", "source", "text", "n")
    val got = Sources.unionEvolving(Seq(v1, v2))
    assert(got.columns.toSeq == Seq("id", "lang", "text", "source", "n"))
    val byId = got.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getString(1) == "en" && byId(1L).isNullAt(3)
      && byId(1L).isNullAt(4))
    assert(byId(2L).isNullAt(1) && byId(2L).getString(3) == "web"
      && byId(2L).getLong(4) == 10L)
  }
}
