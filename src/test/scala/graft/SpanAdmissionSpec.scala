package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.SpanAdmission

/** Streaming boilerplate admission: a doc arriving mostly as spans the
  * registry already holds is rejected; fresh text lands. */
class SpanAdmissionSpec extends AnyFunSuite with SparkTestSupport {

  private val boiler = (1 to 20).map(i => s"nav$i").mkString(" ")

  test("span-covered docs rejected across batches; fresh docs land") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val root = java.nio.file.Files
      .createTempDirectory("graft_spadm_").toString
    val adm = new SpanAdmission(root + "/state", "text", "doc_id",
      k = 4, gatePct = 50)

    val stream = MemoryStream[(Long, String)]
    val q = stream.toDF().toDF("doc_id", "text")
      .writeStream
      .option("checkpointLocation", root + "/ck")
      .foreachBatch(adm.step((df, _) =>
        df.write.mode("append").parquet(root + "/out")) _)
      .start()
    try {
      // batch 1: the boilerplate-bearing page (admitted — empty registry)
      stream.addData((1L, boiler + " welcome to the site"))
      q.processAllAvailable()
      // batch 2: new page that is ~80% the same boilerplate (rejected),
      // and a genuinely fresh page (admitted)
      stream.addData(
        (2L, boiler + " different footer"),
        (3L, "entirely novel research content with original phrasing"))
      q.processAllAvailable()
      val admitted = spark.read.parquet(root + "/out")
        .collect().map(_.getLong(0)).toSet
      assert(admitted == Set(1L, 3L))
    } finally q.stop()
  }
}
