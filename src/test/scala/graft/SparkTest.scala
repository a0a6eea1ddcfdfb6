package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole suite (JVM-singleton — Spark
  * reuses it via getOrCreate, so suites don't pay session startup each). */
object SparkTest {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

trait SparkTestSupport {
  lazy val spark: SparkSession = SparkTest.spark
}
