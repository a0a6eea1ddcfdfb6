package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture-table loader for the driver-generated parquet (TESTDATA.md).
  *
  * The `events` fixture stores `ts` as parquet TIMESTAMP(NANOS), which
  * Spark's vectorized reader rejects ([PARQUET_TYPE_ILLEGAL]). We read it
  * under `spark.sql.legacy.parquet.nanosAsLong` (nanos surface as a plain
  * LongType) and rebuild the timestamp losslessly — the fixture's values
  * are microsecond-aligned, so `nanos div 1000` drops only trailing zeros.
  * The conf is a runtime SQLConf, so setting it here covers any session
  * (including the driver's own) without builder-time config.
  */
object Tables {

  /** Columns that are TIMESTAMP(NANOS) in the fixture parquet, per table. */
  private val nanosCols: Map[String, Seq[String]] = Map(
    "events" -> Seq("ts"))

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    nanosCols.getOrElse(name, Nil).foldLeft(df) { (d, c) =>
      if (d.schema(c).dataType == org.apache.spark.sql.types.LongType)
        // integer DIV, not `/`: Column `/` is DOUBLE division, and nanos
        // (~1.7e18) exceed double precision (ulp ≈ 256 ns) — the float
        // path lands ±1 µs off the exact value on some rows
        d.withColumn(c, timestamp_micros(expr(s"$c DIV 1000")))
      else d
    }
  }
}
