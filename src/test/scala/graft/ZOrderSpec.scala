package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ZOrder

class ZOrderSpec extends AnyFunSuite with SparkTestSupport {

  test("zvalue interleaves bits: known values and bijectivity") {
    val s = spark
    import s.implicits._
    val cases = Seq(
      (3L, 0L, 5L),        // x bits 0,1 → positions 0,2
      (0L, 3L, 10L),       // y bits 0,1 → positions 1,3
      (65535L, 0L, 0x55555555L),
      (0L, 65535L, 0xAAAAAAAAL),
      (65535L, 65535L, 0xFFFFFFFFL),
      (1L, 1L, 3L))
    val got = cases.map { case (x, y, _) => (x, y) }.toDF("x", "y")
      .select(ZOrder.zvalue(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == cases.map(_._3))
    // bijective on a 32x32 grid: all z distinct
    val grid = (0 until 32).flatMap(x => (0 until 32).map(y => (x, y)))
      .toDF("x", "y")
    assert(grid.select(ZOrder.zvalue(col("x"), col("y")).as("z"))
      .distinct().count() == 32L * 32L)
  }

  test("z-ordered layout skips files on EITHER dimension; x-sort only on x") {
    val s = spark
    import s.implicits._
    val in = Files.createTempDirectory("graft-z-in").toString
    val zDir = Files.createTempDirectory("graft-z-out").toString
    val xDir = Files.createTempDirectory("graft-x-out").toString
    // 64x64 grid, shuffled on disk
    (0 until 64).flatMap(x => (0 until 64).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y").repartition(8).write.mode("overwrite").parquet(in)
    ZOrder.zorderCompact(s, in, zDir, "x", "y", numFiles = 16)
    // control: single-column range sort via the maintenance compactor
    graft.ops.Maintenance.compactParquet(s, in, xDir,
      targetFileBytes = graft.ops.Maintenance.parquetBytes(s, in) / 16,
      sortCols = Seq("x"))

    def filesIntersecting(dir: String, colName: String, lo: Long, hi: Long) = {
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet"))
      val n = files.count { f =>
        val r = s.read.parquet(f.getAbsolutePath)
          .agg(min(colName), max(colName)).head()
        r.getLong(0) <= hi && r.getLong(1) >= lo
      }
      (n, files.length)
    }

    // filter on y alone: the x-sorted layout cannot skip anything…
    val (xHit, xTotal) = filesIntersecting(xDir, "y", 0L, 7L)
    assert(xHit == xTotal, s"x-sorted control unexpectedly pruned y: $xHit/$xTotal")
    // …the z-ordered layout reads only the tiles whose y-span intersects
    val (zHit, zTotal) = filesIntersecting(zDir, "y", 0L, 7L)
    assert(zHit * 2 < zTotal, s"z-order did not prune on y: $zHit/$zTotal")
    // and z-order still prunes on x too
    val (zxHit, _) = filesIntersecting(zDir, "x", 0L, 7L)
    assert(zxHit * 2 < zTotal, s"z-order did not prune on x: $zxHit/$zTotal")
    // row preservation
    assert(s.read.parquet(zDir).count() == 64L * 64L)
  }
}
