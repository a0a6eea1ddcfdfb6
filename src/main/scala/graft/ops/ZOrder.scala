package graft.ops

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering: interleave the bits of two columns so rows
  * close in BOTH dimensions land close in one sort order. Range-sorting a
  * table on a single column ([[Maintenance.compactParquet]] `sortCols`)
  * gives perfect file/row-group skipping on that column and NONE on any
  * other; z-ordering trades a little per-column locality for skipping on
  * every interleaved column — the standard layout for multi-dimension
  * point/box workloads at 100 TB (each parquet file covers one small tile
  * of the (x, y) space, so a filter on either column eliminates most
  * files by min/max stats alone).
  *
  * The z-value is plain integer arithmetic (mask + shift-or spreading, the
  * classic "part1by1" magic-number form) — it stays inside whole-stage
  * codegen and is reproducible in any engine, which is how the DuckDB
  * oracle for `q_zorder_key` recomputes it bit-for-bit.
  */
object ZOrder {

  /** (shift, mask) ladder that spreads the low 16 bits of a long so source
    * bit i lands at position 2i (interleave slot for dimension 0). */
  private val Spread = Seq(
    8 -> 0x00FF00FFL, 4 -> 0x0F0F0F0FL, 2 -> 0x33333333L, 1 -> 0x55555555L)

  /** Bit-spread of the low 16 bits of `c`: result bit 2i = input bit i. */
  def part1by1(c: Column): Column =
    Spread.foldLeft(c.cast("long").bitwiseAND(lit(0xFFFFL))) {
      case (n, (s, m)) => n.bitwiseOR(shiftleft(n, s)).bitwiseAND(lit(m))
    }

  /** 32-bit Morton code of (low 16 bits of x, low 16 bits of y): even bits
    * from x, odd bits from y. Monotone locality: nearby (x, y) → nearby z. */
  def zvalue(x: Column, y: Column): Column =
    part1by1(x).bitwiseOR(shiftleft(part1by1(y), 1))

  /** The same spreading as SQL text (for cross-engine oracles): each step
    * is `(n | (n << s)) & m` over BIGINT. */
  def part1by1Sql(e: String): String =
    Spread.foldLeft(s"(CAST($e AS BIGINT) & 65535)") {
      case (n, (s, m)) => s"(($n | ($n << $s)) & $m)"
    }

  def zvalueSql(x: String, y: String): String =
    s"(${part1by1Sql(x)} | (${part1by1Sql(y)} << 1))"

  /** Rewrite `inDir` z-ordered on (xCol, yCol) into `numFiles` files:
    * range-partition + sort on the z-value, so each output file covers one
    * contiguous z range = one tile of the 2-D space. Metadata cost only at
    * write time; every later scan benefits. Returns the file count. */
  def zorderCompact(spark: SparkSession, inDir: String, outDir: String,
      xCol: String, yCol: String, numFiles: Int): Int = {
    spark.read.parquet(inDir)
      .withColumn("__z", zvalue(col(xCol), col(yCol)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)
    numFiles
  }
}
