package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Dedup
import graft.sources.ParquetMeta

/** Scale-aware blocking caps: fixture-scale floors keep the historical
  * constants (so the oracle SQL embedding them stays exact), corpus-scale
  * values grow with the footer row count. */
class CapsSpec extends AnyFunSuite with SparkTestSupport {

  test("scaledCap floors at base below baseN, grows as sqrt beyond") {
    assert(Dedup.scaledCap(1000, 0) == 1000)
    assert(Dedup.scaledCap(1000, 500) == 1000)
    assert(Dedup.scaledCap(1000, 10000) == 1000)
    // 100× corpus → 10× cap
    assert(Dedup.scaledCap(1000, 1000000L) == 10000)
    // 10^4× corpus → 100× cap (a 100-billion-doc corpus)
    assert(Dedup.scaledCap(1000, 100000000000L) == 3162278)
    // monotone, no overflow at absurd n
    assert(Dedup.scaledCap(1000, Long.MaxValue / 2) > 0)
  }

  test("cellCap floors at base, then tracks mean cell occupancy linearly") {
    assert(Dedup.cellCap(10000, 500, 16) == 10000)
    // mean occupancy 1M/16 ≈ 62.5k already exceeds the 10k constant that
    // would reject EVERY cell; slack×mean keeps the blocking alive
    assert(Dedup.cellCap(10000, 1000000L, 16) == 500000)
    assert(Dedup.cellCap(10000, 1000000L, 16, slack = 2) == 125000)
    assert(Dedup.cellCap(10000, Long.MaxValue / 4, 16) == Int.MaxValue)
  }

  test("fixture-scale footer counts leave every registry cap at its constant") {
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val docs = ParquetMeta.rowCount(spark, s"/root/testdata/$sf/documents.parquet")
      val embs = ParquetMeta.rowCount(spark, s"/root/testdata/$sf/embeddings.parquet")
      assert(docs > 0 && embs > 0)
      assert(Dedup.scaledCap(1000, docs) == 1000, s"$sf docs=$docs")
      assert(Dedup.cellCap(10000, embs, 16) == 10000, s"$sf embs=$embs")
    }
  }
}
