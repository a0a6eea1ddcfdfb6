package graft

import java.nio.file.Files
import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Replay

/** S4 replay loop: slicing/ordering/exactly-once-per-record logic, driven
  * through the pluggable sink (the Kafka wire write needs a broker —
  * proven unavailable offline, SURVEY §9). */
class ReplaySpec extends AnyFunSuite with SparkTestSupport {

  private def reviewLine(id: Long, ts: Long): String =
    s"""$id,10,"G",$id,english,"text $id",$ts,$ts,true,1,0,0.5,0,true,false,false,7656,5,2,100.0,10.0,60.0,1.5,0.9"""

  test("replay emits every record exactly once, slices in residue order") {
    val dir = Files.createTempDirectory("graft-replay")
    val f = dir.resolve("reviews.csv")
    // timestamps 1600000000..1600000009 → residues 0..9 for slices=5: 2 each
    Files.writeString(f,
      (0L until 10L).map(i => reviewLine(i, 1600000000L + i)).mkString("\n"))
    val seen = mutable.ArrayBuffer.empty[(Int, String)] // (slice, key)
    Replay.runWith(spark, f.toString,
      (slice, s) => seen.synchronized {
        seen ++= slice.collect().map(r => (s, r.getAs[String]("key")))
      },
      slices = 5)
    assert(seen.size == 10)
    assert(seen.map(_._2).toSet.size == 10)            // exactly once
    // residue order: review ts 1600000000+i → slice (ts % 5)
    seen.foreach { case (s, key) =>
      val id = key.toLong
      assert(((1600000000L + id) % 5).toInt == s, s"key $id in slice $s")
    }
    // slices emitted in ascending order
    assert(seen.map(_._1).toSeq == seen.map(_._1).toSeq.sorted)
  }
}
