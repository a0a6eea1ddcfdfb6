package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.HeavyHitters

/** Misra–Gries heavy hitters: bounded summaries, superset guarantee,
  * exact final answer vs the naive full GROUP BY. */
class HeavyHittersSpec extends AnyFunSuite with SparkTestSupport {

  test("misraGries: summary bounded by m and superset of 1/(m+1)-heavy") {
    // adversarial stream: 1 item at 30%, 1 at 20%, noise singletons
    val stream = Seq.fill(300)("hot") ++ Seq.fill(200)("warm") ++
      (0 until 500).map(i => s"noise$i")
    val shuffled = new scala.util.Random(7).shuffle(stream)
    val out = HeavyHitters.misraGries(shuffled.iterator, m = 5).toList
    val Seq((null, n)) = out.filter(_._1 == null)
    assert(n == 1000L)
    val keys = out.collect { case (k, _) if k != null => k }
    assert(keys.length <= 5)
    // anything with freq > n/(m+1) must survive
    assert(keys.contains("hot") && keys.contains("warm"))
  }

  test("heavyTokens: exact answer equals the naive GROUP BY .. HAVING") {
    val s = spark
    import s.implicits._
    // zipf-ish docs over many partitions; d=20 → threshold 5% of tokens
    val docs = (0L until 200L).map { i =>
      val hot = "alpha " * 3
      val mid = if (i % 2 == 0) "beta " else ""
      (i, s"$hot$mid word$i word${i * 7 % 500} tail${i % 97}")
    }.toDF("doc_id", "text").repartition(5)
    val d = 20
    val got = HeavyHitters.heavyTokens(docs, "text", d)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val toks = docs.select(explode(graft.ext.Dedup.tokens(col("text")))
      .as("token"))
    val n = toks.count()
    val want = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * lit(d.toLong) >= lit(n))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
    assert(got.contains("alpha")) // 600 of ~1200 tokens — clearly heavy
  }

  test("heavyTokens: exact-boundary token (cnt*d == N) is included") {
    val s = spark
    import s.implicits._
    // total 40 tokens, "edge" occurs exactly 10 times, d=4 → 10*4 == 40
    val text = ("edge " * 10) + (0 until 30).map(i => s"u$i").mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val got = HeavyHitters.heavyTokens(docs, "text", d = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("edge" -> 10L))
  }

  test("heavyTokens: pass-2 recount joins via broadcast") {
    val s = spark
    import s.implicits._
    val docs = (0L until 50L).map(i => (i, s"hot hot cold$i"))
      .toDF("doc_id", "text")
    val plan = HeavyHitters.heavyTokens(docs, "text", d = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"),
      s"candidate semi-join should broadcast, got:\n$plan")
  }
}
