package graft.tools

import org.apache.spark.sql.SparkSession

/** Registry-wide physical-plan audit: explains every SparkEntry query
  * at the given sf dir and reports, per query, the plan features that
  * matter at 100 TB — typed object boundaries (DeserializeToObject:
  * each one is a per-row InternalRow⇄JVM-object round trip),
  * hash-shuffle exchange count, sort-merge joins, and cartesian
  * products. The r16 expression-izing work (UrlPartExpr, HtmlTextExpr,
  * HttpBodyBytesExpr) was driven by exactly this signal; this tool
  * makes the remaining population a reviewable table instead of a
  * per-query spelunk, so a future regression (a typed map sneaking
  * into a hot census) is one diff away from visible.
  *
  * Usage: runMain graft.tools.PlanAudit [sfDir]
  */
object PlanAudit {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    var nDeser = 0; var nSmj = 0; var nCart = 0; var nErr = 0
    val rows = graft.SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        try {
          val plan = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          val tree = plan.split("== Initial Plan ==")(0)
          val deser = " DeserializeToObject".r.findAllIn(tree).length
          val exch = " Exchange \\(".r.findAllIn(tree).length
          val smj = " SortMergeJoin".r.findAllIn(tree).length
          val cart = "CartesianProduct".r.findAllIn(tree).length
          if (deser > 0) nDeser += 1
          if (smj > 0) nSmj += 1
          if (cart > 0) nCart += 1
          spark.catalog.clearCache()
          graft.ops.Caches.releaseAll()
          (name, deser, exch, smj, cart)
        } catch {
          case e: Throwable =>
            nErr += 1
            System.err.println(s"[audit] $name failed: ${e.getMessage}")
            (name, -1, -1, -1, -1)
        }
    }
    println("[audit] query deser exchanges smj cartesian")
    rows.foreach { case (n, d, e, s, c) =>
      if (d != 0 || s > 0 || c > 0)
        println(f"[audit] $n%-40s $d%2d $e%2d $s%2d $c%2d")
    }
    println(s"[audit] TOTAL queries=${rows.size} with_deser=$nDeser " +
      s"with_smj=$nSmj with_cartesian=$nCart errors=$nErr")
    spark.stop()
  }
}
