package graft.tools

/** Dev tool: print formatted physical plans for the scale-critical
  * queries so broadcast/pushdown/codegen decisions are inspectable.
  * Usage: runMain graft.tools.PlanCheck [queryName ...] */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build("plan-check")
    spark.sparkContext.setLogLevel("ERROR")
    // full plans here — the session default caps plan strings (a
    // scored-run optimization; see GraftSession), but this tool's
    // whole point is the complete formatted plan
    spark.conf.set("spark.sql.maxPlanStringLength", Int.MaxValue - 15)
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q08_multi_join", "q05_broadcast_join", "q02_filter_year",
        "q36_minhash_lsh", "q37_cosine_topk", "q52_enrich_pipeline")
    for (n <- names) {
      println(s"\n===== $n =====")
      graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
