package graft.tools

/** Dev-only: time a handful of SparkEntry queries at a given SF dir —
  * a focused slice of Bench for iterating on one query's plan without
  * paying the full 100+-query sweep. Usage:
  *   runMain graft.tools.TimeQueries <sfDir> <queryName>...
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TimeQueries <sfDir> <queryName>...")
    val sfDir = args.head
    val spark = graft.GraftSession.build("graft-timeq")
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      fn(spark, sfDir).count() // warm
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[timeq] $name: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
