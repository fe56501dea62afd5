package graft.tools

/** Dev-only: time a handful of SparkEntry queries at a given SF dir —
  * a focused slice of Bench for iterating on one query's plan without
  * paying the full 100+-query sweep. Usage:
  *   runMain graft.tools.TimeQueries <sfDir> <queryName>...
  *
  * REGRESSION-GATE mode (`--assert-floor=<benchJson> [--factor=N]`):
  * turns a recorded clean Bench artifact (the one-line JSON Bench
  * writes to GRAFT_BENCH_OUT — its `queries` map IS the per-query
  * floor table; a flat {"name": secs} object works too) into a gate
  * the builder can run before handing a round to the driver: each
  * named query (default: every query present in BOTH the floors file
  * and SparkEntry) is warmed once and timed as the min of two passes,
  * and the run FAILS (exit 1) when any query exceeds `factor`x its
  * floor (default 2.0 — inside that band is established
  * window-to-window noise on this host, beyond it is a real plan
  * regression or a contaminated host). The report prints the 1-min
  * loadavg per query so a hot-host failure is distinguishable from a
  * plan regression at a glance: floors are only meaningful on a
  * quiet host, same as the Bench runs that record them. */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: TimeQueries <sfDir> [--assert-floor=<benchJson>] " +
        "[--factor=N] <queryName>...")
    val sfDir = args.head
    val opts = args.tail.filter(_.startsWith("--"))
    val names = args.tail.filterNot(_.startsWith("--")).toSeq
    val floorsFile = opts.collectFirst {
      case o if o.startsWith("--assert-floor=") =>
        o.stripPrefix("--assert-floor=")
    }
    val factor = opts.collectFirst {
      case o if o.startsWith("--factor=") =>
        o.stripPrefix("--factor=").toDouble
    }.getOrElse(2.0)
    require(factor > 0, s"--factor must be > 0, got $factor")
    val unknownOpts = opts.filterNot(o =>
      o.startsWith("--assert-floor=") || o.startsWith("--factor="))
    require(unknownOpts.isEmpty, s"unknown options: ${unknownOpts.mkString(" ")}")

    val spark = graft.GraftSession.build("graft-timeq")
    spark.sparkContext.setLogLevel("ERROR")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean

    def time(name: String): Double = {
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      fn(spark, sfDir).count() // warm
      def pass(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      math.min(pass(), pass())
    }

    floorsFile match {
      case None =>
        names.foreach { name =>
          val s = time(name)
          println(f"[timeq] $name: ${s}%.2f s")
        }

      case Some(file) =>
        // Jackson rides Spark's classpath; the floors file is either a
        // Bench artifact (floors under "queries") or a flat name->secs map
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val root = mapper.readTree(new java.io.File(file))
        val table = if (root.has("queries")) root.get("queries") else root
        val floors = {
          val b = Map.newBuilder[String, Double]
          table.fields().forEachRemaining { e =>
            if (e.getValue.isNumber) b += e.getKey -> e.getValue.asDouble()
          }
          b.result()
        }
        require(floors.nonEmpty, s"no numeric floors found in $file")
        val toCheck =
          if (names.nonEmpty) names
          else floors.keys.toSeq.sorted.filter(graft.SparkEntry.queries.contains)
        val missing = toCheck.filterNot(floors.contains)
        require(missing.isEmpty,
          s"no recorded floor for: ${missing.mkString(", ")} — re-record " +
            s"the floors file from a clean Bench run before gating on it")
        var failed = 0
        toCheck.foreach { name =>
          val load = osBean.getSystemLoadAverage
          val s = time(name)
          val floor = floors(name)
          val ok = floor < 0 || s <= factor * floor
          if (!ok) failed += 1
          println(f"[timeq] ${if (ok) "PASS" else "FAIL"} $name: ${s}%.2f s " +
            f"(floor ${floor}%.2f s, limit ${factor * floor}%.2f s, " +
            f"loadavg ${load}%.1f)")
        }
        if (failed > 0) {
          println(s"[timeq] $failed of ${toCheck.size} queries exceeded " +
            s"${factor}x their recorded floor — a real plan regression, or " +
            "a contaminated host (check the loadavg column; floors are " +
            "only meaningful on a quiet host)")
          spark.stop()
          sys.exit(1)
        }
        println(s"[timeq] all ${toCheck.size} queries within ${factor}x " +
          "of their recorded floors")
    }
    spark.stop()
  }
}
