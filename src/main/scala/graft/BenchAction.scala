package graft

import org.apache.spark.sql.DataFrame

/** THE timed action shared by Bench, TimeQueries and JobProfile — one
  * definition so the scored sweep, the floors gate and the profiler
  * always measure the same work.
  *
  * Default is the noop sink (optimization guide §1.4): it eagerly
  * computes EVERY column of every row and discards the result, so the
  * optimizer cannot prune columns or whole subtrees the way it can
  * under `.count()` — which flattered some of the pure-relational
  * queries (q01–q29) for 17 rounds. Switched at the r18 floor
  * re-record boundary (floors recalibrate there anyway);
  * `GRAFT_BENCH_ACTION=count` reproduces the legacy action for
  * cross-round comparisons, and the Bench artifact carries an
  * `action` field so floors/sweeps recorded under different actions
  * are never silently compared. */
object BenchAction {
  val name: String = sys.env.getOrElse("GRAFT_BENCH_ACTION", "noop") match {
    case a @ ("noop" | "count") => a
    case other => sys.error(s"GRAFT_BENCH_ACTION must be noop|count, got $other")
  }
  def run(df: DataFrame): Unit = name match {
    case "count" => df.count(); ()
    case _ => df.write.format("noop").mode("overwrite").save()
  }
}
