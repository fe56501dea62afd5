package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark. One untimed warmup pass primes JIT, codegen
  * caches, and file listings; each query is then timed over
  * `GRAFT_BENCH_ITERS` (default 3) passes and reported as the
  * per-query MEDIAN, so a single GC/JIT hiccup cannot masquerade as a
  * regression (a single-iteration harness showed 9x run-to-run noise
  * on sub-second queries). Prints one JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val iters = math.max(1, sys.env.getOrElse("GRAFT_BENCH_ITERS", "3").toInt)
    val spark = GraftSession.build("graft-bench")

    val names = SparkEntry.queries.keys.toSeq
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    names.foreach(once) // warmup pass (untimed)
    val samples: Seq[Map[String, Double]] =
      (1 to iters).map(_ => names.map(n => n -> once(n)).toMap)

    def median(xs: Seq[Double]): Double =
      if (xs.contains(-1.0)) -1.0
      else xs.sorted.apply(xs.length / 2)

    val results = names.map(n => n -> median(samples.map(_(n))))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
