package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Row-tracing analogue of the reference's `-debug v=CVE-...` filter
  * (common/debug.go:26-68, consumed pre/post enrichment at
  * updater/updater.go:353-531): given a CVE set, capture each matching
  * record's full field snapshot after every pipeline phase, to answer
  * "why did this CVE come out wrong".
  *
  * Spark-first shape: each tap is a filtered side-output — the name
  * filter is a codegen'd `IN` that pushes toward the scan, the
  * snapshot is `to_json(struct(*))`. Taps evaluate eagerly when
  * enabled (the reference logs eagerly too) so the snapshot reflects
  * the record AT that phase rather than after later rewrites; with an
  * empty CVE set every tap is the identity and adds nothing to the
  * plan. The trace set is meant to be a handful of CVEs — the collect
  * is bounded by |cves| x phases. */
final class VulTracer(val cves: Set[String]) extends Serializable {

  final case class Trace(phase: String, name: String, snapshot: String)

  private val buf = scala.collection.mutable.ArrayBuffer.empty[Trace]

  def enabled: Boolean = cves.nonEmpty

  /** Pass-through tap: records snapshots of matching rows, returns the
    * dataset unchanged. */
  def tap[T](phase: String, ds: Dataset[T], nameCol: String = "name"): Dataset[T] = {
    if (enabled) {
      val snap = ds.toDF()
        .filter(col(nameCol).isin(cves.toSeq: _*))
        .select(col(nameCol).cast("string").as("n"),
          to_json(struct(col("*"))).as("s"))
        .collect()
      buf.synchronized {
        snap.foreach(r => buf += Trace(phase, r.getString(0), r.getString(1)))
      }
    }
    ds
  }

  def traces: Seq[Trace] = buf.synchronized(buf.toList)

  def toDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    traces.map(t => (t.phase, t.name, t.snapshot)).toDF("phase", "name", "snapshot")
  }

  /** Human-readable dump, one line per (phase, record). */
  def format: String =
    traces.map(t => s"[trace] ${t.phase} ${t.name} ${t.snapshot}").mkString("\n")
}

object VulTracer {
  /** No-op tracer: every tap is the identity. */
  val disabled = new VulTracer(Set.empty)

  /** Parse the reference's `-debug` syntax: `v=CVE-a,CVE-b` (tokens
    * without `v=` are ignored, as in common/debug.go:26-44). */
  def parse(arg: String): VulTracer = {
    val cves = arg.split(",").toSeq
      .foldLeft((Set.empty[String], false)) { case ((acc, inV), tok) =>
        if (tok.startsWith("v=")) (acc + tok.stripPrefix("v="), true)
        else if (tok.contains("=")) (acc, false)
        else if (inV) (acc + tok, true)
        else (acc, inV)
      }._1.filter(_.nonEmpty)
    new VulTracer(cves)
  }
}
