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
  * filter is a codegen'd `IN`, the snapshot is `to_json(struct(*))`.
  * Single-pass: a tap CACHES its phase frame and registers a LAZY
  * snapshot; the pipeline's own action then fills each phase cache
  * exactly once, and all snapshots are collected in ONE job at the
  * end (a union over the cached phases), so tracing never re-executes
  * the upstream pipeline per phase. Dataset lineage is immutable, so
  * a deferred snapshot still reflects the record AT its phase. With an
  * empty CVE set every tap is the identity and adds nothing to the
  * plan. The trace set is meant to be a handful of CVEs — the final
  * collect is bounded by |cves| x phases. */
final class VulTracer(val cves: Set[String]) extends Serializable {

  final case class Trace(phase: String, name: String, snapshot: String)

  private val pending = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
  private val cachedFrames = scala.collection.mutable.ArrayBuffer.empty[Dataset[_]]
  private val buf = scala.collection.mutable.ArrayBuffer.empty[Trace]

  def enabled: Boolean = cves.nonEmpty

  /** Pass-through tap: caches the phase frame (so the trace costs no
    * extra pipeline pass) and registers a lazy snapshot of matching
    * rows; returns the cached dataset for downstream phases. */
  def tap[T](phase: String, ds: Dataset[T], nameCol: String = "name"): Dataset[T] = {
    if (!enabled) ds
    else {
      val cached = ds.cache()
      val snap = cached.toDF()
        .filter(col(nameCol).isin(cves.toSeq: _*))
        .select(lit(phase).as("p"),
          col(nameCol).cast("string").as("n"),
          to_json(struct(col("*"))).as("s"))
      pending.synchronized { pending += snap; cachedFrames += cached }
      cached
    }
  }

  /** Drain every registered snapshot in one union job (each branch
    * reads its phase cache, already filled by the pipeline's action),
    * then UNPERSIST every phase cache: the trace collect is the last
    * reader, and without the release a 6-phase `-debug` run would pin
    * six full intermediate datasets in executor storage for the rest
    * of the application. */
  private def resolve(): Unit = {
    // one atomic drain of BOTH lists (tap appends to both under the
    // same lock): a tap racing in between two separate drains would
    // get its cache freed while its snapshot is still pending, and the
    // later collect would re-execute the upstream pipeline
    val (toRun, toFree) = pending.synchronized {
      val r = (pending.toList, cachedFrames.toList)
      pending.clear(); cachedFrames.clear(); r
    }
    if (toRun.nonEmpty) {
      val rows = toRun.reduce(_ union _).collect()
      buf.synchronized {
        rows.foreach(r => buf += Trace(r.getString(0), r.getString(1), r.getString(2)))
      }
    }
    toFree.foreach(_.unpersist(blocking = false))
  }

  def traces: Seq[Trace] = { resolve(); buf.synchronized(buf.toList) }

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
