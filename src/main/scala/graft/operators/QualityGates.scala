package graft.operators

import org.apache.spark.sql.Dataset

/** A11/A12 — the reference's count-threshold run gates and run
  * statistics (rhel.go:261-264 >= 20000, amazon.go:95-98 >= 1000,
  * zero-count app-feed failures, per-phase count logging) as library
  * checks a pipeline driver calls between phases. */
object QualityGates {

  final case class GateResult(name: String, count: Long, minExpected: Long, ok: Boolean)

  /** The reference's minimum-count constants. */
  val rhelMinCount = 20000L
  val amazonMinCount = 1000L

  /** Count a feed against its floor; one action per gate, as the
    * reference does (the count doubles as the A12 telemetry point). */
  def gate[T](name: String, ds: Dataset[T], minExpected: Long): GateResult = {
    val n = ds.count()
    GateResult(name, n, minExpected, n >= minExpected)
  }

  /** Evaluate all gates; throws like the reference's failed run when
    * any floor is broken. */
  def enforce(results: Seq[GateResult]): Seq[GateResult] = {
    val failed = results.filterNot(_.ok)
    if (failed.nonEmpty)
      throw new IllegalStateException(
        "feed count gates failed: " + failed.map(g =>
          s"${g.name}=${g.count} (< ${g.minExpected})").mkString(", "))
    results
  }
}
