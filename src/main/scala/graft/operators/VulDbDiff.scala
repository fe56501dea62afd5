package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.core.Vulnerability

/** Incremental run diff. The reference regenerates the full DB every
  * run with no change report; operationally the first question after
  * a run is "what changed since yesterday". One full-outer join on
  * the record key answers it at any scale: both sides shuffle once on
  * (namespace, name), per-field comparison is null-safe equality on
  * the columns themselves (no JSON detour), and the changed-field
  * list is assembled map-side. */
object VulDbDiff {

  private val keyCols = Seq("namespace", "name")

  /** (status, namespace, name, changed_fields) where status is
    * added | removed | changed (and unchanged when asked for).
    * changed_fields is empty except for status = changed. */
  def diff(oldDb: Dataset[Vulnerability], newDb: Dataset[Vulnerability],
      includeUnchanged: Boolean = false): DataFrame = {
    val valueCols = oldDb.columns.filterNot(keyCols.contains)
    val o = oldDb.toDF(oldDb.columns.map("_o_" + _): _*)
    val n = newDb.toDF(newDb.columns.map("_n_" + _): _*)
    val joined = o.join(n,
      keyCols.map(k => col("_o_" + k) <=> col("_n_" + k)).reduce(_ && _),
      "full_outer")
    val changedFields = array_compact(array(valueCols.map(c =>
      when(!(col("_o_" + c) <=> col("_n_" + c)), lit(c))): _*))
    val out = joined.select(
      when(col("_o_name").isNull, "added")
        .when(col("_n_name").isNull, "removed")
        .when(size(changedFields) > 0, "changed")
        .otherwise("unchanged").as("status"),
      coalesce(col("_n_namespace"), col("_o_namespace")).as("namespace"),
      coalesce(col("_n_name"), col("_o_name")).as("name"),
      when(col("_o_name").isNotNull && col("_n_name").isNotNull, changedFields)
        .otherwise(array().cast("array<string>")).as("changed_fields"))
    if (includeUnchanged) out else out.filter(col("status") =!= "unchanged")
  }

  /** Per-status counts — the run-report headline. */
  def summary(oldDb: Dataset[Vulnerability], newDb: Dataset[Vulnerability]): DataFrame =
    diff(oldDb, newDb, includeUnchanged = true)
      .groupBy("status").agg(count(lit(1)).as("n"))
      .orderBy("status")
}
