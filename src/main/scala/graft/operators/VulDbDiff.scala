package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.core.{AppModuleVul, Vulnerability}

/** Incremental run diff. The reference regenerates the full DB every
  * run with no change report; operationally the first question after
  * a run is "what changed since yesterday" — for BOTH fact tables:
  * the OS table keyed (namespace, name) and the app table keyed
  * (moduleName, vulName) (reference `memdb.go:118-123`). One
  * full-outer join on the record key answers it at any scale: both
  * sides shuffle once on the key, per-field comparison is null-safe
  * equality on the columns themselves (no JSON detour), and the
  * changed-field list is assembled map-side. */
object VulDbDiff {

  /** Generic keyed snapshot diff — the shared core, public because it
    * answers the same "what changed between runs" question for ANY
    * keyed table (e.g. a corpus snapshot keyed doc_id — see
    * q69_snapshot_diff): full-outer join `oldDf`/`newDf` on `keyCols`,
    * classify each key as added | removed | changed | unchanged with
    * the null-safe per-field change list. Presence on each side is
    * carried as an explicit marker column, so the classification never
    * depends on any data column being non-null. */
  def keyedDiff(oldDf: DataFrame, newDf: DataFrame,
      keyCols: Seq[String], includeUnchanged: Boolean = false): DataFrame = {
    val valueCols = oldDf.columns.filterNot(keyCols.contains)
    val o = oldDf.select(oldDf.columns.map(c => col(c).as("_o_" + c))
      :+ lit(true).as("_o_present"): _*)
    val n = newDf.select(newDf.columns.map(c => col(c).as("_n_" + c))
      :+ lit(true).as("_n_present"): _*)
    val joined = o.join(n,
      keyCols.map(k => col("_o_" + k) <=> col("_n_" + k)).reduce(_ && _),
      "full_outer")
    val inOld: Column = coalesce(col("_o_present"), lit(false))
    val inNew: Column = coalesce(col("_n_present"), lit(false))
    val changedFields = array_compact(array(valueCols.map(c =>
      when(!(col("_o_" + c) <=> col("_n_" + c)), lit(c))): _*))
    val out = joined.select(
      when(!inOld, "added")
        .when(!inNew, "removed")
        .when(size(changedFields) > 0, "changed")
        .otherwise("unchanged").as("status") +:
      keyCols.map(k => coalesce(col("_n_" + k), col("_o_" + k)).as(k)) :+
      when(inOld && inNew, changedFields)
        .otherwise(array().cast("array<string>")).as("changed_fields"): _*)
    if (includeUnchanged) out else out.filter(col("status") =!= "unchanged")
  }

  /** OS-table diff: (status, namespace, name, changed_fields) where
    * status is added | removed | changed (and unchanged when asked
    * for). changed_fields is empty except for status = changed. */
  def diff(oldDb: Dataset[Vulnerability], newDb: Dataset[Vulnerability],
      includeUnchanged: Boolean = false): DataFrame =
    keyedDiff(oldDb.toDF(), newDb.toDF(), Seq("namespace", "name"), includeUnchanged)

  /** App-table diff, keyed (moduleName, vulName) — the app fact
    * table's identity key (one row per vulnerable module per vul):
    * (status, moduleName, vulName, changed_fields). */
  def diffApps(oldDb: Dataset[AppModuleVul], newDb: Dataset[AppModuleVul],
      includeUnchanged: Boolean = false): DataFrame =
    keyedDiff(oldDb.toDF(), newDb.toDF(), Seq("moduleName", "vulName"), includeUnchanged)

  /** Per-status counts — the run-report headline. */
  def summary(oldDb: Dataset[Vulnerability], newDb: Dataset[Vulnerability]): DataFrame =
    diff(oldDb, newDb, includeUnchanged = true)
      .groupBy("status").agg(count(lit(1)).as("n"))
      .orderBy("status")

  /** Per-status counts for the app table. */
  def summaryApps(oldDb: Dataset[AppModuleVul], newDb: Dataset[AppModuleVul]): DataFrame =
    diffApps(oldDb, newDb, includeUnchanged = true)
      .groupBy("status").agg(count(lit(1)).as("n"))
      .orderBy("status")
}
