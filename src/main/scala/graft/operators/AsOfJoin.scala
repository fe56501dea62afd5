package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, the single right
  * row with the same key whose time is the latest at-or-before
  * (backward) / earliest at-or-after (forward) the left row's time.
  * Spark has no native as-of operator; the naive encodings are a
  * range join (quadratic blow-up per key) or a per-key collect. This
  * is the scalable form: tag both sides, UNION them, and resolve the
  * match with one `last(_, ignoreNulls)` window over
  * (key, time) — exactly ONE shuffle on the key and one
  * within-partition sort, the same cost as a sort-merge join,
  * independent of how many right rows precede each left row.
  *
  * Semantics (backward) match the classic time-series as-of join
  * (pandas `merge_asof`, DuckDB `ASOF JOIN`): ties at equal time
  * match (at-or-before), unmatched left rows survive with nulls
  * (left-outer), and an optional `tolerance` voids matches older
  * than `tolerance` time units.
  *
  * The right side must be unique per (key, time) — pre-aggregate ties
  * (e.g. `groupBy(key, time).agg(max_by(...))`) so the matched row is
  * well-defined; this mirrors DuckDB's ASOF requirement and keeps the
  * window tie-break deterministic. A duplicate (key, time) pair on
  * the right would otherwise make "the" as-of row ambiguous.
  */
object AsOfJoin {

  /** Backward as-of join (most recent right row at-or-before).
    *
    * @param left      probe side; all its columns are preserved
    * @param right     build side, unique per (rightKey, rightTime)
    * @param leftKey   equi-key column on `left`
    * @param rightKey  equi-key column on `right`
    * @param leftTime  orderable time column on `left`
    * @param rightTime orderable time column on `right` (same type)
    * @param rightCols right value columns to carry onto matches
    * @param prefix    prefix for the carried right columns
    * @param tolerance max allowed `leftTime - rightTime`; older
    *                  matches are nulled out. Units follow the time
    *                  columns' type: native units for numeric times,
    *                  MICROSECONDS for timestamp columns (the
    *                  `timestampdiff` difference — wall-clock for
    *                  TIMESTAMP_NTZ, epoch for TIMESTAMP, so a DST
    *                  session timezone cannot distort the horizon),
    *                  DAYS for date columns — so the common
    *                  event-time case needs no manual cast
    */
  def asOfBackward(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightCols: Seq[String], prefix: String = "",
      tolerance: Option[Long] = None): DataFrame =
    asOf(left, right, leftKey, rightKey, leftTime, rightTime,
      rightCols, prefix, tolerance, forward = false)

  /** Forward as-of join (earliest right row at-or-after). */
  def asOfForward(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightCols: Seq[String], prefix: String = "",
      tolerance: Option[Long] = None): DataFrame =
    asOf(left, right, leftKey, rightKey, leftTime, rightTime,
      rightCols, prefix, tolerance, forward = true)

  private def asOf(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightCols: Seq[String], prefix: String,
      tolerance: Option[Long], forward: Boolean): DataFrame = {
    require(rightCols.nonEmpty, "asOf needs at least one right value column")
    require(!rightCols.contains(rightTime),
      s"$rightTime is carried automatically as $prefix$rightTime; leave it out of rightCols")
    val leftCols = left.columns.toSeq
    val outCols = rightCols.map(prefix + _)
    require(leftCols.intersect(outCols :+ (prefix + rightTime)).isEmpty,
      s"prefixed right columns ${outCols.mkString(",")} collide with the left schema; pass a prefix")
    // the tag-union materializes these working columns alongside the
    // full left schema — an input column with one of these names would
    // produce duplicate/ambiguous references inside the union
    val internal = Seq("_k", "_t", "_side", "_m", "_wm")
    val clash = (leftCols ++ right.columns).distinct.intersect(internal)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(",")} collide with as-of internal names ${internal.mkString(",")}; rename them first")

    // Tag-union. Right rows carry their ENTIRE matched payload
    // (time + values) as ONE struct `_m` — the window resolves the
    // match with a single last(_m, ignoreNulls), so the matched time
    // and every matched value always come from the SAME right row
    // (per-column last() would resurrect an older row's value when
    // the matched row holds a null in that column). Left rows carry
    // a null `_m` and the full left schema. `_side` orders a right
    // row BEFORE a left row at the same time, which is what makes
    // equal-time rows match (at-or-before / at-or-after semantics).
    val mStruct = struct(
      col(rightTime).as("_mt") +:
      rightCols.map(c => col(c).as(prefix + c)): _*)
    val mType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("_mt",
        right.schema(rightTime).dataType, nullable = true) +:
      rightCols.map(c => org.apache.spark.sql.types.StructField(prefix + c,
        right.schema(c).dataType, nullable = true)))
    // a null-time right row is "at or before/after" nothing — drop it
    // up front so it can never shadow the unmatched state for left
    // rows that precede every real right row
    val r = right.filter(col(rightTime).isNotNull).select(
      col(rightKey).as("_k") +:
      col(rightTime).as("_t") +:
      lit(0).as("_side") +:
      mStruct.as("_m") +:
      leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val l = left.select(
      col(leftKey).as("_k") +:
      col(leftTime).as("_t") +:
      lit(1).as("_side") +:
      lit(null).cast(mType).as("_m") +:
      leftCols.map(col): _*)
    val u = r.unionByName(l)

    // For backward: ascending time, right-before-left at ties, running
    // last(non-null) = the most recent right row seen so far. Forward
    // mirrors the time order only — the side tie-break stays
    // right-before-left so an equal-time right row is still visible.
    // Null left times must sort FIRST in BOTH directions (before any
    // right row) so they stay unmatched: Spark's bare `desc` is NULLS
    // LAST, which would hand a null-time left row the key's running
    // last() — a spurious match. `asc` defaults to NULLS FIRST; made
    // explicit so the invariant survives refactors.
    val tOrd = if (forward) col("_t").desc_nulls_first else col("_t").asc_nulls_first
    val w = Window.partitionBy("_k").orderBy(tOrd, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val windowed = u.select(
      (Seq(col("_side"), col("_t"),
        last(col("_m"), ignoreNulls = true).over(w).as("_wm")) ++
        leftCols.map(col)): _*)
      .filter(col("_side") === 1)

    // Tolerance: void matches farther than `tolerance` time units.
    // Timestamp columns (LTZ and NTZ) diff via timestampdiff
    // MICROSECOND — for NTZ that is the WALL-CLOCK difference, which
    // a cast-to-LTZ epoch diff would distort by the DST offset in any
    // DST-observing session timezone; date columns diff in days — so
    // `tolerance` reads micros / days without a caller-side cast. A
    // null LEFT time also voids the match (belt to the ordering's
    // braces): null time means "unknown when", and an as-of match at
    // an unknown time is not a match.
    import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}
    val tType = left.schema(leftTime).dataType
    val mt = col("_wm._mt")
    val lt = col("_t")
    // signed difference (later - earlier) in the tolerance's units
    def diff(later: Column, earlier: Column, laterSql: String, earlierSql: String): Column =
      tType match {
        case TimestampType | TimestampNTZType =>
          expr(s"timestampdiff(MICROSECOND, $earlierSql, $laterSql)")
        case DateType => datediff(later, earlier)
        case _        => later - earlier
      }
    val keep: Column = tolerance match {
      case Some(tol) if forward =>
        mt.isNotNull && lt.isNotNull && diff(mt, lt, "_wm._mt", "_t") <= tol
      case Some(tol) =>
        mt.isNotNull && lt.isNotNull && diff(lt, mt, "_t", "_wm._mt") <= tol
      case None => mt.isNotNull && lt.isNotNull
    }
    windowed.select(
      leftCols.map(col) ++
      (outCols.map(c => when(keep, col("_wm." + c)).as(c)) :+
        when(keep, mt).as(prefix + rightTime)): _*)
  }
}
