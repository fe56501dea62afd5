package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interval (range) join: match point rows to interval rows with NO
  * equi-key — `point ∈ [start, end)`. Spark plans a bare inequality
  * join as a nested-loop (broadcast if one side is small, cartesian
  * otherwise), which is quadratic when both sides are large. The
  * scale path here manufactures an equi-key by bucketing time:
  * intervals explode to every fixed-width bucket they overlap, points
  * map to their single bucket, and the join becomes a hash equi-join
  * on the bucket id with the exact range predicate as a residual
  * filter. Each (point, interval) match lands in exactly ONE bucket —
  * the point's own — so the output needs no dedup.
  *
  * Cost model: intervals of span s explode to ~s/width + 1 rows, so
  * `width` trades replication (small width) against residual-filter
  * selectivity and bucket skew (large width). Pick width near the
  * typical interval span. This is the standard bucketized
  * interval-join; at 100 TB both sides shuffle once on the bucket id
  * and no executor ever sees more than one bucket's worth of
  * candidates.
  */
object RangeJoin {

  /** Join `points` (numeric `pointCol`) to `intervals`
    * (`startCol` inclusive, `endCol` exclusive — numeric, same units)
    * via `width`-sized buckets. Returns matched pairs with all
    * columns of both inputs (interval columns prefixed when asked).
    *
    * Degenerate/huge intervals are the skew hazard (one interval
    * exploding to millions of buckets): intervals longer than
    * `maxBuckets * width` are rejected up front with a counted
    * observed metric (`metricName`) rather than silently exploding.
    * Empty (`end <= start`) and null-bounded intervals — which can
    * never match any point — are likewise dropped with their own
    * counted metric (`metricName + "_degenerate"`), so every
    * interval the join discards is observable.
    */
  def intervalJoin(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      width: Long, prefix: String = "", maxBuckets: Int = 4096,
      metricName: String = "graft_rangejoin_oversize"): DataFrame = {
    require(width > 0, s"bucket width must be positive, got $width")
    val ivCols = intervals.columns.toSeq
    val outIv = ivCols.map(prefix + _)
    require(points.columns.toSeq.intersect(outIv).isEmpty,
      "interval columns collide with the point schema; pass a prefix")
    // the bucketing materializes working columns on both sides — an
    // input column with one of these names would resolve ambiguously
    val internal = Seq("_bucket", "_rj_s", "_rj_e1", "_rj_b0", "_rj_b1", "_rj_v")
    val clash = (points.columns.toSeq ++ ivCols ++ outIv).distinct.intersect(internal)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(",")} collide with range-join internal names; rename them first")

    // integral columns take the exact integer path (SQL `div` +
    // sign-safe mod): double arithmetic would quantize epoch-nano
    // magnitudes (> 2^53) and silently drop boundary matches.
    // Fractional columns keep double bucketing (their values ARE
    // doubles, so floor(x / width) is the faithful bucket; a long
    // cast would TRUNCATE 3.2 -> 3 and mis-bucket).
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val integral = Seq(points.schema(pointCol).dataType,
      intervals.schema(startCol).dataType, intervals.schema(endCol).dataType)
      .forall(t => t == LongType || t == IntegerType || t == ShortType || t == ByteType)
    def floorDivExpr(v: String): String =
      s"($v - (($v % $width) + $width) % $width) div $width"
    // null-bounded intervals make the predicate null -> dropped AND
    // counted (observeDrops counts rows where keep is not true)
    val keptIv0 = HotKeys.observeDrops(intervals,
      col(endCol) > col(startCol), metricName + "_degenerate")
    val keptIv = if (integral)
      keptIv0
        .withColumn("_rj_s", col(startCol).cast("long"))
        .withColumn("_rj_e1", col(endCol).cast("long") - 1) // end exclusive
        .withColumn("_rj_b0", expr(floorDivExpr("_rj_s")))
        .withColumn("_rj_b1", expr(floorDivExpr("_rj_e1")))
    else
      keptIv0
        .withColumn("_rj_b0",
          floor(col(startCol).cast("double") / width).cast("long"))
        .withColumn("_rj_b1",
          // end exclusive: the last covered bucket; greatest() guards
          // a sub-width interval collapsing below its own start bucket
          greatest(ceil(col(endCol).cast("double") / width).cast("long") - 1,
            floor(col(startCol).cast("double") / width).cast("long")))
    val guarded = HotKeys.observeDrops(keptIv,
      col("_rj_b1") - col("_rj_b0") + 1 <= maxBuckets, metricName)
    val exploded = guarded.select(
      ivCols.map(c => col(c).as(prefix + c)) :+
      explode(sequence(col("_rj_b0"), col("_rj_b1"))).as("_bucket"): _*)

    val bucketedPoints = if (integral)
      points
        .withColumn("_rj_v", col(pointCol).cast("long"))
        .withColumn("_bucket", expr(floorDivExpr("_rj_v")))
        .drop("_rj_v")
    else
      points.withColumn("_bucket",
        floor(col(pointCol).cast("double") / width).cast("long"))

    bucketedPoints.join(exploded, Seq("_bucket"))
      .filter(col(pointCol) >= col(prefix + startCol) &&
        col(pointCol) < col(prefix + endCol))
      .drop("_bucket")
  }
}
