package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Bucketized interval join pinned against the naive inequality join:
  * identical matches at every bucket width (the width is a cost knob,
  * never a semantics knob), [start, end) boundary behavior, no
  * duplicate matches, oversize-interval guard. */
class RangeJoinSpec extends SparkSpecBase {

  import spark.implicits._

  private lazy val points = (0L to 100L).map(p => (p, s"p$p")).toDF("t", "tag")
  private lazy val intervals = Seq(
    (1L, 0L, 10L), (2L, 5L, 7L), (3L, 10L, 10L), // empty: start == end
    (4L, 9L, 11L), (5L, 98L, 200L)
  ).toDF("iv_id", "s", "e")

  private def canon(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("t", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private lazy val naive: Set[(Long, Long)] = canon(
    points.join(intervals, col("t") >= col("s") && col("t") < col("e")))

  test("matches the inequality join exactly, at several widths") {
    for (w <- Seq(1L, 3L, 7L, 64L)) {
      val got = canon(RangeJoin.intervalJoin(points, intervals,
        "t", "s", "e", width = w, metricName = s"w$w"))
      assert(got == naive, s"width $w diverged")
    }
  }

  test("boundaries: start inclusive, end exclusive, empty interval matches nothing") {
    val got = canon(RangeJoin.intervalJoin(points, intervals, "t", "s", "e", 5L))
    assert(got.contains((0L, 1L)) && !got.contains((10L, 1L)))  // [0,10)
    assert(got.contains((9L, 4L)) && got.contains((10L, 4L)) && !got.contains((11L, 4L)))
    assert(!got.exists(_._2 == 3L)) // start == end
  }

  test("no duplicate (point, interval) pairs — each match lands in one bucket") {
    val out = RangeJoin.intervalJoin(points, intervals, "t", "s", "e", 2L)
    assert(out.count() == out.select("t", "iv_id").distinct().count())
  }

  test("oversize intervals are dropped, not exploded") {
    val huge = Seq((9L, 0L, 1000000L)).toDF("iv_id", "s", "e")
    val out = RangeJoin.intervalJoin(points, huge, "t", "s", "e",
      width = 1L, maxBuckets = 100, metricName = "oversize_case")
    assert(out.count() == 0)
  }

  test("degenerate (empty / null-bounded) intervals are dropped WITH a counted metric") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("iv_id", LongType),
      StructField("s", LongType, nullable = true), StructField("e", LongType, nullable = true)))
    val ivs = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, 0L, 10L),     // valid
      Row(2L, 10L, 10L),    // empty: start == end
      Row(3L, 10L, 5L),     // inverted
      Row(4L, null, 10L),   // null start
      Row(5L, 0L, null))),  // null end
      schema)
    val out = RangeJoin.intervalJoin(points, ivs, "t", "s", "e",
      width = 5L, metricName = "degen_case")
    assert(canon(out).map(_._2) == Set(1L))
    out.collect() // metrics populate on THIS QueryExecution's action
    val m = out.queryExecution.observedMetrics("degen_case_degenerate")
    assert(m.getAs[Long]("dropped_rows") == 4L)
  }

  test("input columns colliding with internal names are rejected") {
    intercept[IllegalArgumentException] {
      RangeJoin.intervalJoin(points.withColumn("_bucket", lit(1)),
        intervals, "t", "s", "e", 5L)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.intervalJoin(points,
        intervals.withColumn("_rj_b0", lit(1)), "t", "s", "e", 5L)
    }
  }

  test("plan is a hash equi-join on the bucket — no nested loop") {
    val plan = RangeJoin.intervalJoin(points, intervals, "t", "s", "e", 5L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("epoch-nano magnitudes (> 2^53) bucket exactly — no double quantization") {
    val base = 1706000000000000000L // ~2024 in epoch nanos, > 2^53
    val pts = Seq(base, base + 1L, base + 999L, base + 1000L, base + 1001L)
      .zipWithIndex.map { case (t, i) => (t, i.toLong) }.toDF("t", "pid")
    val ivs = Seq((1L, base + 1L, base + 1001L)).toDF("iv_id", "s", "e") // [s, e)
    val got = RangeJoin.intervalJoin(pts, ivs, "t", "s", "e",
        width = 1000L, metricName = "nanos_case")
      .select("pid").collect().map(_.getLong(0)).toSet
    // matches: base+1, base+999, base+1000 (end base+1001 exclusive -> base+1001 out, base out)
    assert(got == Set(1L, 2L, 3L))
  }

  test("fractional (double) columns bucket by value, not by truncation") {
    val pts = Seq((3.2, 1L), (0.4, 2L), (3.6, 3L)).toDF("t", "pid")
    val ivs = Seq((1L, 0.0, 3.5), (2L, 0.2, 0.5)).toDF("iv_id", "s", "e")
    val got = RangeJoin.intervalJoin(pts, ivs, "t", "s", "e",
        width = 1L, metricName = "frac_case")
      .select("pid", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 3.2 in [0, 3.5) ✓; 0.4 in both [0,3.5) and [0.2,0.5) ✓; 3.6 in neither
    assert(got == Set((1L, 1L), (2L, 1L), (2L, 2L)))
    // identical to the naive inequality join
    val naiveF = pts.join(ivs, col("t") >= col("s") && col("t") < col("e"))
      .select("pid", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naiveF)
  }
}
