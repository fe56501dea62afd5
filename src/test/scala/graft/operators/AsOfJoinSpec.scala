package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** As-of join semantics pinned against a brute-force per-row oracle:
  * backward picks the latest right row at-or-before, forward the
  * earliest at-or-after, equal times match, unmatched lefts survive
  * with nulls, tolerance voids stale matches — and the plan stays a
  * single window (no nested loop, no cartesian). */
class AsOfJoinSpec extends SparkSpecBase {

  import spark.implicits._

  // left probes: (id, key, t)
  private lazy val quotes = Seq(
    (1L, "a", 100L), (2L, "a", 205L), (3L, "a", 300L),
    (4L, "b", 50L), (5L, "b", 500L),
    (6L, "c", 10L) // key with no right rows at all
  ).toDF("id", "key", "t")

  // right states: (key, rt, px) — unique per (key, rt)
  private lazy val trades = Seq(
    ("a", 100L, 1.0), ("a", 200L, 2.0), ("a", 400L, 4.0),
    ("b", 60L, 6.0), ("b", 90L, 9.0)
  ).toDF("key", "rt", "px")

  private def byId(df: org.apache.spark.sql.DataFrame): Map[Long, (Option[Double], Option[Long])] =
    df.select("id", "r_px", "r_rt").collect().map { r =>
      r.getLong(0) -> (
        if (r.isNullAt(1)) None else Some(r.getDouble(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))
    }.toMap

  test("backward: latest at-or-before, equal time matches, no-match is null") {
    val out = byId(AsOfJoin.asOfBackward(quotes, trades,
      "key", "key", "t", "rt", Seq("px"), prefix = "r_"))
    assert(out(1L) == (Some(1.0), Some(100L))) // equal time matches
    assert(out(2L) == (Some(2.0), Some(200L))) // latest of {100,200}
    assert(out(3L) == (Some(2.0), Some(200L))) // 400 is in the future
    assert(out(4L) == (None, None))            // before the first state
    assert(out(5L) == (Some(9.0), Some(90L)))
    assert(out(6L) == (None, None))            // key absent on the right
  }

  test("forward: earliest at-or-after") {
    val out = byId(AsOfJoin.asOfForward(quotes, trades,
      "key", "key", "t", "rt", Seq("px"), prefix = "r_"))
    assert(out(1L) == (Some(1.0), Some(100L))) // equal time matches
    assert(out(2L) == (Some(4.0), Some(400L)))
    assert(out(3L) == (Some(4.0), Some(400L)))
    assert(out(4L) == (Some(6.0), Some(60L)))
    assert(out(5L) == (None, None))            // after the last state
    assert(out(6L) == (None, None))
  }

  test("tolerance voids matches farther than the horizon") {
    val out = byId(AsOfJoin.asOfBackward(quotes, trades,
      "key", "key", "t", "rt", Seq("px"), prefix = "r_", tolerance = Some(10L)))
    assert(out(1L) == (Some(1.0), Some(100L))) // lag 0 <= 10
    assert(out(2L) == (Some(2.0), Some(200L))) // lag 5 <= 10
    assert(out(3L) == (None, None))            // lag 100 > 10
    assert(out(5L) == (None, None))            // lag 410 > 10
  }

  test("matches a brute-force oracle on a randomized-ish dense input") {
    // deterministic pseudo-random fixture, several rows per key
    val left = (0 until 200).map { i =>
      (i.toLong, s"k${i % 7}", ((i * 37) % 97).toLong)
    }.toDF("id", "key", "t")
    val right = (0 until 60).map { j =>
      (s"k${j % 7}", ((j * 13) % 91).toLong, j.toDouble)
    }.distinct.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      .toDF("key", "rt", "px")

    val got = AsOfJoin.asOfBackward(left, right,
      "key", "key", "t", "rt", Seq("px"), prefix = "r_")
      .select("id", "r_px").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap

    val rightRows = right.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val want = left.collect().map { l =>
      val (id, k, t) = (l.getLong(0), l.getString(1), l.getLong(2))
      val cands = rightRows.filter(r => r._1 == k && r._2 <= t)
      id -> (if (cands.isEmpty) None else Some(cands.maxBy(_._2)._3))
    }.toMap
    assert(got == want)
    assert(got.size == 200) // left-outer: every left row survives
  }

  test("plan is one window over a union — no nested loop, no cartesian") {
    val plan = AsOfJoin.asOfBackward(quotes, trades,
      "key", "key", "t", "rt", Seq("px"), prefix = "r_")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(plan.contains("Window"))
  }

  test("guards: rightTime in rightCols and schema collisions are rejected") {
    intercept[IllegalArgumentException] {
      AsOfJoin.asOfBackward(quotes, trades, "key", "key", "t", "rt", Seq("rt", "px"))
    }
    intercept[IllegalArgumentException] {
      // no prefix: right 'px' is fine but carried 'rt' collides with… nothing;
      // collide deliberately via a left column named like the carried one
      AsOfJoin.asOfBackward(quotes.withColumnRenamed("id", "px"), trades,
        "key", "key", "t", "rt", Seq("px"))
    }
  }

  test("a matched right row with a null value column stays atomic (no stale resurrection)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("key", StringType),
      StructField("rt", LongType), StructField("px", DoubleType, nullable = true)))
    val r = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("a", 3L, 1.0), Row("a", 5L, null))), schema)
    val q = Seq((1L, "a", 10L)).toDF("id", "key", "t")
    // matched row is (t=5, px=null): px must come out NULL, not 1.0
    val out = AsOfJoin.asOfBackward(q, r, "key", "key", "t", "rt",
      Seq("px"), prefix = "r_").collect()(0)
    assert(out.getAs[Any]("r_rt") == 5L)
    assert(out.isNullAt(out.fieldIndex("r_px")), s"stale value resurrected: $out")
    // tolerance binds to the TRUE matched time (5), so lag 5 <= 6 keeps
    // the match — and still emits the matched row's null px
    val tol = AsOfJoin.asOfBackward(q, r, "key", "key", "t", "rt",
      Seq("px"), prefix = "r_", tolerance = Some(6L)).collect()(0)
    assert(tol.getAs[Any]("r_rt") == 5L && tol.isNullAt(tol.fieldIndex("r_px")))
  }

  test("null times never match, in both directions") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val lSchema = StructType(Seq(StructField("id", LongType),
      StructField("key", StringType), StructField("t", LongType, nullable = true)))
    val l = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, "a", 100L), Row(2L, "a", null))), lSchema)
    val rSchema = StructType(Seq(StructField("key", StringType),
      StructField("rt", LongType, nullable = true), StructField("px", DoubleType)))
    val r = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("a", 50L, 5.0), Row("a", null, 99.0))), rSchema)

    val bwd = byId(AsOfJoin.asOfBackward(l, r, "key", "key", "t", "rt", Seq("px"), "r_"))
    assert(bwd(1L) == (Some(5.0), Some(50L))) // real match unaffected
    assert(bwd(2L) == (None, None))           // null left time: unmatched
    val fwd = byId(AsOfJoin.asOfForward(l, r, "key", "key", "t", "rt", Seq("px"), "r_"))
    assert(fwd(1L) == (None, None))           // nothing at-or-after 100
    assert(fwd(2L) == (None, None))           // null left time: unmatched, NOT the earliest right row
    // the null-time right row (px=99.0) matched nothing anywhere
    assert(!bwd.values.exists(_._1.contains(99.0)) && !fwd.values.exists(_._1.contains(99.0)))
  }

  test("timestamp time columns: tolerance reads in microseconds, no manual cast") {
    val l = Seq((1L, "a", "2026-01-01 00:00:10"), (2L, "a", "2026-01-01 00:01:00"))
      .toDF("id", "key", "ts").withColumn("ts", to_timestamp(col("ts")))
    val r = Seq(("a", "2026-01-01 00:00:00", 1.0))
      .toDF("key", "rts", "px").withColumn("rts", to_timestamp(col("rts")))
    // 30 s horizon = 30e6 micros: lag 10 s matches, lag 60 s is voided
    val out = AsOfJoin.asOfBackward(l, r, "key", "key", "ts", "rts",
        Seq("px"), prefix = "r_", tolerance = Some(30000000L))
      .collect().map(row => row.getLong(0) ->
        (if (row.isNullAt(row.fieldIndex("r_px"))) None
         else Some(row.getDouble(row.fieldIndex("r_px"))))).toMap
    assert(out(1L) == Some(1.0))
    assert(out(2L) == None)
  }

  test("NTZ tolerance is wall-clock: a DST-gap session timezone cannot shrink the horizon") {
    // Europe/Berlin skips 02:00-03:00 on 2026-03-29. Wall-clock lag
    // between 01:30 and 03:30 is 2 h; a cast-to-LTZ epoch diff would
    // report 1 h and keep a match the 90-minute horizon must void.
    val sess = spark
    val savedTz = sess.conf.get("spark.sql.session.timeZone")
    try {
      sess.conf.set("spark.sql.session.timeZone", "Europe/Berlin")
      val l = Seq((1L, "a")).toDF("id", "key")
        .withColumn("ts", lit("2026-03-29 03:30:00").cast("timestamp_ntz"))
      val r = Seq(("a", 1.0)).toDF("key", "px")
        .withColumn("rts", lit("2026-03-29 01:30:00").cast("timestamp_ntz"))
      def matched(tolMicros: Long): Boolean = {
        val row = AsOfJoin.asOfBackward(l, r, "key", "key", "ts", "rts",
          Seq("px"), prefix = "r_", tolerance = Some(tolMicros)).collect()(0)
        !row.isNullAt(row.fieldIndex("r_px"))
      }
      assert(!matched(90L * 60 * 1000000), "2h wall-clock lag must exceed a 90min horizon")
      assert(matched(150L * 60 * 1000000), "and a 150min horizon must keep it")
    } finally sess.conf.set("spark.sql.session.timeZone", savedTz)
  }

  test("input columns colliding with internal names are rejected") {
    intercept[IllegalArgumentException] {
      AsOfJoin.asOfBackward(quotes.withColumn("_side", lit(1)), trades,
        "key", "key", "t", "rt", Seq("px"), prefix = "r_")
    }
    intercept[IllegalArgumentException] {
      AsOfJoin.asOfBackward(quotes, trades.withColumn("_m", lit(1)),
        "key", "key", "t", "rt", Seq("px"), prefix = "r_")
    }
  }

  test("seeded property: forward and tolerance match brute force on dense random data") {
    val rnd = new scala.util.Random(20260812L)
    // duplicate left times, boundary-adjacent right times, sparse keys
    val left = (0 until 400).map { i =>
      (i.toLong, s"k${rnd.nextInt(11)}", rnd.nextInt(50).toLong)
    }.toDF("id", "key", "t")
    val right = (0 until 150).map { j =>
      (s"k${rnd.nextInt(11)}", rnd.nextInt(50).toLong, j.toDouble)
    }.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq // unique (key, rt)
      .toDF("key", "rt", "px")
    val rightRows = right.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))

    def got(df: org.apache.spark.sql.DataFrame): Map[Long, Option[Double]] =
      df.select("id", "r_px").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val leftRows = left.collect().map(l => (l.getLong(0), l.getString(1), l.getLong(2)))

    // forward
    val fwd = got(AsOfJoin.asOfForward(left, right, "key", "key", "t", "rt",
      Seq("px"), prefix = "r_"))
    val fwdWant = leftRows.map { case (id, k, t) =>
      val c = rightRows.filter(r => r._1 == k && r._2 >= t)
      id -> (if (c.isEmpty) None else Some(c.minBy(_._2)._3))
    }.toMap
    assert(fwd == fwdWant)

    // backward with tolerance 7
    val tol = got(AsOfJoin.asOfBackward(left, right, "key", "key", "t", "rt",
      Seq("px"), prefix = "r_", tolerance = Some(7L)))
    val tolWant = leftRows.map { case (id, k, t) =>
      val c = rightRows.filter(r => r._1 == k && r._2 <= t && t - r._2 <= 7L)
      id -> (if (c.isEmpty) None else Some(c.maxBy(_._2)._3))
    }.toMap
    assert(tol == tolWant)
  }
}
