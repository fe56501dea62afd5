package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Misra–Gries heavy-hitters sketch: exact below capacity (the
  * oracle-able regime), order-independent MG guarantees above it. */
class HeavyHittersSpec extends SparkSpecBase {

  import spark.implicits._

  test("exact regime: distinct <= capacity reproduces plain groupBy counts with err = 0") {
    val rows = (0 until 500).map(i => (i % 7L, s"t${i % 5}"))
    val df = rows.toDF("k", "item").repartition(8)
    val got = df.groupBy("k")
      .agg(HeavyHittersAgg.heavyHitters(col("item"), 8).as("hh"))
      .select(col("k"), col("hh.err").as("err"), explode(col("hh.items")).as("it"))
      .select(col("k"), col("err"), col("it.item"), col("it.count"))
      .collect().map(r => (r.getLong(0), r.getString(2)) -> ((r.getLong(1), r.getLong(3)))).toMap
    val want = rows.groupBy(identity).map { case (ki, xs) => ki -> xs.size.toLong }
    assert(got.view.mapValues(_._2).toMap == want)
    assert(got.values.forall(_._1 == 0L), "no decrement may fire below capacity")
  }

  test("approximate regime: lower-bound counts, additive error, guaranteed heavy items — any partitioning") {
    // skewed stream: 3 heavy items over a 3000-item tail, capacity 8
    val rnd = new scala.util.Random(11L)
    val items = (0 until 20000).map { _ =>
      val r = rnd.nextInt(100)
      if (r < 30) "h0" else if (r < 50) "h1" else if (r < 60) "h2"
      else s"tail${rnd.nextInt(3000)}"
    }
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = items.size.toLong
    val cap = 8
    for (parts <- Seq(1, 13)) {
      val row = items.map(Tuple1(_)).toDF("item").repartition(parts)
        .agg(HeavyHittersAgg.heavyHitters(col("item"), cap).as("hh"))
        .select(col("hh.err"), col("hh.items")).collect()(0)
      val err = row.getLong(0)
      val got = row.getSeq[org.apache.spark.sql.Row](1)
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got.size <= cap)
      assert(err > 0, "this stream must overflow the capacity")
      assert(err <= n / (cap + 1), s"error bound violated: err=$err n=$n")
      got.foreach { case (i, c) =>
        val t = truth(i)
        assert(c <= t && t <= c + err,
          s"bounds violated for $i at $parts partitions: count=$c true=$t err=$err")
      }
      truth.filter(_._2 > n / (cap + 1)).keys.foreach { h =>
        assert(got.contains(h),
          s"guaranteed-heavy item $h (freq ${truth(h)}) missing at $parts partitions")
      }
    }
  }

  test("nulls are skipped; empty group evaluates to err=0, no items") {
    val df = Seq(Some("a"), None, Some("a"), None).toDF("item")
    val row = df.agg(HeavyHittersAgg.heavyHitters(col("item"), 4).as("hh"))
      .select(col("hh.err"), col("hh.items")).collect()(0)
    assert(row.getLong(0) == 0L)
    val items = row.getSeq[org.apache.spark.sql.Row](1)
    assert(items.map(r => (r.getString(0), r.getLong(1))) == Seq(("a", 2L)))

    val empty = spark.emptyDataFrame.withColumn("item", lit("x")).limit(0)
      .agg(HeavyHittersAgg.heavyHitters(col("item"), 4).as("hh"))
      .select(col("hh.items")).collect()(0)
    assert(empty.getSeq[org.apache.spark.sql.Row](0).isEmpty)
  }
}
