package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** top_k aggregate pinned against the window-ranking baseline:
  * identical results, deterministic under repartitioning, bounded
  * groups, null/short-group behavior, and a partial-aggregation
  * shuffle (ObjectHashAggregate partial_top_k before the exchange). */
class TopKAggregateSpec extends SparkSpecBase {

  import spark.implicits._

  // 5000 rows, 10 keys, unique ords (i as double) so the expected
  // payload set is unambiguous
  private lazy val df = (0 until 5000)
    .map(i => (s"k${i % 10}", i.toDouble, s"p$i"))
    .toDF("key", "score", "payload")

  private def viaTopK(input: org.apache.spark.sql.DataFrame, k: Int) =
    input.groupBy("key")
      .agg(TopKAgg.topK(col("score"), col("payload"), k).as("top"))
      .select(col("key"), explode(col("top")).as("e"))
      .select(col("key"), col("e.ord").as("score"), col("e.payload").as("payload"))

  test("matches the window row_number encoding exactly") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("key").orderBy(desc("score"))
    val expected = df.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 7).select("key", "score", "payload")
      .collect().map(_.mkString("|")).toSet
    val got = viaTopK(df, 7).collect().map(_.mkString("|")).toSet
    assert(got == expected)
  }

  test("deterministic under repartitioning, arrays sorted descending") {
    val a = viaTopK(df, 5).collect().map(_.mkString("|")).toList.sorted
    val b = viaTopK(df.repartition(17), 5).collect().map(_.mkString("|")).toList.sorted
    assert(a == b)
    val arr = df.groupBy("key").agg(TopKAgg.topK(col("score"), col("payload"), 5).as("top"))
      .select(col("top.ord").as("ords")).as[Seq[Double]].collect()
    assert(arr.forall(s => s == s.sorted.reverse && s.size == 5))
  }

  test("groups smaller than k return the whole group; null ords skipped") {
    val small = Seq(("a", Some(1.0), "x"), ("a", Some(2.0), "y"),
      ("a", None, "dropped"), ("b", Some(9.0), "z"))
      .toDF("key", "score", "payload")
    val got = viaTopK(small, 10).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getString(2))).toSet
    assert(got == Set(("a", 2.0, "y"), ("a", 1.0, "x"), ("b", 9.0, "z")))
  }

  test("struct payloads survive the heap round-trip") {
    val rows = Seq(("a", 3.0, (7L, "x")), ("a", 1.0, (8L, "y")), ("a", 2.0, (9L, "z")))
      .toDF("key", "score", "payload")
    val got = rows.groupBy("key")
      .agg(TopKAgg.topK(col("score"), col("payload"), 2).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.ord"), col("e.payload._1"), col("e.payload._2"))
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getString(2))).toSet
    assert(got == Set((3.0, 7L, "x"), (2.0, 9L, "z")))
  }

  test("partial aggregation happens map-side (partial_top_k before the exchange)") {
    val plan = df.groupBy("key")
      .agg(TopKAgg.topK(col("score"), col("payload"), 3).as("top"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_top_k"), plan.linesIterator.take(8).mkString("\n"))
    assert(plan.contains("ObjectHashAggregate"))
  }

  test("registered as SQL top_k via GraftExtensions") {
    val reg = org.apache.spark.sql.GraftBridge.functionRegistryOf(new GraftExtensions)
    assert(reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("top_k")))
  }
}
