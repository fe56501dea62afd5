package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** The point of bucketing is plan-shaped: co-bucketed joins and
  * bucket-key aggregations must run with ZERO shuffle exchanges,
  * and results must equal the unbucketed baseline. */
class BucketingSpec extends SparkSpecBase {

  import spark.implicits._

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int =
    "ShuffleExchange|Exchange hashpartitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).length

  test("co-bucketed equi-join and bucket-key agg plan with zero exchanges") {
    val facts = (0 until 10000).map(i => (i.toLong % 500, s"f$i", i * 1.0))
      .toDF("key", "tag", "v")
    val dims = (0L until 500L).map(k => (k, s"d$k")).toDF("key", "attr")
    try {
      Bucketing.writeBucketed(facts, "bk_facts", "key", 8, sortCols = Seq("key"))
      Bucketing.writeBucketed(dims, "bk_dims", "key", 8, sortCols = Seq("key"))
      val bf = Bucketing.read(spark, "bk_facts")
      val bd = Bucketing.read(spark, "bk_dims")

      // make sure AQE/broadcast doesn't mask the property under test
      val joined = bf.hint("merge").join(bd.hint("merge"), "key")
      assert(shuffles(joined) == 0, joined.queryExecution.executedPlan.toString)
      assert(joined.count() == 10000)

      val agg = bf.groupBy("key").agg(sum("v").as("sv"))
      assert(shuffles(agg) == 0, agg.queryExecution.executedPlan.toString)

      // results identical to the unbucketed baseline
      val base = facts.join(dims, "key").groupBy("key").count()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val got = joined.groupBy("key").count()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == base)

      // the unbucketed twin of the same join DOES shuffle (sanity)
      val plain = facts.hint("merge").join(dims.hint("merge"), "key")
      assert(shuffles(plain) > 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bk_facts")
      spark.sql("DROP TABLE IF EXISTS bk_dims")
    }
  }
}
