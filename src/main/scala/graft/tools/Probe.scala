package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only scratch probe (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build("probe")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val customer = spark.read.parquet(s"$dir/customer.parquet")

    // variant 1: Dataset rollup after projection
    try {
      orders.join(customer, col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("seg"))
        .rollup("seg").agg(count(lit(1)).as("n"))
        .toDF("seg2", "n")
        .select(coalesce(col("seg2"), lit("ALL")).as("segment"), col("n"))
        .orderBy("segment").show()
      println("variant1 OK")
    } catch { case e: Throwable => println(s"variant1 FAIL: ${e.getMessage.take(120)}") }

    // variant 2: SQL GROUP BY ROLLUP over a temp view
    try {
      orders.join(customer, col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("seg"))
        .createOrReplaceTempView("q18_base")
      spark.sql("SELECT seg, count(*) AS n FROM q18_base GROUP BY seg ORDER BY seg").show()
      spark.sql("SELECT coalesce(seg, 'ALL') AS segment, count(*) AS n FROM q18_base GROUP BY ROLLUP(seg) ORDER BY segment").show(10)
      spark.sql("SELECT seg, grouping(seg) AS g, count(*) AS n FROM q18_base GROUP BY ROLLUP(seg)").show(10)
      println("variant2 OK")
    } catch { case e: Throwable => println(s"variant2 FAIL: ${e.getMessage.take(120)}") }

    spark.stop()
  }
}
