package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only: does AQE partition coalescing fire on this session's tiny
  * shuffles? Prints the post-shuffle partition counts for a groupBy
  * and a join over the sf0.1 documents table under the engine session
  * configs — answers whether the observed 32-task reduce stages are
  * expected (parallelismFirst) or a config bug. */
object CoalesceProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build("coalesce-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val agg = docs.groupBy("source").agg(count(lit(1)).as("n"))
    agg.write.format("noop").mode("overwrite").save()
    println("groupBy post-AQE partitions: " + agg.rdd.getNumPartitions)
    val tok = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
    tok.write.format("noop").mode("overwrite").save()
    println("tokenize groupBy post-AQE partitions: " + tok.rdd.getNumPartitions)
    for (k <- Seq("spark.sql.adaptive.enabled",
        "spark.sql.adaptive.coalescePartitions.enabled",
        "spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes"))
      println(s"$k = ${spark.conf.getOption(k).getOrElse("(default)")}")
    spark.stop()
  }
}
