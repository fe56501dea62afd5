package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only scratch probe (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build("probe")
    spark.sparkContext.setLogLevel("ERROR")
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val dir = "/root/testdata/sf0.001"

    // streaming surface: tumbling windows via readStream
    val q = graft.streaming.EventStream.runTumbling(spark, dir, "probe_stream", "events.parquet")
    q.awaitTermination(60000)
    val n = spark.sql("SELECT count(*) AS n, sum(n) AS events FROM probe_stream").collect()(0)
    println(s"[probe] stream tumbling: ${n.getLong(0)} window rows, ${n.getLong(1)} events")

    // streaming surface: stateful sessionization
    val sess = graft.streaming.EventStream.sessionize(spark,
      spark.read.parquet(s"$dir/events.parquet"))
    println(s"[probe] sessionize: ${sess.count()} users, total sessions = " +
      sess.agg(sum("n_sessions")).collect()(0).get(0))

    // multimodal surface
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("blob", col("text").cast("binary"))
    val stats = graft.operators.Multimodal.mediaStats(docs, "blob", Seq("lang"))
    stats.orderBy("lang").show(5, false)

    // empty-binary probe
    import spark.implicits._
    val weird = Seq(("a", Array.empty[Byte]), ("b", null.asInstanceOf[Array[Byte]]),
      ("c", "bytes".getBytes)).toDF("id", "blob")
    graft.operators.Multimodal.withMediaMeta(weird, "blob").select("id", "media.ok", "media.digest").show()
    spark.stop()
  }
}
