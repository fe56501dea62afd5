package graft

import org.apache.spark.sql.SparkSession

/** One place for session construction so Verify / Bench / tests / CLI
  * agree on configs.
  *
  * Scale posture: these settings are sized for local[32] smoke runs,
  * but every query in the engine is written shuffle-clean (AQE on,
  * broadcast-friendly) so the same plans hold on a multi-executor
  * cluster — shuffle.partitions is the only knob a deployment resizes.
  */
object GraftSession {
  def build(appName: String = "graft"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // the driver-generated events table stores TIMESTAMP(NANOS);
      // Spark's TimestampType is micros-only, so surface ns as long
      // and convert explicitly (queries use timestamp_micros(ns/1000)).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    functions.VulFunctions.register(spark)
    spark
  }
}
