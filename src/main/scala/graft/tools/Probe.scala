package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scratch probe (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build("probe")
    spark.sparkContext.setLogLevel("ERROR")
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.printSchema()
    ev.select(col("ts"),
      date_format(timestamp_micros(expr("ts div 1000")), "yyyy-MM-dd HH:mm:ss").as("s")).show(3, false)
    spark.sql("SELECT version_cmp('1.0~rc1', '1.0') a, version_cmp('2:1.0-1','1:9.9-9') b, " +
      "version_cmp('2.9.1-6.el7.4','2.9.1-6.el7_2.2') c, version_cmp('1.6_rc1-r0','1.6-r1') d").show()
    spark.sql("SELECT version_cmp('#MINV#','0') min_first, version_cmp('#MAXV#','999:9') max_last, " +
      "version_cmp(NULL,'1.0') null_in, version_cmp('','1.0') empty_in, " +
      "version_cmp('2:svn28991.0-45.el7','2:svn28991.0-45.el7') self_eq").show()
    spark.sql("SELECT parse_range_expr('>=1.3.0 <1.3.2 || >=1.4.0 <1.4.11') chain").show(false)
    spark.sql("SELECT range_contains(parse_range_expr('>=1.3.0 <1.3.2 || >=1.4.0'), '1.3.1') in1, " +
      "range_contains(parse_range_expr('>=1.3.0 <1.3.2 || >=1.4.0'), '1.3.5') in2, " +
      "range_contains(parse_range_expr(''), '1.0') empty_chain, " +
      "cve_year('CVE-2021-9999') yr, cve_year('garbage') bad_yr").show()
    // native expression stays inside whole-stage codegen:
    spark.range(3).selectExpr("version_cmp(cast(id as string), '1')").explain("formatted")
    spark.stop()
  }
}
