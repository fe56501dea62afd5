package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only scratch probe (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    // fresh JVM: the extensions config applies to a brand-new session,
    // the way a deployment registers the engine's native functions
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("ext-probe")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql("SELECT version_cmp('1.0~rc1', '1.0') a, " +
      "version_cmp('2.9.1-6.el7.4', '2.9.1-6.el7_2.2') b, " +
      "version_cmp('1.6_rc1-r0', '1.6-r1') c").show()
    // and the error path: wrong arity
    try spark.sql("SELECT version_cmp('1.0')").collect()
    catch { case e: Exception => println(s"[probe] arity error surfaces: ${e.getMessage.linesIterator.next()}") }
    // compiled text kernels registered via the same extensions path
    spark.sql("SELECT shingles('a b c d', 3) shs, " +
      "minhash_sig('a b c d', 3, 4) sig, " +
      "minhash_sig('one token', 3, 4) empty_doc").show(false)
    spark.sql("SELECT simhash64(array('a','b','c')) sh_arr, " +
      "simhash64_text('a b c') sh_text, " +
      "shingles('a b c d', CAST(3 AS BIGINT)) foldable_n").show(false)
    spark.sql("SELECT nfc_normalize('plain') nfc, " +
      "round(cosine_sim(array(1D,2D), array(2D,4D)), 4) cos, " +
      "dot_product(array(1D,2D), array(3D,4D)) dot, " +
      "range_contains(parse_range_expr('>=1.0 <2.0'), '1.5') in_range").show(false)
    spark.stop()
  }
}
