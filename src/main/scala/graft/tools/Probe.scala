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

    // media decode surface: a hand-assembled minimal MP4 driven
    // through withVideoMeta's mapPartitions path on this session
    {
      import spark.implicits._
      def be32(v: Long): Array[Byte] = Array(((v >> 24) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
      def box(tpe: String, payload: Array[Byte]*): Array[Byte] = {
        val body = payload.flatten.toArray
        be32(body.length + 8L) ++ tpe.getBytes("ISO-8859-1") ++ body
      }
      val mp4 = box("ftyp", "isom".getBytes("ISO-8859-1")) ++
        box("moov",
          box("mvhd", new Array[Byte](4), be32(0), be32(0), be32(600), be32(1800),
            new Array[Byte](80)),
          box("trak",
            box("tkhd", new Array[Byte](76), be32(1280L << 16), be32(720L << 16)),
            box("mdia", box("hdlr", new Array[Byte](8),
              "vide".getBytes("ISO-8859-1"), new Array[Byte](13)))))
      val docs = Seq((1L, mp4), (2L, "not a video".getBytes("UTF-8")))
        .toDF("id", "blob").repartition(2)
      graft.operators.Multimodal.withVideoMeta(docs, "blob")(spark)
        .select("id", "video.ok", "video.width", "video.height",
          "video.durationMs", "video.videoTracks", "video.brand")
        .orderBy("id").show(false)
    }
    spark.stop()
  }
}
