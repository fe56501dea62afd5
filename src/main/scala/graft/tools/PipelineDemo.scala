package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.{Enrich, Namespacing}
import graft.sinks.VulDbSink
import graft.sources.{AlpineSource, NvdSource}

/** End-to-end consumer path of the vul-db pipeline on fixture feeds:
  * source -> namespacing (A1) -> NVD enrichment (J1) -> severity gate
  * -> dual-projection encrypted artifacts (K1-K6) -> read-back.
  * Usage: runMain graft.tools.PipelineDemo <alpineJson> <nvdJson> <outDir> */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val Array(alpinePath, nvdPath, outDir) = args
    implicit val spark: SparkSession = graft.GraftSession.build("pipeline-demo")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val raw = AlpineSource.load(spark, alpinePath)
    val grouped = Namespacing(raw)
    val nvd = NvdSource.load(spark, nvdPath)
    val enriched = Enrich.distro(grouped, nvd)
    println(s"[demo] parsed=${raw.count()} grouped=${grouped.count()} enriched+gated=${enriched.count()}")

    val shas = VulDbSink.write(enriched, spark.emptyDataset[graft.core.AppModuleVul],
      Seq(VulDbSink.TarEntry("rhel-cpes.json", "{}".getBytes)), outDir, "1.000",
      java.time.format.DateTimeFormatter.ISO_INSTANT.format(java.time.Instant.now()))

    val (header, entries) = VulDbSink.readDbFile(s"$outDir/cvedb.regular")
    println(s"[demo] regular artifact: ${entries.length} files, header ${header.take(80)}...")
    val alpineFull = entries.find(_.name == "alpine_full.tb").get
    println(s"[demo] alpine_full.tb sha ok: ${VulDbSink.sha256Hex(alpineFull.bytes) == shas("alpine_full.tb")}")
    new String(alpineFull.bytes, "UTF-8").linesIterator.take(3).foreach(l => println(s"[demo] $l"))
    spark.stop()
  }
}
