package graft.tools

import org.apache.spark.sql.SparkSession

import graft.pipeline.VulDbPipeline
import graft.sinks.VulDbSink
import graft.sources._

/** End-to-end consumer path of the full vul-db pipeline on fixture
  * feeds: distro (alpine, debian, photon) + app (ghsa, k8s, manual,
  * openshift) + NVD + calibration -> dual encrypted artifacts ->
  * decrypt read-back.
  * Usage: runMain graft.tools.PipelineDemo <fixturesDir> <outDir> */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val Array(fx, outDir) = args
    implicit val spark: SparkSession = graft.GraftSession.build("pipeline-demo")
    spark.sparkContext.setLogLevel("ERROR")

    val inputs = VulDbPipeline.Inputs(
      distroFeeds = Seq(
        AlpineSource.load(spark, s"$fx/alpine_secdb.json"),
        DebianSource.load(spark, s"$fx/debian_main.json", Seq(s"$fx/debian_archive.json")),
        PhotonSource.load(spark, s"$fx/photon4.json", "4.0"),
        graft.sources.oval.RhelSource.load(spark, s"$fx/rhel_oval.xml", 8),
        graft.sources.oval.OracleSource.load(spark, s"$fx/oracle_oval.xml"),
        graft.sources.oval.SuseSource.load(spark, s"$fx/suse_oval.xml",
          graft.sources.oval.SuseSource.FeedInfo("sles15", "SUSE Linux Enterprise Server 15 ", "sles:")),
        graft.sources.oval.MarinerSource.load(spark, s"$fx/mariner_oval.xml"),
        UbuntuSource.load(spark, s"$fx/ubuntu-tracker"),
        RockySource.load(spark, s"$fx/rocky_api.json")),
      appFeeds = Seq(
        GhsaSource.load(spark, s"$fx/ghsa_maven.ndjson", "maven"),
        AppSources.k8s(spark, s"$fx/k8s.json"),
        AppSources.openshift(spark),
        AppSources.manual(spark, s"$fx/manual.db")),
      nvd = NvdSource.load(spark, s"$fx/nvd_sample.json"),
      calibration = Some(AppSources.calibration(spark, s"$fx/apps_calibration")),
      rawFiles = Seq(VulDbSink.TarEntry("rhel-cpes.json", "{}".getBytes)))

    val built = VulDbPipeline.build(inputs)
    println(s"[demo] distro vulns=${built.vulns.count()} apps=${built.apps.count()}")
    built.vulns.groupBy("namespace").count().orderBy("namespace").collect()
      .foreach(r => println(s"[demo] ns ${r.get(0)} -> ${r.get(1)}"))

    val shas = VulDbPipeline.run(inputs, outDir, "1.000",
      java.time.format.DateTimeFormatter.ISO_INSTANT.format(java.time.Instant.now()))

    val (header, entries) = VulDbSink.readDbFile(s"$outDir/cvedb.regular")
    println(s"[demo] regular artifact: ${entries.length} files")
    for (name <- Seq("alpine_full.tb", "debian_full.tb", "photon_full.tb", "apps.tb")) {
      val e = entries.find(_.name == name).get
      val n = new String(e.bytes, "UTF-8").linesIterator.count(_.nonEmpty)
      println(s"[demo] $name: $n rows, sha ok: ${VulDbSink.sha256Hex(e.bytes) == shas(name)}")
    }
    val apps = new String(entries.find(_.name == "apps.tb").get.bytes, "UTF-8")
    apps.linesIterator.take(2).foreach(l => println(s"[demo] app: ${l.take(140)}"))
    spark.stop()
  }
}
