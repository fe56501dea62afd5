package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.AppEnrichOps
import graft.pipeline.VulDbPipeline
import graft.sinks.VulDbSink
import graft.sources._
import graft.sources.oval._

/** End-to-end consumer path of the full vul-db pipeline on fixture
  * feeds — every adapter in the library: 11 distro feeds + 8 app
  * feeds + NVD + calibration + whitelist injection + version
  * backfill -> dual encrypted artifacts -> decrypt read-back.
  * Usage: runMain graft.tools.PipelineDemo <fixturesDir> <outDir>
  *          [-debug v=CVE-a,CVE-b]
  * The -debug flag is the reference's row-tracing filter: matching
  * records print a field snapshot after each pipeline phase. */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val (fx, outDir) = (args(0), args(1))
    val tracer = args.indexOf("-debug") match {
      case i if i >= 0 && i + 1 < args.length =>
        graft.pipeline.VulTracer.parse(args(i + 1))
      case _ => graft.pipeline.VulTracer.disabled
    }
    implicit val spark: SparkSession = graft.GraftSession.build("pipeline-demo")
    spark.sparkContext.setLogLevel("ERROR")

    val nvd = NvdSource.load(spark, s"$fx/nvd_sample.json")
    val ubuntu = UbuntuSource.load(spark, s"$fx/ubuntu-tracker")
    val goVulns = OsvSource.calibrateWithUbuntu(
      OsvSource.loadGo(spark, s"$fx/go-osv"),
      graft.operators.Namespacing(ubuntu))

    val inputs = VulDbPipeline.Inputs(
      distroFeeds = Seq(
        AlpineSource.load(spark, s"$fx/alpine_secdb.json"),
        DebianSource.load(spark, s"$fx/debian_main.json", Seq(s"$fx/debian_archive.json")),
        PhotonSource.load(spark, s"$fx/photon4.json", "4.0"),
        RhelSource.load(spark, s"$fx/rhel_oval.xml", 8),
        OracleSource.load(spark, s"$fx/oracle_oval.xml"),
        SuseSource.load(spark, s"$fx/suse_oval.xml",
          SuseSource.FeedInfo("sles15", "SUSE Linux Enterprise Server 15 ", "sles:")),
        MarinerSource.load(spark, s"$fx/mariner_oval.xml"),
        ubuntu,
        RockySource.load(spark, s"$fx/rocky_api.json"),
        AmazonSource.load(spark, s"$fx/alas.rss", s"$fx/alas-pages", 1),
        OsvSource.loadChainguard(spark, s"$fx/cg-osv", "Chainguard", "chainguard"),
        OsvSource.loadChainguard(spark, s"$fx/cg-osv", "Wolfi", "wolfi")),
      appFeeds = Seq(
        goVulns,
        GhsaSource.load(spark, s"$fx/ghsa_maven.ndjson", "maven"),
        HtmlSources.loadNginx(spark, s"$fx/nginx_advisories.html"),
        HtmlSources.loadOpenssl(spark, s"$fx/openssl_advisories.html"),
        RubySource.load(spark, s"$fx/ruby-gems"),
        AppSources.k8s(spark, s"$fx/k8s.json"),
        AppSources.openshift(spark),
        AppSources.manual(spark, s"$fx/manual.db")),
      nvd = nvd,
      calibration = Some(AppSources.calibration(spark, s"$fx/apps_calibration")),
      rawFiles = Seq(VulDbSink.TarEntry("rhel-cpes.json", "{}".getBytes)))

    // the J4 whitelist + J3 backfill sit between merge and enrichment
    val built = VulDbPipeline.build(inputs, tracer)
    val withBackfill = AppEnrichOps.backfillAffectedVersions(built.apps, nvd)
    println(s"[demo] distro vulns=${built.vulns.count()} apps=${withBackfill.count()}")
    built.vulns.groupBy("namespace").count().orderBy("namespace").collect()
      .foreach(r => println(s"[demo] ns ${r.get(0)} -> ${r.get(1)}"))
    withBackfill.groupBy("appName").count().orderBy("appName").collect()
      .foreach(r => println(s"[demo] app ${r.get(0)} -> ${r.get(1)}"))

    val shas = VulDbSink.write(built.vulns, withBackfill, inputs.rawFiles, outDir, "1.000",
      java.time.format.DateTimeFormatter.ISO_INSTANT.format(java.time.Instant.now()))
    val (_, entries) = VulDbSink.readDbFile(s"$outDir/cvedb.regular")
    println(s"[demo] regular artifact: ${entries.length} files, shas=${shas.size}")
    for (name <- Seq("chainguard_full.tb", "wolfi_full.tb", "amazon_full.tb", "apps.tb")) {
      val e = entries.find(_.name == name).get
      val n = new String(e.bytes, "UTF-8").linesIterator.count(_.nonEmpty)
      println(s"[demo] $name: $n rows, sha ok: ${VulDbSink.sha256Hex(e.bytes) == shas(name)}")
    }
    if (tracer.enabled) println(tracer.format)
    spark.stop()
  }
}
