package graft.pipeline

import java.sql.Timestamp

import graft.SparkSpecBase
import graft.core._

/** The -debug v=CVE row-tracing analogue: a traced CVE is snapshotted
  * at parse, namespacing, enrichment, and pre-sink; untraced CVEs and
  * a disabled tracer leave nothing behind. */
class VulTracerSpec extends SparkSpecBase {

  private def vul(name: String, ns: String) = Vulnerability(
    name = name, namespace = ns, description = "desc " + name,
    link = "l", severity = "High", cvssV2Score = 7.1, cvssV2Vectors = "AV:N",
    cvssV3Score = 8.0, cvssV3Vectors = "CVSS:3.1/X",
    issuedDate = Timestamp.valueOf("2021-04-01 00:00:00"),
    lastModDate = null, cves = Nil,
    fixedIn = Seq(FeatureVersion("pkg", ns, "1.2-r0", "")),
    cpes = Nil, feedRating = "")

  test("traced CVE is snapshotted at every phase") {
    import spark.implicits._
    val feed = Seq(vul("CVE-2021-1111", "alpine:3.6"),
      vul("CVE-2021-2222", "alpine:3.6")).toDS()
    val nvd = spark.emptyDataset[NvdMetadata]

    val cachedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val tracer = VulTracer.parse("v=CVE-2021-1111")
    assert(tracer.cves == Set("CVE-2021-1111"))
    val out = VulDbPipeline.build(
      VulDbPipeline.Inputs(distroFeeds = Seq(feed), appFeeds = Nil, nvd = nvd),
      tracer)
    out.vulns.count() // the taps themselves already ran eagerly

    val phases = tracer.traces.map(_.phase)
    assert(phases == Seq("parse distro", "namespacing distro",
      "post enrich distro", "pre sink distro"), s"got $phases")
    assert(tracer.traces.forall(_.name == "CVE-2021-1111"))
    // snapshots carry the full record at that phase
    assert(tracer.traces.head.snapshot.contains("\"description\":\"desc CVE-2021-1111\""))
    assert(tracer.traces.forall(_.snapshot.contains("alpine:3.6")))
    // renders one line per phase
    assert(tracer.format.linesIterator.size == 4)
    assert(tracer.toDF(spark).count() == 4)
    // the trace collect is the last reader of the phase caches: after
    // `traces` resolves, every cached phase frame must be released, or
    // a -debug run pins all intermediates in storage for the rest of
    // the application (compared against the pre-existing cache set so
    // caches owned by other suites in the shared session don't bleed in)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- cachedBefore
    assert(leaked.isEmpty,
      s"phase caches must be unpersisted after resolve, still pinned: $leaked")
  }

  test("disabled tracer records nothing and taps are identity") {
    import spark.implicits._
    val feed = Seq(vul("CVE-2021-1111", "alpine:3.6")).toDS()
    val out = VulDbPipeline.build(VulDbPipeline.Inputs(
      distroFeeds = Seq(feed), appFeeds = Nil,
      nvd = spark.emptyDataset[NvdMetadata]))
    assert(out.vulns.count() == 1)
    assert(VulTracer.disabled.traces.isEmpty)
  }

  test("debug-arg parser matches the reference syntax") {
    assert(VulTracer.parse("v=CVE-1,CVE-2").cves == Set("CVE-1", "CVE-2"))
    assert(VulTracer.parse("x=1").cves.isEmpty)
    assert(!VulTracer.parse("").enabled)
  }
}
