package graft.sources

import graft.SparkSpecBase
import graft.core.{OpVersion, PkgVersion}
import graft.operators.AppPostFilters

/** Debian / GHSA / Photon / K8s / Manual / Calibration adapter
  * semantics on authored fixtures (FIXTURES.md §3, §6, §8, §12). */
class FeedSourcesSpec extends SparkSpecBase {

  // ---- Debian ----------------------------------------------------------

  lazy val debian = DebianSource.load(spark, fixture("debian_main.json"),
    Seq(fixture("debian_archive.json"))).collect().map(v => v.name -> v).toMap

  test("debian: release rows explode with status rules") {
    val v = debian("CVE-2021-9999")
    val byNs = v.fixedIn.map(f => (f.featureNamespace, f.featureName) -> f.version).toMap
    assert(byNs(("debian:11", "openldap")) == "2.4.57+dfsg-3") // resolved
    assert(byNs(("debian:unstable", "openldap")) == PkgVersion.MaxSentinel) // open
    assert(byNs(("debian:10", "openldap")) == PkgVersion.MinSentinel) // fixed_version "0"
    assert(byNs(("debian:12", "nginx")) == "1.18.0-6.1") // second package, same cve
  }

  test("debian: snapshot merge appends archive fixedIn, main metadata wins") {
    val v = debian("CVE-2021-9999")
    assert(v.fixedIn.exists(f => f.featureNamespace == "debian:9" && f.version == "2.4.44+dfsg-5+deb9u9"))
    // the archive's description never wins over the main tracker; among
    // equal-rank (main) descriptions the canonical pick is the minimum
    // (reference is Go-map-order nondeterministic here)
    assert(v.description == "nginx shares the cve")
    assert(debian.contains("CVE-2020-7777")) // archive-only cve present
    assert(debian("CVE-2020-7777").description == "archive-only cve")
  }

  test("debian: severity = max urgency; feedRating matches it") {
    assert(debian("CVE-2021-9999").severity == "High") // nginx row high beats medium
    assert(debian("CVE-2021-9999").feedRating == "high")
    assert(debian("CVE-2020-7777").severity == "High")
  }

  test("debian: gates") {
    assert(!debian.contains("CVE-2021-8888")) // undetermined only
    assert(!debian.contains("CVE-2013-0001")) // year floor
    assert(!debian.contains("TEMP-0000000-ABCDEF")) // non-CVE name
    assert(!debian.contains("CVE-2022-1111")) // unparseable resolved version
    // unknown release (warty) contributed no fixedIn
    assert(!debian("CVE-2021-9999").fixedIn.exists(_.version == "1.0"))
  }

  // ---- GHSA ------------------------------------------------------------

  lazy val ghsa = GhsaSource.load(spark, fixture("ghsa_maven.ndjson"), "maven")
    .collect().map(v => (v.vulName, v.moduleName) -> v).toMap

  test("ghsa: multi-line merge with or-chained ranges in line order") {
    val v = ghsa(("CVE-2021-9999", "org.apache.tomcat:tomcat"))
    assert(v.affectedVer == Seq(
      OpVersion("gteq", "9.0.0"), OpVersion("lt", "9.0.44"),
      OpVersion("orgteq", "10.0.0"), OpVersion("lt", "10.0.4")))
    assert(v.fixedVer == Seq(OpVersion("", "9.0.44"), OpVersion("", "10.0.4")))
    assert(v.description.startsWith("tomcat vuln\nline one")) // first line wins metadata
    assert(v.severity == "High")
    assert(v.scoreV3 == 8.8 && v.score == 0.0)
    assert(v.cves == Seq("CVE-2021-9999"))
  }

  test("ghsa: jre suffix cleanup + v2 vector routing") {
    val v = ghsa(("GHSA-bbbb", "com.example:mssql-thing"))
    assert(v.affectedVer == Seq(OpVersion("lt", "8.4.1")))
    assert(v.fixedVer == Seq(OpVersion("", "8.4.1")))
    assert(v.score == 5.8 && v.scoreV3 == 0.0) // AV:N/... routes to v2
    assert(v.severity == "Medium")
  }

  test("ghsa: fixedVer [0.0.0] means no fix") {
    assert(ghsa(("GHSA-cccc", "com.example:nofix")).fixedVer.isEmpty)
  }

  test("ghsa: unknown severity rows dropped; CWE name fallback") {
    assert(!ghsa.contains(("GHSA-dddd", "com.example:unknownsev")))
    assert(ghsa.contains(("CWE-79", "com.example:cwe-named")))
  }

  // ---- Photon ----------------------------------------------------------

  lazy val photon = PhotonSource.load(spark, fixture("photon4.json"), "4.0")
    .collect().map(v => v.name -> v).toMap

  test("photon: score in v3, sentinel + bad-version handling, alt names") {
    assert(photon("CVE-2021-9999").cvssV3Score == 7.5)
    assert(photon("CVE-2021-9999").fixedIn.head.version == "2.4.57-1.ph4")
    assert(photon("CVE-2021-9999").namespace == "photon:4.0")
    assert(photon("CVE-2021-7777").fixedIn.head.version == PkgVersion.MaxSentinel)
    // the reference's broken err check keeps unparseable versions (empty)
    assert(photon("CVE-2021-6666").fixedIn.head.version == "")
    // expat duplicated under its alternate name
    val expat = photon("CVE-2021-8888").fixedIn
    assert(expat.map(_.featureName).toSet == Set("expat", "expat-libs"))
    assert(expat.forall(_.version == "2.2.9-1.ph4"))
  }

  // ---- K8s / Manual / Calibration -------------------------------------

  test("k8s: id-only rows with cve alias") {
    val rows = AppSources.k8s(spark, fixture("k8s.json")).collect()
    assert(rows.length == 2)
    val r = rows.find(_.vulName == "CVE-2021-25741").get
    assert(r.moduleName == "kubernetes" && r.cves == Seq("CVE-2021-25741"))
    assert(r.description.contains("symlink"))
  }

  test("manual: Go-tag JSON lines parse") {
    val rows = AppSources.manual(spark, fixture("manual.db")).collect()
    assert(rows.length == 2)
    val bb = rows.find(_.vulName == "CVE-2017-16544").get
    assert(bb.moduleName == "busybox")
    assert(bb.affectedVer == Seq(OpVersion("lteq", "1.27.2")))
    assert(bb.severity == "High")
  }

  test("openshift: static records present") {
    val rows = AppSources.openshift(spark).collect()
    assert(rows.length == 5)
    assert(rows.exists(r => r.vulName == "CVE-2018-1002105" && r.severity == "Critical"
      && r.affectedVer.length == 10))
  }

  test("calibration: parse + apply appends ranges") {
    val cal = AppSources.calibration(spark, fixture("apps_calibration"))
    val calMap = cal.collect().toMap
    assert(calMap("CVE-2017-16544") ==
      Seq(OpVersion("orlt", "1.27.2"), OpVersion("andgteq", "1.20.0")))
    val apps = AppSources.manual(spark, fixture("manual.db"))
    val applied = AppPostFilters.applyCalibration(apps, cal).collect()
    val bb = applied.find(_.vulName == "CVE-2017-16544").get
    assert(bb.affectedVer == Seq(OpVersion("lteq", "1.27.2"),
      OpVersion("orlt", "1.27.2"), OpVersion("andgteq", "1.20.0")))
    val tc = applied.find(_.vulName == "CVE-2020-1938").get
    assert(tc.affectedVer.length == 2) // untouched
  }

  test("app post gate: withdrawn + year rules") {
    import spark.implicits._
    def mk(name: String, desc: String = "ok") = graft.core.AppModuleVul(
      name, "a", "m-" + name, Nil, Nil, desc, "", 0, "", 0, "", "High",
      Nil, Nil, Nil, null, null, Seq(name))
    val in = Seq(
      mk("CVE-2021-23334"), // withdrawn set
      mk("CVE-2013-1111"), // year floor
      mk("CVE-2021-1111"), // kept
      mk("GHSA-xxxx-yyyy"), // exempt from year rule
      mk("CWE-79"), // exempt
      mk("CVE-2021-2222", "This was a withdrawn advisory, please ignore")
    ).toDS()
    val out = AppPostFilters.gate(in).collect().map(_.vulName).toSet
    assert(out == Set("CVE-2021-1111", "GHSA-xxxx-yyyy", "CWE-79"))
  }

  test("app dedup: last-writer-wins by source rank") {
    import spark.implicits._
    def mk(name: String, mod: String, desc: String) = graft.core.AppModuleVul(
      name, "a", mod, Nil, Nil, desc, "", 0, "", 0, "", "High",
      Nil, Nil, Nil, null, null, Seq(name))
    val src1 = Seq(mk("CVE-2021-1", "m", "from src1"), mk("CVE-2021-2", "m", "only src1")).toDS()
    val src2 = Seq(mk("CVE-2021-1", "m", "from src2")).toDS()
    val out = AppPostFilters.dedup(Seq(src1, src2)).collect()
    assert(out.length == 2)
    assert(out.find(_.vulName == "CVE-2021-1").get.description == "from src2")
  }
}
