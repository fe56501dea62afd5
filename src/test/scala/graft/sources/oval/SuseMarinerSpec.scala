package graft.sources.oval

import graft.SparkSpecBase
import graft.core.FeatureVersion

/** SUSE test-map resolution (J7) and Mariner 3-level indirection (J8). */
class SuseMarinerSpec extends SparkSpecBase {

  val sles15 = SuseSource.FeedInfo("suse/sles15.xml.gz", "SUSE Linux Enterprise Server 15 ", "sles:")

  lazy val suse = SuseSource.load(spark, fixture("suse_oval.xml"), sles15)
    .collect().map(v => v.name -> v).toMap

  test("suse: namespace from the release test, version from the package test") {
    val v = suse("CVE-2021-9999")
    assert(v.fixedIn == Seq(FeatureVersion("openldap2", "sles:15.3", "2.4.46-9.48.1", "")))
    assert(v.severity == "High")
    assert(v.link.contains("suse.com"))
    // duplicate cve refs deduped by regex-extracted name
    assert(v.cves.map(_.name) == Seq("CVE-2021-9999"))
  }

  test("suse: verStr 0 package skipped; year floor applies (non-liberty)") {
    assert(!suse.contains("CVE-2021-8888")) // only the 0-version pkg -> no features
    assert(!suse.contains("CVE-2010-0001")) // below 2014
  }

  test("suse: liberty feeds use the 2004 floor") {
    val lib = sles15.copy(liberty = true, nsPrefix = "sles:lib")
    val rows = SuseSource.parseFile(lib,
      java.nio.file.Files.readString(java.nio.file.Paths.get(fixture("suse_oval.xml"))))
    assert(rows.exists(_.name == "CVE-2010-0001"))
  }

  test("suse: tumbleweed-style noVersion namespace") {
    val tw = sles15.copy(noVersion = true, nsPrefix = "sles:tw")
    val rows = SuseSource.parseFile(tw,
      java.nio.file.Files.readString(java.nio.file.Paths.get(fixture("suse_oval.xml"))))
    assert(rows.find(_.name == "CVE-2021-9999").get.fixedIn.head.featureNamespace == "sles:tw")
  }

  lazy val mariner = MarinerSource.load(spark, fixture("mariner_oval.xml"))
    .collect().map(v => v.name -> v).toMap

  test("mariner: criterion -> test -> object/state resolution") {
    val v = mariner("CVE-2021-9999")
    assert(v.fixedIn == Seq(FeatureVersion("openssl", "mariner:1.0", "1.1.1k-3.cm1", "")))
    assert(v.severity == "High")
    assert(v.issuedDate == java.sql.Timestamp.valueOf("2021-06-01 00:00:00"))
  }

  test("mariner: patchable rules") {
    // false -> kept without features; Not Applicable -> dropped
    assert(mariner("CVE-2021-7777").fixedIn.isEmpty)
    assert(!mariner.contains("CVE-2021-6666"))
  }
}
