package graft.sources.oval

import graft.SparkSpecBase
import graft.core.{CveRef, FeatureVersion, PkgVersion, Vulnerability}

/** OVAL family: criteria expansion (G1), RHEL parse + culling (J5,
  * mirroring rhel_test.go:9-134), Oracle parse + merge (A3). */
class OvalSourcesSpec extends SparkSpecBase {

  // ---- criteria expansion ----------------------------------------------

  test("criteria: OR of ANDs expands to possibilities, ignores filtered") {
    val c = Oval.Criteria("OR", Seq(
      Oval.Criteria("AND", Nil, Seq(
        Oval.Criterion("a is earlier than 1", "t1"),
        Oval.Criterion("x is signed with Red Hat key", "t2"),
        Oval.Criterion("Red Hat Enterprise Linux 8 is installed", "t3"))),
      Oval.Criteria("AND", Nil, Seq(
        Oval.Criterion("b is earlier than 2", "t4")))), Nil)
    val p = Oval.possibilities(c, RhelSource.ignoredCriterions)
    assert(p.length == 2)
    assert(p.head.map(_.comment) ==
      Seq("a is earlier than 1", "Red Hat Enterprise Linux 8 is installed"))
  }

  test("criteria: AND composes cartesian product") {
    val c = Oval.Criteria("AND", Seq(
      Oval.Criteria("OR", Nil, Seq(Oval.Criterion("a", "t"), Oval.Criterion("b", "t"))),
      Oval.Criteria("OR", Nil, Seq(Oval.Criterion("c", "t"), Oval.Criterion("d", "t")))), Nil)
    val p = Oval.possibilities(c, Nil)
    assert(p.map(_.map(_.comment)) ==
      Seq(Seq("a", "c"), Seq("a", "d"), Seq("b", "c"), Seq("b", "d")))
  }

  // ---- RHEL ------------------------------------------------------------

  lazy val rhel = RhelSource.load(spark, fixture("rhel_oval.xml"), 8)
    .collect().map(v => v.name -> v).toMap

  test("rhel: RHSA parse with version cleanup and feature extraction") {
    val v = rhel("RHSA-2021:1234")
    assert(v.namespace == "centos:8")
    val vers = v.fixedIn.map(f => f.featureName -> f.version).toMap
    // canonical render drops the 0 epoch, as the reference's String() does
    assert(vers("openldap") == "2.4.46-10.el8")
    assert(vers("openldap-servers") == "2.4.46-10.el8") // svn prefix stripped after epoch
    assert(v.severity == "High") // Important -> High
    assert(v.cvssV2Score == 6.8 && v.cvssV3Score == 7.8)
    assert(v.cves == Seq(CveRef("CVE-2021-9999", 6.8, "AV:N/AC:M/Au:N/C:P/I:P/A:P", 7.8, "CVSS:3.1/AV:L/AC:L")))
    assert(v.cpes == Seq("cpe:/o:redhat:enterprise_linux:8"))
    assert(!v.description.contains("\n")) // squeeze
    assert(v.link.contains("errata"))
  }

  test("rhel: unaffected marker becomes MinVersion; year gate applies") {
    assert(rhel("CVE-2021-8888").fixedIn ==
      Seq(FeatureVersion("barlib", "centos:8", PkgVersion.MinSentinel, "")))
    assert(!rhel.contains("RHSA-2013:0001"))
  }

  test("rhel: culling removes RHSA-covered features from CVE records") {
    // CVE-2021-9999 had {openldap(MAXV), foolib(MAXV)}; RHSA-2021:1234
    // references it and covers openldap + openldap-servers -> only
    // foolib remains.
    val cve = rhel("CVE-2021-9999")
    assert(cve.fixedIn.map(_.featureName) == Seq("foolib"))
    assert(cve.fixedIn.head.version == PkgVersion.MaxSentinel)
  }

  test("rhel: culling scenario from the reference's rhel_test.go") {
    import spark.implicits._
    def fv(name: String, ns: String) = FeatureVersion(name, ns, "", "")
    def vuln(name: String, ns: String, fixedIn: Seq[FeatureVersion], cves: Seq[String]) =
      Vulnerability(name, ns, "", "", "", 0, "", 0, "", null, null,
        cves.map(c => CveRef(c, 0, "", 0, "")), fixedIn, Nil, "")
    val fixedIn1 = fv("ldap", "centos7")
    val fixedIn2 = fv("ldap", "centos8")
    val fixedIn3 = fv("openldap", "centos7")
    val in = Seq(
      vuln("CVE-2021-2222", "centos7", Seq(fixedIn1, fixedIn3), Nil),
      vuln("RHSA-33", "centos7", Seq(fixedIn1), Seq("CVE-2021-2222")),
      vuln("RHSA-34", "centos8", Seq(fixedIn2, fixedIn3), Seq("CVE-2021-2223", "CVE-2021-2225")),
      vuln("CVE-2021-2223", "centos8", Seq(fixedIn2), Nil),
      vuln("CVE-2021-2224", "centos8", Seq(fixedIn1, fixedIn2, fixedIn3), Nil),
      vuln("CVE-2021-2225", "centos8", Seq(fixedIn2, fixedIn3), Nil)).toDS()
    val out = RhelSource.mergeAndCull(in).collect().map(v => v.name -> v).toMap

    assert(out.size == 4)
    assert(out("CVE-2021-2222").fixedIn == Seq(fixedIn3))
    assert(out("RHSA-33").fixedIn.length == 1)
    assert(out("RHSA-34").fixedIn.length == 2)
    assert(!out.contains("CVE-2021-2223")) // fully covered -> culled
    assert(out("CVE-2021-2224").fixedIn.length == 3) // no RHSA references it
    assert(!out.contains("CVE-2021-2225")) // fully covered -> culled
  }

  // ---- Oracle ----------------------------------------------------------

  lazy val oracle = OracleSource.load(spark, fixture("oracle_oval.xml"))
    .collect().map(v => v.name -> v).toMap

  test("oracle: parse + A3 merge across OL releases") {
    val v = oracle("ELSA-2021-1234")
    // two definitions merged: OL8 + OL9 features, CVEs deduped
    assert(v.fixedIn.toSet == Set(
      FeatureVersion("openldap", "oracle:8", "2.4.46-11.el8", ""),
      FeatureVersion("openldap", "oracle:9", "2.6.2-3.el9", "")))
    assert(v.cves.map(_.name) == Seq("CVE-2021-9999", "CVE-2021-7777"))
    assert(v.description == "An openldap update for OL8.") // first non-empty
    assert(v.severity == "High")
    assert(v.issuedDate == java.sql.Timestamp.valueOf("2021-03-01 00:00:00")) // min issued
    assert(v.lastModDate == java.sql.Timestamp.valueOf("2021-03-20 00:00:00")) // max lastMod
  }

  test("oracle: OL6 below firstConsideredELSA dropped; ksplice ignored") {
    assert(!oracle.contains("ELSA-2020-5555"))
  }

  test("oracle: HTML response skipped without error") {
    assert(OracleSource.parseFile("<!DOCTYPE html><html><body>err</body></html>").isEmpty)
    assert(OracleSource.parseFile("   <html><body>soft err</body></html>").isEmpty)
  }
}
