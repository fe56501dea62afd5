package graft.sources

import graft.SparkSpecBase
import graft.operators.Namespacing

/** Mirrors the reference's alpine_test.go semantics on an authored
  * fixture (FIXTURES.md §1 edge cases). */
class AlpineSourceSpec extends SparkSpecBase {

  lazy val rows = AlpineSource.load(spark, fixture("alpine_secdb.json")).collect()

  test("parses rows with namespace and fix versions") {
    val heimdal = rows.filter(_.fixedIn.head.featureName == "heimdal")
    assert(heimdal.map(_.name).toSet == Set("CVE-2017-17439", "CVE-2017-11103"))
    assert(heimdal.forall(_.namespace == "alpine:3.6"))
    assert(heimdal.forall(_.fixedIn.head.featureNamespace == "alpine:3.6"))
    val v = heimdal.find(_.name == "CVE-2017-17439").get
    assert(v.fixedIn.head.version == "7.1.0-r2")
    assert(v.link.endsWith("CVE-2017-17439"))
  }

  test("non-array secfix value skipped") {
    assert(!rows.exists(_.fixedIn.exists(_.version == "7.4.0-r0")))
  }

  test("hard-coded CVE-2017-3738@1.0.2o-r0 skipped") {
    assert(!rows.exists(v => v.name == "CVE-2017-3738" && v.fixedIn.exists(_.version == "1.0.2o-r0")))
  }

  test("trailing text after space trimmed from CVE name") {
    assert(rows.exists(_.name == "CVE-2018-0739"))
    assert(!rows.exists(_.name.contains(" ")))
  }

  test("year < 2014 dropped") {
    assert(!rows.exists(_.name == "CVE-2013-0166"))
  }

  test("unparseable package version dropped") {
    assert(!rows.exists(_.name == "CVE-2020-1111"))
  }

  test("2016 CVE kept (year gate is >= 2014)") {
    assert(rows.exists(_.name == "CVE-2016-7055"))
  }

  test("namespacing regroups by (ns, cve) appending fixedIn") {
    val ds = AlpineSource.load(spark, fixture("alpine_secdb.json"))
    val grouped = Namespacing(ds).collect()
    assert(grouped.map(v => (v.namespace, v.name)).distinct.length == grouped.length)
    // every vuln in this fixture touches one package only
    assert(grouped.forall(_.fixedIn.nonEmpty))
    val curl = grouped.filter(v => v.fixedIn.exists(_.featureName == "curl"))
    assert(curl.map(_.name).toSet == Set("CVE-2018-14618", "CVE-2018-0500"))
  }
}
