package graft.sources

import graft.SparkSpecBase

/** ALAS RSS + page scrape (FIXTURES.md §5; mirrors amazon_test.go's
  * TestParseAlasPage shape). */
class AmazonSourceSpec extends SparkSpecBase {

  lazy val rows = AmazonSource.load(spark, fixture("alas.rss"), fixture("alas-pages"), 1)
    .collect().map(v => v.name -> v).toMap

  test("rss items with page versions kept; severities mapped") {
    assert(rows.keySet == Set("ALAS-2021-1500")) // low dropped, no-page dropped
    val v = rows("ALAS-2021-1500")
    assert(v.namespace == "amzn:1")
    assert(v.severity == "High") // important -> High
    assert(v.feedRating == "Important")
    assert(v.cves.map(_.name) == Seq("CVE-2021-9999", "CVE-2021-8888"))
    assert(v.issuedDate == java.sql.Timestamp.valueOf("2021-03-01 20:00:00"))
    assert(v.lastModDate == java.sql.Timestamp.valueOf("2021-03-09 20:00:00"))
  }

  test("page parse: description between markers, package versions from pre block") {
    val v = rows("ALAS-2021-1500")
    assert(v.description.contains("remote crash"))
    val vers = v.fixedIn.map(f => f.featureName -> f.version).toMap
    assert(vers("openldap") == "2.4.40-16.31.amzn1")
    assert(vers("openldap-devel") == "2.4.40-16.31.amzn1")
  }

  test("package token parse edge cases") {
    assert(AmazonSource.parsePackageToken("openldap-2.4.40-16.31.amzn1.x86_64") ==
      Some(("openldap", "2.4.40-16.31.amzn1")))
    // numeric-numeric fallback uses the FIRST match
    assert(AmazonSource.parsePackageToken("pkg2-3-4.5.noarch") == Some(("pkg2", "3-4.5")))
    assert(AmazonSource.parsePackageToken("noversionhere") == None)
  }
}
