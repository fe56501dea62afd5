package graft.sources

import java.sql.Timestamp

import graft.SparkSpecBase

/** FIXTURES.md §13 edge cases. */
class NvdSourceSpec extends SparkSpecBase {

  lazy val rows = NvdSource.load(spark, fixture("nvd_sample.json"))
    .collect().map(m => m.cve -> m).toMap

  test("v3.1 preferred, v2 captured alongside") {
    val m = rows("CVE-2018-14618")
    assert(m.cvssV3Score == 9.8)
    assert(m.cvssV3Vectors.startsWith("CVSS:3.1/"))
    assert(m.severity == "Critical")
    assert(m.cvssV2Score == 7.5)
    assert(m.description.contains("NTLM"))
    assert(m.link.endsWith("CVE-2018-14618"))
  }

  test("v3.0 used when no v3.1") {
    val m = rows("CVE-2017-17439")
    assert(m.cvssV3Score == 7.5)
    assert(m.severity == "High")
    assert(m.cvssV2Score == 0.0)
  }

  test("v2 severity only when v3 absent") {
    val m = rows("CVE-2018-0739")
    assert(m.cvssV3Score == 0.0)
    assert(m.severity == "Medium")
    assert(m.cvssV2Score == 5.0)
  }

  test("zero-score v3 metric ignored entirely") {
    val m = rows("CVE-2099-0001")
    assert(m.cvssV3Score == 0.0)
    assert(m.severity == "")
  }

  test("dates parsed in both layouts") {
    assert(rows("CVE-2018-14618").publishedDate ==
      Timestamp.valueOf("2018-09-05 19:29:00"))
    // minute-precision layout (no seconds)
    assert(rows("CVE-2099-0001").publishedDate ==
      Timestamp.valueOf("2099-01-01 00:00:00"))
  }

  test("vulnerable ranges: configurations[0] OR nodes only, visual_studio and non-vulnerable excluded") {
    val vv = rows("CVE-2018-14618").vulnVersions
    assert(vv.length == 1)
    assert(vv.head.startIncluding == "7.15.4")
    assert(vv.head.endExcluding == "7.61.1")
  }
}
