package graft.operators

import java.sql.Timestamp

import graft.SparkSpecBase
import graft.core._

/** Incremental run diff: added / removed / changed with the precise
  * changed-field list, across scalar, timestamp, and nested columns. */
class VulDbDiffSpec extends SparkSpecBase {

  private def vul(name: String, ns: String, sev: String = "High",
      fixedIn: Seq[FeatureVersion] = Nil) = Vulnerability(
    name = name, namespace = ns, description = "d", link = "l",
    severity = sev, cvssV2Score = 5.0, cvssV2Vectors = "AV:N",
    cvssV3Score = 7.0, cvssV3Vectors = "X",
    issuedDate = Timestamp.valueOf("2021-01-01 00:00:00"),
    lastModDate = null, cves = Nil, fixedIn = fixedIn, cpes = Nil,
    feedRating = "")

  test("added / removed / changed statuses with changed-field lists") {
    import spark.implicits._
    val yesterday = Seq(
      vul("CVE-1", "alpine:3.6"),
      vul("CVE-2", "alpine:3.6"),
      vul("CVE-3", "debian:11", sev = "Medium")).toDS()
    val today = Seq(
      vul("CVE-1", "alpine:3.6"), // unchanged
      vul("CVE-3", "debian:11", sev = "High", // changed: severity + fixedIn
        fixedIn = Seq(FeatureVersion("pkg", "debian:11", "2.0", ""))),
      vul("CVE-4", "debian:11")).toDS() // added

    val d = VulDbDiff.diff(yesterday, today)
      .collect().map(r => (r.getString(0), r.getString(2),
        r.getSeq[String](3).toSet)).toSet
    assert(d == Set(
      ("removed", "CVE-2", Set.empty[String]),
      ("changed", "CVE-3", Set("severity", "fixedIn")),
      ("added", "CVE-4", Set.empty[String])))

    val s = VulDbDiff.summary(yesterday, today)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s == Map("added" -> 1L, "removed" -> 1L,
      "changed" -> 1L, "unchanged" -> 1L))
  }

  test("same key in different namespaces stays distinct") {
    import spark.implicits._
    val old = Seq(vul("CVE-1", "alpine:3.6"), vul("CVE-1", "debian:11")).toDS()
    val nw = Seq(vul("CVE-1", "alpine:3.6")).toDS()
    val d = VulDbDiff.diff(old, nw).collect()
    assert(d.length == 1)
    assert(d(0).getString(0) == "removed" && d(0).getString(1) == "debian:11")
  }

  private def appVul(module: String, vulName: String, score: Double = 5.0,
      fixedVer: Seq[OpVersion] = Nil) = AppModuleVul(
    vulName = vulName, appName = "app", moduleName = module,
    importPaths = Nil, symbols = Nil, description = "d", link = "l",
    score = score, vectors = "AV:N", scoreV3 = 7.0, vectorsV3 = "X",
    severity = "High", affectedVer = Nil, fixedVer = fixedVer,
    unaffectedVer = Nil, issuedDate = Timestamp.valueOf("2021-01-01 00:00:00"),
    lastModDate = null, cves = Nil)

  test("app-table diff keyed (moduleName, vulName)") {
    import spark.implicits._
    val yesterday = Seq(
      appVul("golang.org/x/net", "CVE-1"),
      appVul("golang.org/x/net", "CVE-2"),
      appVul("lodash", "CVE-3", score = 4.0)).toDS()
    val today = Seq(
      appVul("golang.org/x/net", "CVE-1"), // unchanged
      appVul("lodash", "CVE-3", score = 9.8, // changed: score + fixedVer
        fixedVer = Seq(OpVersion("gteq", "4.17.21"))),
      appVul("openssl", "CVE-3")).toDS() // added: same vul, new module

    val d = VulDbDiff.diffApps(yesterday, today)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getSeq[String](3).toSet)).toSet
    assert(d == Set(
      ("removed", "golang.org/x/net", "CVE-2", Set.empty[String]),
      ("changed", "lodash", "CVE-3", Set("score", "fixedVer")),
      ("added", "openssl", "CVE-3", Set.empty[String])))

    val s = VulDbDiff.summaryApps(yesterday, today)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s == Map("added" -> 1L, "removed" -> 1L,
      "changed" -> 1L, "unchanged" -> 1L))
  }

  test("keyedDiff works for any keyed table (corpus snapshot by digest)") {
    import spark.implicits._
    val old = Seq((1L, "aaa", "en"), (2L, "bbb", "en"), (3L, "ccc", "de"))
      .toDF("doc_id", "digest", "lang")
    val now = Seq((1L, "aaa", "en"), (3L, "CHANGED", "de"), (4L, "ddd", "fr"))
      .toDF("doc_id", "digest", "lang")
    val d = VulDbDiff.keyedDiff(old, now, Seq("doc_id"), includeUnchanged = true)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getSeq[String](2).toSet)).toSet
    assert(d == Set(
      ("unchanged", 1L, Set.empty[String]),
      ("removed", 2L, Set.empty[String]),
      ("changed", 3L, Set("digest")),
      ("added", 4L, Set.empty[String])))
  }
}
