package graft.core

import java.sql.Timestamp

/** Relational data model of the engine — encoder-friendly case classes
  * mirroring the reference's record types
  * (/root/reference/common/types.go:15-157). Timestamps are nullable
  * (`Option`/null models the reference's zero-time "missing"). */

/** Nested package-fix element (types.go:118-128). */
final case class FeatureVersion(
  featureName: String,
  featureNamespace: String,
  version: String,
  minVer: String)

/** Per-CVE score element nested in a Vulnerability (types.go:130-134). */
final case class CveRef(
  name: String,
  cvssV2Score: Double,
  cvssV2Vectors: String,
  cvssV3Score: Double,
  cvssV3Vectors: String)

/** OS-distro vulnerability record — the main fact table
  * (types.go:136-152). */
final case class Vulnerability(
  name: String,
  namespace: String,
  description: String,
  link: String,
  severity: String,
  cvssV2Score: Double,
  cvssV2Vectors: String,
  cvssV3Score: Double,
  cvssV3Vectors: String,
  issuedDate: Timestamp,
  lastModDate: Timestamp,
  cves: Seq[CveRef],
  fixedIn: Seq[FeatureVersion],
  cpes: Seq[String],
  feedRating: String)

/** Application/module vulnerability record (types.go:95-114). */
final case class AppModuleVul(
  vulName: String,
  appName: String,
  moduleName: String,
  importPaths: Seq[String],
  symbols: Seq[String],
  description: String,
  link: String,
  score: Double,
  vectors: String,
  scoreV3: Double,
  vectorsV3: String,
  severity: String,
  affectedVer: Seq[OpVersion],
  fixedVer: Seq[OpVersion],
  unaffectedVer: Seq[OpVersion],
  issuedDate: Timestamp,
  lastModDate: Timestamp,
  cves: Seq[String])

/** NVD enrichment dimension row, keyed by CVE id (types.go:15-31). */
final case class NvdMetadata(
  cve: String,
  description: String,
  severity: String,
  cvssV2Score: Double,
  cvssV2Vectors: String,
  cvssV3Score: Double,
  cvssV3Vectors: String,
  publishedDate: Timestamp,
  lastModifiedDate: Timestamp,
  link: String,
  vulnVersions: Seq[RangeExpr.NvdInterval])

/** Output projections (types.go:53-88): the `*_index.tb` short row. */
final case class VulShort(
  name: String,
  namespace: String,
  fixedIn: Seq[FeatureVersion],
  cpes: Seq[String])

object Model {
  /** Static release dimension: Ubuntu codename -> version
    * (types.go:162-195). */
  val ubuntuReleases: Map[String, String] = Map(
    "upstream" -> "upstream",
    "precise" -> "12.04", "precise/esm" -> "12.04", "quantal" -> "12.10",
    "raring" -> "13.04", "trusty" -> "14.04", "trusty/esm" -> "14.04",
    "utopic" -> "14.10", "vivid" -> "15.04", "wily" -> "15.10",
    "xenial" -> "16.04", "esm-infra/xenial" -> "16.04", "yakkety" -> "16.10",
    "zesty" -> "17.04", "artful" -> "17.10", "bionic" -> "18.04",
    "cosmic" -> "18.10", "disco" -> "19.04", "eoan" -> "19.10",
    "focal" -> "20.04", "groovy" -> "20.10", "hirsute" -> "21.04",
    "impish" -> "21.10", "jammy" -> "22.04", "kinetic" -> "22.10",
    "lunar" -> "23.04", "mantic" -> "23.10", "noble" -> "24.04",
    "esm-apps/bionic" -> "18.04", "esm-apps/focal" -> "20.04",
    "esm-apps/jammy" -> "22.04", "esm-apps/noble" -> "24.04")

  /** Debian codename -> version (types.go:197-216). */
  val debianReleases: Map[String, String] = Map(
    "squeeze" -> "6", "wheezy" -> "7", "jessie" -> "8", "stretch" -> "9",
    "buster" -> "10", "bullseye" -> "11", "bookworm" -> "12",
    "trixie" -> "13", "forky" -> "14", "sid" -> "unstable")

  /** Global year floor (common/db.go:16). */
  val firstYear = 2014

  /** Leading-digit year parse: `2021-9999` or `2021:1234` -> 2021; -1
    * when the string has no leading digits (common/db.go:63-70 reads
    * digits up to the first non-digit). */
  def cveYear(name: String): Int = {
    val digits = name.takeWhile(_.isDigit)
    if (digits.isEmpty || digits.length > 9) -1 else digits.toInt
  }
}
