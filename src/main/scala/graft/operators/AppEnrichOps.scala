package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core._

/** The app-side enrichment operators around assignMetadata:
  * G2 upstream translation, J3 affected-version backfill, J4 NVD
  * whitelist injection (reference updater/updater.go:67-86, 147-189,
  * 596-640). */
object AppEnrichOps {

  private val cveUrlPrefix = "https://cve.mitre.org/cgi-bin/cvename.cgi?name="

  /** G2 — ubuntu:upstream records translated to app vulns, one per
    * FixedIn entry (defined but not invoked by the reference's current
    * pipeline; exposed as a library operator). */
  def xslateUbuntuUpstream(vulns: Dataset[Vulnerability])(
      implicit spark: SparkSession): Dataset[AppModuleVul] = {
    import spark.implicits._
    vulns.filter(col("namespace") === "ubuntu:upstream").toDF()
      .select(col("name"), col("description"), col("severity"), explode(col("fixedIn")).as("ff"))
      .select(
        col("name").as("vulName"),
        lit("").as("appName"),
        col("ff.featureName").as("moduleName"),
        expr("CAST(array() AS array<string>)").as("importPaths"),
        expr("CAST(array() AS array<string>)").as("symbols"),
        col("description"),
        concat(lit(cveUrlPrefix), col("name")).as("link"),
        lit(0.0).as("score"), lit("").as("vectors"),
        lit(0.0).as("scoreV3"), lit("").as("vectorsV3"),
        col("severity"),
        array(struct(lit("lt").as("opCode"), col("ff.version").as("version"))).as("affectedVer"),
        array(struct(lit("gteq").as("opCode"), col("ff.version").as("version"))).as("fixedVer"),
        expr("CAST(array() AS array<struct<opCode:string,version:string>>)").as("unaffectedVer"),
        lit(null).cast("timestamp").as("issuedDate"),
        lit(null).cast("timestamp").as("lastModDate"),
        expr("CAST(array() AS array<string>)").as("cves"))
      .as[AppModuleVul]
  }

  /** J3 — correctAppAffectedVersion: apps missing affected or fixed
    * chains pull NVD vulnerable-version intervals (keyed by vulName)
    * converted to `||`-chained tokens then opcodes. */
  def backfillAffectedVersions(apps: Dataset[AppModuleVul], nvd: Dataset[NvdMetadata])(
      implicit spark: SparkSession): Dataset[AppModuleVul] = {
    import spark.implicits._
    val ranges = nvd
      .filter(size(col("vulnVersions")) > 0)
      .map { m =>
        val intervals = m.vulnVersions
        val (affects, fixes) = RangeExpr.nvdIntervalsToTokens(intervals)
        (m.cve, affects.map(RangeExpr.parseToken), fixes.map(RangeExpr.parseToken))
      }
      .toDF("_cve", "_nvd_affects", "_nvd_fixes")

    apps.toDF()
      .join(broadcast(ranges), col("vulName") === col("_cve"), "left_outer")
      .withColumn("affectedVer",
        when(size(col("affectedVer")) === 0 && col("_nvd_affects").isNotNull,
          col("_nvd_affects")).otherwise(col("affectedVer")))
      .withColumn("fixedVer",
        when(size(col("fixedVer")) === 0 && col("_nvd_fixes").isNotNull,
          col("_nvd_fixes")).otherwise(col("fixedVer")))
      .drop("_cve", "_nvd_affects", "_nvd_fixes")
      .as[AppModuleVul]
  }

  final case class WhitelistEntry(cve: String, appName: String, moduleName: String)

  /** Hand-listed NVD CVEs injected as app records (updater.go:26-33). */
  val nvdAppWhitelist: Seq[WhitelistEntry] = Seq(
    WhitelistEntry("CVE-2025-14847", "mongodb", "mongodb"))

  /** J4 — injectNvdWhitelistApps: whitelist entries enriched from NVD
    * and appended. The reference's existence check keys on module
    * "nvd" rather than the entry's module (updater.go:604-609), so it
    * never suppresses an entry — mirrored by appending whenever the
    * NVD metadata exists. */
  def injectNvdWhitelist(apps: Dataset[AppModuleVul], nvd: Dataset[NvdMetadata],
      whitelist: Seq[WhitelistEntry] = nvdAppWhitelist)(
      implicit spark: SparkSession): Dataset[AppModuleVul] = {
    import spark.implicits._
    val wl = whitelist.toDS().toDF("w_cve", "w_app", "w_module")
    val injected = wl.join(nvd.toDF(), col("w_cve") === col("cve"), "inner")
      .select(
        col("w_cve").as("vulName"),
        col("w_app").as("appName"),
        col("w_module").as("moduleName"),
        expr("CAST(array() AS array<string>)").as("importPaths"),
        expr("CAST(array() AS array<string>)").as("symbols"),
        col("description"),
        col("link"),
        col("cvssV2Score").as("score"),
        col("cvssV2Vectors").as("vectors"),
        col("cvssV3Score").as("scoreV3"),
        col("cvssV3Vectors").as("vectorsV3"),
        col("severity"),
        expr("CAST(array() AS array<struct<opCode:string,version:string>>)").as("affectedVer"),
        expr("CAST(array() AS array<struct<opCode:string,version:string>>)").as("fixedVer"),
        expr("CAST(array() AS array<struct<opCode:string,version:string>>)").as("unaffectedVer"),
        col("publishedDate").as("issuedDate"),
        col("lastModifiedDate").as("lastModDate"),
        array(col("w_cve")).as("cves"))
      .as[AppModuleVul]
    apps.unionByName(injected)
  }
}
