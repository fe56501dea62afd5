package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Vulnerability

/** SURVEY A1 — doVulnerabilitiesNamespacing
  * (reference updater/updater.go:642-671): explode each vuln's
  * `fixedIn` entries, regroup by (feature namespace, vuln name); the
  * regrouped record adopts the feature's namespace, appends all
  * feature versions, and keeps one representative copy of the
  * metadata.
  *
  * Deviation (documented): the reference's metadata pick is Go-map
  * insertion order (nondeterministic); we take the lexicographically
  * greatest metadata struct, which is deterministic across runs and
  * cluster layouts. In practice all records sharing (ns, name) within
  * one feed carry identical metadata.
  *
  * Scale: one shuffle on (namespace, name); collect_list is bounded by
  * per-vuln fix counts (tens), so no group blow-up.
  */
object Namespacing {

  def apply(vulns: Dataset[Vulnerability])(implicit spark: SparkSession): Dataset[Vulnerability] = {
    import spark.implicits._
    vulns.toDF()
      .select(col("*"), posexplode(col("fixedIn")).as(Seq("fv_pos", "fv")))
      .groupBy(col("fv.featureNamespace").as("groupNs"), col("name"))
      .agg(
        max(struct(col("description"), col("link"), col("severity"),
          col("cvssV2Score"), col("cvssV2Vectors"), col("cvssV3Score"),
          col("cvssV3Vectors"), col("issuedDate"), col("lastModDate"),
          col("cves"), col("cpes"), col("feedRating"))).as("m"),
        sort_array(collect_list(struct(col("fv_pos"), col("fv")))).as("fvs"))
      .select(
        col("name"),
        col("groupNs").as("namespace"),
        col("m.description").as("description"),
        col("m.link").as("link"),
        col("m.severity").as("severity"),
        col("m.cvssV2Score").as("cvssV2Score"),
        col("m.cvssV2Vectors").as("cvssV2Vectors"),
        col("m.cvssV3Score").as("cvssV3Score"),
        col("m.cvssV3Vectors").as("cvssV3Vectors"),
        col("m.issuedDate").as("issuedDate"),
        col("m.lastModDate").as("lastModDate"),
        col("m.cves").as("cves"),
        expr("transform(fvs, x -> x.fv)").as("fixedIn"),
        col("m.cpes").as("cpes"),
        col("m.feedRating").as("feedRating"))
      .as[Vulnerability]
  }
}
