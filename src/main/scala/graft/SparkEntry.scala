package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{DataPrepQueries, QueryDef, RelationalQueries, VulDomainQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory: one entry per implemented
  * operator family from SURVEY §2 (relational layer), the
  * training-data-pipeline layer (dedup / similarity / text analysis /
  * multimodal), and the vulnerability-domain layer (version ordering,
  * range opcodes, enrichment pipeline). `oracleSql` carries the DuckDB
  * twin of each query; the feed adapters' full-domain semantics are
  * additionally pinned by the ScalaTest suites.
  */
object SparkEntry {

  val allQueries: Seq[QueryDef] =
    RelationalQueries.all ++ DataPrepQueries.all ++ VulDomainQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The multi-join star-schema revenue rollup (SURVEY J1/A1 shape). */
  def entry(spark: SparkSession): DataFrame = {
    functions.VulFunctions.register(spark)
    allQueries.find(_.name == "q08_multi_join").get.run(spark, "/root/testdata/sf0.001")
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> { (s: SparkSession, dir: String) =>
      functions.VulFunctions.register(s)
      q.run(s, dir)
    }).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted only for q89_bpe_oov_segment —
    * but BOTH of its folds are hash-pinned elsewhere: inference by
    * q91's fixed-merge recursive replay, and the iterative LEARNING
    * loop by q129's six unrolled sequential rounds (q89 itself runs 40
    * merges end-to-end, kept rows-only rather than a 40-round CTE).
    * The dpkg-specific version-order cases live in ScalaTest golden
    * suites instead. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(o => q.name -> o.stripMargin.trim)).toMap
}
