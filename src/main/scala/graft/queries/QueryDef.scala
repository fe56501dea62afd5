package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark plan plus (when SQL-expressible)
  * the equivalent DuckDB oracle SQL over the same parquet tables.
  * Column names and row ordering must match the oracle exactly — the
  * driver sorts columns by name and hashes values. */
final case class QueryDef(
  name: String,
  oracle: Option[String],
  run: (SparkSession, String) => DataFrame)

object QueryDef {
  /** Read one of the driver-generated tables. */
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** events.ts arrives as epoch-nanos LONG (see GraftSession); micros
    * timestamp for date functions. */
  val tsCol = "timestamp_micros(ts div 1000)"
}
