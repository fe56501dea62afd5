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

  // events.ts conversions live in graft.functions.EventTime: the
  // physical type changed across driver testdata generations
  // (epoch-nano LONG -> native timestamp[us]), so consumers resolve
  // it from the frame's actual schema instead of a fixed expression.
}
