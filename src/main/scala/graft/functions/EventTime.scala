package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The events table's `ts` column has changed physical type across
  * driver testdata generations: TIMESTAMP(NANOS) parquet surfaces as
  * an epoch-nano LONG (spark.sql.legacy.parquet.nanosAsLong, set by
  * GraftSession), while native timestamp[us] surfaces as
  * TIMESTAMP_NTZ. Every consumer resolves the conversion HERE, from
  * the frame's ACTUAL schema — never by assuming a generation. The
  * session timezone is pinned to UTC (GraftSession), so the NTZ ->
  * TIMESTAMP cast is instant-preserving and both paths yield
  * identical values over the same logical data. Works for batch and
  * streaming frames alike (schema inspection only — no action). */
object EventTime {
  /** `ts` as a micros TIMESTAMP — what window/date functions take. */
  def eventTs(df: DataFrame): Column = df.schema("ts").dataType match {
    case LongType => timestamp_micros(expr("ts div 1000"))
    case _ => col("ts").cast("timestamp")
  }

  /** `ts` as epoch milliseconds (LONG) — the join-arithmetic shape. */
  def eventMs(df: DataFrame): Column = df.schema("ts").dataType match {
    case LongType => expr("ts div 1000000")
    case _ => unix_millis(col("ts").cast("timestamp"))
  }
}
