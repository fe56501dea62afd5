package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table co-location: the standing answer to "this join/agg
  * key is hit every day — stop shuffling for it". Writing a table
  * with `bucketBy(n, key)` pre-shuffles it ONCE at write time; every
  * later equi-join between co-bucketed tables (same key, same bucket
  * count) and every aggregation on the bucket key plans with ZERO
  * exchange — the scan's output partitioning already satisfies the
  * operator's requirement. At 100 TB this converts the recurring
  * cost of the pipeline's dominant shuffle into a one-time write
  * cost, and (with `sortBy`) the sort-merge join's per-task sort
  * disappears too.
  *
  * Trade-offs to size `buckets` by: each writing task emits one file
  * per bucket it sees (pre-`repartition` by the key to keep file
  * counts sane), bucket count is fixed at write time (pick for the
  * largest consumer), and both join sides must agree on (key, count)
  * for the exchange-free plan. BucketingSpec pins the zero-exchange
  * property for join and aggregation.
  */
object Bucketing {

  /** Write `df` as a bucketed (optionally sorted) parquet table in
    * the session catalog. `repartitionFirst` (default) pre-shuffles
    * on the key so each task writes each bucket once — without it, a
    * T-task write can emit T×buckets files. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, sortCols: Seq[String] = Nil,
      repartitionFirst: Boolean = true): Unit = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val src = if (repartitionFirst)
      df.repartition(buckets, df.col(key)) else df
    val w = src.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Read a bucketed table back (plain catalog read; the bucket
    * metadata rides along and Catalyst uses it automatically). */
  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
