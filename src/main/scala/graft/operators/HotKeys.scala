package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hot-key protection for the inverted-index / LSH-bucket operators.
  *
  * The classic scale-killer of bucket-join dedup is one pathological
  * key: a stop-word shingle with df ≈ corpus size, or a degenerate
  * LSH band, turns the bucket's `collect_set` into a corpus-sized
  * array and the in-bucket pair expansion quadratic. The guard here
  * drops such keys BEFORE any array exists: a windowed per-key row
  * count (streaming and spillable over the key-partitioned sort —
  * bounded memory at any key size), a `[minPerKey, cap]` filter, and
  * the drop counts published as observed metrics
  * (`Dataset.observe`/`CollectMetrics`), which GraftSession's
  * query-execution listener logs after every action.
  *
  * No extra shuffle: the window hash-partitions on the same keys the
  * following aggregation groups by, so the aggregation reuses the
  * window's exchange. The `minPerKey = 2` floor also prunes singleton
  * keys (the vast majority of shingles) before any array is built —
  * previously they were collected and then discarded by a
  * `size(ids) > 1` filter.
  */
object HotKeys {

  /** Default per-key row cap. Far above any non-degenerate bucket
    * (a 100k-row bucket already means ~5e9 candidate pairs — a job
    * killer regardless), and far above the whole corpus at the test
    * scale factors, so oracle results are unchanged there. */
  val DefaultBucketCap = 100000

  /** The shared cap MECHANISM: the per-key windowed row count every
    * cap variant filters on — one definition, so the partition shape
    * cannot drift between `cap`, `capPair` and the callers that need
    * their own observe around it (Dedup.writeBandsVersion rides its
    * _meta statistics on this column). */
  private[operators] def counted(df: DataFrame, keys: Seq[Column]): DataFrame =
    df.withColumn("_key_n", count(lit(1)).over(Window.partitionBy(keys: _*)))

  /** Keep only rows whose key group has between `minPerKey` and `cap`
    * rows; publish (dropped_rows, hot_keys_est, max_key_rows) under
    * `metricName`. Metric names must be UNIQUE within one query
    * execution (Spark's CollectMetrics contract) — when composing two
    * capped pipelines in a single query, give each a distinct name
    * via the operators' metricName parameters.
    *
    * Metric-delivery caveat: if the filter leaves EXACTLY zero rows
    * and a further shuffle follows, AQE's empty-relation propagation
    * can prune the CollectMetrics node before `observedMetrics` is
    * read — so a 100%-drop run may not report. Any realistic run
    * (some keys survive) reports reliably. */
  def cap(df: DataFrame, keys: Seq[Column], cap: Int,
      minPerKey: Int = 2, metricName: String = "graft_hot_key_cap"): DataFrame = {
    counted(df, keys)
      .observe(metricName,
        coalesce(sum(when(col("_key_n") > cap, 1).otherwise(0)), lit(0L)).as("dropped_rows"),
        // one hot key contributes n rows, each weighted 1/n -> ≈ #keys
        coalesce(round(sum(when(col("_key_n") > cap, lit(1.0) / col("_key_n")).otherwise(0.0))), lit(0.0)).as("hot_keys_est"),
        coalesce(max(col("_key_n")), lit(0L)).as("max_key_rows"))
      .filter(col("_key_n").between(minPerKey, cap))
      .drop("_key_n")
  }

  /** Both branches of a pair-expansion SELF-JOIN over one capped
    * frame: (observed, silent) — identical `[minPerKey, cap]` filters
    * over ONE shared window-count subtree. Two constraints meet here:
    * the CollectMetrics node must appear in exactly one join branch
    * (AQE drops a metric duplicated across branches — observed
    * empirically), and the window's exchange subtree must be
    * IDENTICAL in both branches so ReuseExchange shuffles the input
    * once, not per side. Building both branches from the same counted
    * frame, observe above the window, satisfies both. */
  def capPair(df: DataFrame, keys: Seq[Column], cap: Int,
      minPerKey: Int = 2, metricName: String = "graft_hot_key_cap")
      : (DataFrame, DataFrame) = {
    // null-key rows can never join a pair (equi-join keys) — filter
    // them HERE so the join's inferred isnotnull predicates are
    // no-ops on both branches. Without this the optimizer pushes
    // isnotnull below the window only on the silent branch
    // (CollectMetrics blocks pushdown on the observed one), the
    // exchange subtrees diverge, and ReuseExchange can't dedup the
    // input shuffle.
    val countedDf = counted(df.filter(keys.map(_.isNotNull).reduce(_ && _)), keys)
    val keep = col("_key_n").between(minPerKey, cap)
    val observed = countedDf
      .observe(metricName,
        coalesce(sum(when(col("_key_n") > cap, 1).otherwise(0)), lit(0L)).as("dropped_rows"),
        coalesce(round(sum(when(col("_key_n") > cap, lit(1.0) / col("_key_n")).otherwise(0.0))), lit(0.0)).as("hot_keys_est"),
        coalesce(max(col("_key_n")), lit(0L)).as("max_key_rows"))
      .filter(keep).drop("_key_n")
    (observed, countedDf.filter(keep).drop("_key_n"))
  }

  /** Keep rows satisfying `keep`; publish the dropped-row count under
    * `metricName`. The cheap guard for one-sided validity filters
    * whose drops must stay observable (e.g. oversize intervals in
    * RangeJoin) — no window, no shuffle, just a counted filter. A
    * null predicate drops the row (filter semantics) and IS counted:
    * the metric counts rows where `keep` is not true. */
  def observeDrops(df: DataFrame, keep: Column, metricName: String): DataFrame =
    df.observe(metricName,
        coalesce(sum(when(keep, 0).otherwise(1)), lit(0L)).as("dropped_rows"))
      .filter(keep)
}
