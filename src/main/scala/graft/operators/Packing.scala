package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed-size context-window
  * bins by cumulative token count — the step between corpus prep and
  * tokenizer batching. Documents are conceptually concatenated in
  * `orderCol` order within each group and chunked every `ctxLen`
  * tokens; a document's bin is the chunk its first token lands in
  * (`floor(exclusive-cumsum / ctxLen)`), the streaming
  * concatenate-then-chunk packing used for pretraining batches.
  *
  * Scale design: the only shuffle is the window partition on
  * `groupCols`. A single global ordering would serialize the corpus
  * through one partition, so callers shard explicitly — pass a
  * deterministic shard key (e.g. `doc_id % nShards`) in `groupCols`
  * and bins become per-shard, which is exactly what a multi-worker
  * tokenizer wants anyway (each worker consumes whole shards, no
  * cross-shard coordination). Within a shard the window is one
  * sort + linear scan; everything stays in whole-stage codegen.
  */
object Packing {

  /** Appends `tokOut` (the evaluated `tokenCol`) and `binOut` (the
    * 0-based context-window bin) to `df`. `orderCol` must be a total
    * order within each group for deterministic bins. */
  def packGreedy(df: DataFrame, tokenCol: Column, groupCols: Seq[Column],
      orderCol: Column, ctxLen: Long,
      tokOut: String = "n_tok", binOut: String = "bin"): DataFrame = {
    require(ctxLen > 0, s"ctxLen must be positive, got $ctxLen")
    val w = Window.partitionBy(groupCols: _*).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn(tokOut, tokenCol)
      .withColumn(binOut,
        floor(coalesce(sum(col(tokOut)).over(w), lit(0L)) / ctxLen))
  }

  /** Per-(group, bin) packing stats over a `packGreedy` result:
    * document count, token total, and fill ratio vs `ctxLen`. The
    * groupBy keys extend the window partition keys, so AQE reuses the
    * window's exchange — stats cost no extra shuffle. */
  def packStats(packed: DataFrame, groupCols: Seq[Column], ctxLen: Long,
      tokCol: String = "n_tok", binCol: String = "bin"): DataFrame =
    packed.groupBy(groupCols :+ col(binCol): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokCol)).cast("bigint").as("bin_tokens"),
        round(sum(col(tokCol)) / lit(ctxLen.toDouble), 4).as("fill_ratio"))
}
