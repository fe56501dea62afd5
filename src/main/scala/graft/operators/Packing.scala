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

  /** Split long documents into overlapping context-window chunks —
    * the flip side of packing: packing fills windows with whole short
    * docs, chunking cuts docs longer than a window into strided
    * pieces (`maxTokens` per chunk, `overlap` tokens shared with the
    * previous chunk so no span is ever split across a boundary
    * without context). Emits one row per chunk with `chunk_idx`
    * (0-based), `chunk_text`, and `chunk_tokens`; empty docs emit
    * nothing. Pure map-side (tokenize, stride sequence, explode,
    * slice) — rows multiply BEFORE any shuffle, so downstream
    * tokenization parallelizes over chunks with the scan
    * partitioning. */
  def chunk(df: DataFrame, textCol: String, maxTokens: Int,
      overlap: Int = 0): DataFrame = {
    require(maxTokens > 0 && overlap >= 0 && overlap < maxTokens,
      s"need 0 <= overlap < maxTokens, got overlap=$overlap maxTokens=$maxTokens")
    val step = maxTokens - overlap
    df.withColumn("_toks",
        expr(s"filter(split($textCol, ' '), x -> x <> '')"))
      .filter(size(col("_toks")) > 0)
      .select(col("*"),
        posexplode(sequence(lit(1),
          greatest(size(col("_toks")) - overlap, lit(1)), lit(step)))
          .as(Seq("chunk_idx", "_start")))
      .withColumn("chunk_text",
        concat_ws(" ", slice(col("_toks"), col("_start"), lit(maxTokens))))
      .withColumn("chunk_tokens",
        least(size(col("_toks")) - col("_start") + 1, lit(maxTokens)))
      .drop("_toks", "_start")
  }

  /** Thread / conversation assembly: collapse per-message rows into
    * one ordered document per thread — the step that turns chat logs,
    * forum threads, or event streams into training documents. Each
    * group's rows sort by `orderCol` (make it a TOTAL order — ties
    * would make the document nondeterministic, so the sort key
    * includes it as the final tiebreak) and their `textCol` values
    * join with `sep`. Returns one row per thread:
    * (groupCols..., n_turns, thread_text).
    *
    * Scale: one groupBy shuffle on the thread key; the ordered
    * assembly happens inside the aggregated array (sort_array over
    * (order, text) structs), never via a global sort. A thread's
    * document must fit in one aggregation buffer — true for
    * conversations by construction; `maxTurns` is the guard for
    * degenerate keys (a bot mega-thread, a log stream mis-keyed to
    * one id): turns past the cap are dropped BEFORE the aggregation
    * ever buffers them — a windowed per-thread row_number (streaming
    * over the key-partitioned sort, bounded memory at any thread
    * size) keeps the FIRST `maxTurns` turns in `orderCol` order, and
    * the drop count publishes as the `metricName` observed metric
    * (same contract as HotKeys.cap: names unique per query
    * execution). The window partitions on the same keys the groupBy
    * uses, so the aggregation reuses its exchange — the cap costs no
    * extra shuffle. `n_turns` counts the KEPT turns (the assembled
    * document's actual length). */
  def assembleThreads(df: DataFrame, groupCols: Seq[String],
      orderCol: String, textCol: String, sep: String = "\n",
      maxTurns: Option[Int] = None,
      metricName: String = "graft_thread_turn_cap"): DataFrame = {
    require(orderCol != textCol,
      "orderCol and textCol must differ (the sort struct needs distinct fields)")
    require(maxTurns.forall(_ >= 1), s"maxTurns must be >= 1, got $maxTurns")
    val capped = maxTurns.fold(df) { cap =>
      // tie-break by textCol, matching the assembly's own
      // sort_array(struct(order, text)) order — ordering the cap
      // window by orderCol alone would make WHICH tied turns survive
      // nondeterministic run to run
      val w = Window.partitionBy(groupCols.map(col): _*)
        .orderBy(col(orderCol), col(textCol))
      df.withColumn("_turn_rn", row_number().over(w))
        .observe(metricName,
          coalesce(sum(when(col("_turn_rn") > cap, 1).otherwise(0)), lit(0L))
            .as("dropped_turns"))
        .filter(col("_turn_rn") <= cap)
        .drop("_turn_rn")
    }
    // Column-API HOFs (not an interpolated expr string), so column
    // names needing backticks can't misparse
    capped.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_turns"),
        array_join(
          transform(
            array_sort(collect_list(struct(col(orderCol).as("_o"), col(textCol).as("_x")))),
            x => x.getField("_x")),
          sep).as("thread_text"))
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
