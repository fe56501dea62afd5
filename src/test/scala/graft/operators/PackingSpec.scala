package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpecBase {

  test("packGreedy bins by exclusive cumulative tokens within each group") {
    import spark.implicits._
    // exclusive cumsums 0, 100, 400, 600 at ctx=512 -> bins 0, 0, 0, 1
    val docs = Seq((1L, 100L), (2L, 300L), (3L, 200L), (4L, 50L))
      .toDF("doc_id", "ntok")
    val out = Packing.packGreedy(docs, col("ntok"), Seq(lit(0)), col("doc_id"), 512)
      .select("doc_id", "bin").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L), s"got $out")
  }

  test("packGreedy groups pack independently and stats report fill") {
    import spark.implicits._
    val docs = Seq((1L, "a", 400L), (2L, "a", 400L), (3L, "b", 100L))
      .toDF("doc_id", "shard", "ntok")
    val packed = Packing.packGreedy(docs, col("ntok"), Seq(col("shard")), col("doc_id"), 512)
    val bins = packed.select("doc_id", "bin").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // shard a: cumsums 0, 400 -> bins 0, 0; shard b restarts at 0
    assert(bins == Map(1L -> 0L, 2L -> 0L, 3L -> 0L), s"got $bins")
    val stats = Packing.packStats(packed, Seq(col("shard")), 512)
      .orderBy("shard").collect()
    assert(stats(0).getAs[Long]("bin_tokens") == 800L)
    assert(stats(0).getAs[Double]("fill_ratio") == 1.5625)
    assert(stats(1).getAs[Long]("n_docs") == 1L)
  }

  test("chunk strides with overlap and reconstructs exact token windows") {
    import spark.implicits._
    val docs = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"),
      (2L, "short doc"),
      (3L, ""))
      .toDF("doc_id", "text")
    val out = Packing.chunk(docs, "text", maxTokens = 4, overlap = 1)
      .select("doc_id", "chunk_idx", "chunk_text", "chunk_tokens")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> (r.getString(2), r.getInt(3))).toMap
    // starts 1, 4, 7 (step 3): windows share one boundary token each
    assert(out(1L -> 0) == (("t1 t2 t3 t4", 4)))
    assert(out(1L -> 1) == (("t4 t5 t6 t7", 4)))
    assert(out(1L -> 2) == (("t7 t8 t9 t10", 4)))
    assert(out(2L -> 0) == (("short doc", 2)), "sub-window doc is one whole chunk")
    assert(!out.keySet.exists(_._1 == 3L), "empty doc emits no chunks")
    assert(out.size == 4)
  }

  test("repeatedSpans flags only docs sharing a span in >= minDf documents") {
    import spark.implicits._
    val boiler = "all rights reserved by corp"
    val docs = Seq(
      (1L, s"alpha beta $boiler"),
      (2L, s"gamma delta $boiler"),
      (3L, s"$boiler epsilon zeta"),
      (4L, "totally unique text with no shared spans at all"))
      .toDF("doc_id", "text")
    val out = Dedup.repeatedSpans(docs, "text", "doc_id", n = 3, minDf = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.keySet == Set(1L, 2L, 3L), s"got $out")
    // "all rights reserved", "rights reserved by", "reserved by corp"
    // appear in all three docs; doc 3 shares nothing else
    assert(out(3L) == ((3L, 3L)), s"got ${out(3L)}")
    assert(out(1L)._2 == 3L)
  }

  test("assembleThreads: per-thread ordered document, partitioning-independent") {
    import spark.implicits._
    val msgs = Seq(
      (1L, 3L, "third"), (1L, 1L, "first"), (1L, 2L, "second"),
      (2L, 10L, "solo")
    ).toDF("thread", "turn", "msg")
    def run(df: org.apache.spark.sql.DataFrame) =
      Packing.assembleThreads(df, Seq("thread"), "turn", "msg", sep = " | ")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    val out = run(msgs)
    assert(out(1L) == ((3L, "first | second | third")))
    assert(out(2L) == ((1L, "solo")))
    // collect_list order is partition-dependent; the struct sort must
    // make the document identical under any partitioning
    assert(run(msgs.repartition(7)) == out)

    // non-identifier column names survive (Column API, no SQL splice)
    val weird = msgs.withColumnRenamed("msg", "msg-text")
    val w = Packing.assembleThreads(weird, Seq("thread"), "turn", "msg-text")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(w(1L) == "first\nsecond\nthird")
    // identical order/text columns are rejected, not silently ambiguous
    intercept[IllegalArgumentException] {
      Packing.assembleThreads(msgs, Seq("thread"), "msg", "msg")
    }
  }

  test("assembleThreads maxTurns: first N by order survive; drops observed") {
    import spark.implicits._
    val msgs = Seq(
      (1L, 3L, "third"), (1L, 1L, "first"), (1L, 2L, "second"),
      (2L, 10L, "solo")
    ).toDF("thread", "turn", "msg")
    val capped = Packing.assembleThreads(msgs, Seq("thread"), "turn", "msg",
      sep = " | ", maxTurns = Some(2))
    val out = capped.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // mega-thread truncates to its FIRST two turns in order; n_turns
    // reports the kept length; under-cap threads are untouched
    assert(out(1L) == ((2L, "first | second")))
    assert(out(2L) == ((1L, "solo")))
    val metric = capped.queryExecution.observedMetrics("graft_thread_turn_cap")
    assert(metric.getLong(0) == 1L, s"one dropped turn expected: $metric")

    // a cap above every thread's length is a no-op (q88's regime)
    val uncapped = Packing.assembleThreads(msgs, Seq("thread"), "turn", "msg",
      sep = " | ", maxTurns = Some(10))
    assert(uncapped.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
      == Map(1L -> ((3L, "first | second | third")), 2L -> ((1L, "solo"))))
    intercept[IllegalArgumentException] {
      Packing.assembleThreads(msgs, Seq("thread"), "turn", "msg", maxTurns = Some(0))
    }
  }
}
