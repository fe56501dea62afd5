package graft.tools

import org.apache.spark.sql.functions._

/** Evidence run for the batched BPE learner: learn N merges over the
  * sf0.01 documents corpus sequentially (batchMerges = 1) and batched
  * (default 16), print rounds + wall time for each — the measured
  * version of SCALE.md's "hundreds of rounds, not tens of thousands".
  * Usage: runMain graft.tools.BpeRounds [numMerges] [skipSequential] */
object BpeRounds {
  def main(args: Array[String]): Unit = {
    val merges = args.headOption.map(_.toInt).getOrElse(256)
    val skipSeq = args.lift(1).contains("skipSequential")
    val spark = graft.GraftSession.build("bpe-rounds")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"), col("text")).cache()
    docs.count()

    def timed(name: String, batch: Int): Unit = {
      val t0 = System.nanoTime()
      val learned = graft.operators.Bpe.learn(docs, "text", merges, batchMerges = batch)
      val n = learned.merges.count()
      println(f"[bpe] $name: $n merges in ${learned.rounds} rounds, " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    timed("batched(16)", 16)
    if (!skipSeq) timed("sequential", 1)
    spark.stop()
  }
}
