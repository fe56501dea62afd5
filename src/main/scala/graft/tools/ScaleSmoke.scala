package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Scale smoke: replicate the sf0.1 documents corpus N times (half the
  * replicas byte-identical — a worst-realistic duplication profile —
  * half perturbed) and run the dedup layer's heavy shapes end to end.
  * Prints one timing line per operator. This is evidence, not a gate:
  * the shapes (map-side signatures, capped bucket expansion, no
  * self-joins) must scale linearly in rows here, or they won't scale
  * on a cluster either.
  * Usage: runMain graft.tools.ScaleSmoke [multiplier] */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val spark = graft.GraftSession.build("scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text")
    val docs = (0 until mult).map { i =>
      base.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
        // even replicas identical (pure dup pressure), odd perturbed
        (if (i % 2 == 0) col("text")
         else concat(col("text"), lit(s" replica$i"))).as("text"))
    }.reduce(_ unionByName _).cache()
    val n = docs.count()
    println(s"[smoke] corpus: $n docs (${mult}x sf0.1)")

    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[smoke] $name: $rows rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    timed("exact_dedup")(
      Dedup.exactGroups(docs, "text", "doc_id").count())
    timed("minhash_lsh_candidates")(
      Dedup.minhashNearDupCandidates(docs, "text", "doc_id").count())
    timed("jaccard_neardup(0.5)")(
      Dedup.jaccardNearDupPairs(docs, "text", "doc_id", minJaccard = 0.5).count())
    timed("jaccard_via_lsh(0.5)")(
      Dedup.minhashJaccardPairs(docs, "text", "doc_id", minJaccard = 0.5).count())
    timed("simhash_signatures")(
      docs.select(Dedup.simhash64Text(col("text")).as("sh"))
        .agg(count(col("sh"))).collect()(0).getLong(0))
    timed("dup_clusters")(
      Dedup.duplicateClusters(
        Dedup.minhashNearDupCandidates(docs, "text", "doc_id")).count())

    spark.stop()
  }
}
