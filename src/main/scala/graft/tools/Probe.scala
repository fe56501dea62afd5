package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, QualityGates, Similarity}

/** Dev-only scratch probe (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build("probe")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")

    val pairs = Dedup.minhashNearDupCandidates(docs, "text", "doc_id")
    println(s"[probe] minhash candidates: ${pairs.count()} pairs")

    val sim = docs.select(col("doc_id"), Dedup.simhash64(Dedup.tokens(col("text"))).as("sh"))
    val nearByHamming = sim.as("a").join(sim.as("b"),
        col("a.doc_id") < col("b.doc_id") &&
        Dedup.hammingDistance(col("a.sh"), col("b.sh")) <= 8)
      .count()
    println(s"[probe] simhash pairs (hamming<=8): $nearByHamming")

    val query = emb.filter(col("vec_id") === 0)
      .select(expr("transform(embedding, x -> cast(x as double))"))
      .collect()(0).getSeq[Double](0)
    println("[probe] brute topk: " + Similarity.bruteForceTopK(
      emb.filter(col("vec_id") =!= 0), "embedding", "vec_id", query, 5)
      .collect().map(r => s"${r.getLong(0)}@${r.getDouble(1)}").mkString(", "))
    println("[probe] bucketed topk: " + Similarity.bucketedTopK(
      emb.filter(col("vec_id") =!= 0), "embedding", "vec_id", query, 5, 4)
      .collect().map(r => s"${r.getLong(0)}@${r.getDouble(1)}").mkString(", "))
    println(s"[probe] neardup pairs cos>=0.5 @8 bits: " +
      Similarity.nearDupPairs(emb, "embedding", "vec_id", 8, 0.5).count())

    val gates = Seq(
      QualityGates.gate("documents", docs, 100),
      QualityGates.gate("embeddings", emb, 100))
    println(s"[probe] gates: ${QualityGates.enforce(gates)}")
    try QualityGates.enforce(Seq(QualityGates.gate("documents", docs, 1000000)))
    catch { case e: IllegalStateException => println(s"[probe] gate failure surfaces: ${e.getMessage}") }
    spark.stop()
  }
}
