package graft.operators

import java.util.concurrent.ConcurrentHashMap

import graft.SparkSpecBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Adversarial hot-bucket corpora — the inverted-index / LSH-band
  * scale-killers the caps exist for:
  *   - a stop-phrase shingle present in EVERY document (df = corpus);
  *   - one LSH band shared by every document (identical texts);
  *   - one sign-LSH bucket holding every embedding.
  * With a small cap each pipeline completes with the hot group dropped
  * (no corpus-sized array, no quadratic pair blowup) and the drop
  * counts surface as observed metrics. */
class HotBucketSpec extends SparkSpecBase {

  import spark.implicits._

  // capture observed metrics by name (listener bus is async -> poll)
  private val metrics = new ConcurrentHashMap[String, Row]()
  private lazy val listener = {
    val l = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String, qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        qe.observedMetrics.foreach { case (k, v) => metrics.put(k, v) }
      override def onFailure(f: String, qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    l
  }

  private def awaitMetric(name: String): Row = {
    val deadline = System.currentTimeMillis() + 10000
    while (!metrics.containsKey(name) && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    assert(metrics.containsKey(name), s"observed metric $name never arrived")
    metrics.get(name)
  }

  test("stop-phrase shingle (df = corpus size) is capped, not expanded") {
    listener
    metrics.clear()
    // 500 docs share one phrase -> shingle "common stop phrase" has
    // df=500 (the inverted-index killer); docs 1001/1002 are genuine
    // near-dups via their own below-cap shingles. The cap must drop
    // the hot shingle and keep the real pair.
    val docs = ((1 to 500)
      .map(i => (i.toLong, s"common stop phrase doc$i word$i tail$i")) ++ Seq(
        (1001L, "real duplicate body shared verbatim ending one"),
        (1002L, "real duplicate body shared verbatim ending two")))
      .toDF("doc_id", "text")
    val pairs = Dedup.jaccardNearDupPairs(docs, "text", "doc_id",
      n = 3, minJaccard = 0.1, maxDf = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // without the cap the hot shingle alone yields ~125k pairs
    assert(pairs.toSeq == Seq((1001L, 1002L)))
    val m = awaitMetric("graft_shingle_df_cap")
    assert(m.getAs[Long]("dropped_rows") == 500L)
    assert(m.getAs[Double]("hot_keys_est") == 1.0)
    assert(m.getAs[Long]("max_key_rows") == 500L)
  }

  test("degenerate LSH band (shared by 400 docs) is capped") {
    listener
    metrics.clear()
    // 400 identical docs collapse into one band per band-index; 3 dup
    // docs with different text form a legitimate below-cap bucket
    val docs = ((1 to 400)
      .map(i => (i.toLong, "identical text shared by every single document")) ++
      (1001 to 1003).map(i => (i.toLong, "small duplicate group text body here")))
      .toDF("doc_id", "text")
    val cands = Dedup.minhashNearDupCandidates(docs, "text", "doc_id",
      maxBucket = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the 400-doc band never expands; the 3-doc bucket still pairs up
    assert(cands == Set((1001L, 1002L), (1001L, 1003L), (1002L, 1003L)))
    val m = awaitMetric("graft_lsh_band_cap")
    assert(m.getAs[Long]("dropped_rows") == 800L) // 400 docs x 2 bands
    assert(m.getAs[Long]("max_key_rows") == 400L)
  }

  test("cap leaves sub-threshold buckets untouched (candidates intact)") {
    // 3 identical docs + unique docs: the duplicate band is below the
    // cap, so the candidate pairs still come out
    val docs = ((1 to 3).map(i => (i.toLong, "dup dup dup dup text")) ++
      (4 to 50).map(i => (i.toLong, s"unique text number $i entry $i")))
      .toDF("doc_id", "text")
    val cands = Dedup.minhashNearDupCandidates(docs, "text", "doc_id", maxBucket = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("hot embedding bucket is dropped before vectors are collected") {
    listener
    metrics.clear()
    // all vectors positive in the first 4 dims -> single sign bucket
    val emb = (1 to 300)
      .map(i => (i.toLong, Array.fill(8)(0.5f + (i % 7) * 0.01f)))
      .toDF("vec_id", "embedding")
    val pairs = Similarity.nearDupPairs(emb, "embedding", "vec_id",
      bits = 4, minCosine = 0.0, maxBucket = 50)
    assert(pairs.count() == 0)
    val m = awaitMetric("graft_embedding_bucket_cap")
    assert(m.getAs[Long]("dropped_rows") == 300L)
  }

  test("hot IVF-PQ list is dropped and its cap metric still delivers through the pair join") {
    listener
    metrics.clear()
    // 120 vectors crowd inverted list 0 (hot, capped); 3 land on
    // centroid 1 and still pair up. The metric must survive the pair
    // self-join + verify joins under AQE (the quirk HotKeys.capPair
    // exists for; with at least one surviving list the plan is never
    // empty-relation-pruned)
    val emb = ((1 to 120)
      .map(i => (i.toLong, Array.fill(8)(1.0 + (i % 5) * 0.01))) ++
      (201 to 203).map(i => (i.toLong, Array.fill(8)(-1.0 - (i % 3) * 0.01))))
      .toDF("vec_id", "embedding")
    val codebook = Seq(
      (0L, Seq.fill(8)(1.0)), (1L, Seq.fill(8)(-1.0)))
    val pq = Similarity.pqFromVectors(
      Seq.tabulate(4)(k => Seq.tabulate(8)(d => (d + 1.0) * (k + 1) - 4.0)),
      numSubspaces = 4)
    val pairs = Similarity.nearDupPairsIvfPq(emb, "embedding", "vec_id",
        codebook, pq, minCosine = 0.99, nprobe = 1, maxBucket = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((201L, 202L), (201L, 203L), (202L, 203L)),
      s"hot list must not expand, small list must pair: $pairs")
    val m = awaitMetric("graft_ivf_pq_bucket_cap")
    assert(m.getAs[Long]("dropped_rows") == 120L)
  }

  test("candidates-then-verify finds the pairs the full index finds") {
    import spark.implicits._
    val docs = (
      (1 to 4).map(i => (i.toLong, "shared duplicate content body text here")) ++
      (11 to 40).map(i => (i.toLong, s"unique number $i text with words $i here")))
      .toDF("doc_id", "text")
    val full = Dedup.jaccardNearDupPairs(docs, "text", "doc_id", minJaccard = 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaLsh = Dedup.minhashJaccardPairs(docs, "text", "doc_id", minJaccard = 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // identical docs are always found by LSH (collision prob 1)
    assert(full == viaLsh)
    assert(full == (for (a <- 1 to 4; b <- (a + 1) to 4) yield (a.toLong, b.toLong)).toSet)
    // and verification scores are exact Jaccard, not estimates
    val j = Dedup.minhashJaccardPairs(docs, "text", "doc_id", minJaccard = 0.9)
      .select("jaccard").collect().map(_.getDouble(0))
    assert(j.forall(_ == 1.0))
  }

  test("jaccard library form agrees with itself under a generous cap") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon eta"),
      (3L, "totally different words here now ok")).toDF("doc_id", "text")
    val got = Dedup.jaccardNearDupPairs(docs, "text", "doc_id",
      n = 3, minJaccard = 0.3, maxDf = HotKeys.DefaultBucketCap)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 2L)))
  }
}
