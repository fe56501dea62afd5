package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor operators over an embedding column
  * (`array<float>`) — library form of q37-q39. Baseline: brute-force
  * cosine against a broadcast query vector; scale path: sign-LSH
  * bucketing so probes search ~n/2^bits rows (SCALE.md §4). */
object Similarity {

  /** Cosine similarity between two double-array columns — a compiled
    * Catalyst kernel (functions.CosineSim): one primitive-double pass
    * per row inside whole-stage codegen, with accumulation order (and
    * therefore bits) identical to the aggregate(zip_with(...)) HOF
    * formulation it replaced. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.cosine_sim(a, b)

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Brute-force top-k against one query vector: the query is a
    * literal broadcast into the plan; one map-side pass + ordered
    * limit. */
  def bruteForceTopK(df: DataFrame, embCol: String, idCol: String,
      query: Seq[Double], k: Int): DataFrame = {
    val q = typedLit(query)
    df.select(col(idCol),
        round(cosine(asDouble(col(embCol)), q), 4).as("cos"))
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
  }

  /** Sign-LSH bucket key from the first `bits` dimensions. */
  def signBucket(embCol: Column, bits: Int): Column =
    concat_ws("", transform(slice(embCol, 1, bits),
      x => when(x >= lit(0f), "1").otherwise("0")))

  /** Bucketed ANN: assign buckets once, search only the query's
    * bucket. Returns top-k within the bucket — the recall/latency
    * trade the bucketed path buys at scale. */
  def bucketedTopK(df: DataFrame, embCol: String, idCol: String,
      query: Seq[Double], k: Int, bits: Int): DataFrame = {
    val queryBucket = query.take(bits).map(v => if (v >= 0) "1" else "0").mkString
    bruteForceTopK(
      df.filter(signBucket(col(embCol), bits) === queryBucket),
      embCol, idCol, query, k)
  }

  /** IVF index build: assign every vector to its nearest codebook
    * centroid in a single map-side pass — the codebook is a literal
    * inside the generated code (NearestCentroid expression), so
    * assignment shuffles NOTHING. A codebook is small by definition
    * (k-means output, KBs), which is why materializing it driver-side
    * is the correct trade, unlike collecting a data-sized dimension.
    * Cache or write the result once; every probe then reads one
    * inverted list (~n/K vectors). */
  def ivfAssign(df: DataFrame, codebook: Seq[(Long, Seq[Double])],
      embCol: String, cidCol: String = "cid"): DataFrame =
    df.withColumn(cidCol,
      graft.functions.VectorExpressions.nearest_centroid(col(embCol), codebook))

  /** IVF probe over an assigned (indexed) corpus: cosine top-k within
    * the probe's inverted list only. */
  def ivfProbe(assigned: DataFrame, embCol: String, idCol: String,
      queryVecId: Long, k: Int, cidCol: String = "cid"): DataFrame = {
    val probe = assigned.filter(col(idCol) === queryVecId)
      .select(col(cidCol).as("_pcid"), col(embCol).as("_qe"))
    assigned.join(broadcast(probe), col(cidCol) === col("_pcid"))
      .filter(col(idCol) =!= queryVecId)
      .select(col(idCol),
        round(cosine(col(embCol), col("_qe")), 4).as("cos"))
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
  }

  /** One-shot IVF ANN (index + probe in one plan; amortized use goes
    * through ivfAssign once + ivfProbe per query). `centroids` is a
    * (cid, ce) DataFrame — collected as the codebook literal. */
  def ivfTopK(df: DataFrame, centroids: DataFrame, embCol: String, idCol: String,
      queryVecId: Long, k: Int): DataFrame = {
    val codebook = centroids.select(col("cid"), col("ce")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq
    ivfProbe(ivfAssign(df, codebook, embCol), embCol, idCol, queryVecId, k)
  }

  /** Near-duplicate embedding pairs above a cosine threshold, searched
    * bucket-locally (no O(n^2) cross join): group ids+vectors per sign
    * bucket, expand pairs inside the bucket, then score. A bucket with
    * more than `maxBucket` vectors (degenerate hyperplane cut) is
    * dropped before the vector arrays are collected — full vectors per
    * row make an uncapped hot bucket the fastest way to an executor
    * OOM — with drop counts logged via observed metrics. */
  def nearDupPairs(df: DataFrame, embCol: String, idCol: String,
      bits: Int, minCosine: Double,
      maxBucket: Int = 8192): DataFrame = {
    val bucketed = df.select(col(idCol).as("_id"), asDouble(col(embCol)).as("_e"),
      signBucket(col(embCol), bits).as("_bucket"))
    HotKeys.cap(bucketed, Seq(col("_bucket")), maxBucket,
        metricName = "graft_embedding_bucket_cap")
      .groupBy("_bucket")
      .agg(sort_array(collect_list(struct(col("_id"), col("_e")))).as("rows"))
      .filter(size(col("rows")) > 1)
      .select(explode(expr(
        """flatten(transform(rows, (x, i) ->
             transform(slice(rows, i + 2, size(rows) - i - 1),
               y -> struct(x._id AS id_a, y._id AS id_b, x._e AS e_a, y._e AS e_b))))""")).as("p"))
      .select(col("p.id_a"), col("p.id_b"),
        round(cosine(col("p.e_a"), col("p.e_b")), 4).as("cos"))
      .filter(col("cos") >= minCosine)
  }
}
