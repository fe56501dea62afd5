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

  /** IVF-style ANN: a (small, broadcast) centroid table acts as the
    * coarse quantizer; every vector is assigned to its nearest
    * centroid in one map-side pass + a vec-keyed groupBy, and the
    * probe searches only its centroid's inverted list — n/K work per
    * probe instead of n. Swapping a trained k-means codebook for the
    * centroid input changes nothing in the plan. `df` must carry
    * double-array embeddings in `embCol`; `centroids` has (cid, ce).
    * The probe is the row of `df` with id `queryVecId` (excluded from
    * results). */
  def ivfTopK(df: DataFrame, centroids: DataFrame, embCol: String, idCol: String,
      queryVecId: Long, k: Int): DataFrame = {
    val e = col(embCol)
    val dist = sqrt(aggregate(zip_with(e, col("ce"), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v))
    // assignment keeps the vector via first(e) — constant per id, so
    // no second join against the corpus is needed
    val assign = df.crossJoin(broadcast(centroids))
      .groupBy(idCol)
      .agg(min_by(col("cid"), dist).as("cid"), first(e).as("_e"))
    val probe = assign.filter(col(idCol) === queryVecId).select(
      col("cid").as("_pcid"), col("_e").as("_qe"))
    assign.join(broadcast(probe), col("cid") === col("_pcid"))
      .filter(col(idCol) =!= queryVecId)
      .select(col(idCol),
        round(cosine(col("_e"), col("_qe")), 4).as("cos"))
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
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
