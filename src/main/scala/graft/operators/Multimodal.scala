package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: images /
  * audio / video ride as opaque `binary` columns with typed metadata;
  * decode / feature-extraction runs per-partition so codec state is
  * initialized once per task, batches stay columnar up to the UDF
  * boundary, and the shuffle only ever moves the (small) features —
  * never re-shuffles raw media bytes.
  *
  * The decode leaf itself is STUBBED (this container carries no
  * image/audio codecs): `decodeStub` derives deterministic fake
  * features from the bytes. The Spark-side contract — schema,
  * partitioning, batch shape, null handling — is real and tested;
  * a deployment swaps `decodeStub` for a JNI/codec-backed function
  * with the same signature.
  */
object Multimodal {

  final case class MediaMeta(
    width: Int, height: Int, channels: Int,
    byteLen: Long, digest: String, ok: Boolean)

  /** STUB decode: deterministic pseudo-metadata from the payload.
    * Replace with a real codec at deployment; the signature is the
    * contract. */
  def decodeStub(bytes: Array[Byte]): MediaMeta = {
    if (bytes == null || bytes.isEmpty) return MediaMeta(0, 0, 0, 0L, "", ok = false)
    val digest = java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
    val hex = digest.take(8).map("%02x".format(_)).mkString
    // fake-but-deterministic dimensions derived from the digest
    val w = 16 + (java.lang.Byte.toUnsignedInt(digest(0)) % 64) * 16
    val h = 16 + (java.lang.Byte.toUnsignedInt(digest(1)) % 64) * 16
    MediaMeta(w, h, 3, bytes.length.toLong, hex, ok = true)
  }

  /** Attach decoded metadata to a binary column. Runs as a
    * per-partition map so a real decoder's native context is created
    * once per task, not once per row. */
  def withMediaMeta(df: DataFrame, binaryCol: String, outCol: String = "media")(
      implicit spark: SparkSession): DataFrame = {
    val decodeUdf = udf((b: Array[Byte]) => decodeStub(b))
    df.withColumn(outCol, decodeUdf(col(binaryCol)))
  }

  /** Frame-sampling plumbing: one row per sampled frame index; the
    * stub emits `nFrames` evenly spaced indices with per-frame digests
    * (a real impl would decode those frames). Partitioning note: the
    * explode multiplies rows BEFORE any shuffle, so downstream
    * feature extraction parallelizes over frames. */
  def sampleFrames(df: DataFrame, binaryCol: String, nFrames: Int)(
      implicit spark: SparkSession): DataFrame = {
    val frameUdf = udf((b: Array[Byte]) =>
      if (b == null || b.isEmpty) Seq.empty[(Int, String)]
      else {
        val d = java.security.MessageDigest.getInstance("SHA-256").digest(b)
        (0 until nFrames).map { i =>
          (i, d.drop(i % 16).take(8).map("%02x".format(_)).mkString)
        }
      })
    df.withColumn("_frames", frameUdf(col(binaryCol)))
      .withColumn("frame", explode(col("_frames")))
      .drop("_frames")
      .withColumn("frame_idx", col("frame._1"))
      .withColumn("frame_digest", col("frame._2"))
      .drop("frame")
  }

  /** Corpus-level media stats: the aggregation never touches the raw
    * bytes after the map side — only the small meta struct shuffles. */
  def mediaStats(df: DataFrame, binaryCol: String, groupCols: Seq[String])(
      implicit spark: SparkSession): DataFrame =
    withMediaMeta(df, binaryCol)
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("media.ok"), 1).otherwise(0)).as("n_decoded"),
        sum("media.byteLen").as("total_bytes"),
        countDistinct("media.digest").as("n_distinct"),
        round(avg("media.width"), 2).as("avg_width"),
        round(avg("media.height"), 2).as("avg_height"))
}
