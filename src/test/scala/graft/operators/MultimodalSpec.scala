package graft.operators

import java.util.concurrent.atomic.AtomicInteger

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Pins the mapPartitions decode contract: the decoder factory runs
  * once per partition (never per row), decode per row, schema
  * appended, nulls handled. Local mode shares one JVM, so a static
  * counter observes executor-side constructions. */
object MultimodalSpec {
  val inits = new AtomicInteger(0)
  val decodes = new AtomicInteger(0)

  final class CountingDecoder extends Multimodal.MediaDecoder {
    inits.incrementAndGet()
    private val real = new Multimodal.StubDecoder
    def decode(bytes: Array[Byte]): Multimodal.MediaMeta = {
      decodes.incrementAndGet()
      real.decode(bytes)
    }
  }
}

class MultimodalSpec extends SparkSpecBase {

  test("decoder is constructed once per partition, invoked once per row") {
    import spark.implicits._
    MultimodalSpec.inits.set(0)
    MultimodalSpec.decodes.set(0)
    val docs = (1 to 90).map(i => (i.toLong, s"payload number $i"))
      .toDF("id", "text")
      .withColumn("blob", col("text").cast("binary"))
      .repartition(3)
    val out = Multimodal.withMediaMeta(docs, "blob",
      decoderFactory = () => new MultimodalSpec.CountingDecoder)(spark)
    assert(out.count() == 90)
    assert(MultimodalSpec.inits.get() == 3,
      s"decoder built ${MultimodalSpec.inits.get()} times for 3 partitions")
    assert(MultimodalSpec.decodes.get() == 90)
  }

  test("media meta fields are appended with the decode results") {
    import spark.implicits._
    val docs = Seq((1L, "hello world"), (2L, null.asInstanceOf[String]))
      .toDF("id", "text")
      .withColumn("blob", col("text").cast("binary"))
    val rows = Multimodal.withMediaMeta(docs, "blob")(spark)
      .select(col("id"), col("media.ok"), col("media.byteLen"), col("media.digest"))
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getLong(2), r.getString(3))).toMap
    assert(rows(1L)._1 && rows(1L)._2 == 11L && rows(1L)._3.nonEmpty)
    assert(!rows(2L)._1 && rows(2L)._2 == 0L)
    // deterministic: same payload, same digest
    val again = Multimodal.withMediaMeta(docs, "blob")(spark)
      .select(col("media.digest")).collect().map(_.getString(0))
    assert(again.head == rows(1L)._3)
  }
}
