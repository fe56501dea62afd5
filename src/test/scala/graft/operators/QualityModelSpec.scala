package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** The trained quality filter: hashed-feature logistic regression,
  * hand-rolled batch gradient descent (the house trainer style). */
class QualityModelSpec extends SparkSpecBase {

  import spark.implicits._

  private val goodVocab = Seq("the", "quick", "brown", "fox", "jumps",
    "over", "lazy", "dog", "reads", "daily", "news", "with", "care")
  private val badVocab = Seq("zzz", "qqq", "xxx", "kkk", "vvv", "www",
    "hhh", "jjj", "ggg", "bbb")

  private def fixture = {
    val good = (0 until 30).map { i =>
      val ws = (0 until 8).map(j => goodVocab((i * 3 + j * 5) % goodVocab.size))
      (i.toLong, ws.mkString(" "), 1)
    }
    val bad = (0 until 30).map { i =>
      val ws = (0 until 8).map(j => badVocab((i * 7 + j * 3) % badVocab.size))
      (100L + i, ws.mkString(" "), 0)
    }
    (good ++ bad).toDF("doc_id", "text", "label")
  }

  test("reference-vs-crawl training separates; deterministic under repartition; model roundtrips") {
    val docs = fixture
    val model = QualityModel.train(docs, "text", "label",
      dims = 256, iters = 8, lr = 2.0)
    val scored = QualityModel.score(docs, model, "text")
      .select(col("doc_id"), col("label"), col("score"))
      .collect().map(r => (r.getInt(1), r.getDouble(2)))
    val goodScores = scored.filter(_._1 == 1).map(_._2)
    val badScores = scored.filter(_._1 == 0).map(_._2)
    assert(goodScores.min > badScores.max,
      s"classifier failed to separate: good min ${goodScores.min} vs bad max ${badScores.max}")
    assert(goodScores.min > 0.5 && badScores.max < 0.5,
      s"threshold 0.5 should split the fixture: ${goodScores.min} / ${badScores.max}")

    // determinism: no RNG, per-feature sums — repartitioning the
    // input must yield the identical weight table
    val model2 = QualityModel.train(docs.repartition(7), "text", "label",
      dims = 256, iters = 8, lr = 2.0)
    assert(model2 == model, "training is not repartition-stable")

    // persisted model scores identically
    withTempDir("qmodel") { dir =>
      QualityModel.writeModel(spark, model, dir.getAbsolutePath)
      val back = QualityModel.readModel(spark, dir.getAbsolutePath)
      assert(back == model)
    }
  }

  test("zero-token docs score sigmoid(bias); guards refuse bad labels and collisions") {
    val docs = fixture
    val model = QualityModel.train(docs, "text", "label",
      dims = 128, iters = 3, lr = 1.0)
    val empty = Seq((999L, "", 0)).toDF("doc_id", "text", "label")
    val s = QualityModel.score(empty, model, "text")
      .select("score").collect()(0).getDouble(0)
    val expected = BigDecimal(1.0 / (1.0 + math.exp(-model.bias)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(s - expected) < 1e-9, s"$s vs $expected")
    // labels must be 0/1
    intercept[IllegalArgumentException] {
      QualityModel.train(docs.withColumn("label", lit(2)), "text", "label",
        dims = 16, iters = 1)
    }
    // score-column collision is case-insensitive
    intercept[IllegalArgumentException] {
      QualityModel.score(docs.withColumn("Score", lit(1.0)), model, "text")
    }
    // L2 shrinks weights toward zero
    val l2Model = QualityModel.train(docs, "text", "label",
      dims = 128, iters = 3, lr = 1.0, l2 = 0.5)
    val norm = model.weights.map(w => math.abs(w._2)).sum
    val l2Norm = l2Model.weights.map(w => math.abs(w._2)).sum
    assert(l2Norm < norm, s"L2 should shrink: $l2Norm vs $norm")
  }
}
