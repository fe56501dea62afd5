package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** The compiled vector kernels must match the declarative HOF
  * formulation bit for bit (that formulation is what the DuckDB
  * oracle computes for q37/q44). */
class VectorExpressionsSpec extends SparkSpecBase {

  lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))

  private val hofCos =
    """aggregate(zip_with(e, qv, (x, y) -> x * y), 0D, (acc, x) -> acc + x)
       / (sqrt(aggregate(e, 0D, (acc, x) -> acc + x * x))
          * sqrt(aggregate(qv, 0D, (acc, x) -> acc + x * x)))"""

  test("cosine_sim and dot_product match the HOF formulation bit for bit") {
    val q = emb.filter(col("vec_id") === 0).select(col("e").as("qv"))
    val rows = emb.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
      .select(
        VectorExpressions.cosine_sim(col("e"), col("qv")).as("fast"),
        expr(hofCos).as("ref"),
        VectorExpressions.dot_product(col("e"), col("qv")).as("dfast"),
        expr("aggregate(zip_with(e, qv, (x, y) -> x * y), 0D, (acc, x) -> acc + x)").as("dref"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(3)))
    }
  }

  test("kernels stay inside whole-stage codegen and register in SQL") {
    val df = emb.select(VectorExpressions.cosine_sim(col("e"), col("e")).as("c"))
    val spans = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(spans.exists(_.toString.contains("cosine_sim")))
    val r = spark.sql(
      "SELECT cosine_sim(array(1D, 0D), array(1D, 0D)) a, dot_product(array(1D, 2D), array(3D, 4D)) b")
      .collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) == 11.0)
  }

  test("null propagation and zero-norm edge") {
    val r = spark.sql(
      "SELECT cosine_sim(CAST(NULL AS ARRAY<DOUBLE>), array(1D)) a, " +
      "isnan(cosine_sim(array(0D), array(1D))) b").collect()(0)
    assert(r.isNullAt(0))
    assert(r.getBoolean(1)) // zero norm -> NaN, as the HOF division does
  }
}
