package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** The compiled shingle/MinHash kernels must match the declarative
  * (interpreted-HOF) formulation they replaced — that formulation is
  * also exactly what the DuckDB oracle computes for q35/q36. */
class TextExpressionsSpec extends SparkSpecBase {

  lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  // the round-1 HOF formulation, kept here as the semantic reference
  private val toks = "filter(split(text, ' '), x -> x <> '')"
  private val hofShingles =
    s"array_distinct(CASE WHEN size($toks) >= 3 THEN transform(sequence(1, size($toks) - 2), k -> concat_ws(' ', slice($toks, k, 3))) ELSE array() END)"

  test("shingles kernel matches the HOF formulation on the corpus") {
    val rows = docs
      .select(TextExpressions.shingles(col("text"), 3).as("fast"),
        expr(hofShingles).as("ref"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
  }

  test("shingles edge cases: short, empty, repeated, multi-space") {
    val df = spark.createDataFrame(Seq(
      (1L, "a b c d"),
      (2L, "a b"),
      (3L, ""),
      (4L, "x y z x y z x y z"),
      (5L, "a  b   c d"),
      (6L, " leading and trailing ")
    )).toDF("id", "text")
    val got = df.select(col("id"), TextExpressions.shingles(col("text"), 3).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) == Seq("a b c", "b c d"))
    assert(got(2L) == Seq.empty)
    assert(got(3L) == Seq.empty)
    // distinct, first-occurrence order
    assert(got(4L) == Seq("x y z", "y z x", "z x y"))
    // runs of spaces behave like split+filter
    assert(got(5L) == Seq("a b c", "b c d"))
    assert(got(6L) == Seq("leading and trailing"))
  }

  test("minhash_sig matches per-seed md5 min of the shingle set") {
    val rows = docs.limit(50)
      .select(TextExpressions.minhash_sig(col("text"), 3, 4).as("fast"),
        expr(s"""transform(sequence(0, 3),
          s -> array_min(transform($hofShingles, x -> md5(concat(s, '#', x)))))""").as("ref"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
  }

  test("minhash_sig is null when the doc has no shingles") {
    val df = spark.createDataFrame(Seq((1L, "only two"), (2L, "now three tokens")))
      .toDF("id", "text")
      .select(col("id"), TextExpressions.minhash_sig(col("text"), 3, 2).as("hs"))
    val byId = df.collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(byId(1L))
    assert(!byId(2L))
  }

  test("SQL registration: shingles / minhash_sig callable from SQL") {
    val r = spark.sql(
      "SELECT shingles('a b c d', 3) AS s, minhash_sig('a b c d', 3, 2) AS m")
      .collect()(0)
    assert(r.getSeq[String](0) == Seq("a b c", "b c d"))
    assert(r.getSeq[String](1).length == 2)
  }

  test("non-string input is rejected at analysis time (ExpectsInputTypes)") {
    val df = spark.createDataFrame(Seq((1, 2))).toDF("a", "b")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(TextExpressions.shingles(col("a"), 3)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("shingles"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(TextExpressions.minhash_sig(col("a"), 3, 2)).collect()
    }
    assert(e2.getMessage.toLowerCase.contains("minhash_sig"))
  }

  test("SQL: foldable integral arguments accepted (CAST / arithmetic)") {
    val r = spark.sql(
      "SELECT shingles('a b c d', CAST(3 AS BIGINT)) AS s1, shingles('a b c d', 1 + 2) AS s2")
      .collect()(0)
    assert(r.getSeq[String](0) == Seq("a b c", "b c d"))
    assert(r.getSeq[String](1) == Seq("a b c", "b c d"))
  }

  test("simhash64 expression matches the reference UDF semantics") {
    // reference semantics: per-token md5 first-8-bytes BE, majority vote
    def ref(tokens: Seq[String]): Long = {
      val counts = new Array[Int](64)
      for (t <- tokens) {
        val d = java.security.MessageDigest.getInstance("MD5").digest(t.getBytes("UTF-8"))
        val h = java.nio.ByteBuffer.wrap(d, 0, 8).getLong
        for (b <- 0 until 64) if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
      }
      (0 until 64).foldLeft(0L)((acc, b) => if (counts(b) > 0) acc | (1L << b) else acc)
    }
    val rows = docs.limit(50)
      .select(col("text"), TextExpressions.simhash64(expr(toks)).as("sh"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val tokens = r.getString(0).split(" ").filter(_.nonEmpty).toSeq
      assert(r.getLong(1) == ref(tokens))
    }
    // SQL registration + NULL in -> NULL out
    val sqlRow = spark.sql(
      "SELECT simhash64(array('a', 'b')) AS s, simhash64(CAST(NULL AS ARRAY<STRING>)) AS n")
      .collect()(0)
    assert(sqlRow.getLong(0) == ref(Seq("a", "b")))
    assert(sqlRow.isNullAt(1))
  }

  test("simhash64_text matches simhash64 over the tokenized column") {
    val rows = docs.limit(100)
      .select(TextExpressions.simhash64(expr(toks)).as("a"),
        TextExpressions.simhash64_text(col("text")).as("b"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("nfc_normalize: composed forms, ASCII fast path, null, cleaning chain") {
    // decomposed e + combining acute (U+0301) must compose to U+00E9
    val decomposed = "e\u0301cole"
    val composed = "\u00e9cole"
    assert(decomposed != composed)
    val ndf = spark.createDataFrame(Seq(Tuple1(decomposed))).toDF("t")
      .select(TextExpressions.nfc_normalize(col("t")).as("a"))
    assert(ndf.collect()(0).getString(0) == composed)
    val r = spark.sql("SELECT nfc_normalize('plain') b, " +
      "nfc_normalize(CAST(NULL AS STRING)) c").collect()(0)
    assert(r.getString(0) == "plain")
    assert(r.isNullAt(1))
    // the full cleaning chain: scrub + fold + squeeze
    val cleaned = spark.createDataFrame(Seq(Tuple1(
      "Mail  ME at A.User@Example.COM  or https://x.io/page  NOW")))
      .toDF("text")
      .select(graft.operators.TextNorm.clean(org.apache.spark.sql.functions.col("text")))
      .collect()(0).getString(0)
    assert(cleaned == "mail me at <EMAIL> or <URL> now")
  }

  test("kernels stay inside whole-stage codegen") {
    val plan = docs
      .select(TextExpressions.shingles(col("text"), 3).as("s"),
        TextExpressions.minhash_sig(col("text"), 3, 4).as("m"),
        // split (codegen'd built-in), not the filter-lambda tokenizer:
        // a HOF lambda in the same Project would break the span
        TextExpressions.simhash64(split(col("text"), " ")).as("sh"))
      .queryExecution.executedPlan
    val codegenSpans = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    // the project hosting the kernels compiled into a codegen span
    assert(codegenSpans.exists(_.toString.contains("shingles")))
    assert(codegenSpans.exists(_.toString.contains("minhash_sig")))
    assert(codegenSpans.exists(_.toString.contains("simhash64")))
  }

  test("repetition_stats: hand-computed signals over a period-7 doc, null propagation, codegen") {
    import spark.implicits._
    // token stream: aa bb cc dd ee xx yy aa bb cc dd ee xx yy
    // (period 7, every token 2 chars, 14 tokens, 28 token chars);
    // lines: [aa bb cc dd ee][xx yy][aa bb cc dd ee] | [xx yy]
    val txt = "aa bb cc dd ee\nxx yy\naa bb cc dd ee\n\nxx yy"
    val r = Seq(Tuple1(txt)).toDF("t")
      .select(TextExpressions.repetition_stats(col("t")).as("s"))
      .select(col("s.*")).collect()(0)
    def f(name: String): Double =
      math.rint(r.getAs[Double](name) * 1e6) / 1e6
    // 2 of 4 lines are dups; dup chars (14 + 5) / 38
    assert(f("dup_line_frac") == 0.5, r)
    assert(f("dup_line_char_frac") == 0.5, r)
    // the two paragraphs differ
    assert(f("dup_para_frac") == 0.0 && f("dup_para_char_frac") == 0.0, r)
    // every interior n-gram repeats once (period 7): top n-gram count
    // 2, char mass 2n, total 28
    assert(f("top_2gram_char_frac") == 0.285714, r)
    assert(f("top_3gram_char_frac") == 0.428571, r)
    assert(f("top_4gram_char_frac") == 0.571429, r)
    // 5/6/7-grams at offsets s and s+7 coincide and their coverage
    // union is the WHOLE stream; no 8+-gram repeats (period 7)
    assert(f("dup_5gram_char_frac") == 1.0, r)
    assert(f("dup_6gram_char_frac") == 1.0, r)
    assert(f("dup_7gram_char_frac") == 1.0, r)
    assert(f("dup_8gram_char_frac") == 0.0, r)
    assert(f("dup_9gram_char_frac") == 0.0, r)
    assert(f("dup_10gram_char_frac") == 0.0, r)
    // duplicate PARAGRAPH: both para stats fire; a repeated 2-token
    // line is also a repeated 2-gram but too short for the 5+ tiers
    val p = Seq(Tuple1("pp qq\n\npp qq")).toDF("t")
      .select(TextExpressions.repetition_stats(col("t")).as("s"))
      .select(col("s.*")).collect()(0)
    assert(p.getAs[Double]("dup_para_frac") == 0.5 &&
      p.getAs[Double]("dup_para_char_frac") == 0.5, p)
    assert(p.getAs[Double]("dup_line_frac") == 0.5, p)
    assert(p.getAs[Double]("dup_5gram_char_frac") == 0.0, p)
    // singleton top n-gram carries no repetition signal — 0, not 1/n
    val single = Seq(Tuple1("aa bb cc")).toDF("t")
      .select(TextExpressions.repetition_stats(col("t")).as("s"))
      .select(col("s.*")).collect()(0)
    assert(single.getAs[Double]("top_2gram_char_frac") == 0.0, single)
    // empty/whitespace docs score zero everywhere; NULL propagates
    val z = Seq(Tuple1("   \n  ")).toDF("t")
      .select(TextExpressions.repetition_stats(col("t")).as("s"))
      .select(col("s.*")).collect()(0)
    assert((0 until 13).forall(i => z.getDouble(i) == 0.0), z)
    val nul = Seq(Tuple1(null: String)).toDF("t")
      .select(TextExpressions.repetition_stats(col("t")).as("s"))
      .collect()(0)
    assert(nul.isNullAt(0))
    // SQL registration + the kernel sits inside whole-stage codegen
    val viaSql = spark.sql(
      s"SELECT repetition_stats('${txt.replace("\n", "\\n")}') AS s")
      .select(col("s.dup_line_frac")).collect()(0).getDouble(0)
    assert(viaSql == 0.5)
    // over the parquet corpus: a literal local relation constant-folds
    // away before any codegen span exists
    val plan2 = docs.select(TextExpressions.repetition_stats(col("text")))
      .queryExecution.executedPlan
    assert(plan2.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.exists(_.toString.contains("repetition_stats")))
  }
}
