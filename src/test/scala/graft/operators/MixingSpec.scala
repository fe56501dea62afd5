package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class MixingSpec extends SparkSpecBase {

  test("integer weights give exact copy counts with 0-based epochs") {
    import spark.implicits._
    val docs = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val out = Mixing.weightedMix(docs, "doc_id", lit(2.0))
      .groupBy("doc_id").agg(count(lit(1)).as("n"), max("epoch").as("mx"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(out == Map(1L -> ((2L, 1)), 2L -> ((2L, 1))), s"got $out")
  }

  test("weight 0 drops everything; weight 1 keeps exactly one epoch") {
    import spark.implicits._
    val docs = (1L to 50L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    assert(Mixing.weightedMix(docs, "doc_id", lit(0.0)).count() == 0)
    val ones = Mixing.weightedMix(docs, "doc_id", lit(1.0))
    assert(ones.count() == 50 && ones.agg(max("epoch")).head.getInt(0) == 0)
  }

  test("fractional weights are deterministic and hit the expected rate") {
    import spark.implicits._
    val docs = (1L to 2000L).map(i => (i, "x")).toDF("doc_id", "text")
    val kept = Mixing.weightedMix(docs, "doc_id", lit(0.3))
      .select("doc_id").as[Long].collect().toSet
    // reproducible: identical draw on a second run and under reshuffle
    val again = Mixing.weightedMix(docs.repartition(7), "doc_id", lit(0.3))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == again)
    assert(math.abs(kept.size / 2000.0 - 0.3) < 0.05, s"rate ${kept.size / 2000.0}")
  }

  test("oversampling mixes guaranteed and Bernoulli copies") {
    import spark.implicits._
    val docs = (1L to 2000L).map(i => (i, "x")).toDF("doc_id", "text")
    val counts = Mixing.weightedMix(docs, "doc_id", lit(1.5))
      .groupBy("doc_id").count().select("count").as[Long].collect()
    assert(counts.forall(c => c == 1L || c == 2L))
    val avg = counts.sum.toDouble / 2000.0
    assert(math.abs(avg - 1.5) < 0.08, s"avg copies $avg")
    assert(counts.length == 2000, "floor(1.5)=1 guarantees every doc appears")
  }

  test("stratifiedSample: deterministic per-stratum rates, map-side only") {
    import spark.implicits._
    val docs = (1L to 3000L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    val rate = when(col("lang") === "en", 0.5).otherwise(0.1)
    val kept = Mixing.stratifiedSample(docs, "doc_id", rate)
    val byLang = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(byLang("en") / 1500.0 - 0.5) < 0.06, s"en ${byLang("en")}")
    assert(math.abs(byLang("de") / 1500.0 - 0.1) < 0.06, s"de ${byLang("de")}")
    // identical draw under reshuffle (no RNG state)
    val again = Mixing.stratifiedSample(docs.repartition(11), "doc_id", rate)
    assert(kept.select("doc_id").as[Long].collect().toSet ==
      again.select("doc_id").as[Long].collect().toSet)
    // subset property: a doc kept at rate r survives every rate >= r
    val wider = Mixing.stratifiedSample(docs, "doc_id",
      when(col("lang") === "en", 0.8).otherwise(0.3))
    assert(kept.select("doc_id").as[Long].collect().toSet.subsetOf(
      wider.select("doc_id").as[Long].collect().toSet))
    // no shuffle in the plan: pure filter
    assert(!kept.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("stratifiedTake: exactly k per stratum, nested and deterministic") {
    import spark.implicits._
    val docs = (1L to 900L).map(i => (i, s"s${i % 3}")).toDF("doc_id", "stratum")
    val k10 = Mixing.stratifiedTake(docs, Seq("stratum"), "doc_id", 10)
    val sizes = k10.groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes == Map("s0" -> 10L, "s1" -> 10L, "s2" -> 10L))
    // nested: the k=10 sample is a prefix of the k=25 sample
    val ids10 = k10.select("doc_id").as[Long].collect().toSet
    val ids25 = Mixing.stratifiedTake(docs, Seq("stratum"), "doc_id", 25)
      .select("doc_id").as[Long].collect().toSet
    assert(ids10.subsetOf(ids25) && ids25.size == 75)
    // stable under repartitioning
    val again = Mixing.stratifiedTake(docs.repartition(13), Seq("stratum"), "doc_id", 10)
      .select("doc_id").as[Long].collect().toSet
    assert(again == ids10)
    // strata smaller than k return whole strata
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "stratum")
    assert(Mixing.stratifiedTake(tiny, Seq("stratum"), "doc_id", 10).count() == 3)
  }

  test("temperature weights: alpha < 1 lifts low-resource sources, alpha = 1 is natural, budget is the expectation") {
    import spark.implicits._
    val docs = ((1L to 90L).map(i => (i, "big")) ++ (91L to 100L).map(i => (i, "small")))
      .toDF("doc_id", "source")
    val w = Mixing.temperatureWeights(docs, "source", alpha = 0.5, budget = 100L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(3)))).toMap
    assert(w("small")._2 > 1.0, s"low-resource source must oversample: $w")
    assert(w("big")._2 < 1.0)
    // expected output size = budget exactly (sum n_i * w_i)
    val expected = w.map { case (_, (n, wt)) => n * wt }.sum
    assert(math.abs(expected - 100.0) < 1e-9)
    // alpha = 1: natural proportions — every doc gets budget/total
    val w1 = Mixing.temperatureWeights(docs, "source", alpha = 1.0, budget = 50L)
      .collect().map(_.getDouble(3))
    assert(w1.forall(v => math.abs(v - 0.5) < 1e-12))
    // realization is deterministic run-to-run
    def mix() = Mixing.temperatureMix(docs, "source", "doc_id", 0.5, 100L)
      .select("doc_id", "epoch").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(mix() == mix())

    // a null source is a stratum, not a silent drop: its rows keep
    // their weight through the null-safe join
    val withNull = docs.withColumn("source",
      when(col("doc_id") <= 10L, lit(null).cast("string")).otherwise(col("source")))
    val wN = Mixing.temperatureWeights(withNull, "source", 0.5, 100L).count()
    assert(wN == 3, "null stratum must appear in the weight table")
    val mixedNull = Mixing.temperatureMix(withNull, "source", "doc_id", 1.0, 200L)
    // alpha=1, budget=2x corpus -> weight 2.0 for every stratum incl null:
    // every doc (null-source ones too) contributes exactly 2 copies
    assert(mixedNull.count() == 200L)
  }

  test("salted draws decorrelate composed samplers") {
    import spark.implicits._
    val docs = (1L to 4000L).map(i => (i, "x")).toDF("doc_id", "text")
    // unsalted-then-unsalted correlates fully: every survivor of
    // sample(0.25) also clears the mix's Bernoulli(0.5) -> 2.0 copies
    val correlated = Mixing.weightedMix(
      Mixing.stratifiedSample(docs, "doc_id", lit(0.25)), "doc_id", lit(1.5))
    val corrAvg = correlated.count().toDouble /
      Mixing.stratifiedSample(docs, "doc_id", lit(0.25)).count()
    assert(corrAvg > 1.9, s"expected full correlation, got $corrAvg")
    // salting one stage restores the independent expectation (~1.5)
    val salted = Mixing.weightedMix(
      Mixing.stratifiedSample(docs, "doc_id", lit(0.25), salt = "stageA"),
      "doc_id", lit(1.5))
    val saltAvg = salted.count().toDouble /
      Mixing.stratifiedSample(docs, "doc_id", lit(0.25), salt = "stageA").count()
    assert(math.abs(saltAvg - 1.5) < 0.1, s"expected ~1.5 copies, got $saltAvg")
  }

  test("tokenBudgetTake: budget hit per stratum with one-doc overshoot, prefix-nested, whole small strata, null counts drop") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // stratum A: 50 docs x 100 tokens = 5000 >> budget; B: 3 docs,
    // 300 total, under every budget; one null-count row in A
    val rows = (0 until 50).map(i => (i.toLong, "A", Some(100L))) ++
      Seq((100L, "B", Some(120L)), (101L, "B", Some(90L)), (102L, "B", Some(90L)),
        (103L, "A", None: Option[Long]))
    val df = rows.toDF("doc_id", "source", "nt")

    val kept = Mixing.tokenBudgetTake(df, Seq("source"), "doc_id", "nt", 1000L)
    val bySrc = kept.groupBy("source")
      .agg(sum("nt").as("tok"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // A: greedy inclusion crosses 1000 exactly at the 10th 100-token doc
    assert(bySrc("A") == ((1000L, 10L)), s"got ${bySrc("A")}")
    // B is under budget: kept whole
    assert(bySrc("B") == ((300L, 3L)))
    // the null-count row can never be kept
    assert(kept.filter(col("doc_id") === 103L).isEmpty)

    // nested: the 500-token sample is a prefix of the 1000-token one
    val small = Mixing.tokenBudgetTake(df, Seq("source"), "doc_id", "nt", 500L)
      .filter(col("source") === "A").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val big = kept.filter(col("source") === "A").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(small.size == 5 && small.subsetOf(big))

    // reproducible under repartitioning
    val re = Mixing.tokenBudgetTake(df.repartition(7), Seq("source"),
        "doc_id", "nt", 1000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(re == kept.select("doc_id").collect().map(_.getLong(0)).toSet)

    intercept[IllegalArgumentException](
      Mixing.tokenBudgetTake(df, Seq.empty, "doc_id", "nt", 1000L))
    intercept[IllegalArgumentException](
      Mixing.tokenBudgetTake(df, Seq("source"), "doc_id", "nt", 0L))

    // a NULL stratum (missing metadata) is a stratum like any other —
    // it gets its own budget instead of silently vanishing
    val withNull = df.unionByName(Seq(
      (200L, null.asInstanceOf[String], Some(80L)),
      (201L, null.asInstanceOf[String], Some(60L))).toDF("doc_id", "source", "nt"))
    val keptNull = Mixing.tokenBudgetTake(withNull, Seq("source"), "doc_id",
        "nt", 1000L)
      .filter(col("source").isNull)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptNull == Set(200L, 201L), s"got $keptNull")
  }

  test("tokenBudgetTakeMixed: per-stratum recipe, absent strata drop, top-up composes to one full take") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = (0 until 50).map(i => (i.toLong, "A", 100L)) ++
      (0 until 10).map(i => (500L + i, "B", 50L)) ++
      (0 until 5).map(i => (900L + i, "C", 10L))
    val df = rows.toDF("doc_id", "source", "nt")
    val budgets = Seq(("A", 1000L), ("B", 120L)).toDF("source", "budget")

    val kept = Mixing.tokenBudgetTakeMixed(df, Seq("source"), "doc_id",
      "nt", budgets, "budget")
    val bySrc = kept.groupBy("source")
      .agg(sum("nt").as("tok"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(bySrc("A") == ((1000L, 10L)))
    // B crosses 120 at its third 50-token doc (greedy inclusion)
    assert(bySrc("B") == ((150L, 3L)))
    // C is not in the recipe: dropped entirely
    assert(!bySrc.contains("C"))

    // top-up composition: standing = take at 400 tokens for A; drawing
    // the REMAINDER (1000 - standing) from the leftover rows under the
    // same salt reproduces the one-shot take at 1000 EXACTLY (the
    // prefix property — what makes daily top-ups sound)
    val a = df.filter(col("source") === "A")
    val standing = Mixing.tokenBudgetTake(a, Seq("source"), "doc_id", "nt", 400L)
    val standingIds = standing.select("doc_id").collect().map(_.getLong(0)).toSet
    val standingTok = standing.agg(sum("nt")).collect()(0).getLong(0)
    val leftover = a.filter(!col("doc_id").isin(standingIds.toSeq: _*))
    val topUp = Mixing.tokenBudgetTakeMixed(leftover, Seq("source"), "doc_id",
        "nt", Seq(("A", 1000L - standingTok)).toDF("source", "budget"), "budget")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val oneShot = Mixing.tokenBudgetTake(a, Seq("source"), "doc_id", "nt", 1000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert((standingIds ++ topUp) == oneShot,
      s"standing $standingIds + topup $topUp != oneshot $oneShot")

    // an explicit zero budget keeps nothing (vs absent = dropped too,
    // but listed-with-zero must not crash the window branch)
    val zeroed = Mixing.tokenBudgetTakeMixed(df, Seq("source"), "doc_id",
      "nt", Seq(("A", 0L)).toDF("source", "budget"), "budget")
    assert(zeroed.isEmpty)

    // duplicate stratum rows in the recipe would fan out the totals
    // join and silently duplicate every kept row — refused loudly
    val err = intercept[IllegalArgumentException] {
      Mixing.tokenBudgetTakeMixed(df, Seq("source"), "doc_id", "nt",
        Seq(("A", 1000L), ("A", 500L)).toDF("source", "budget"), "budget")
    }
    assert(err.getMessage.contains("duplicate stratum rows"))
  }

  test("tokenBudgetTakePrefiltered: exact at covering slack; under-coverage is a published metric") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // A: 5000 tokens vs budget 1000 (over-budget, prefilter bites);
    // B: 50 tokens (kept whole, never sorted)
    val rows = (0 until 50).map(i => (i.toLong, "A", 100L)) ++
      (0 until 5).map(i => (500L + i, "B", 10L))
    val df = rows.toDF("doc_id", "source", "nt")
    def ids(d: org.apache.spark.sql.DataFrame) =
      d.select("doc_id").collect().map(_.getLong(0)).toSet
    val exact = ids(Mixing.tokenBudgetTake(df, Seq("source"), "doc_id", "nt", 1000L))
    // slack 4: prefilter keeps ~80% of A's draw mass — covers the
    // budget, so the prefix property makes the take identical
    val fast = ids(Mixing.tokenBudgetTakePrefiltered(
      df, Seq("source"), "doc_id", "nt", 1000L, slack = 4.0))
    assert(fast == exact, s"prefiltered take diverged: $fast vs $exact")

    // slack 0.2 keeps ~4% of A — cannot cover 1000 tokens; the take
    // comes up short AND says so through the observed metric
    val metrics = new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.Row]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String, qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        qe.observedMetrics.foreach { case (k, v) => metrics.put(k, v) }
      override def onFailure(f: String, qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val starved = Mixing.tokenBudgetTakePrefiltered(
        df, Seq("source"), "doc_id", "nt", 1000L, slack = 0.2,
        metricName = "graft_tbp_test")
      val aTokens = starved.filter(col("source") === "A")
        .agg(coalesce(sum("nt"), lit(0L))).collect()(0).getLong(0)
      assert(aTokens < 1000L, s"starved slack still covered: $aTokens")
      val deadline = System.currentTimeMillis() + 10000
      while (!metrics.containsKey("graft_tbp_test") &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
      val m = metrics.get("graft_tbp_test")
      assert(m != null && m.getLong(0) >= 1L,
        s"under-coverage metric missing or zero: $m")
    } finally spark.listenerManager.unregister(listener)

    // recipe-form twin: exact vs tokenBudgetTakeMixed at covering
    // slack, absent strata still drop
    val budgets = Seq(("A", 1000L)).toDF("source", "budget")
    val exactMixed = ids(Mixing.tokenBudgetTakeMixed(
      df, Seq("source"), "doc_id", "nt", budgets, "budget"))
    val fastMixed = ids(Mixing.tokenBudgetTakeMixedPrefiltered(
      df, Seq("source"), "doc_id", "nt", budgets, "budget", slack = 4.0))
    assert(fastMixed == exactMixed, s"$fastMixed vs $exactMixed")
    assert(!fastMixed.exists(_ >= 500L), "stratum B is not in the recipe")
  }

  test("budget takes: null ids drop uniformly in exact and prefiltered forms, consuming no budget") {
    import spark.implicits._
    // a null id in an over-budget stratum: its unitHash is null, which
    // sorts FIRST in the ascending cumsum window — without the core's
    // null-id filter it would consume 900 of the 1000-token budget in
    // the exact form while the prefiltered twin drops it (null < theta
    // is never true), silently diverging the two takes
    val rows = (0 until 50).map(i => (Option(i.toLong), "A", 100L)) :+
      ((Option.empty[Long], "A", 900L))
    val df = rows.toDF("doc_id", "source", "nt")
    val clean = (0 until 50).map(i => (i.toLong, "A", 100L))
      .toDF("doc_id", "source", "nt")
    def ids(d: org.apache.spark.sql.DataFrame) =
      d.select("doc_id").collect().map(_.getLong(0)).toSet
    val exact = ids(Mixing.tokenBudgetTake(df, Seq("source"), "doc_id", "nt", 1000L))
    assert(exact == ids(Mixing.tokenBudgetTake(clean, Seq("source"), "doc_id", "nt", 1000L)),
      "null-id row changed the exact take")
    assert(exact == ids(Mixing.tokenBudgetTakePrefiltered(
        df, Seq("source"), "doc_id", "nt", 1000L, slack = 4.0)),
      "exact and prefiltered takes diverged on a null-id input")
    // the dropped mass also doesn't count toward the stratum total: a
    // stratum whose NON-null mass fits the budget is kept whole
    val small = Seq((Option(1L), "B", 50L), (Option(2L), "B", 40L),
      (Option.empty[Long], "B", 5000L)).toDF("doc_id", "source", "nt")
    assert(ids(Mixing.tokenBudgetTake(small, Seq("source"), "doc_id", "nt", 100L))
      == Set(1L, 2L), "null-id mass pushed a fitting stratum into the cut branch")
  }

  test("prefiltered take: a fully-emptied stratum registers in the coverage metrics") {
    import spark.implicits._
    // C has 3 docs whose draws (0.67, 0.71, 0.66) all exceed its theta
    // = slack*budget/tot = 3*10/3000 = 0.01 — the prefilter eliminates
    // EVERY row, so the cum==mass estimator sees nothing; the pre-
    // filter coverage observe must still flag it. A keeps survivors
    // (theta = 3*1000/5000 = 0.6).
    val rows = (0 until 50).map(i => (i.toLong, "A", 100L)) ++
      Seq((900L, "C", 1000L), (902L, "C", 1000L), (903L, "C", 1000L))
    val df = rows.toDF("doc_id", "source", "nt")
    val metrics = new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.Row]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String, qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        qe.observedMetrics.foreach { case (k, v) => metrics.put(k, v) }
      override def onFailure(f: String, qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val budgets = Seq(("A", 1000L), ("C", 10L)).toDF("source", "budget")
      val out = Mixing.tokenBudgetTakeMixedPrefiltered(df, Seq("source"),
        "doc_id", "nt", budgets, "budget", slack = 3.0,
        metricName = "graft_tbp_empty_test")
      assert(out.filter(col("source") === "C").count() == 0,
        "C's rows should all fall to the prefilter in this fixture")
      val deadline = System.currentTimeMillis() + 10000
      while (!metrics.containsKey("graft_tbp_empty_test_strata") &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
      val m = metrics.get("graft_tbp_empty_test_strata")
      assert(m != null, "coverage metrics never arrived")
      val overb = m.getAs[Long]("overbudget_strata_est")
      val surv = m.getAs[Long]("surviving_strata_est")
      assert(overb == 2L && surv == 1L,
        s"emptied stratum invisible: overbudget=$overb surviving=$surv")
    } finally spark.listenerManager.unregister(listener)
  }

  test("splitByGroup: groups land whole on one side; weights normalize; recuts nest; null groups drop") {
    import spark.implicits._
    // 200 groups x 3 members — the near-dup-cluster shape (every
    // member of a cluster must land on the same side)
    val docs = (0L until 600L).map(i => (i, i % 200L)).toDF("doc_id", "grp")
    val split = Mixing.splitByGroup(docs, "grp",
      Seq(("train", 0.5), ("val", 0.25), ("test", 0.25)))
    val perGroup = split.groupBy("grp")
      .agg(countDistinct(col("split")).as("k"), count(lit(1)).as("n"))
      .collect()
    assert(perGroup.forall(_.getLong(1) == 1L),
      "a group straddled the split — leakage")
    assert(perGroup.forall(_.getLong(2) == 3L) && perGroup.length == 200)
    // disjoint + exhaustive, and all three sides are populated
    val sides = split.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sides.keySet == Set("train", "val", "test"), s"$sides")
    assert(sides.values.sum == 600L)
    assert(math.abs(sides("train") / 600.0 - 0.5) < 0.15, s"$sides")
    // weights normalize: (2, 1, 1) is the same split as (.5, .25, .25)
    val renorm = Mixing.splitByGroup(docs, "grp",
      Seq(("train", 2.0), ("val", 1.0), ("test", 1.0)))
    assert(renorm.orderBy("doc_id").collect().map(_.getString(2)).toSeq ==
      split.orderBy("doc_id").collect().map(_.getString(2)).toSeq)
    // determinism under repartitioning (md5 draw, no RNG state)
    val reshuffled = Mixing.splitByGroup(docs.repartition(7), "grp",
      Seq(("train", 0.5), ("val", 0.25), ("test", 0.25)))
    assert(reshuffled.orderBy("doc_id").collect().map(_.getString(2)).toSeq ==
      split.orderBy("doc_id").collect().map(_.getString(2)).toSeq)
    // recuts NEST: growing train only moves the boundary, so no group
    // held out at 50% re-enters train at 70% unless its draw sits in
    // the moved band — concretely, train(50%) is a subset of
    // train(70%), and test-side groups never flip INTO train's old
    // region (eval contamination from a recut is impossible for
    // groups that stay held out)
    val wider = Mixing.splitByGroup(docs, "grp",
      Seq(("train", 0.7), ("val", 0.15), ("test", 0.15)))
    val train50 = split.filter(col("split") === "train")
      .select("doc_id").as[Long].collect().toSet
    val train70 = wider.filter(col("split") === "train")
      .select("doc_id").as[Long].collect().toSet
    assert(train50.subsetOf(train70), "recut broke the nesting property")
    // null groups have no draw: the rows drop (key-fill upstream)
    val withNull = docs.withColumn("grp",
      when(col("doc_id") < 3, lit(null)).otherwise(col("grp")))
    assert(Mixing.splitByGroup(withNull, "grp",
      Seq(("a", 1.0), ("b", 1.0))).count() == 597L)
    // guards: output collision (case-INSENSITIVE — withColumn resolves
    // case-insensitively and would silently clobber 'Split'),
    // duplicate names, non-positive weights
    intercept[IllegalArgumentException] {
      Mixing.splitByGroup(docs.withColumn("split", lit("x")), "grp",
        Seq(("a", 1.0)))
    }
    intercept[IllegalArgumentException] {
      Mixing.splitByGroup(docs.withColumn("Split", lit("x")), "grp",
        Seq(("a", 1.0)))
    }
    intercept[IllegalArgumentException] {
      Mixing.splitByGroup(docs, "grp", Seq(("a", 1.0), ("a", 2.0)))
    }
    intercept[IllegalArgumentException] {
      Mixing.splitByGroup(docs, "grp", Seq(("a", 0.0), ("b", 1.0)))
    }
  }
}
