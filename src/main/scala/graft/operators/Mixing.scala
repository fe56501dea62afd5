package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data mixing: realize per-source (or per-domain) sampling
  * weights over a corpus. A mix weight w means each document
  * contributes w expected copies to the epoch — w <= 1 subsamples a
  * source, w > 1 oversamples it (floor(w) guaranteed copies plus a
  * Bernoulli(frac(w)) extra).
  *
  * Randomness is DETERMINISTIC: the uniform is derived from md5 of
  * the id column, so the mix is reproducible run-to-run, stable under
  * repartitioning (no RNG-per-partition seed coupling, unlike
  * df.sample), and auditable — the same doc always makes the same
  * draw. Everything is map-side (hash, compare, explode) with no
  * shuffle introduced; copies multiply BEFORE any downstream shuffle
  * so they spread across the cluster with the scan partitioning.
  */
object Mixing {

  /** Deterministic uniform in [0,1): the first 8 hex chars of
    * md5(id || salt) scaled by 2^32. Engine-portable (any SQL dialect
    * with md5 reproduces it bit-for-bit).
    *
    * CORRELATION HAZARD: two draws over the same ids with the same
    * salt are the SAME draw — composing two unsalted samplers keeps
    * exactly the rows whose single shared uniform clears both
    * thresholds (e.g. sample(0.25) then mix(1.5) gives every survivor
    * 2 copies, not an average of 1.5). Give each independent stage
    * its own salt. */
  def unitHash(id: Column, salt: String = ""): Column =
    conv(substring(md5(
      if (salt.isEmpty) id.cast("string")
      else concat(id.cast("string"), lit(salt))), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)

  /** One epoch of the mix: each row yields
    * `floor(w) + Bernoulli(frac(w))` copies, tagged 0-based in
    * `epoch`; rows drawing zero copies drop. `weight` may be any
    * numeric expression (a literal, a joined mix-table column, a
    * per-row quality score).
    *
    * NULL-id rule, uniform across every draw-based operator here
    * (weightedMix, stratifiedSample, shuffle, the budget takes): a
    * null id has no draw (unitHash(null) is null, and a null
    * comparison is never true), so the row DROPS. Filter or key-fill
    * null ids upstream if they must participate — a silent
    * "floor(w) copies, Bernoulli never fires" half-rule would be a
    * deterministic mix bias that no error ever surfaces. */
  def weightedMix(df: DataFrame, idCol: String, weight: Column,
      epochOut: String = "epoch", salt: String = ""): DataFrame = {
    val clash = df.columns.toSeq.intersect(Seq("_copies", epochOut))
    require(clash.isEmpty,
      s"input columns ${clash.mkString(",")} collide with weightedMix's working/output names; rename them or pass a different epochOut")
    val w = weight.cast("double")
    val copies = (floor(w) +
      when(unitHash(col(idCol), salt) < w - floor(w), 1).otherwise(0)).cast("int")
    df.filter(col(idCol).isNotNull)
      .withColumn("_copies", copies)
      .filter(col("_copies") > 0)
      .withColumn(epochOut, explode(sequence(lit(0), col("_copies") - 1)))
      .drop("_copies")
  }

  /** Deterministic stratified sampling: keep a row iff its md5-uniform
    * falls below `rate` (any per-row expression in [0,1] — typically a
    * per-stratum rate joined or computed from a stratum column). The
    * `weightedMix` degenerate case for w <= 1, kept as its own verb
    * because downsampling-by-strata is the everyday corpus-balancing
    * call: pure map-side filter, no shuffle, no RNG state, stable
    * under repartitioning, and the same row always makes the same
    * draw (audit-friendly and incremental-run-friendly). */
  def stratifiedSample(df: DataFrame, idCol: String, rate: Column,
      salt: String = ""): DataFrame =
    df.filter(unitHash(col(idCol), salt) < rate.cast("double"))

  /** Deterministic global shuffle — the training-order pass: rows
    * ordered by their md5-uniform (ties by id). Spark's range-
    * partitioned sort distributes it (sampled range boundaries, one
    * shuffle); the order is a pure function of the ids, so every
    * rerun, resume, and engine reproduces the same epoch order —
    * unlike an RNG shuffle, which silently changes under
    * repartitioning. Salt with an epoch tag (`unitHash(concat(id,
    * lit(epoch)))`) for a different-but-reproducible order per
    * epoch. */
  def deterministicShuffle(df: DataFrame, idCol: String,
      salt: String = ""): DataFrame =
    df.orderBy(unitHash(col(idCol), salt), col(idCol))

  /** Leakage-safe deterministic split: label every row with one of the
    * named splits (("train", 0.9), ("val", 0.05), ("test", 0.05)) by
    * ONE md5-uniform draw over `groupCol` — every row sharing a group
    * value lands on the SAME side. That group is the whole point:
    * split on the near-dup CLUSTER id (`Dedup.duplicateClusters`
    * label, coalesced to the doc's own id for singletons), the url
    * domain, or the conversation/thread id, and a held-out document's
    * near-twin can never leak into train — an id-hashed split leaks
    * exactly those twins, which is how eval scores go quietly stale.
    * Weights normalize by their sum (9/1 and 0.9/0.1 are the same
    * split); sides are disjoint and exhaustive by construction
    * (cumulative thresholds on one draw), and REBALANCING NESTS the
    * way every md5 draw here does: growing train's fraction only
    * MOVES the boundary, so no group swaps sides unless its draw sits
    * in the moved band — eval contamination from a recut is
    * impossible for groups that stay held out.
    *
    * Null-group rule, same as every draw here: a null group has no
    * draw, so the row DROPS — key-fill upstream (coalesce the cluster
    * label with the doc id) rather than letting unclustered rows
    * vanish. Pure map-side (hash + compare), no shuffle; the draw
    * replays in any engine with md5.
    *
    * Stability across corpus GROWTH is only as stable as the group
    * label: `duplicateClusters` labels are the component's min id,
    * which never moves under append-only ingestion with monotone ids
    * — EXCEPT when a new doc BRIDGES two existing clusters, merging
    * them under the smaller min; the absorbed cluster's rows then
    * redraw under the new label and may flip sides. That flip is the
    * honest outcome (the merge asserts those docs are near-dups of
    * the other side — keeping them split would itself be leakage),
    * but sides are only append-stable modulo merges; pin the split
    * assignment at cut time (persist doc_id → split) when training
    * reproducibility demands it. */
  def splitByGroup(df: DataFrame, groupCol: String,
      splits: Seq[(String, Double)], outCol: String = "split",
      salt: String = ""): DataFrame = {
    require(splits.nonEmpty, "splits must name at least one side")
    require(splits.forall(_._2 > 0),
      s"split weights must be positive, got ${splits.map(_._2).mkString(",")}")
    val names = splits.map(_._1)
    require(names.distinct.size == names.size,
      s"duplicate split names: ${names.mkString(",")}")
    // case-INSENSITIVE: withColumn resolves names case-insensitively
    // under Spark's default, so a column differing only in case would
    // be silently replaced — refuse it regardless of the session's
    // caseSensitive setting (conservative for the rare sensitive
    // session, where the caller can still pick another outCol)
    require(!df.columns.exists(_.equalsIgnoreCase(outCol)),
      s"input column '$outCol' collides with the split label; pass a different outCol")
    val total = splits.map(_._2).sum
    val cums = splits.map(_._2).scanLeft(0.0)(_ + _).tail.map(_ / total)
    val u = unitHash(col(groupCol), salt)
    // the LAST side is the otherwise-branch: it owns [c_{k-1}, 1) plus
    // any floating-point sliver at the top, so the labeling is total
    val labeled = names.init.zip(cums.init).foldRight(lit(names.last)) {
      case ((n, c), acc) => when(u < lit(c), lit(n)).otherwise(acc)
    }
    df.filter(col(groupCol).isNotNull).withColumn(outCol, labeled)
  }

  /** Temperature-scaled source weights — the standard multi-source /
    * multilingual re-balancing (sample source i with probability
    * q_i ∝ p_i^alpha, alpha in (0, 1]: alpha = 1 keeps natural
    * proportions, alpha → 0 approaches uniform over sources, lifting
    * low-resource sources). Returns one row per source:
    * (sourceCol, n, q, weight) where `weight = budget·q_i / n_i` is
    * the per-document expected copy count realizing the mix at
    * `budget` total expected rows — > 1 means the source OVERSAMPLES
    * (the whole point for small sources), which `weightedMix`
    * realizes with floor+Bernoulli copies.
    *
    * Scale: one source-keyed census (map-side partial count), a
    * one-row normalizer literal — the weight table is
    * sources-sized (dozens), never corpus-sized. */
  def temperatureWeights(docs: DataFrame, sourceCol: String,
      alpha: Double, budget: Long): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    require(budget > 0, s"budget must be positive, got $budget")
    val counts = docs.groupBy(sourceCol).agg(count(lit(1)).cast("double").as("_n"))
    val z = counts.agg(sum(pow(col("_n"), alpha)).as("_z"))
    counts.crossJoin(broadcast(z))
      .select(col(sourceCol), col("_n").cast("bigint").as("n"),
        (pow(col("_n"), alpha) / col("_z")).as("q"),
        (pow(col("_n"), alpha) / col("_z") * budget / col("_n")).as("weight"))
  }

  /** Realize the temperature mix: every doc draws
    * floor(w) + Bernoulli(frac(w)) copies of its source's temperature
    * weight (md5-uniform — deterministic, repartition-stable). The
    * sources-sized weight table broadcasts back onto the corpus; the
    * realization is the same map-side explode as `weightedMix`. */
  def temperatureMix(docs: DataFrame, sourceCol: String, idCol: String,
      alpha: Double, budget: Long, epochOut: String = "epoch",
      salt: String = ""): DataFrame = {
    val clash = docs.columns.toSeq.intersect(Seq("_src", "_w"))
    require(clash.isEmpty,
      s"input columns ${clash.mkString(",")} collide with temperature-mix internal names; rename them first")
    val wt = broadcast(
      temperatureWeights(docs, sourceCol, alpha, budget)
        .select(col(sourceCol).as("_src"), col("weight").as("_w")))
    // null-safe join: a null source is a stratum like any other (the
    // census groups it), so its rows must pick up their weight rather
    // than silently dropping on a null equi-key mismatch
    weightedMix(docs.join(wt, col(sourceCol) <=> col("_src")),
        idCol, col("_w"), epochOut, salt)
      .drop("_src", "_w")
  }

  /** Exactly-k-per-stratum deterministic sample: the k rows with the
    * smallest md5-uniform within each stratum. Rate-based sampling
    * (`stratifiedSample`) leaves stratum sizes binomially distributed;
    * this pins them exactly — the "give me 10k docs per language"
    * call. Selection rides the bounded `top_k` heap aggregate
    * (ord = -uniform), so no stratum is ever fully sorted and the
    * selection shuffle carries at most k ids per stratum per map
    * task; survivors come back via a semi-join on the id. Like every
    * md5-uniform draw: reproducible, repartition-stable, and nested —
    * the k=10 sample is a prefix of the k=20 sample. */
  def stratifiedTake(df: DataFrame, strataCols: Seq[String], idCol: String,
      k: Int, salt: String = ""): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val picked = df
      .groupBy(strataCols.map(col): _*)
      .agg(graft.functions.TopKAgg.topK(
        -unitHash(col(idCol), salt), col(idCol), k).as("_t"))
      .select(explode(col("_t")).as("_e"))
      .select(col("_e.payload").as(idCol))
    df.join(picked, Seq(idCol), "left_semi")
  }

  /** Token-budget sample per stratum: keep rows, in md5-uniform draw
    * order, until each stratum's running TOKEN total reaches `budget`
    * — the "50B tokens of every source" call. Training mixes are
    * specified in tokens; doc-count knobs (`stratifiedTake`) cannot
    * hit a token target when doc lengths vary by orders of magnitude.
    * The boundary row that crosses the budget is KEPT (greedy
    * inclusion: the output is nonempty whenever the stratum is, and
    * the kept total overshoots by at most one document — truncate or
    * drop downstream if a hard ceiling outranks nonemptiness). Like
    * every md5 draw: reproducible, repartition-stable, and NESTED —
    * the 10B-token sample is a prefix of the 50B one under the same
    * salt. Rows with a NULL token count drop (they cannot be
    * budgeted); counts must be non-negative (a negative count breaks
    * the running total's monotonicity and the prefix property with
    * it).
    *
    * Cost shape: one tiny per-stratum total (broadcast back), then a
    * window cumsum ONLY over strata that exceed the budget — a
    * stratum at or under budget is kept whole without sorting
    * anything. At 100 TB, when a stratum dwarfs its budget, bound the
    * sort by pre-filtering with the SAME salt at a draw threshold
    * ~ slack·budget/stratumTokens before calling this: the prefix
    * property makes the composition exact whenever the prefiltered
    * mass still covers the budget (and over-covering is guaranteed in
    * expectation by the slack). */
  def tokenBudgetTake(df: DataFrame, strataCols: Seq[String], idCol: String,
      tokenCol: String, budget: Long, salt: String = ""): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    tokenBudgetCore(df, strataCols, idCol, tokenCol, salt)(
      _.withColumn("_budget", lit(budget)))
  }

  /** Per-stratum-budget variant of `tokenBudgetTake` — the shape a
    * real mix recipe has ("web 50B, code 20B, wiki 5B"): `budgets`
    * maps strata to token budgets (strataCols + `budgetCol`, one row
    * per stratum — tiny by definition, broadcast). Strata ABSENT from
    * the recipe are DROPPED (no budget = not in the mix; list a
    * stratum explicitly to keep it), which is also what makes the
    * incremental top-up a pure composition: pass
    * recipe_budget − standing_kept_tokens as the budgets frame and
    * only the remainder is drawn from the new batch — the md5 draw's
    * prefix property guarantees the union of standing picks and
    * top-up picks is EXACTLY what one full-corpus take at the recipe
    * budget would have chosen, provided standing picks used the same
    * salt. Same draw order, boundary rule, NULL-stratum and
    * NULL-token-count semantics as the scalar form. */
  def tokenBudgetTakeMixed(df: DataFrame, strataCols: Seq[String], idCol: String,
      tokenCol: String, budgets: DataFrame, budgetCol: String,
      salt: String = ""): DataFrame =
    tokenBudgetCore(df, strataCols, idCol, tokenCol, salt)(
      attachRecipe(strataCols, budgets, budgetCol))

  /** Shared recipe-attach for the Mixed forms: aliases the budgets
    * frame's stratum columns (both sides carry the names, a bare one
    * would be ambiguous), refuses duplicate stratum rows loudly (they
    * would fan out the totals join and silently duplicate every kept
    * row — the recipe frame is tiny by contract, so the eager check
    * is one trivial job), inner-joins (strata missing from the recipe
    * DROP — the not-in-the-mix rule) and drops non-positive budgets
    * (an explicit zero keeps nothing). */
  private def attachRecipe(strataCols: Seq[String], budgets: DataFrame,
      budgetCol: String): DataFrame => DataFrame = { totals =>
    val b = budgets.select(
      strataCols.map(c => col(c).as(s"_b_$c")) :+
        col(budgetCol).cast("long").as("_budget"): _*)
    val dup = b.groupBy(strataCols.map(c => col(s"_b_$c")): _*)
      .count().filter(col("count") > 1).limit(1).count()
    require(dup == 0,
      "tokenBudgetTakeMixed: budgets frame has duplicate stratum rows; " +
        "one budget row per stratum required")
    totals
      .join(broadcast(b),
        strataCols.map(c => col(c) <=> col(s"_b_$c")).reduce(_ && _))
      .drop(strataCols.map(c => s"_b_$c"): _*)
      .filter(col("_budget") > 0)
  }

  /** Big-stratum fast path for `tokenBudgetTake` — the SCALE.md
    * prefilter recipe as an operator. When a stratum dwarfs its
    * budget (a 50B-token web crawl sampled to 1B), the window cumsum
    * still sorts the WHOLE stratum; here over-budget strata first
    * prefilter to rows whose draw < slack·budget/stratumTokens —
    * expected surviving mass = slack × budget — and only the
    * survivors sort. Because the prefilter keeps a PREFIX of the
    * same md5 draw order, the result is EXACTLY `tokenBudgetTake`'s
    * whenever the surviving mass still covers the budget (the prefix
    * property; at `slack` = 4 the non-coverage probability is
    * Chernoff-negligible for any budget ≫ one doc). Non-coverage is
    * not silent: `undercovered_strata_est` is published as an
    * observed metric (cum ties can overcount, hence _est) — a
    * non-zero value means that stratum's take stopped short of
    * budget and `slack` should be raised. Under-budget strata are
    * kept whole without sorting, exactly as in the exact form. */
  def tokenBudgetTakePrefiltered(df: DataFrame, strataCols: Seq[String],
      idCol: String, tokenCol: String, budget: Long, slack: Double = 4.0,
      salt: String = "",
      metricName: String = "graft_token_budget_prefilter"): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    tokenBudgetCore(df, strataCols, idCol, tokenCol, salt,
      prefilter = Some((slack, metricName)))(
      _.withColumn("_budget", lit(budget)))
  }

  /** Recipe-form twin of `tokenBudgetTakePrefiltered` — the fast path
    * under `tokenBudgetTakeMixed`'s per-stratum budgets frame, with
    * the same not-in-the-recipe drop rule, duplicate-recipe refusal,
    * prefix-exactness-at-covering-slack guarantee, and
    * `undercovered_strata_est` observed metric. */
  def tokenBudgetTakeMixedPrefiltered(df: DataFrame, strataCols: Seq[String],
      idCol: String, tokenCol: String, budgets: DataFrame, budgetCol: String,
      slack: Double = 4.0, salt: String = "",
      metricName: String = "graft_token_budget_prefilter"): DataFrame =
    tokenBudgetCore(df, strataCols, idCol, tokenCol, salt,
      prefilter = Some((slack, metricName)))(
      attachRecipe(strataCols, budgets, budgetCol))

  /** Shared budget-take core: `attachBudget` appends a long `_budget`
    * column to the per-stratum totals frame (a literal for the scalar
    * form, a recipe join for the mixed form). `prefilter`, when set to
    * (slack, metricName), applies the big-stratum fast path to the
    * over-budget branch: keep only rows with draw <
    * slack·budget/stratumTokens before the window cumsum, and publish
    * `undercovered_strata_est` when a stratum's surviving mass missed
    * its budget — ONE core, so the null-safe stratum join and the
    * whole/cut branch logic cannot drift between the exact and
    * prefiltered forms. */
  private def tokenBudgetCore(df: DataFrame, strataCols: Seq[String],
      idCol: String, tokenCol: String, salt: String,
      prefilter: Option[(Double, String)] = None)(
      attachBudget: DataFrame => DataFrame): DataFrame = {
    require(strataCols.nonEmpty, "tokenBudgetTake needs at least one stratum column")
    prefilter.foreach { case (slack, _) =>
      require(slack > 0, s"slack must be positive, got $slack") }
    val keyAliases = strataCols.map(c => s"_k_$c")
    val clash = df.columns.toSeq
      .intersect("_tot" +: "_cum" +: "_mass" +: "_surv" +: "_budget" +: keyAliases)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(",")} collide with tokenBudgetTake's working names")
    // the uniform NULL-id drop rule (see weightedMix), enforced HERE so
    // the exact and prefiltered forms cannot diverge: without it a null
    // unitHash draw sorts FIRST in the exact branch's ascending cumsum
    // window (nulls-first) and consumes budget ahead of every real row,
    // while the prefiltered twin drops the same row (null < theta is
    // never true) — breaking the prefix-exactness guarantee. Dropped
    // rows are also excluded from the stratum totals: a row that can
    // never be taken must not count toward the whole/cut branch choice.
    val rows = df.filter(col(idCol).isNotNull)
    val totals = attachBudget(
      rows.groupBy(strataCols.map(col): _*).agg(sum(col(tokenCol)).as("_tot")))
      .select(strataCols.map(c => col(c).as(s"_k_$c")) ++
        Seq(col("_tot"), col("_budget")): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCols.map(col): _*)
      .orderBy(unitHash(col(idCol), salt), col(idCol))
    // null-safe stratum keys: a NULL stratum (missing metadata) is a
    // stratum like any other and gets its own budget — an equi-join
    // here would silently vanish the whole NULL group, the exact
    // failure stratifiedTake's id-keyed semi-join doesn't have
    val joined = rows.filter(col(tokenCol).isNotNull)
      .join(broadcast(totals),
        strataCols.map(c => col(c) <=> col(s"_k_$c")).reduce(_ && _))
      .drop(keyAliases: _*)
    // two real branches, not a when(): a conditional window expression
    // would still sort every row — the union keeps under-budget strata
    // out of the window's input entirely
    val whole = joined.filter(col("_tot") <= col("_budget"))
      .drop("_tot", "_budget")
    val over = joined.filter(col("_tot") > col("_budget"))
    val cut = prefilter match {
      case None => over
        .withColumn("_cum", sum(col(tokenCol)).over(w))
        .filter(col("_cum") - col(tokenCol) < col("_budget"))
        .drop("_tot", "_budget", "_cum")
      case Some((slack, metricName)) =>
        val wAll = org.apache.spark.sql.expressions.Window
          .partitionBy(strataCols.map(col): _*)
        // the `_cum === _mass` undercoverage estimator below can only
        // see strata that kept AT LEAST ONE row — a stratum whose
        // prefilter eliminated every draw (small doc count, unlucky
        // draws: the SEVEREST undercoverage) emits zero rows and zero
        // metric. So the survival marker is observed BEFORE the filter,
        // where emptied strata are still visible: a gap between
        // overbudget_strata_est and surviving_strata_est flags them
        // (HLL-approximate, hence _est — exact counting would need a
        // distinct aggregate observe cannot carry or a full-stratum
        // window that would defeat the fast path)
        val strataKey = concat_ws("\u0001",
          strataCols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*)
        over
          .withColumn("_surv", unitHash(col(idCol), salt) <
            lit(slack) * col("_budget") / col("_tot"))
          .observe(s"${metricName}_strata",
            approx_count_distinct(strataKey).as("overbudget_strata_est"),
            approx_count_distinct(when(col("_surv"), strataKey))
              .as("surviving_strata_est"))
          .filter(col("_surv")).drop("_surv")
          .withColumn("_cum", sum(col(tokenCol)).over(w))
          .withColumn("_mass", max(col("_cum")).over(wAll))
          .observe(metricName,
            coalesce(sum(when(col("_cum") === col("_mass") &&
              col("_mass") < col("_budget"), 1).otherwise(0)), lit(0L))
              .as("undercovered_strata_est"))
          .filter(col("_cum") - col(tokenCol) < col("_budget"))
          .drop("_tot", "_cum", "_mass", "_budget")
    }
    whole.unionByName(cut)
  }
}
