package graft.operators

import graft.SparkSpecBase

/** Adversarial property harness for the batched-BPE acceptance rule.
  *
  * The round-7 self-merge episode showed that generic seeds miss
  * holes in a case-split proof: the failing corpora were SHAPED like
  * one specific case (self-merge runs). This suite fuzzes the REAL
  * acceptance scan (`Bpe.acceptBatch` — extracted unchanged from the
  * learn loop) through a pure-Scala learn loop at volumes a Spark
  * loop could never reach, with one corpus generator per case of the
  * equivalence proof's split:
  *
  *   - run-heavy: 1-2 char alphabets with long same-char runs, the
  *     self-merge regime (created (ss,s)/(ss,ss) pairs bounded only
  *     by the accepted pair's own count);
  *   - tie-storm: many equal-count words over a tiny alphabet, run
  *     under a TRUNCATED lookahead so tie groups straddle the scan
  *     boundary — the tie-group look-ahead guard's hardest case;
  *   - collision-prone: words concatenated from overlapping bigram
  *     patterns, stressing the live-symbol-collision close.
  *
  * Ground truth is an INDEPENDENT plain argmax-per-round sequential
  * learner (no shared code with the scan under test); the property
  * is batch-width invariance at every width. Default volume keeps CI
  * fast; `GRAFT_BPE_FUZZ_N` raises it to nightly scale (the r7 bug
  * reproduced at ~1.4 per 1000 corpora of its shape, so the default
  * already covers that regime several times over per shape). Anchor
  * cases pin the pure model against the real Spark learner, so the
  * fuzzed loop is the operator's loop, not a lookalike. */
class BpeFuzzSpec extends SparkSpecBase {

  import spark.implicits._

  private type Vocab = Vector[(Vector[String], Long)]

  private def toVocab(words: Seq[(String, Long)]): Vocab =
    words.map { case (w, c) => (w.map(_.toString).toVector :+ "</w>") -> c }.toVector

  private def pairCounts(vocab: Vocab): Map[(String, String), Long] = {
    val m = scala.collection.mutable.Map.empty[(String, String), Long]
    for ((syms, c) <- vocab; i <- 0 until syms.length - 1) {
      val k = (syms(i), syms(i + 1))
      m(k) = m.getOrElse(k, 0L) + c
    }
    m.toMap
  }

  /** (count desc, left asc, right asc) — the learner's total order. */
  private def rankedRows(counts: Map[(String, String), Long]): IndexedSeq[(String, String, Long)] =
    counts.toVector
      .map { case ((l, r), n) => (l, r, n) }
      .sortBy { case (l, r, n) => (-n, l, r) }

  /** The disjoint-batch fold (mergePairs' semantics): one
    * left-to-right non-overlapping pass; at most one pair can match
    * per position because an accepted batch is pairwise disjoint. */
  private def foldBatch(syms: Vector[String], pairs: Seq[(String, String)]): Vector[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    for (x <- syms) {
      if (pairs.exists { case (l, r) => out.nonEmpty && out.last == l && x == r })
        out(out.length - 1) = out.last + x
      else out += x
    }
    out.toVector
  }

  /** Independent sequential ground truth: plain argmax per round. */
  private def seqLearn(words: Seq[(String, Long)], numMerges: Int): Vector[(String, String, Long)] = {
    var vocab = toVocab(words)
    var out = Vector.empty[(String, String, Long)]
    var done = false
    while (out.length < numMerges && !done) {
      val counts = pairCounts(vocab)
      if (counts.isEmpty) done = true
      else {
        val (l, r, n) = rankedRows(counts).head
        out :+= ((l, r, n))
        vocab = vocab.map { case (s, c) => (foldBatch(s, Seq((l, r))), c) }
      }
    }
    out
  }

  /** Batched learner driving the REAL acceptance scan over
    * plain-Scala counts — the learn loop minus Spark. */
  private def batLearn(words: Seq[(String, Long)], numMerges: Int,
      batchMerges: Int, lookaheadOverride: Option[Int] = None): Vector[(String, String, Long)] = {
    var vocab = toVocab(words)
    val lookahead = lookaheadOverride.getOrElse(math.max(batchMerges * 4, 64))
    val liveSyms = scala.collection.mutable.Set[String]("</w>")
    var out = Vector.empty[(String, String, Long)]
    var done = false
    while (out.length < numMerges && !done) {
      val rows = rankedRows(pairCounts(vocab)).take(lookahead)
      if (rows.isEmpty) done = true
      else {
        val want = math.min(batchMerges, numMerges - out.length)
        val accepted = Bpe.acceptBatch(rows, want, lookahead, liveSyms)
        out ++= accepted
        val pairs = accepted.map(p => (p._1, p._2))
        vocab = vocab.map { case (s, c) => (foldBatch(s, pairs), c) }
      }
    }
    out
  }

  private def dedupWords(ws: Seq[(String, Long)]): Seq[(String, Long)] =
    ws.groupMapReduce(_._1)(_._2)(_ + _).toSeq.sortBy(_._1)

  // --- corpus shapes, one per proof case ---

  private def runHeavy(rnd: scala.util.Random): Seq[(String, Long)] = {
    val alpha = 1 + rnd.nextInt(2)
    dedupWords((0 until (3 + rnd.nextInt(6))).map { _ =>
      val len = 1 + rnd.nextInt(8)
      (0 until len).map(_ => ('a' + rnd.nextInt(alpha)).toChar).mkString ->
        (1L + rnd.nextInt(80))
    })
  }

  private def tieStorm(rnd: scala.util.Random): Seq[(String, Long)] = {
    val counts = Seq(1L, 2L, 5L)
    dedupWords((0 until (20 + rnd.nextInt(40))).map { _ =>
      val len = 2 + rnd.nextInt(4)
      (0 until len).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString ->
        counts(rnd.nextInt(counts.length))
    })
  }

  private def collisionProne(rnd: scala.util.Random): Seq[(String, Long)] = {
    val pats = Seq("ab", "ba", "aa", "b")
    dedupWords((0 until (5 + rnd.nextInt(8))).map { _ =>
      (0 until (1 + rnd.nextInt(4))).map(_ => pats(rnd.nextInt(pats.length))).mkString ->
        (1L + rnd.nextInt(50))
    })
  }

  test("fuzz: batched == sequential across the proof's adversarial corpus shapes") {
    val n = sys.env.get("GRAFT_BPE_FUZZ_N").map(_.toInt).getOrElse(4000)
    val shapes: Seq[(String, scala.util.Random => Seq[(String, Long)], Option[Int])] = Seq(
      ("run-heavy", runHeavy _, None),
      // lookahead truncated to 8 so tie groups STRADDLE the scan
      // boundary — only the truncation guard keeps this safe
      ("tie-storm", tieStorm _, Some(8)),
      ("collision", collisionProne _, None))
    var checked = 0
    for ((name, gen, la) <- shapes; c <- 0 until n) {
      val rnd = new scala.util.Random(c * 2654435761L + name.hashCode)
      val words = gen(rnd)
      val truth = seqLearn(words, 10)
      for (batch <- Seq(2, 5, 16)) {
        val got = batLearn(words, 10, batch, la)
        assert(got == truth,
          s"$name case $c batch $batch diverged\n  corpus=$words\n  truth=$truth\n  got=$got")
      }
      checked += 1
    }
    assert(checked == 3 * n)
  }

  test("anchors: the pure-model loop reproduces the Spark learner exactly") {
    // known counterexample corpora (the tie and self-merge regression
    // cases) plus seeded run-heavy draws: the pure fuzz loop and the
    // real operator must produce identical merge tables, or the fuzz
    // verdicts say nothing about the operator
    val anchors: Seq[Seq[(String, Long)]] =
      Seq(
        Seq("azq" -> 50L, "az" -> 50L, "mm" -> 50L),
        Seq("abbbbbb" -> 35L, "a" -> 42L)) ++
        (1 to 3).map(s => runHeavy(new scala.util.Random(s * 7919L)))
    for (words <- anchors; batch <- Seq(1, 4)) {
      val text = words.flatMap { case (w, c) => Seq.fill(c.toInt)(w) }.mkString(" ")
      val spark_ = Bpe.learn(Seq((1L, text)).toDF("doc_id", "text"),
          "text", numMerges = 6, batchMerges = batch)
        .merges.orderBy("rank").collect()
        .map(r => (r.getString(1), r.getString(2), r.getLong(4))).toVector
      val pure = batLearn(words, 6, batch)
      assert(spark_ == pure,
        s"anchor $words batch $batch: spark=$spark_ pure=$pure")
      // and both equal the independent sequential truth
      assert(pure == seqLearn(words, 6))
    }
  }
}
