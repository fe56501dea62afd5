package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Property test: banded-LSH candidate recall follows the analytic
  * s-curve P(s) = 1 - (1 - s^r)^b.
  *
  * Corpus construction gives each pair an exact, private Jaccard: two
  * L-token docs share an m-token prefix (unique vocab per pair), so
  * the shared 3-shingles are exactly m-2 of the L-2 per doc and
  * J = (m-2) / (2(L-2) - (m-2)). The hash family is fixed (seeded
  * md5), but each pair's disjoint vocabulary makes its collision
  * events effectively independent draws, so across 200 pairs the
  * empirical candidate rate must sit on the curve (binomial sd
  * < 0.036 at n=200 -> ±0.11 is a 3-sigma gate). */
class LshCalibrationSpec extends SparkSpecBase {

  private val L = 22 // tokens per doc -> 20 distinct shingles
  private val pairsPerLevel = 200
  private val sharedShingleCounts = Seq(5, 10, 14, 17, 19)

  private def jaccardOf(c: Int): Double = c.toDouble / (2 * (L - 2) - c)
  private def sCurve(s: Double, r: Int, b: Int): Double =
    1.0 - math.pow(1.0 - math.pow(s, r), b)

  test("candidate recall tracks the analytic s-curve (k=16, r=4, b=4)") {
    import spark.implicits._
    val docs = for {
      (c, level) <- sharedShingleCounts.zipWithIndex
      pair <- 0 until pairsPerLevel
      side <- 0 to 1
    } yield {
      val m = c + 2 // shared-prefix tokens
      val prefix = (0 until m).map(k => s"p${level}_${pair}_$k")
      val suffix = (0 until (L - m)).map(k => s"s${side}_${level}_${pair}_$k")
      val id = (level.toLong << 32) | (pair.toLong << 1) | side.toLong
      (id, (prefix ++ suffix).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val found = Dedup.minhashNearDupCandidates(df, "text", "doc_id",
        shingleN = 3, numHashes = 16, rowsPerBand = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val rates = sharedShingleCounts.zipWithIndex.map { case (c, level) =>
      val hits = (0 until pairsPerLevel).count { pair =>
        val a = (level.toLong << 32) | (pair.toLong << 1)
        found.contains((a, a | 1L)) || found.contains((a | 1L, a))
      }
      val s = jaccardOf(c)
      val expected = sCurve(s, r = 4, b = 4)
      val empirical = hits.toDouble / pairsPerLevel
      assert(math.abs(empirical - expected) < 0.11,
        f"s=$s%.3f: empirical $empirical%.3f vs analytic $expected%.3f")
      empirical
    }
    // the curve must be monotone in s
    assert(rates == rates.sorted, s"recall not monotone: $rates")
    // and span the curve: near-zero at the bottom, near-one at the top
    assert(rates.head < 0.1 && rates.last > 0.9)
  }

  test("threshold helper matches the curve's 50% crossing") {
    // t = (1/b)^(1/r); P(t) is ~0.5 by construction for moderate b
    val t = Dedup.lshThreshold(16, 4)
    assert(math.abs(t - math.pow(0.25, 0.25)) < 1e-12)
    val p = sCurve(t, 4, 4)
    assert(p > 0.5 && p < 0.75) // 1-(1-1/b)^b rises toward 1-1/e
    intercept[IllegalArgumentException](Dedup.lshThreshold(10, 4))
  }

  test("planLsh picks the tightest recall-safe config under the hash budget") {
    // the returned config must (a) be valid, (b) sit at or below the
    // target, and (c) dominate every other valid config on
    // (threshold desc, hashes asc, rows asc)
    for (target <- Seq(0.3, 0.5, 0.7, 0.85, 0.95); maxK <- Seq(16, 64, 128)) {
      val (k, r) = Dedup.planLsh(target, maxK)
      assert(k % r == 0 && k <= maxK, s"invalid config ($k, $r) under $maxK")
      val t = Dedup.lshThreshold(k, r)
      assert(t <= target + 1e-12,
        f"threshold $t%.4f above target $target for ($k, $r)")
      val better = for {
        r2 <- 1 to maxK; b2 <- 1 to maxK / r2; k2 = r2 * b2
        t2 = Dedup.lshThreshold(k2, r2)
        if t2 <= target && (t2 > t + 1e-12 ||
          (math.abs(t2 - t) <= 1e-12 && (k2 < k || (k2 == k && r2 < r))))
      } yield (k2, r2, t2)
      assert(better.isEmpty, s"($k, $r, $t) dominated by ${better.take(3)}")
    }
    // the doc-table row: target 0.7 within 4 hashes -> (4, 2) at t=0.71?
    // no — 0.71 > 0.7, so the planner must step DOWN, never up
    val (k07, r07) = Dedup.planLsh(0.7, 4)
    assert(Dedup.lshThreshold(k07, r07) <= 0.7)
    // degenerate budgets still resolve (b single-row bands) or fail loudly
    assert(Dedup.planLsh(1.0, 1) == (1, 1))
    intercept[IllegalArgumentException](Dedup.planLsh(0.4, 2))
    intercept[IllegalArgumentException](Dedup.planLsh(0.0))
  }
}
