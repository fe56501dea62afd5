package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Seeded property sweep for the serving-stack rankers: rrfFuse and
  * mmrRerank pinned against driver-side references that re-derive
  * each operator's CONTRACT (the fusion sum + rounded rank cut; the
  * greedy walk with its rounding and tie rules) on randomized
  * shortlists — any aggregation/window/walk mistake diverges. The
  * references mirror the operators' exact arithmetic (same op order,
  * same HALF_UP rounding), so equality is bitwise, not approximate. */
class RetrievalPropertySpec extends SparkSpecBase {

  import spark.implicits._

  private val rounds = 6

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  test("rrfFuse == contract reference on random rankings (weighted and not)") {
    val rnd = new scala.util.Random(31337)
    for (round <- 0 until rounds) {
      val nLists = 2 + rnd.nextInt(2)
      val queries = (0 until 3).map(_.toLong)
      // each list: a permutation-ranked sample of ids per query
      val lists = (0 until nLists).map { _ =>
        queries.flatMap { q =>
          val idsHere = rnd.shuffle((0 until 30).map(_.toLong).toList)
            .take(3 + rnd.nextInt(8))
          idsHere.zipWithIndex.map { case (id, i) => (q, id, i + 1) }
        }
      }
      val k0 = 40 + rnd.nextInt(40)
      val k = 3 + rnd.nextInt(8)
      val weights = if (rnd.nextBoolean())
        Some((0 until nLists).map(_ => 0.5 + rnd.nextDouble() * 3.0))
      else None
      val got = Similarity.rrfFuse(
          lists.map(_.toDF("qid", "doc_id", "rank")), "qid", "doc_id",
          "rank", k = k, k0 = k0, weights = weights)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet
      // reference: per (q, id), sum w_i/(k0 + rank_i) over the lists
      // containing it, rounded 6; cut top-k by (score desc, id asc)
      val scores = lists.zipWithIndex
        .flatMap { case (l, li) =>
          l.map { case (q, id, r) =>
            ((q, id),
              weights.fold(1.0)(_(li)) / (k0 + r)) } }
        .groupBy(_._1)
        .map { case ((q, id), xs) => (q, id, round6(xs.map(_._2).sum)) }
      val want = scores.groupBy(_._1).flatMap { case (q, rs) =>
        rs.toSeq.sortBy(t => (-t._3, t._2)).take(k).zipWithIndex
          .map { case ((_, id, s), i) => (q, id, s, i + 1) }
      }.toSet
      assert(got == want, s"round $round k=$k k0=$k0 w=$weights: " +
        s"extra ${got.diff(want)}, missing ${want.diff(got)}")
    }
  }

  test("mmrRerank == contract reference greedy walk on random shortlists") {
    val rnd = new scala.util.Random(8086)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    for (round <- 0 until rounds) {
      val dims = 3 + rnd.nextInt(3)
      val embs = (0 until 25).map(id => id.toLong ->
        Array.fill(dims)(rnd.nextDouble() * 2 - 1)).toMap
      val store = embs.toSeq.map { case (id, e) => (id, e.toSeq) }
        .toDF("vec_id", "e")
      val shortRows = (0 until 3).flatMap { q =>
        rnd.shuffle(embs.keys.toList).take(6 + rnd.nextInt(6))
          .map(id => (q.toLong, id, round6(rnd.nextDouble())))
      }
      val k = 2 + rnd.nextInt(4)
      val lambda = rnd.nextInt(11) / 10.0
      val got = Similarity.mmrRerank(shortRows.toDF("qid", "vec_id", "cos"),
          "qid", "vec_id", "cos", store, "vec_id", "e", k = k, lambda = lambda)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
      // reference walk, mirroring the operator's arithmetic exactly
      val want = shortRows.groupBy(_._1).flatMap { case (q, rs) =>
        val order = rs.sortBy(t => (-t._3, t._2)).toVector
        val n = order.length
        val taken = Array.fill(n)(false)
        val maxSim = Array.fill(n)(Double.NegativeInfinity)
        val picks = scala.collection.mutable.ArrayBuffer.empty[Int]
        while (picks.length < math.min(k, n)) {
          var best = -1; var bs = Double.NegativeInfinity
          for (i <- 0 until n if !taken(i)) {
            val pen = if (picks.isEmpty) 0.0
              else (1.0 - lambda) * math.max(maxSim(i), 0.0)
            val s = lambda * order(i)._3 - pen
            if (s > bs) { best = i; bs = s }
          }
          picks += best; taken(best) = true
          for (j <- 0 until n if !taken(j)) {
            val s = cos(embs(order(best)._2), embs(order(j)._2))
            if (!s.isNaN) {
              val r6 = round6(s)
              if (r6 > maxSim(j)) maxSim(j) = r6
            }
          }
        }
        picks.zipWithIndex.map { case (i, r) => (q, order(i)._2, r + 1) }
      }.toSet
      assert(got == want, s"round $round k=$k lambda=$lambda: " +
        s"extra ${got.diff(want)}, missing ${want.diff(got)}")
    }
  }
}
