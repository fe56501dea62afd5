package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Seeded property sweep for the token-budget take family: every form
  * is pinned against a driver-side reference that re-derives the
  * CONTRACT — the md5 draw, the (draw, id) order, the whole-stratum
  * branch, the boundary-kept cut, the recipe drop rule — not the
  * plan, so any window/join/branch mistake diverges on some random
  * corpus. The prefiltered forms are checked coverage-aware: when the
  * reference says the slack covers, the take must be EXACTLY the
  * exact form's; when it does not, the take must be the survivor
  * prefix (a subset of the exact take) — never something else. */
class MixingPropertySpec extends SparkSpecBase {

  import spark.implicits._

  private val rounds = 6

  /** Driver-side unitHash twin: first 8 hex chars of md5(id) / 2^32. */
  private def draw(id: Long): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(id.toString.getBytes("UTF-8"))
    val hex = d.take(4).map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
  }

  private def corpus(rnd: scala.util.Random): Seq[(Long, String, Long)] = {
    val nStrata = 3 + rnd.nextInt(3)
    (0 until nStrata).flatMap { s =>
      val n = 15 + rnd.nextInt(25)
      (0 until n).map(i =>
        (s * 1000L + i + rnd.nextInt(3) * 10000L + i, s"s$s",
          1L + rnd.nextInt(50)))
    }.distinctBy(_._1)
  }

  /** Contract reference: per-stratum, whole if total <= budget, else
    * the (draw, id)-ordered prefix with the boundary row kept. */
  private def refTake(rows: Seq[(Long, String, Long)],
      budgets: Map[String, Long]): Set[Long] =
    rows.groupBy(_._2).flatMap { case (src, rs) =>
      budgets.get(src) match {
        case None => Nil
        case Some(b) if b <= 0 => Nil
        case Some(b) =>
          val tot = rs.map(_._3).sum
          if (tot <= b) rs.map(_._1)
          else {
            var cum = 0L
            rs.sortBy(r => (draw(r._1), r._1)).takeWhile { r =>
              val before = cum; cum += r._3; before < b
            }.map(_._1)
          }
      }
    }.toSet

  private def ids(d: org.apache.spark.sql.DataFrame): Set[Long] =
    d.select("doc_id").collect().map(_.getLong(0)).toSet

  test("tokenBudgetTake == contract reference; takes nest across budgets") {
    val rnd = new scala.util.Random(90125)
    for (round <- 0 until rounds) {
      val rows = corpus(rnd)
      val df = rows.toDF("doc_id", "source", "nt")
      val budget = 100L + rnd.nextInt(400)
      val want = refTake(rows, rows.map(_._2).distinct.map(_ -> budget).toMap)
      val got = ids(Mixing.tokenBudgetTake(df, Seq("source"), "doc_id", "nt", budget))
      assert(got == want, s"round $round budget $budget: " +
        s"extra ${got.diff(want)}, missing ${want.diff(got)}")
      // prefix property: the smaller-budget take is a subset of the
      // larger one (what makes incremental top-ups sound)
      val bigger = ids(Mixing.tokenBudgetTake(df, Seq("source"), "doc_id",
        "nt", budget + 200L))
      assert(got.subsetOf(bigger), s"round $round: nesting violated")
    }
  }

  test("tokenBudgetTakePrefiltered: exact when the slack covers, survivor prefix when it cannot") {
    val rnd = new scala.util.Random(5150)
    for (round <- 0 until rounds) {
      val rows = corpus(rnd)
      val df = rows.toDF("doc_id", "source", "nt")
      val budget = 100L + rnd.nextInt(300)
      val slack = 0.5 + rnd.nextDouble() * 3.0
      val exact = refTake(rows, rows.map(_._2).distinct.map(_ -> budget).toMap)
      val got = ids(Mixing.tokenBudgetTakePrefiltered(df, Seq("source"),
        "doc_id", "nt", budget, slack = slack))
      // coverage decided per stratum by the reference
      rows.groupBy(_._2).foreach { case (src, rs) =>
        val tot = rs.map(_._3).sum
        val srcIds = rs.map(_._1).toSet
        val gotSrc = got.intersect(srcIds)
        val exactSrc = exact.intersect(srcIds)
        if (tot <= budget) assert(gotSrc == srcIds, s"round $round $src: whole-branch")
        else {
          val theta = slack * budget / tot.toDouble
          val survivors = rs.filter(r => draw(r._1) < theta)
          if (survivors.map(_._3).sum >= budget)
            assert(gotSrc == exactSrc,
              s"round $round $src: covered slack diverged ($slack)")
          else {
            assert(gotSrc == survivors.map(_._1).toSet,
              s"round $round $src: uncovered take is not the survivor prefix")
            assert(gotSrc.subsetOf(exactSrc),
              s"round $round $src: uncovered take escaped the exact prefix")
          }
        }
      }
    }
  }

  test("tokenBudgetTakeMixed == per-stratum reference; absent strata drop") {
    val rnd = new scala.util.Random(2112)
    for (round <- 0 until rounds) {
      val rows = corpus(rnd)
      val df = rows.toDF("doc_id", "source", "nt")
      val strata = rows.map(_._2).distinct
      // one stratum deliberately absent from the recipe
      val recipe = strata.drop(1).map(s => s -> (50L + rnd.nextInt(400))).toMap
      val budgets = recipe.toSeq.toDF("source", "budget")
      val want = refTake(rows, recipe)
      val got = ids(Mixing.tokenBudgetTakeMixed(df, Seq("source"), "doc_id",
        "nt", budgets, "budget"))
      assert(got == want, s"round $round recipe $recipe: " +
        s"extra ${got.diff(want)}, missing ${want.diff(got)}")
      assert(!got.exists(id => rows.exists(r => r._1 == id && r._2 == strata.head)),
        s"round $round: not-in-recipe stratum leaked")
    }
  }

  test("splitByGroup == contract reference on random weights/groups; recuts nest") {
    // driver-side twin of unitHash(group, salt)
    def saltedDraw(g: Long, salt: String): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val d = md.digest((g.toString + salt).getBytes("UTF-8"))
      val hex = d.take(4).map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
    }
    val rnd = new scala.util.Random(3113)
    for (round <- 0 until rounds) {
      val nGroups = 5 + rnd.nextInt(40)
      val rows = (0L until (50 + rnd.nextInt(200)).toLong)
        .map(i => (i, rnd.nextInt(nGroups).toLong))
      val df = rows.toDF("doc_id", "g")
      val k = 2 + rnd.nextInt(3)
      val names = (0 until k).map(i => s"side$i")
      val weights = names.map(_ -> (0.05 + rnd.nextDouble()))
      val salt = s"s$round"
      // reference: normalized cumulative thresholds over one draw
      val total = weights.map(_._2).sum
      val cums = weights.map(_._2).scanLeft(0.0)(_ + _).tail.map(_ / total)
      def refLabel(g: Long): String = {
        val u = saltedDraw(g, salt)
        names.zip(cums).find { case (_, c) => u < c }
          .map(_._1).getOrElse(names.last)
      }
      val got = Mixing.splitByGroup(df, "g", weights, salt = salt)
        .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
      val want = rows.map { case (id, g) => id -> refLabel(g) }.toMap
      assert(got == want, s"round $round weights $weights: " +
        s"diverged at ${got.toSet.diff(want.toSet).take(5)}")
      // nesting: growing side0's weight only moves the boundary — no
      // row leaves side0
      val grown = weights.updated(0, names.head -> (weights.head._2 + 0.5))
      val got2 = Mixing.splitByGroup(df, "g", grown, salt = salt)
        .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
      val in0 = got.filter(_._2 == names.head).keySet
      assert(in0.forall(id => got2(id) == names.head),
        s"round $round: a group left the grown first side")
    }
  }
}
