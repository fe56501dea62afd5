package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Seeded property sweep for the four bucket-pair operators after the
  * round-8 structural rewrite (sort-merge self-join expansion): each
  * operator is pinned against an independent driver-side brute-force
  * reference on randomized corpora. The references re-derive the
  * operator's CONTRACT (bucketing rule + pair rule + score), not its
  * plan, so any join-shape mistake — dropped tie pairs, double-counted
  * shared keys, self-pairs, survivor drift — diverges. */
class PairExpansionPropertySpec extends SparkSpecBase {

  import spark.implicits._

  private val rounds = 8

  private def words(rnd: scala.util.Random): String = {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    (0 until 4 + rnd.nextInt(8)).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
  }

  test("jaccardNearDupPairs == brute-force shingle Jaccard on random corpora") {
    val rnd = new scala.util.Random(4242)
    for (round <- 0 until rounds) {
      val docs = (0 until 30).map(i => (i.toLong, words(rnd)))
      val df = docs.toDF("doc_id", "text")
      val got = Dedup.jaccardNearDupPairs(df, "text", "doc_id", n = 2,
          minJaccard = 0.3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

      def sh(t: String): Set[String] = {
        val ts = t.split(" ").filter(_.nonEmpty)
        ts.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSet
      }
      val brute = (for {
        (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
        sa = sh(ta); sb = sh(tb)
        inter = sa.intersect(sb).size
        if inter > 0
        j = inter.toDouble / (sa.size + sb.size - inter)
        if j >= 0.3
      } yield (ia, ib, j)).toSet
      assert(got == brute, s"round $round: ${got.diff(brute)} / ${brute.diff(got)}")
    }
  }

  test("hashNearDupPairs == banding-aware brute force on random signatures") {
    val rnd = new scala.util.Random(777)
    for (round <- 0 until rounds) {
      // random 64-bit hashes with planted near-pairs (few bit flips)
      val base = (0 until 20).map(i => (i.toLong, rnd.nextLong()))
      val flipped = (0 until 10).map { i =>
        val (id, h) = base(rnd.nextInt(base.size))
        (100L + i, h ^ (1L << rnd.nextInt(64)) ^
          (if (rnd.nextBoolean()) 1L << rnd.nextInt(64) else 0L))
      }
      val rows = base ++ flipped
      val df = rows.toDF("vec_id", "h")
      val got = Dedup.hashNearDupPairs(df, "h", "vec_id", maxHamming = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

      def blocks(h: Long): Seq[Long] =
        (0 until 4).map(k => (h >>> (16 * k)) & 0xffffL)
      val brute = (for {
        (ia, ha) <- rows; (ib, hb) <- rows if ia < ib
        if blocks(ha).zip(blocks(hb)).exists { case (x, y) => x == y }
        d = java.lang.Long.bitCount(ha ^ hb).toLong
        if d <= 3
      } yield (ia, ib, d)).toSet
      assert(got == brute, s"round $round: ${got.diff(brute)} / ${brute.diff(got)}")
      // pigeonhole: hamming <= 3 pairs ALWAYS share a block, so the
      // banding-aware reference equals the plain <=3 reference
      val plain = (for {
        (ia, ha) <- rows; (ib, hb) <- rows if ia < ib
        d = java.lang.Long.bitCount(ha ^ hb).toLong
        if d <= 3
      } yield (ia, ib, d)).toSet
      assert(brute == plain)
    }
  }

  test("lshCandidatePairs == brute-force band collisions on random signatures") {
    val rnd = new scala.util.Random(1313)
    for (round <- 0 until rounds) {
      val sigs = (0 until 25).map(i =>
        (i.toLong, (0 until 4).map(_ => rnd.nextInt(6).toString)))
      val df = sigs.map { case (id, hs) => (id, hs(0), hs(1), hs(2), hs(3)) }
        .toDF("doc_id", "h0", "h1", "h2", "h3")
      val got = Dedup.lshCandidatePairs(df, "doc_id", k = 4, rowsPerBand = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      def bands(hs: Seq[String]): Seq[String] =
        Seq(hs(0) + "|" + hs(1), hs(2) + "|" + hs(3))
      val brute = (for {
        (ia, ha) <- sigs; (ib, hb) <- sigs if ia < ib
        if bands(ha).intersect(bands(hb)).nonEmpty
      } yield (ia, ib)).toSet
      assert(got == brute, s"round $round: ${got.diff(brute)} / ${brute.diff(got)}")
    }
  }

  test("nearDupPairs == brute force within sign buckets on random embeddings") {
    val rnd = new scala.util.Random(99)
    for (round <- 0 until rounds) {
      val vecs = (0 until 25).map(i =>
        (i.toLong, Seq.fill(6)(rnd.nextDouble() * 2 - 1)))
      val df = vecs.toDF("vec_id", "e")
      val got = Similarity.nearDupPairs(df, "e", "vec_id", bits = 3,
          minCosine = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

      def bucket(e: Seq[Double]): String =
        e.take(3).map(x => if (x >= 0) "1" else "0").mkString
      def cos(a: Seq[Double], b: Seq[Double]): Double = {
        val d = a.zip(b).map { case (x, y) => x * y }.sum
        d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      }
      val brute = (for {
        (ia, ea) <- vecs; (ib, eb) <- vecs if ia < ib
        if bucket(ea) == bucket(eb)
        c = BigDecimal(cos(ea, eb))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        if c >= 0.5
      } yield (ia, ib, c)).toSet
      assert(got == brute, s"round $round: ${got.diff(brute)} / ${brute.diff(got)}")
    }
  }
}
