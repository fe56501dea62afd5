package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Salted join must be result-identical to the plain join on a
  * pathologically skewed key distribution, for every supported join
  * type, while actually spreading the hot key across salts. */
class SkewJoinSpec extends SparkSpecBase {

  import spark.implicits._

  // 10k facts, 95% on one hot key; dim covers some keys only
  private lazy val facts = ((1 to 9500).map(i => (i.toLong, "hot")) ++
    (1 to 500).map(i => (i.toLong, s"k${i % 50}")))
    .toDF("fact_id", "key")
  private lazy val dim = (Seq("hot") ++ (0 until 25).map(i => s"k$i"))
    .zipWithIndex.map { case (k, i) => (k, s"dim$i") }
    .toDF("key", "attr")

  private def canon(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("inner and left joins match the unsalted result exactly") {
    for (jt <- Seq("inner", "left_outer")) {
      val plain = facts.join(dim, Seq("key"), jt)
        .select("fact_id", "key", "attr")
      val salted = SkewJoin.salted(facts, dim, "key", salt = 8, joinType = jt)
        .select("fact_id", "key", "attr")
      assert(canon(salted) == canon(plain), s"mismatch for $jt")
    }
  }

  test("left_semi / left_anti match and do not duplicate") {
    val semi = SkewJoin.salted(facts, dim, "key", 8, "left_semi")
    assert(canon(semi.select("fact_id", "key")) ==
      canon(facts.join(dim, Seq("key"), "left_semi").select("fact_id", "key")))
    assert(semi.count() == facts.join(dim, Seq("key"), "left_semi").count())
    val anti = SkewJoin.salted(facts, dim, "key", 8, "left_anti")
    assert(canon(anti.select("fact_id", "key")) ==
      canon(facts.join(dim, Seq("key"), "left_anti").select("fact_id", "key")))
  }

  test("the hot key actually spreads across salts") {
    val spread = facts.withColumn("_salt",
        pmod(hash(struct(facts.columns.map(col): _*)), lit(8)))
      .filter(col("key") === "hot")
      .groupBy("_salt").count().collect()
    assert(spread.length == 8) // every salt bucket populated
    assert(spread.map(_.getLong(1)).max < 9500) // no bucket holds it all
  }

  test("right/full joins are rejected") {
    intercept[IllegalArgumentException](
      SkewJoin.salted(facts, dim, "key", 8, "right_outer"))
    intercept[IllegalArgumentException](
      SkewJoin.salted(facts, dim, "key", 0))
  }
}
