package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation equi-join by key salting.
  *
  * AQE's skew-join split handles most hot keys at runtime, but it only
  * applies to sort-merge join stages without agg-reuse constraints;
  * when one key dominates a join that AQE can't split, the classic fix
  * is explicit salting: the big (left) side gets a deterministic salt
  * in [0, salt), the small (right) side is replicated once per salt
  * value, and the join key becomes (key, salt) — one straggler
  * partition becomes `salt` parallel ones at the cost of replicating
  * the right side `salt` times (keep the right side the smaller one).
  *
  * Results are identical to the plain join for inner / left_outer /
  * left_semi / left_anti joins (each left row carries exactly one
  * salt, and every right row exists at every salt). Right/full joins
  * would duplicate unmatched right rows and are rejected.
  */
object SkewJoin {

  private val allowed = Set("inner", "left", "left_outer", "leftouter",
    "left_semi", "leftsemi", "left_anti", "leftanti")

  def salted(left: DataFrame, right: DataFrame, key: String,
      salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt >= 1, s"salt must be >= 1, got $salt")
    require(allowed.contains(joinType.toLowerCase),
      s"salted join supports inner/left joins only, got $joinType")
    // deterministic salt from the whole left row: no rand() in the
    // plan (re-computation under retries stays stable), uniform enough
    // to spread a hot key
    val saltedLeft = left.withColumn("_salt",
      pmod(hash(struct(left.columns.map(col): _*)), lit(salt)))
    val replicatedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    val joined = saltedLeft.join(replicatedRight,
      saltedLeft(key) === replicatedRight(key) &&
        saltedLeft("_salt") === replicatedRight("_salt"),
      joinType)
    (joinType.toLowerCase match {
      case "left_semi" | "leftsemi" | "left_anti" | "leftanti" => joined
      case _ => joined.drop(replicatedRight(key)).drop(replicatedRight("_salt"))
    }).drop(saltedLeft("_salt"))
  }
}
