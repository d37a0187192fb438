package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY.md task spec: "salting for
  * skew"; complements AQE's runtime skew-join splitting, which only
  * fires on sort-merge joins above size thresholds).
  *
  * Mechanics: the skewed (large, hot-key) side gets a random salt in
  * [0, salts); the small side is replicated once per salt value via a
  * `explode(sequence(...))`. The join key becomes (key, salt), so a
  * hot key's rows spread over `salts` reducers instead of one.
  *
  * Cost model: replicates the SMALL side `salts`×. Use when (a) the
  * small side is too big to broadcast outright, and (b) key skew on
  * the large side makes a plain shuffle join straggle. If the small
  * side fits in memory, prefer `broadcast()` — zero shuffle beats
  * salted shuffle.
  */
object SkewJoin {

  /** Inner/left salted equi-join of `large` (skewed) with `small`.
    * Output columns = large.* ++ small.* minus the duplicated key.
    */
  def saltedJoin(
      large: DataFrame, small: DataFrame, key: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltedLarge = large
      .withColumn("__salt", (rand(seed = 42) * salts).cast("int"))
    val replicatedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedLarge
      .join(replicatedSmall, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /** Targeted variant: only keys in `hotKeys` get salted; the long
    * tail joins un-replicated. This is the production shape when the
    * hot-key set is known/measured (one extra union, no blanket
    * small-side blowup).
    */
  def saltedJoinHotKeys(
      large: DataFrame, small: DataFrame, key: String,
      hotKeys: Seq[Any], salts: Int): DataFrame = {
    val isHot = col(key).isin(hotKeys: _*)
    val hot = saltedJoin(
      large.filter(isHot), small.filter(isHot), key, salts)
    val cold = large.filter(!isHot).join(small.filter(!isHot), Seq(key))
    hot.unionByName(cold)
  }
}
