package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** J9: Bloom-pruned equi-join — the generic form of the X6b
  * decontamination trick: when one join side is SELECTIVE (a filtered
  * dimension, an id list, a benchmark) and the other is the 100 TB
  * fact table, build a Bloom filter over the small side's keys and
  * drop non-matching fact rows INSIDE the scan, before the join's
  * exchange. The bitmap probe is pure Catalyst built-ins in
  * whole-stage codegen ([[graft.functions.Bloom]]); a Bloom filter
  * has NO false negatives, so for inner and semi joins the result is
  * bit-identical to the plain join — the filter only deletes rows
  * that cannot match, and false positives are killed by the join
  * itself.
  *
  * This is the manual, always-on form of what AQE's runtime filter
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) injects
  * opportunistically; owning the operator makes the prune a stated
  * contract (and works when the small side is only known small at
  * runtime, e.g. after a selective filter the optimizer can't
  * estimate).
  *
  * Scale: the shuffle moves ~|matching fact rows| + FP%·|clean|
  * instead of |fact| — on a 100 TB fact side joined to a 0.1%
  * dimension slice that is a ~1000× exchange-volume cut for one
  * map-side bitmap probe per row. The small side is consumed twice
  * (bitmap build + join build); it is cached and released after the
  * consuming action, the X6b convention.
  */
object BloomJoin {

  /** Inner/semi equi-join of `big` to `small` on `bigKey` ==
    * `smallKey`, with the big side Bloom-pruned in-scan. Result is
    * exactly `big.join(small, ..., joinType)` — spec-asserted.
    */
  def prunedEquiJoin(
      big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String,
      joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "semi", "leftsemi", "left_semi").contains(joinType),
      s"bloom pruning is exactness-safe for inner/semi joins only: $joinType")
    val keyed = small.cache()
    val bloom = graft.functions.Bloom.build(keyed, col(smallKey))
    val pruned = big.where(
      graft.functions.Bloom.mightContain(bloom, col(bigKey)))
    val out = pruned.join(keyed, pruned(bigKey) === keyed(smallKey), joinType)
    CacheLifecycle.releaseAfterAction(out, keyed)
  }
}
