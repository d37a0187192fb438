package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** J5b: interval OVERLAP join — all pairs (l, r) whose closed
  * intervals intersect: `lStart <= rEnd AND rStart <= lEnd` (touching
  * endpoints count). The reference surface's range join (J5) classifies
  * a POINT into bands; this joins two interval SETS — sessions ×
  * campaign windows, spans × outage windows, ad impressions × flights.
  *
  * Spark plans the raw theta predicate as BroadcastNestedLoopJoin (or
  * CartesianProduct when neither side fits a broadcast) — quadratic
  * work that no partitioning distributes. This is the bucketized
  * equi-join form distributed engines use for temporal/spatial
  * overlap instead: explode each interval to the coarse time buckets
  * it covers, equi-join on the bucket id, verify the exact overlap
  * predicate, and emit each pair ONLY in the FIRST bucket the two
  * intervals share (`bucket == max(floorDiv(lStart), floorDiv(rStart))`)
  * — every overlapping pair shares that bucket exactly once, so no
  * dedup shuffle is ever needed and the join's output is exact.
  *
  * Scale: exploded input = Σ ceil(len/bucketWidth + 1) rows; ONE
  * equi-join shuffle on the bucket id; verify + first-bucket filters
  * evaluate inside the join stage (codegen). `bucketWidth` is the
  * dial — near the median interval length it balances the explode
  * factor (longer intervals → more replicas) against per-bucket pair
  * mass (wider buckets → more candidate pairs); both failure ends are
  * visible in the explode count and the join's output rows metric. A
  * pathological hot bucket (everything overlaps rush hour) is
  * ordinary equi-join skew — AQE's skew split applies, which is
  * precisely what a nested-loop plan forfeits.
  */
object IntervalJoin {

  /** @param left   intervals probed (columns carried through)
    * @param right  intervals joined against (columns carried through)
    * @param bucketWidth time-axis bucket size, same unit as the bounds
    * @param keys   optional equi-key pairs (leftColName, rightColName)
    *        ANDed into the join — the keyed form (sessions × campaign
    *        windows PER USER); the join then hash-partitions on
    *        (keys, bucket), so blocking tightens to same-key same-time
    *        rows and per-key parallelism multiplies the bucket count.
    *        Names must differ across sides (like the bound columns).
    *
    * Bounds may be any numeric castable to long (epoch seconds the
    * usual case); negative times are handled (true floor division via
    * pmod, not truncating div). Requires lStart <= lEnd per row
    * (callers with point events pass the same column twice).
    */
  def overlapJoin(
      left: DataFrame, right: DataFrame,
      lStart: Column, lEnd: Column,
      rStart: Column, rEnd: Column,
      bucketWidth: Long,
      keys: Seq[(String, String)] = Nil): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    // floor division exact for ANY sign: (x - pmod(x, w)) is an exact
    // multiple of w and the double division below is integral (epoch
    // magnitudes ≪ 2^53), unlike SQL `div` which truncates toward 0
    def fdiv(c: Column): Column =
      ((c - pmod(c, lit(bucketWidth))) / bucketWidth).cast("long")
    val lb = left
      .withColumn("__ls", lStart.cast("long"))
      .withColumn("__le", lEnd.cast("long"))
      .withColumn("__lbk", explode(sequence(fdiv(col("__ls")), fdiv(col("__le")))))
    val rb = right
      .withColumn("__rs", rStart.cast("long"))
      .withColumn("__re", rEnd.cast("long"))
      .withColumn("__rbk", explode(sequence(fdiv(col("__rs")), fdiv(col("__re")))))
    val cond = keys.foldLeft(
      col("__lbk") === col("__rbk") &&
        col("__ls") <= col("__re") && col("__rs") <= col("__le") &&
        // first-shared-bucket rule: exactly-once emission, in-join
        col("__lbk") === greatest(fdiv(col("__ls")), fdiv(col("__rs")))) {
      case (c, (lk, rk)) => c && col(lk) === col(rk)
    }
    lb.join(rb, cond)
      .drop("__ls", "__le", "__lbk", "__rs", "__re", "__rbk")
  }

  /** J5c: point-in-range join — classify POINTS into (possibly
    * overlapping) RANGES: every (point, range) pair with
    * lo ≤ p < hi. The degenerate-but-ubiquitous cousin of
    * [[overlapJoin]]: IP → geo block, price → tier, timestamp →
    * maintenance window, score → band — whenever the range side is
    * small Spark's broadcast handles it, but a LARGE range table
    * (millions of IP blocks) turns the raw theta join into a
    * nested-loop scan no partitioning distributes.
    *
    * Same bucketization cure, simpler: each range explodes to the
    * buckets it covers, each point lives in exactly ONE bucket
    * (`floor(p / bucketWidth)`), so the equi-join on the bucket id
    * finds every qualifying pair exactly once — no first-shared-bucket
    * rule, no dedup. Exactness does not depend on FP bucket
    * arithmetic: division by a positive constant is IEEE-monotone, so
    * lo ≤ p < hi pins p's bucket inside the range's exploded span,
    * and the verify predicate in the join condition is exact.
    *
    * Scale: exploded ranges = Σ (len/bucketWidth + 2) rows; ONE
    * equi-join shuffle keyed on the bucket id; `bucketWidth` near the
    * median range length balances range replication against
    * per-bucket candidate mass. Hot buckets are ordinary equi-join
    * skew — AQE splits them.
    */
  def pointInRangeJoin(
      points: DataFrame, p: Column,
      ranges: DataFrame, lo: Column, hi: Column,
      bucketWidth: Double,
      keys: Seq[(String, String)] = Nil,
      maxBucketsPerRange: Long = 1L << 20): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    require(maxBucketsPerRange > 0,
      s"maxBucketsPerRange must be positive: $maxBucketsPerRange")
    def fdiv(c: Column): Column = floor(c / lit(bucketWidth)).cast("long")
    val pb = points
      .withColumn("__p", p.cast("double"))
      .withColumn("__pbk", fdiv(col("__p")))
    // inverted ranges (hi < lo) match nothing by definition — drop
    // them BEFORE the bucket explode, or sequence() would emit a
    // descending junk bucket list (filtered by the verify predicate
    // but wasted candidate work). The span guard turns the opaque
    // deep-in-sequence() array-size error a range ≫ bucketWidth would
    // hit into a clear misconfiguration message.
    val nBuckets = fdiv(col("__hi")) - fdiv(col("__lo")) + 1
    val rb = ranges
      .withColumn("__lo", lo.cast("double"))
      .withColumn("__hi", hi.cast("double"))
      .where(col("__hi") >= col("__lo"))
      .withColumn("__rbk", explode(
        when(nBuckets <= maxBucketsPerRange,
          sequence(fdiv(col("__lo")), fdiv(col("__hi"))))
          .otherwise(raise_error(concat(
            lit("pointInRangeJoin: a range spans "), nBuckets,
            lit(s" buckets (> maxBucketsPerRange=$maxBucketsPerRange); " +
              "raise bucketWidth toward the median range length or " +
              "raise maxBucketsPerRange explicitly"))))))
    // keys fold into the equi-condition, so the exchange hashes on
    // (keys..., bucket): per-key range sets never collide in a
    // bucket, and per-key parallelism multiplies the bucket count —
    // same treatment as overlapJoin's keyed form
    val cond = keys.foldLeft(
      col("__pbk") === col("__rbk") &&
        col("__p") >= col("__lo") && col("__p") < col("__hi")) {
      case (c, (pk, rk)) => c && col(pk) === col(rk)
    }
    pb.join(rb, cond)
      .drop("__p", "__pbk", "__lo", "__hi", "__rbk")
  }
}
