package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Equi-depth (equal-height) histogram — the deterministic member of
  * the ClickHouse `histogram()` family (ClickHouse's adaptive variant
  * is seed-dependent "for illustration only" per its own docs; the
  * quantile-edged form is the one a dashboard can assert on).
  *
  * Two aggregations: (1) per group, the exact continuous quantiles
  * 0/n..n/n as bin edges — one partial+final agg, edges rounded so
  * both engines emit identical doubles (the q_quantiles-proven
  * parity); (2) the tiny edge table broadcast back onto the corpus,
  * bin assigned by counting interior edges below the value (a
  * codegen HOF over a ≤n-element array, map-only), then one
  * (group, bin) partial+final count. The corpus is scanned twice but
  * never shuffled except by the final small aggregation — at 100 TB
  * the edge table is |groups|·(bins+1) doubles, always broadcastable.
  */
object Histograms {

  /** Returns (groupKeys..., bin ∈ 1..bins, lo, hi, n_rows): per
    * group, `bins` equal-population bins with quantile edges; a value
    * equal to an interior edge falls in the LOWER bin (v > e strict).
    */
  def equiDepth(df: DataFrame, groupKeys: Seq[String], value: Column,
      bins: Int): DataFrame = {
    require(bins >= 2, "need at least 2 bins")
    val keyCols = groupKeys.map(col)
    // null measures carry no histogram information — dropped (the
    // quantile agg would ignore them anyway; dropping keeps the bin
    // assignment total)
    val base = df.select(keyCols :+ value.cast("double").as("__hv"): _*)
      .where(col("__hv").isNotNull)
    val qs = (0 to bins).map(i => i.toDouble / bins).mkString(", ")
    // floor-based 4-dp edge rounding, NOT round(): quantile
    // interpolation can land on exact decimal halves, where Spark's
    // BigDecimal HALF_UP and DuckDB's float rint disagree by one
    // ulp-of-1e-4 (the exact hazard TimeSeries.resampleFill documents);
    // floor(e·1e4 + 0.5)/1e4 is the same IEEE op sequence in both
    // engines → bit-identical edges, stable bin counts
    val edges = base
      .groupBy(keyCols: _*)
      .agg(expr(
        // 'd' suffixes: Spark parses bare 10000.0 as a DECIMAL
        // literal, and bigint-floor / decimal division would emit
        // decimal edges — the doubles must stay doubles end to end
        s"transform(percentile(__hv, array($qs)), " +
          "e -> floor(e * 10000.0d + 0.5d) / 10000.0d)")
        .as("__edges"))
    // null-SAFE equality on the group keys: a null group is a group
    // like any other and must keep its bins (a plain equi-join would
    // silently drop it)
    val b = base.as("__b")
    val e = edges.as("__e")
    val joinCond = groupKeys
      .map(k => col(s"__b.$k") <=> col(s"__e.$k"))
      .reduceOption(_ && _).getOrElse(lit(true))
    val binned = b.join(broadcast(e), joinCond)
      .select(groupKeys.map(k => col(s"__b.$k")) ++ Seq(
        col("__b.__hv").as("__hv"), col("__e.__edges").as("__edges")): _*)
      .withColumn("bin",
        (size(filter(slice(col("__edges"), 2, bins - 1),
          e => col("__hv") > e)) + 1).cast("long"))
    // lo/hi ride the aggregation key (functionally dependent on
    // (group, bin)) — no second edge join
    binned
      .withColumn("lo", element_at(col("__edges"), col("bin").cast("int")))
      .withColumn("hi", element_at(col("__edges"), col("bin").cast("int") + 1))
      .groupBy(keyCols ++ Seq(col("bin"), col("lo"), col("hi")): _*)
      .agg(count(lit(1)).as("n_rows"))
  }

  /** Exact weighted quantiles — ClickHouse `quantileExactWeighted`
    * (the repeat-count quantile every latency histogram with bucket
    * counts needs): per group, quantile q is the SMALLEST value v
    * whose cumulative weight reaches q · total weight — the
    * left-continuous inverse CDF, ClickHouse's own rule. Weights must
    * be integral (repeat counts), so the threshold comparison
    * `cum ≥ q·tot` is exact decimal arithmetic — no interpolation, no
    * float accumulation, hence engine-portable without rounding.
    *
    * One hash-partition window per group over the (value, tiebreak)
    * sort computes cumulative and total weight in a single sort pass
    * (Catalyst collapses the two frames onto one sort); one
    * partial+final aggregate then takes, per quantile, the min value
    * past its threshold. The sort is the exact algorithm's inherent
    * cost (same as ClickHouse's, which materializes and sorts the
    * (value, weight) pairs per group); pre-aggregating duplicate
    * values into weights upstream is exactly how callers bound it.
    *
    * Output: groupKeys :+ one `wq_<label>` column per requested
    * quantile (label = q with the dot stripped, e.g. 0.5 → wq_50).
    */
  def weightedQuantiles(df: DataFrame, groupKeys: Seq[String],
      value: Column, weight: Column, tiebreak: Seq[Column],
      qs: Seq[BigDecimal]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      s"quantiles must lie in (0, 1]: $qs")
    val keyCols = groupKeys.map(col)
    val base = df
      .select(keyCols ++ Seq(value.as("__wv"), weight.cast("long").as("__w")) ++
        tiebreak.zipWithIndex.map { case (c, i) => c.as(s"__tb$i") }: _*)
      .where(col("__wv").isNotNull && col("__w") > 0)
    val wCum = Window.partitionBy(keyCols: _*)
      .orderBy(col("__wv") +: tiebreak.indices.map(i => col(s"__tb$i")): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(keyCols: _*)
    val cum = base
      .withColumn("__cum", sum(col("__w")).over(wCum))
      .withColumn("__tot", sum(col("__w")).over(wTot))
    val aggs = qs.map { q =>
      val label = (q * 100).bigDecimal.stripTrailingZeros.toPlainString
        .replace(".", "_")
      min(when(col("__cum").cast("decimal(38,6)") >=
        lit(q.bigDecimal).cast("decimal(38,6)") * col("__tot"), col("__wv")))
        .as(s"wq_$label")
    }
    cum.groupBy(keyCols: _*).agg(aggs.head, aggs.tail: _*)
  }
}
