package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Statistical aggregates over the ingested tables — the ClickHouse
  * `entropy` / `cramersV` / `boundingRatio` family (public ClickHouse
  * SQL surface; the analytics layer over the events the reference
  * lands via `internal/ingestion/clickhouse.go:74-96`). Completes the
  * A17 corr/regr statistics row with the categorical-association and
  * distribution-shape members.
  *
  * Determinism discipline (the A17/X13 convention): every input to a
  * floating-point expression is an EXACT integer count (category
  * counts, margins, n), each per-category double term is computed by
  * one fixed IEEE expression tree, rounded to 9 places and summed as
  * DECIMAL — so the only order-sensitive step (double addition) is
  * replaced by an order-free exact sum, and the final statistic is
  * bit-identical in any engine implementing the same formula.
  *
  * Scale shape: everything reduces to (keys, category) partial+final
  * count aggregates first — raw volume reaches one shuffle, once, and
  * every later stage (margins, terms, final fold) runs over
  * category-cardinality rows, never rows of the input.
  */
object StatsAgg {

  /** Shannon entropy (bits) of `value`'s distribution per key:
    * H = log2(n) − (Σ c·log2 c)/n over category counts c — the
    * count-only rewrite of −Σ p·log2 p (every term positive, no
    * division inside the sum). Nulls form their own category, as in
    * ClickHouse. Output: keys :+ (n_rows, n_categories, entropy).
    */
  def entropy(df: DataFrame, keys: Seq[String], value: Column): DataFrame = {
    val counts = df.groupBy((keys.map(col) :+ value.as("__v")): _*)
      .agg(count(lit(1)).as("__c"))
    val term = round(col("__c").cast("double") *
      log2(col("__c").cast("double")), 9).cast("decimal(28,9)")
    counts.groupBy(keys.map(col): _*)
      .agg(sum(col("__c")).as("n_rows"),
        count(lit(1)).as("n_categories"),
        sum(term).as("__clogc"))
      .withColumn("entropy",
        round(log2(col("n_rows").cast("double")) -
          col("__clogc").cast("double") / col("n_rows").cast("double"), 6))
      .drop("__clogc")
  }

  /** Cramér's V association between two categorical columns per key:
    * V = sqrt( (χ²/n) / (min(r, c) − 1) ), computed through the
    * observed-cells-only identity
    *
    *   χ² = Σ_cells (o − e)²/e = Σ_observed o²·n/(ra·cb) − n
    *
    * (expand the square; Σ e over ALL r×c cells telescopes to n, and
    * empty cells contribute 0 to the o²/e sum) — so the full grid
    * never materializes and the plan stays one corpus scan: one
    * (keys, a, b) count aggregate, then three cell-table windows for
    * the margins (cell-cardinality rows, never input rows) and one
    * final fold. Degenerate keys (r = 1 or c = 1 — no association to
    * measure) yield null; a NULL category is a real row/column of the
    * table (GROUP BY keeps it in both engines). All counts exact;
    * per-cell terms follow the round-9 DECIMAL sum discipline.
    * Output: keys :+ (n_rows, chi2, cramers_v).
    */
  def cramersV(df: DataFrame, keys: Seq[String], a: Column,
      b: Column): DataFrame = {
    val cells = df.groupBy((keys.map(col) :+ a.as("__a")) :+ b.as("__b"): _*)
      .agg(count(lit(1)).as("__o"))
    val wa = Window.partitionBy((keys.map(col) :+ col("__a")): _*)
    val wb = Window.partitionBy((keys.map(col) :+ col("__b")): _*)
    val wk = Window.partitionBy(keys.map(col): _*)
    val withMargins = cells
      .withColumn("__ra", sum(col("__o")).over(wa))
      .withColumn("__cb", sum(col("__o")).over(wb))
      .withColumn("__n", sum(col("__o")).over(wk))
    val term = round(
      col("__o").cast("double") * col("__o").cast("double") *
        col("__n").cast("double") /
        (col("__ra").cast("double") * col("__cb").cast("double")),
      9).cast("decimal(28,9)")
    withMargins
      .withColumn("__t", term)
      .groupBy(keys.map(col): _*)
      .agg(max(col("__n")).as("n_rows"),
        count_distinct(col("__a")).as("__r"),
        count_distinct(col("__b")).as("__c"),
        sum(col("__t")).as("__sum"))
      // greatest(…, 0): the identity is ≥ 0 exactly, but the round-9
      // term truncation can land a hair below zero — and a -0.0 here
      // would be a cross-engine hash hazard
      .withColumn("chi2",
        round(greatest(
          col("__sum").cast("double") - col("n_rows").cast("double"),
          lit(0.0)), 6))
      .withColumn("cramers_v",
        when(least(col("__r"), col("__c")) > 1L,
          round(sqrt(greatest(
            col("__sum").cast("double") - col("n_rows").cast("double"),
            lit(0.0)) /
            col("n_rows").cast("double") /
            (least(col("__r"), col("__c")) - 1L).cast("double")), 6)))
      .drop("__r", "__c", "__sum")
  }

  /** `boundingRatio`: the slope of the line between the leftmost and
    * rightmost points of the group — (y at max x − y at min x) /
    * (max x − min x). Endpoint picks are made total with `tie` (the
    * W1 tiebreak discipline: same-x rows resolve deterministically);
    * a degenerate group (max x == min x) yields null. Output:
    * keys :+ (x_lo, x_hi, bounding_ratio). One partial+final
    * aggregate — the struct min/max carries one candidate per group
    * per partition through the map-side combine.
    */
  def boundingRatio(df: DataFrame, keys: Seq[String], x: Column,
      y: Column, tie: Column): DataFrame = {
    val tagged = struct(x.cast("long").as("x"), tie.as("t"),
      y.cast("double").as("y"))
    df.groupBy(keys.map(col): _*)
      .agg(min(tagged).as("__lo"), max(tagged).as("__hi"))
      .select((keys.map(col) ++ Seq(
        col("__lo.x").as("x_lo"), col("__hi.x").as("x_hi"),
        when(col("__hi.x") > col("__lo.x"),
          round((col("__hi.y") - col("__lo.y")) /
            (col("__hi.x") - col("__lo.x")).cast("double"), 6))
          .as("bounding_ratio"))): _*)
  }
}
