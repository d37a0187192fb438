package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-filled time-series resampling — the engine-side equivalent of
  * ClickHouse's `ORDER BY ... WITH FILL` (the reference's sink
  * database feature for dashboarding the `events` table): bucket
  * events onto a fixed grid per key, emit EVERY grid step between
  * each key's first and last bucket, zero-fill the counts in gaps and
  * forward-fill the last observed aggregate value.
  *
  * The bucket column is integral (e.g. epoch-hours) so grid
  * arithmetic is engine-portable — no timestamp-interval semantics to
  * disagree over; callers derive it with integer division on epoch
  * seconds/nanos.
  *
  * Scale: the input collapses to one (key, bucket)-keyed partial agg
  * before anything else, so raw event volume never reaches the grid
  * stages; the grid explode and the left join are sized by the OUTPUT
  * grid (keys × span — the semantic result size, not an
  * amplification), co-partitioned on (key, bucket); the forward fill
  * is one window per key. A key idle for years makes its own span
  * long — that is inherent to WITH FILL semantics, and callers bound
  * it by windowing the input first.
  */
object TimeSeries {

  /** @param step grid stride (ClickHouse `WITH FILL ... STEP n`):
    *   fill rows are emitted at mn, mn+step, … ≤ mx per key; with
    *   step > 1 every OBSERVED bucket is also kept (ClickHouse keeps
    *   original rows and inserts fill rows between them), so the
    *   output is grid ∪ observed. step = 1 is the dense-grid original.
    * @param interpolate when true, adds `avg_interp` (ClickHouse
    *   `INTERPOLATE`): linear interpolation of the bucket-mean between
    *   the surrounding OBSERVED points (exact value on observed rows,
    *   forward-fill past the last observation). The arithmetic is a
    *   fixed double expression over 4-dp-rounded endpoints, so it is
    *   engine-portable (IEEE 754 gives every engine the same product/
    *   quotient for the same operand order).
    */
  def resampleFill(
      df: DataFrame, key: String, bucket: Column, value: Column,
      step: Long = 1L, interpolate: Boolean = false): DataFrame = {
    require(step >= 1L, s"step must be >= 1: $step")
    // cached: the aggregate feeds BOTH the span derivation and the
    // grid join, and Spark does not CSE the subtree across the two
    // uses — uncached, the raw input would be scanned and aggregated
    // twice (verified in the plan dump). The cache is the TINY
    // (key, active-bucket) table, released after the consuming action
    // (see CacheLifecycle)
    val counts = df.groupBy(col(key), bucket.as("bucket"))
      .agg(count(lit(1)).as("cnt"),
        // DECIMAL-exact sum then one rounded double division — the
        // same cross-engine determinism pattern as unigramLogProb
        round(sum(value.cast("decimal(38,6)")).cast("double") /
          count(lit(1)).cast("double"), 4).as("avg_value"))
      .cache()
    val spans = counts.groupBy(col(key))
      .agg(min(col("bucket")).as("mn"), max(col("bucket")).as("mx"))
    val gridPts = spans.select(col(key),
      explode(sequence(col("mn"), col("mx"), lit(step))).as("bucket"))
    // off-stride observed buckets only exist when step > 1 — skip the
    // union+distinct shuffle on the dense-grid path
    val grid =
      if (step == 1L) gridPts
      else gridPts.union(counts.select(col(key), col("bucket"))).distinct()
    val joined = grid.join(counts, Seq(key, "bucket"), "left")
      .na.fill(0L, Seq("cnt"))
    val w = Window.partitionBy(col(key)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ffilled = joined
      .withColumn("avg_ffill", last(col("avg_value"), ignoreNulls = true).over(w))
    val out =
      if (!interpolate) ffilled.drop("avg_value")
      else {
        // prev/next OBSERVED (bucket, value) per row: two windows over
        // the same (key, bucket) sort — Catalyst collapses them into
        // one sort, so interpolation costs no extra shuffle over ffill
        val wNext = Window.partitionBy(col(key)).orderBy(col("bucket"))
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        val obs = when(col("avg_value").isNotNull,
          struct(col("bucket").as("b"), col("avg_value").as("v")))
        ffilled
          .withColumn("__p", last(obs, ignoreNulls = true).over(w))
          .withColumn("__n", first(obs, ignoreNulls = true).over(wNext))
          .withColumn("avg_interp",
            when(col("__n").isNull, col("__p.v"))         // past last obs: ffill
              .when(col("__n.b") === col("__p.b"), col("__p.v")) // on an obs row
              // floor-based 4-dp rounding, NOT round(): interpolation
              // between 4-dp endpoints lands on exact decimal halves
              // (e.g. Δ/2), where Spark's decimal HALF_UP and DuckDB's
              // float multiply-and-rint disagree by one ulp-of-1e-4;
              // floor(x·1e4 + 0.5)/1e4 is the same IEEE op sequence in
              // every engine → bit-identical output
              .otherwise(floor((col("__p.v") + (col("__n.v") - col("__p.v")) *
                (col("bucket") - col("__p.b")).cast("double") /
                (col("__n.b") - col("__p.b")).cast("double")) * lit(10000.0) +
                lit(0.5)) / lit(10000.0)))
          .drop("__p", "__n", "avg_value")
      }
    CacheLifecycle.releaseAfterAction(out, counts)
  }
}
