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

  /** W4c: rolling z-score anomaly detection over an integral series —
    * the monitoring rule an observability plane runs on ingested
    * volumes (reference §3.3 exposes exactly these counters): each
    * (key, bucket) count is compared against its own trailing
    * `lookback`-bucket baseline, z = (x − μ)/σ over the PRECEDING
    * frame only (the current point must not contaminate its own
    * baseline), flagged when |z| > `threshold`. Rows with fewer than
    * `minN` trailing points (warm-up) or a degenerate baseline
    * (σ² ≈ 0) get a null z / null flag rather than a false verdict.
    *
    * Engine-portable numerics: `value` must be integral (a count).
    * The window aggregates are then sums of longs — exact in ANY
    * accumulation order — and μ, σ², z derive from those exact
    * integers through one fixed double expression tree, so two
    * engines agree bit-for-bit before the round(6). (Contrast
    * stddev_samp over doubles, whose partition-order-dependent
    * summation is exactly what this formulation avoids.) Divisions
    * are CASE-guarded for ANSI mode: empty/size-1 frames yield null,
    * never DIVIDE_BY_ZERO.
    *
    * Scale: one (key, bucket)-keyed partial agg upstream of this (the
    * caller buckets raw volume first — raw events never reach the
    * window), then ONE hash-partition window per key over
    * series-length rows. Series data is count-table-sized (keys ×
    * buckets), orders of magnitude below the event volume it
    * summarizes.
    *
    * Input: one row per (partition keys, `ord` bucket) with integral
    * `value`. Output adds n_w, base_mean, z, is_anomaly.
    */
  def rollingZScore(
      df: DataFrame,
      keys: Seq[String],
      ord: Column,
      value: Column,
      lookback: Int,
      minN: Int = 3,
      threshold: Double = 2.0): DataFrame = {
    require(lookback >= 2, s"lookback must be >= 2: $lookback")
    require(minN >= 2, s"minN must be >= 2: $minN")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord)
      .rowsBetween(-lookback.toLong, -1L)
    val d2 = (c: Column) => c.cast("double")
    df.withColumn("__x", value.cast("long"))
      .withColumn("n_w", count(lit(1)).over(w))
      .withColumn("__sm", sum(col("__x")).over(w))
      .withColumn("__ss", sum(col("__x") * col("__x")).over(w))
      .withColumn("base_mean",
        when(col("n_w") >= 1, d2(col("__sm")) / d2(col("n_w"))))
      .withColumn("__vr",
        when(col("n_w") >= 2,
          (d2(col("__ss")) - d2(col("__sm")) * d2(col("__sm")) / d2(col("n_w"))) /
            d2(col("n_w") - 1)))
      .withColumn("z",
        when(col("n_w") >= minN && col("__vr") > 1e-9,
          round((d2(col("__x")) - col("base_mean")) / sqrt(col("__vr")), 6)))
      .withColumn("is_anomaly", abs(col("z")) > threshold)
      .drop("__x", "__sm", "__ss", "__vr")
  }

  /** W9: OHLC resample — the time-series downsampling bar every
    * metrics/market pipeline draws: per (keys, time bucket) the
    * FIRST value (open), max (high), min (low), LAST value (close)
    * and row count. "First"/"last" order by (ts, `tie`) so
    * same-second rows resolve deterministically (the W1 tiebreak
    * discipline).
    *
    * Scale: ONE partial+final aggregate — `min_by`/`max_by` carry a
    * (value, key) pair per group through the map-side combine, so
    * the shuffle moves one candidate row per (keys, bucket) per
    * input partition. Never a window, never a per-bucket sort; the
    * naive first_value/last_value window formulation would shuffle
    * and sort the full event volume for the same four numbers.
    */
  def ohlcResample(
      df: DataFrame, keys: Seq[String], ts: Column, tie: Column,
      value: Column, bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be positive: $bucketSeconds")
    val t = ts.cast("long")
    val bucket = ((t - pmod(t, lit(bucketSeconds))) / bucketSeconds)
      .cast("long")
    df.withColumn("__t", t)
      .withColumn("bucket", bucket)
      .groupBy((keys.map(col) :+ col("bucket")): _*)
      .agg(
        min_by(value, struct(col("__t"), tie)).as("open"),
        max(value).as("high"),
        min(value).as("low"),
        max_by(value, struct(col("__t"), tie)).as("close"),
        count(lit(1)).as("n"))
  }
}
