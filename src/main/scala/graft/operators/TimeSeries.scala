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

  /** A2d: PromQL `histogram_quantile` — the quantile read over
    * BUCKETED counts (le upper bound → per-bucket count), the query
    * every observability backend runs on exactly the latency
    * histogram the reference exports (Prometheus histogram semantics:
    * linear interpolation inside the target bucket, lower bound 0 for
    * the first bucket, an infinite target bucket reports the highest
    * finite bound). Input is per-bucket (NON-cumulative) counts —
    * the shape a Spark aggregation produces; the cumulative view is
    * one window over BUCKET-cardinality rows.
    *
    * All ranks/counts are exact integers until the single
    * interpolation tree (round-6). Keys with zero observations yield
    * null. Plan: one keys exchange, a bucket-table window, one
    * min_by fold — raw volume never enters (the caller buckets
    * first).
    */
  def histogramQuantile(df: DataFrame, keys: Seq[String], le: Column,
      cnt: Column, q: Double): DataFrame = {
    require(q > 0 && q <= 1, s"quantile must be in (0, 1]: $q")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__le"))
    val wk = Window.partitionBy(keys.map(col): _*)
    val annotated = df
      .select(keys.map(col) :+ le.cast("double").as("__le") :+
        cnt.cast("long").as("__c"): _*)
      .withColumn("__cum", sum(col("__c")).over(w))
      .withColumn("__n", sum(col("__c")).over(wk))
      .withColumn("__prevle",
        coalesce(lag(col("__le"), 1).over(w), lit(0.0)))
    val rank = lit(q) * col("__n").cast("double")
    val interp = col("__prevle") + (col("__le") - col("__prevle")) *
      (rank - (col("__cum") - col("__c")).cast("double")) /
      col("__c").cast("double")
    val value = when(col("__le") === lit(Double.PositiveInfinity),
      col("__prevle")).otherwise(interp)
    annotated
      .where(col("__n") > 0 && col("__cum").cast("double") >= rank)
      .groupBy(keys.map(col): _*)
      .agg(max(col("__n")).as("n_obs"),
        min_by(round(value, 6), col("__le")).as("quantile"))
  }

  /** W4f: `nonNegativeDerivative` (ClickHouse window function) — the
    * per-sample rate of a counter gauge: (v − v_prev)/(t − t_prev),
    * clamped at 0 (a drop is a counter reset, not a negative rate —
    * the [[deltaSum]] convention read per-row instead of folded).
    * First row per key, or a repeated timestamp, yields null. The
    * division is one fixed double tree over exact inputs, round-6.
    * One keys exchange, one (ord) sort, one lag window.
    */
  def nonNegativeDerivative(df: DataFrame, keys: Seq[String],
      ord: Seq[Column], ts: Column, value: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    val dv = value.cast("double") - lag(value.cast("double"), 1).over(w)
    val dt = ts.cast("long") - lag(ts.cast("long"), 1).over(w)
    df.withColumn("deriv_per_s",
      when(dt > 0, round(greatest(dv, lit(0.0)) / dt.cast("double"), 6)))
  }

  /** W4g: PromQL counter statistics — `irate` / `resets` / `changes`
    * per key in ONE pass, the instantaneous reads over a counter
    * series next to [[deltaSum]]'s folded total (reference §3.3's
    * counters are exactly this shape; PromQL spec: Prometheus
    * functions documentation, public).
    *
    *  - `resets`: samples strictly below their predecessor (each is a
    *    counter restart);
    *  - `changes`: samples different from their predecessor;
    *  - `irate`: the rate between the LAST TWO samples, with the
    *    PromQL reset rule — a drop means the counter restarted, so
    *    the post-reset raw value (not the negative delta) is the
    *    increase. Null when the key has < 2 samples or the last two
    *    share a timestamp.
    *
    * Plan shape: one keys exchange + one (ord) sort feeding a single
    * lag Window, then ONE partial+final aggregate — the last row's
    * (Δv, Δt, v) arrives via `max_by` on the SAME sort order, so no
    * reverse-order second sort exists. All counts exact; irate is one
    * fixed double tree over exact deltas, round-6. Output: keys :+
    * (n_samples, resets, changes, t_last, irate).
    */
  def counterStats(df: DataFrame, keys: Seq[String], ord: Seq[Column],
      ts: Column, value: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    val v = value.cast("double")
    val t = ts.cast("long")
    val annotated = df
      .withColumn("__v", v)
      .withColumn("__t", t)
      .withColumn("__pv", lag(v, 1).over(w))
      .withColumn("__dt", t - lag(t, 1).over(w))
      .withColumn("__ord", struct(ord: _*))
    val lastRow = max_by(
      struct(col("__t"), col("__v"), col("__pv"), col("__dt")),
      col("__ord"))
    val agg = annotated
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_samples"),
        sum(when(col("__v") < col("__pv"), 1L).otherwise(0L)).as("resets"),
        sum(when(col("__v") =!= col("__pv"), 1L).otherwise(0L))
          .as("changes"),
        lastRow.as("__last"))
    val lv = col("__last.__v"); val lpv = col("__last.__pv")
    val ldt = col("__last.__dt")
    val inc = when(lv < lpv, lv).otherwise(lv - lpv)
    agg.select((keys.map(col) ++ Seq(
      col("n_samples"), col("resets"), col("changes"),
      col("__last.__t").as("t_last"),
      when(ldt > 0L, round(inc / ldt.cast("double"), 6))
        .as("irate"))): _*)
  }

  /** W4h: `predict_linear` / `deriv` — per-key least-squares over the
    * (t, v) series and the extrapolation `horizonSecs` past the key's
    * last sample (the PromQL pair behind every "disk full in N hours"
    * alert).
    *
    * Exact-sum discipline (the [[graft.operators.StatsAgg]] moments
    * convention): t is re-based on the GLOBAL min timestamp (one
    * broadcast 1-row aggregate — keeps Σt'² inside DECIMAL(38) at any
    * per-key volume where raw epoch² would overflow), v is
    * fixed-point floor(v·10^scale), and the five sums (n, Σt, Σv,
    * Σtv, Σt²) accumulate as DECIMAL(38,0) integers — order-free. The
    * slope/intercept numerators n·Σtv − Σt·Σv and n·Σt² − (Σt)² are
    * computed IN DECIMAL (exact — the double subtraction of
    * near-equal magnitudes would lose the signal), and only the final
    * ratios run in doubles, round-6. Keys with < 2 samples or a
    * degenerate time spread yield nulls.
    *
    * Plan: ONE partial+final hash aggregate over the annotated scan +
    * the t0/t_max broadcast — no window, no per-key sort. Output:
    * keys :+ (n_samples, deriv_per_s, predict).
    */
  def predictLinear(df: DataFrame, keys: Seq[String], ts: Column,
      value: Column, horizonSecs: Long, scale: Int = 2): DataFrame = {
    val factor = math.pow(10.0, scale)
    val t = ts.cast("long")
    val base = df
      .withColumn("__t", t)
      .withColumn("__w",
        floor(value.cast("double") * lit(factor)).cast("decimal(38,0)"))
      // __t must be non-null too: a null-ts row would enter n via
      // count() yet drop out of Σt/Σtv/Σt² (null __tr), silently
      // corrupting the least-squares fit with an inconsistent n
      .where(col("__w").isNotNull && !isnan(value.cast("double")) &&
        col("__t").isNotNull)
    val t0row = base.agg(min(col("__t")).as("__t0"))
    val ann = base.crossJoin(broadcast(t0row))
      .withColumn("__tr", (col("__t") - col("__t0")).cast("decimal(38,0)"))
    val agg = ann.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).cast("decimal(38,0)").as("__n"),
        sum(col("__tr")).as("__st"),
        sum(col("__w")).as("__sv"),
        sum(col("__tr") * col("__w")).as("__stv"),
        sum(col("__tr") * col("__tr")).as("__stt"),
        max(col("__t")).as("__tmax"),
        max(col("__t0")).as("__t0"))
    // numerators/denominator EXACT in decimal; only the ratios are
    // doubles. Spark caps the product scale, so operands stay (38,0).
    val num = (col("__n") * col("__stv") - col("__st") * col("__sv"))
      .cast("double")
    val den = (col("__n") * col("__stt") - col("__st") * col("__st"))
      .cast("double")
    val slope = num / den                       // fixed-point v units/s
    val mean = col("__sv").cast("double") / col("__n").cast("double")
    val meanT = col("__st").cast("double") / col("__n").cast("double")
    val atT = (col("__tmax") - col("__t0") + lit(horizonSecs)).cast("double")
    val ok = col("__n").cast("long") > 1L && den > lit(0.0)
    agg.select((keys.map(col) ++ Seq(
      col("__n").cast("long").as("n_samples"),
      when(ok, round(slope / lit(factor), 6)).as("deriv_per_s"),
      when(ok, round((mean + slope * (atT - meanT)) / lit(factor), 6))
        .as("predict"))): _*)
  }

  /** W12: classical additive seasonal decomposition — the
    * deterministic sibling of ClickHouse's `seriesDecomposeSTL`
    * (which is loess-based and engine-private): per key, split a
    * regular series into trend + seasonal + residual by the textbook
    * moving-average method (Hyndman & Athanasopoulos, "Forecasting:
    * Principles and Practice", §6.3 — the procedure STL refines):
    *
    *   trend_i    = centered moving average over w points
    *                (w = period, forced odd by +1 — the equal-weight
    *                convention; rows whose window leaves the series
    *                get null trend, the standard edge rule)
    *   seasonal_p = mean of (v − trend) over each phase
    *                p = (rank − 1) mod period, re-centered so the
    *                per-key seasonal indices sum to 0
    *   residual_i = v_i − trend_i − seasonal_{p(i)}
    *
    * Exactness (the A17 discipline, engine-portable): v enters as the
    * fixed-point w_fp = floor(v·10^scale) DECIMAL; the trend window
    * sum is exact; the detrended numerator v_fp·w − Σwindow is an
    * exact integer (no double subtraction of near-equal magnitudes);
    * phase means divide exact integers in ONE double op each and are
    * rounded to 9 before the DECIMAL(28,9) re-centering sum (the X13
    * order-free convention) — so every emitted value is reproducible
    * bit-for-bit in any engine. Rows with null ts/value or NaN drop.
    *
    * Plan shape: one key exchange carrying the series sort (the
    * trend frame, the rank, and the total count all ride it), one
    * (keys, phase)-keyed partial+final aggregate over PERIOD-sized
    * output, one keys-level re-centering aggregate over ≤ period
    * rows, and one broadcast-sized join of the seasonal indices back
    * onto the rows — raw volume crosses the wire once.
    */
  def seriesDecompose(df: DataFrame, keys: Seq[String], ord: Column,
      value: Column, period: Int, scale: Int = 6): DataFrame = {
    require(period >= 2, s"period must be >= 2: $period")
    val w = if (period % 2 == 1) period else period + 1
    val h = w / 2
    val factor = math.pow(10.0, scale)
    val keyCols = keys.map(col)
    val win = Window.partitionBy(keyCols: _*).orderBy(ord)
    val frame = win.rowsBetween(-h, h)
    val whole = Window.partitionBy(keyCols: _*)
    val base = df
      .where(ord.isNotNull && value.isNotNull &&
        !isnan(value.cast("double")))
      .withColumn("__ord", ord)
      .withColumn("__v",
        floor(value.cast("double") * lit(factor)).cast("decimal(38,0)"))
      .withColumn("__rn", row_number().over(win))
      .withColumn("__n", count(lit(1)).over(whole))
      .withColumn("__phase", pmod(col("__rn") - 1, lit(period)))
      .withColumn("__tsum", sum(col("__v")).over(frame))
      .withColumn("__tok",
        col("__rn") > h && col("__rn") <= col("__n") - h)
    val rows = base
      .withColumn("trend", when(col("__tok"),
        round(col("__tsum").cast("double") / lit(w.toDouble * factor), 6)))
      // detrended numerator: v·w − Σwindow, an EXACT integer in units
      // of 10^-scale/w
      .withColumn("__dnum", when(col("__tok"),
        col("__v") * lit(w) - col("__tsum")))
    val seasonalRaw = rows
      .where(col("__tok"))
      .groupBy((keyCols :+ col("__phase")): _*)
      .agg(sum(col("__dnum")).as("__a"), count(lit(1)).as("__m"))
      .withColumn("__sraw",
        round(col("__a").cast("double") /
          (col("__m").cast("double") * lit(w.toDouble * factor)), 9)
          .cast("decimal(28,9)"))
    // re-centering mean: exact DECIMAL sum → ONE double division →
    // round-9 back to DECIMAL (never decimal-by-decimal division,
    // whose scale rules differ across engines)
    val centered = seasonalRaw
      .withColumn("__smean",
        round(sum(col("__sraw")).over(Window.partitionBy(keyCols: _*))
            .cast("double") /
          count(lit(1)).over(Window.partitionBy(keyCols: _*))
            .cast("double"), 9)
          .cast("decimal(28,9)"))
      .select((keyCols :+ col("__phase")) :+
        round((col("__sraw") - col("__smean")).cast("double"), 6)
          .as("seasonal"): _*)
    rows
      .join(centered, keys :+ "__phase")
      .select((keyCols ++ Seq(
        col("__ord").as("ord"),
        round(col("__v").cast("double") / lit(factor), 6).as("value"),
        col("trend"),
        col("seasonal"),
        when(col("trend").isNotNull,
          round(col("__v").cast("double") / lit(factor) -
            col("trend") - col("seasonal"), 6)).as("residual"))): _*)
  }

  /** W13: sample autocorrelation function — the deterministic
    * arithmetic behind period detection (ClickHouse ships
    * `seriesPeriodDetectFFT`; the ACF is the direct-form equivalent
    * for the lag ranges a monitoring table cares about, and unlike an
    * FFT it is exactly reproducible in any engine):
    *
    *   acf(k) = Σ_{i=1..n−k} (v_i − v̄)(v_{i+k} − v̄) / Σ (v_i − v̄)²
    *
    * Exactness: with the fixed-point v_fp and per-key (S = Σv, n),
    * the centered term is computed as the EXACT integer c_i =
    * v_i·n − S (multiplying the classic formula through by n² — both
    * numerator and denominator scale by n², which cancels), so every
    * lag's numerator and the lag-0 denominator are exact DECIMAL sums
    * and acf is ONE double division, round-6. Degenerate (constant)
    * series yield null acf.
    *
    * Plan shape: designed for AGGREGATED series (day/hour grids, the
    * W12 input convention): one rank window per key, each row explodes
    * to maxLag+1 (target-rank, lag) probes, ONE (keys, rank) equi-join
    * pairs them, one (keys, lag) partial+final aggregate — grid-sized
    * throughout, no per-lag pass.
    */
  def autocorrelation(df: DataFrame, keys: Seq[String], ord: Column,
      value: Column, maxLag: Int, scale: Int = 6): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1: $maxLag")
    val factor = math.pow(10.0, scale)
    val keyCols = keys.map(col)
    val win = Window.partitionBy(keyCols: _*).orderBy(ord)
    val base = df
      .where(ord.isNotNull && value.isNotNull &&
        !isnan(value.cast("double")))
      .withColumn("__v",
        floor(value.cast("double") * lit(factor)).cast("decimal(38,0)"))
      .withColumn("__rn", row_number().over(win))
    val stats = base.groupBy(keyCols: _*)
      .agg(sum(col("__v")).as("__s"),
        count(lit(1)).cast("decimal(38,0)").as("__n"))
    val c = base.join(stats, keys)
      .withColumn("__c", col("__v") * col("__n") - col("__s"))
      .select((keyCols :+ col("__rn")) :+ col("__c"): _*)
    val probes = c
      .select((keyCols :+ col("__rn")) :+ col("__c").as("__ca"): _*)
      .withColumn("__k", explode(sequence(lit(0), lit(maxLag))))
      .withColumn("__rt", col("__rn") + col("__k"))
      .drop("__rn")
    val pairs = probes.join(
      c.select((keyCols :+ col("__rn").as("__rt")) :+
        col("__c").as("__cb"): _*),
      keys :+ "__rt")
    val nk = pairs.groupBy((keyCols :+ col("__k")): _*)
      .agg(sum(col("__ca") * col("__cb")).as("__nk"),
        count(lit(1)).cast("long").as("n_pairs"))
    val d0 = nk.where(col("__k") === 0)
      .select((keyCols :+ col("__nk").as("__d")): _*)
    nk.join(d0, keys)
      .select((keyCols ++ Seq(
        col("__k").cast("long").as("lag"),
        col("n_pairs"),
        when(col("__d") > 0,
          round(col("__nk").cast("double") / col("__d").cast("double"),
            6)).as("acf"))): _*)
  }

  /** W13b: dominant-period pick off the ACF — the
    * `seriesPeriodDetectFFT` read: the lag ≥ 2 with the highest
    * autocorrelation (ties → smallest lag; lag 1 is excluded as the
    * trivial adjacent-sample correlation). One argmax aggregate over
    * the maxLag-sized ACF table. Keys whose series is degenerate
    * (null acf everywhere) drop.
    */
  def periodDetect(df: DataFrame, keys: Seq[String], ord: Column,
      value: Column, maxLag: Int, scale: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    autocorrelation(df, keys, ord, value, maxLag, scale)
      .where(col("lag") >= 2 && col("acf").isNotNull)
      .groupBy(keyCols: _*)
      .agg(max_by(
        struct(col("lag"), col("acf")),
        struct(col("acf").as("a"), (-col("lag")).as("nl"))).as("__w"))
      .select((keyCols ++ Seq(
        col("__w.lag").as("period"), col("__w.acf").as("acf"))): _*)
  }

  /** W4e: Tukey-fence outliers — ClickHouse `seriesOutliersDetectTukey`
    * as a distributed read: flag rows whose value falls outside
    * [q1 − k·IQR, q3 + k·IQR] of their key's distribution. The ROBUST
    * sibling of [[rollingZScore]] (quartiles shrug off the very tail
    * mass a mean/σ baseline absorbs), and a whole-distribution read
    * rather than a trailing-window one.
    *
    * Engine-portable numerics: quartiles are computed on the
    * fixed-point long w = floor(v·10^scale) with the standard p·(n−1)
    * linear interpolation (the A16 convention) — interpolated values
    * land on the exact binary grid {.0, .25, .5, .75}, k·IQR at
    * k = 1.5 stays on the .125 grid, so the fence COMPARISONS are
    * exact in any engine; only the reported fences divide back to
    * value units (round-6). Null values drop.
    *
    * Scale: one (keys) partial+final percentile aggregate (state
    * bounded by distinct fixed-point values per key — cell-bounded
    * for bounded-precision inputs), broadcast of the |keys|-row fence
    * table back onto the corpus, map-only flag — two scans, NO
    * per-key sort of raw volume. Output: outlier rows with
    * (lo_fence, hi_fence) appended.
    */
  def tukeyOutliers(df: DataFrame, keys: Seq[String], value: Column,
      k: Double = 1.5, scale: Int = 2): DataFrame = {
    require(k > 0, s"fence multiplier must be positive: $k")
    val factor = math.pow(10.0, scale)
    val withW = df
      .withColumn("__w", floor(value.cast("double") * lit(factor)))
      .where(col("__w").isNotNull)
    val iqr = col("__q3") - col("__q1")
    val fences = withW
      .groupBy(keys.map(col): _*)
      .agg(expr("percentile(__w, 0.25D)").as("__q1"),
        expr("percentile(__w, 0.75D)").as("__q3"))
      .select((keys.map(col) ++ Seq(
        (col("__q1") - lit(k) * iqr).as("__lo"),
        (col("__q3") + lit(k) * iqr).as("__hi"))): _*)
    withW.join(broadcast(fences), keys)
      .where(col("__w") < col("__lo") || col("__w") > col("__hi"))
      .withColumn("lo_fence", round(col("__lo") / lit(factor), 6))
      .withColumn("hi_fence", round(col("__hi") / lit(factor), 6))
      .drop("__w", "__lo", "__hi")
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

  /** Counter semantics over a per-key sample stream — ClickHouse
    * `deltaSum` fused with the Prometheus `increase`/`rate` pair, the
    * query an observability backend answers over every monotonic
    * counter the reference ingests (its own insert counters,
    * reference internal/metrics/metrics.go:10-24, are this shape):
    * per key, order samples by `ord`, sum only the POSITIVE deltas
    * between consecutive samples (a drop is a counter reset — the
    * restarted process re-counts from 0, and the pre-reset total must
    * not be subtracted), count the resets, and derive the average
    * per-second rate over the observed span.
    *
    * Engine-portable numerics: samples are cast to DECIMAL(18,6)
    * BEFORE differencing, so each delta is exact and the positive-
    * delta sum is a DECIMAL(38,6) — exact in any accumulation order
    * (the double formulation would make the sum partition-order
    * dependent). The rate is one guarded double division rounded at
    * the end.
    *
    * Scale: one hash-partition window per key (the unavoidable
    * per-key sort — deltas are adjacency facts), then one
    * partial+final aggregate that collapses to ONE row per key before
    * the second exchange. Sample volume reaches exactly one shuffle,
    * once; for a 100 TB metrics store pre-bucketed by (key, window)
    * the same fold runs per bucket and the per-bucket partials merge
    * by addition — deltaSum's state is mergeable because only the
    * boundary sample pair spans buckets.
    *
    * Output: keys :+ (n_samples, n_resets, delta_sum, span_s,
    * rate_per_s).
    */
  def deltaSum(
      df: DataFrame,
      keys: Seq[String],
      ord: Seq[Column],
      ts: Column,
      value: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    val v = value.cast("decimal(18,6)")
    df.withColumn("__v", v)
      .withColumn("__ts", ts.cast("long"))
      .withColumn("__d", col("__v") - lag(col("__v"), 1).over(w))
      .groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n_samples"),
        count(when(col("__d") < 0, lit(1))).as("n_resets"),
        coalesce(sum(when(col("__d") > 0, col("__d"))),
          lit(java.math.BigDecimal.ZERO).cast("decimal(38,6)"))
          .as("delta_sum"),
        (max(col("__ts")) - min(col("__ts"))).as("span_s"))
      .withColumn("rate_per_s",
        when(col("span_s") > 0,
          round(col("delta_sum").cast("double") /
            col("span_s").cast("double"), 6)))
  }

  /** Mergeable [[deltaSum]] state over a slice of the sample stream —
    * the partial/merge/finalize algebra that makes counter analytics
    * incremental at 100 TB: fold each time-partition of the metrics
    * store once, keep one state row per (key, partition), and answer
    * any partition-aligned range query by merging states instead of
    * re-reading samples (the MatView discipline, A14).
    *
    * Unlike the OHLC/matview states this one is NOT order-free:
    * deltas are adjacency facts, so two slices merge EXACTLY iff
    * their `ord` ranges are disjoint (e.g. day-partitioned samples —
    * the natural layout). The merge stitches the one boundary delta
    * (next slice's first sample minus this slice's last) that the
    * per-slice folds could not see. Overlapping slices violate the
    * precondition and are the caller's bug, same contract as
    * ClickHouse's deltaSum merge ("values must not overlap").
    *
    * State: n_samples, n_resets, pos_sum, lo_ord/hi_ord (slice
    * bounds), first_v/last_v (boundary samples), min_ts/max_ts.
    * [[mergeDeltaSumStates]] output is itself a state — merges
    * compose hierarchically (partition → day → month).
    */
  def deltaSumState(
      df: DataFrame,
      keys: Seq[String],
      ord: Seq[Column],
      ts: Column,
      value: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    val o = struct(ord.zipWithIndex.map { case (c, i) => c.as(s"o$i") }: _*)
    df.withColumn("__v", value.cast("decimal(18,6)"))
      .withColumn("__ts", ts.cast("long"))
      .withColumn("__o", o)
      .withColumn("__d", col("__v") - lag(col("__v"), 1).over(w))
      .groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n_samples"),
        count(when(col("__d") < 0, lit(1))).as("n_resets"),
        coalesce(sum(when(col("__d") > 0, col("__d"))),
          lit(java.math.BigDecimal.ZERO).cast("decimal(38,6)")).as("pos_sum"),
        min(col("__o")).as("lo_ord"),
        max(col("__o")).as("hi_ord"),
        min_by(col("__v"), col("__o")).as("first_v"),
        max_by(col("__v"), col("__o")).as("last_v"),
        min(col("__ts")).as("min_ts"),
        max(col("__ts")).as("max_ts"))
  }

  /** Merge ord-range-disjoint [[deltaSumState]] rows to one state per
    * key: order slices by lo_ord, add each boundary delta (first_v of
    * a slice minus last_v of its predecessor) into the positive-delta
    * sum / reset count, and recombine the bounds. One window over
    * |states| rows (slice-count sized, not sample-count) + one
    * partial+final aggregate.
    */
  def mergeDeltaSumStates(states: DataFrame, keys: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("lo_ord"))
    states
      .withColumn("__bd", col("first_v") - lag(col("last_v"), 1).over(w))
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("n_samples")).as("n_samples"),
        (sum(col("n_resets")) +
          count(when(col("__bd") < 0, lit(1)))).as("n_resets"),
        (coalesce(sum(col("pos_sum")),
          lit(java.math.BigDecimal.ZERO).cast("decimal(38,6)")) +
          coalesce(sum(when(col("__bd") > 0, col("__bd"))),
            lit(java.math.BigDecimal.ZERO).cast("decimal(38,6)")))
          .cast("decimal(38,6)").as("pos_sum"),
        min(col("lo_ord")).as("lo_ord"),
        max(col("hi_ord")).as("hi_ord"),
        min_by(col("first_v"), col("lo_ord")).as("first_v"),
        max_by(col("last_v"), col("hi_ord")).as("last_v"),
        min(col("min_ts")).as("min_ts"),
        max(col("max_ts")).as("max_ts"))
  }

  /** Read face: a merged state rendered as the [[deltaSum]] answer. */
  def finalizeDeltaSum(state: DataFrame, keys: Seq[String]): DataFrame =
    state.select(keys.map(col) ++ Seq(
      col("n_samples"), col("n_resets"),
      col("pos_sum").as("delta_sum"),
      (col("max_ts") - col("min_ts")).as("span_s")): _*)
      .withColumn("rate_per_s",
        when(col("span_s") > 0,
          round(col("delta_sum").cast("double") /
            col("span_s").cast("double"), 6)))

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
  /** W10: largestTriangleThreeBuckets — the ClickHouse LTTB
    * downsampler (Steinarsson 2013, "Downsampling Time Series for
    * Visual Representation"): reduce each key's (x, y) series to
    * `nOut` points keeping the first and last and, per interior
    * bucket, the point forming the largest triangle with the
    * previously SELECTED point and the next bucket's centroid — the
    * visually-faithful downsample a dashboard draws.
    *
    * The selection is inherently SEQUENTIAL per key (each pick
    * depends on the previous pick), so no order-free aggregate
    * exists: the series is collected sorted into one aggregate state
    * (group-sized, exactly the memory bound ClickHouse's own
    * aggregate state pays) and a scalar fold runs ONCE PER KEY over
    * that array — the legitimate read-face-UDF use: |keys|
    * invocations over downsample-input arrays, never a per-input-row
    * UDF in the scan path. Area ties keep the earliest point
    * (strict >), making the pick deterministic; callers pre-filter
    * null x/y. Output: keys :+ (x, y, pos) exploded back to rows,
    * pos = 0-based selection index.
    */
  def lttb(df: DataFrame, keys: Seq[String], x: Column, y: Column,
      nOut: Int): DataFrame = {
    require(nOut >= 2, s"nOut must be >= 2: $nOut")
    val sel = udf((pts: Seq[org.apache.spark.sql.Row]) => {
      val p = pts.map(r => (r.getDouble(0), r.getDouble(1)))
      lttbSelect(p, nOut)
    })
    df.groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(
        struct(x.cast("double").as("x"), y.cast("double").as("y"))))
        .as("__pts"))
      .withColumn("__sel", sel(col("__pts")))
      .select((keys.map(col) :+
        posexplode(col("__sel")).as(Seq("pos", "__p"))): _*)
      .select((keys.map(col) ++ Seq(
        col("__p._1").as("x"), col("__p._2").as("y"),
        col("pos").cast("long").as("pos"))): _*)
  }

  /** The scalar LTTB fold — public so the spec can law-check the
    * Spark plumbing against the same reference it property-tests.
    */
  def lttbSelect(points: Seq[(Double, Double)],
      nOut: Int): Seq[(Double, Double)] = {
    val m = points.size
    if (m <= nOut || m <= 2 || nOut <= 2)
      return if (m <= nOut) points
      else Seq(points.head, points.last)
    val buckets = nOut - 2
    val out = scala.collection.mutable.ArrayBuffer(points.head)
    var anchor = 0
    var i = 0
    while (i < buckets) {
      val lo = 1 + (i.toLong * (m - 2) / buckets).toInt
      val hi = 1 + ((i + 1).toLong * (m - 2) / buckets).toInt
      val nLo = hi
      val nHi = if (i == buckets - 1) m
        else 1 + ((i + 2).toLong * (m - 2) / buckets).toInt
      var cx = 0.0; var cy = 0.0
      var j = nLo
      while (j < nHi) { cx += points(j)._1; cy += points(j)._2; j += 1 }
      val w = nHi - nLo
      cx /= w; cy /= w
      val (ax, ay) = points(anchor)
      var best = lo; var bestArea = -1.0
      j = lo
      while (j < hi) {
        val (px, py) = points(j)
        val area = math.abs((ax - cx) * (py - ay) - (ax - px) * (cy - ay))
        if (area > bestArea) { bestArea = area; best = j }
        j += 1
      }
      out += points(best)
      anchor = best
      i += 1
    }
    out += points.last
    out.toSeq
  }

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

  /** W15: CUSUM changepoint estimate per key — the classic
    * cumulative-sum location test (Page 1954; the at-most-one-change
    * mean-shift estimator): the changepoint is the index maximizing
    * |S_t|, S_t = Σ_{i≤t}(v_i − v̄), and the magnitude max|S_t| is the
    * shift evidence a monitor thresholds. ClickHouse ships this read
    * as part of its anomaly toolbox; here it is one window + one
    * argmax over the aggregated series.
    *
    * Exactness: with fixed-point v and per-key totals (T = Σv, n),
    * the statistic is computed as the EXACT integer
    * D_t = n·C_t − t·T (C_t the prefix sum — multiplying S_t through
    * by n), so the argmax ordering never touches a double; only the
    * reported magnitude divides back to value units (max|S| =
    * max|D|/n, one double division, round-6). Ties → smallest t.
    * t ranges over 1..n−1 (D_n ≡ 0 is excluded — a "change after the
    * last point" is no change). Keys with n < 2 drop.
    *
    * Plan shape: the W12/W13 aggregated-series convention — one rank
    * window per key over GRID-sized rows, one keys aggregate for
    * (T, S2, n), one broadcast-size join back, one argmax aggregate.
    * Raw volume pays exactly one upstream pre-aggregation.
    *
    * Output: keys :+ (n_rows, cp_ord, cusum_abs, p_approx) — p_approx
    * is the Brownian-bridge tail 2·exp(−2b²), b = max|S|/(σ̂√n): the
    * asymptotic significance read a monitor thresholds instead of a
    * raw magnitude (and the feed [[graft.operators.StatsAgg.fdrAdjust]]
    * expects). Null when σ̂ = 0.
    */
  def cusumChangepoint(df: DataFrame, keys: Seq[String], ord: Column,
      value: Column, scale: Int = 6): DataFrame = {
    val factor = math.pow(10.0, scale)
    val keyCols = keys.map(col)
    val win = Window.partitionBy(keyCols: _*).orderBy(ord)
    val base = df
      .where(ord.isNotNull && value.isNotNull &&
        !isnan(value.cast("double")))
      .withColumn("__ord", ord)
      .withColumn("__v",
        floor(value.cast("double") * lit(factor)).cast("decimal(38,0)"))
      .withColumn("__rn", row_number().over(win).cast("decimal(38,0)"))
      .withColumn("__c", sum(col("__v"))
        .over(win.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val stats = base.groupBy(keyCols: _*)
      .agg(sum(col("__v")).as("__t"),
        sum(col("__v") * col("__v")).as("__s2"),
        count(lit(1)).cast("decimal(38,0)").as("__n"))
    val agg = base.join(stats, keys)
      .where(col("__rn") < col("__n"))
      .withColumn("__d", col("__c") * col("__n") - col("__rn") * col("__t"))
      .groupBy(keyCols: _*)
      .agg(max_by(
          struct(col("__ord"), col("__d"), col("__rn")),
          struct(abs(col("__d")).as("a"), (-col("__rn")).as("nr"))).as("__w"),
        max(col("__n")).as("__nn"),
        max(col("__t")).as("__tt"),
        max(col("__s2")).as("__ss2"))
    // Brownian-bridge significance: under H0 (iid, variance σ²) the
    // normalized CUSUM path S_⌊nu⌋/(σ√n) converges to a Brownian
    // bridge, whose sup-|B| tail is the Kolmogorov series —
    // P(sup|B| > b) ≈ 2·exp(−2b²), the FIRST term only: an upper
    // bound whose omitted second term 2·exp(−8b²) is ~1.3e-4 at
    // b = 1.1, so the truncation is visible on a round-6 grid until
    // b ≳ 1.4 (r18 ADVICE — the tail here is a deliberate one-term
    // screen, coarser than the 3-term ksP the KS test carries; the
    // SQL oracle mirrors this same one-term tree literal-for-literal,
    // so cross-engine parity is unaffected). b = max|D|/(σ·n^1.5) off
    // the same exact integers as the statistic (σ² via power sums),
    // one double tree. σ = 0 → null.
    val nD = col("__nn").cast("double")
    val maxD = abs(col("__w.__d")).cast("double")
    val muFp = col("__tt").cast("double") / nD
    val sigma2 = col("__ss2").cast("double") / nD - muFp * muFp
    val b = maxD / (sqrt(sigma2) * nD * sqrt(nD))
    agg.select((keyCols ++ Seq(
      col("__nn").cast("long").as("n_rows"),
      col("__w.__ord").as("cp_ord"),
      round(maxD / (nD * lit(factor)), 6).as("cusum_abs"),
      when(sigma2 > lit(0.0),
        round(least(lit(1.0), lit(2.0) * exp(lit(-2.0) * b * b)), 6))
        .as("p_approx"))): _*)
  }

  /** W16: MAD-based modified z-score per row (Iglewicz & Hoaglin
    * 1993, the 0.6745·(x − median)/MAD rule) — the missing member of
    * the anomaly family: [[rollingZScore]] is a trailing mean/σ
    * baseline, [[tukeyOutliers]] a quartile FENCE; this is the robust
    * whole-distribution SCORE (a z each row can be ranked by, with
    * the median/MAD location+scale that a heavy tail cannot drag the
    * way it drags mean/σ).
    *
    * Engine-portable numerics (the [[tukeyOutliers]] grid argument,
    * one level deeper): medians interpolate the fixed-point integer
    * w = floor(v·10^scale) and land on the exact binary .5 grid;
    * deviations |w − med| then sit on the .5 grid so the MAD lands on
    * the .25 grid — every comparison input is exact in any engine,
    * and z = 0.6745·(w − med)/mad is ONE fixed double tree. The
    * reported z FLOOR-quantizes to the 1e-6 grid rather than
    * round(6): the coarse exact input grids make z repeat across rows
    * and land exactly on 6-decimal rounding boundaries, where
    * engines' round-on-double implementations legitimately differ by
    * one ulp — floor of the identical tree is exact everywhere. The
    * outlier flag compares the unrounded |z| against `threshold`
    * (exact inputs + identical tree ⇒ cross-engine identical flag).
    * Keys with MAD = 0 (over half the mass on one value) yield null
    * z/flag rather than a division blowup — the documented MAD
    * degeneracy.
    *
    * Scale: two (keys) percentile aggregates (state bounded by
    * distinct fixed-point values per key), each joined back broadcast
    * (|keys|-row tables), flag map-only — three corpus scans, no
    * per-key sort of raw volume. Output: input keys + (tie, value,
    * robust_z, is_outlier).
    */
  def madZScore(df: DataFrame, keys: Seq[String], tie: Column,
      value: Column, threshold: Double = 3.5, scale: Int = 2): DataFrame = {
    require(threshold > 0, s"threshold must be positive: $threshold")
    val factor = math.pow(10.0, scale)
    val withW = df
      .where(value.isNotNull && !isnan(value.cast("double")))
      .select((keys.map(col) :+ tie.as("__tie")) :+ value.as("__v"): _*)
      .withColumn("__w", floor(col("__v").cast("double") * lit(factor)))
    val med = withW.groupBy(keys.map(col): _*)
      .agg(expr("percentile(__w, 0.5D)").as("__med"))
    val withDev = withW.join(broadcast(med), keys)
      .withColumn("__dev", abs(col("__w") - col("__med")))
    val mad = withDev.groupBy(keys.map(col): _*)
      .agg(expr("percentile(__dev, 0.5D)").as("__mad"))
    val z = lit(0.6745) * (col("__w") - col("__med")) / col("__mad")
    withDev.join(broadcast(mad), keys)
      .select((keys.map(col) ++ Seq(
        col("__tie").as("tie"),
        col("__v").as("value"),
        when(col("__mad") > lit(0.0),
          floor(z * lit(1000000.0)) / lit(1000000.0)).as("robust_z"),
        when(col("__mad") > lit(0.0), abs(z) > lit(threshold))
          .as("is_outlier"))): _*)
  }

  /** W17: forecast backtest accuracy per key — MAE, RMSE, and MASE
    * (Hyndman & Koehler 2006, "Another look at measures of forecast
    * accuracy") of a caller-provided one-step forecast column against
    * actuals over an ordered series. MASE scales the forecast's MAE
    * by the in-sample seasonal-naive MAE (the lag-`period` forecast),
    * so 1.0 means "no better than repeating last season" — the
    * evaluation face the W14/W14b forecast family needs to be
    * honest about itself.
    *
    * Exactness: actual and forecast quantize to the fixed-point grid,
    * so every |error| and squared error is an exact integer, the
    * three error sums are exact DECIMALs (order-free), and each
    * reported metric is one fixed double tree (round-6). Rows with a
    * null forecast (e.g. the warm-up of a lag-based forecast) are
    * excluded from MAE/RMSE; the seasonal-naive denominator runs over
    * the rows with a lag-`period` predecessor. Keys with no scored
    * rows drop; a zero seasonal-naive MAE (perfectly periodic
    * actuals) yields null MASE.
    *
    * Scale: the W12/W13 aggregated-grid convention — one window per
    * key over grid-sized rows, one aggregate. Output: keys +
    * (n_scored, mae, rmse, mase).
    */
  def forecastAccuracy(df: DataFrame, keys: Seq[String], ord: Column,
      actual: Column, forecast: Column, period: Int,
      scale: Int = 6): DataFrame = {
    require(period >= 1, s"period must be >= 1: $period")
    val factor = math.pow(10.0, scale)
    val keyCols = keys.map(col)
    val win = Window.partitionBy(keyCols: _*).orderBy(ord)
    def fp(c: Column) =
      floor(c.cast("double") * lit(factor)).cast("decimal(38,0)")
    val base = df
      .where(ord.isNotNull && actual.isNotNull &&
        !isnan(actual.cast("double")))
      .withColumn("__a", fp(actual))
      .withColumn("__f",
        when(forecast.isNotNull && !isnan(forecast.cast("double")),
          fp(forecast)))
      .withColumn("__sn", lag(col("__a"), period).over(win))
    val agg = base.groupBy(keyCols: _*)
      .agg(
        count(col("__f")).as("n_scored"),
        sum(abs(col("__a") - col("__f"))).as("__se"),
        sum((col("__a") - col("__f")) * (col("__a") - col("__f")))
          .as("__se2"),
        count(col("__sn")).as("__nsn"),
        sum(abs(col("__a") - col("__sn"))).as("__ssn"))
    val n = col("n_scored").cast("double")
    val mae = col("__se").cast("double") / n / lit(factor)
    val rmse = sqrt(col("__se2").cast("double") / n) / lit(factor)
    val snMae = col("__ssn").cast("double") /
      col("__nsn").cast("double") / lit(factor)
    agg.where(col("n_scored") > 0)
      .select((keyCols ++ Seq(
        col("n_scored"),
        round(mae, 6).as("mae"),
        round(rmse, 6).as("rmse"),
        when(col("__nsn") > 0 && col("__ssn") > 0,
          round(mae / snMae, 6)).as("mase"))): _*)
  }

  /** W18: Mann–Kendall trend test per key (Mann 1945; Kendall 1975) —
    * the SIGNIFICANCE companion to [[theilSen]]'s magnitude (the
    * standard pairing in trend analysis: MK decides whether a
    * monotonic trend exists, Theil–Sen estimates its slope):
    *
    *   S   = Σ_{i<j} sign(v_j − v_i)
    *   var = ( n(n−1)(2n+5) − Σ_t t(t−1)(2t+5) ) / 18
    *   z   = (S ∓ 1)/√var  (continuity-corrected; 0 when S = 0)
    *   τ_b = S / √( (n0 − n1)(n0 − n2) ),  n0 = n(n−1)/2,
    *         n1/n2 = Σ t(t−1)/2 over value/ord tie groups
    *
    * Exactness: every pair sign compares exact fixed-point integers,
    * so S, the tie sums, n0/n1/n2 are all exact integers and each
    * reported statistic is one fixed double tree (round-6). Keys with
    * n < 2 drop (no pairs); all-tied values (var = 0) or a degenerate
    * τ denominator yield nulls.
    *
    * Plan shape: the [[theilSen]] aggregated-grid posture — one
    * (keys)-keyed self-join over GRID-sized rows for S, two bounded
    * tie-group aggregates, one keys fold. Output: keys :+ (n_rows,
    * s_stat, tau, z_stat, p_value — two-sided normal, round-6).
    */
  def mannKendall(df: DataFrame, keys: Seq[String], ord: Column,
      value: Column, scale: Int = 6): DataFrame = {
    val factor = math.pow(10.0, scale)
    val base = df
      .where(ord.isNotNull && value.isNotNull &&
        !isnan(value.cast("double")))
      .select((keys.map(col) :+ ord.cast("long").as("__o")) :+
        floor(value.cast("double") * lit(factor)).cast("decimal(38,0)")
          .as("__v"): _*)
    val a = base.select((keys.map(col) :+ col("__o").as("__oa")) :+
      col("__v").as("__va"): _*)
    val b = base.select((keys.map(col) :+ col("__o").as("__ob")) :+
      col("__v").as("__vb"): _*)
    val s = a.join(b, keys).where(col("__ob") > col("__oa"))
      .groupBy(keys.map(col): _*)
      .agg(sum(signum((col("__vb") - col("__va")).cast("double"))
        .cast("long")).as("s_stat"))
    def tieSum(c: String) = base
      .groupBy((keys.map(col) :+ col(c)): _*)
      .agg(count(lit(1)).as("__t"))
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__groups"),
        sum(col("__t") * (col("__t") - 1) * (lit(2) * col("__t") + 5))
          .as("__t25"),
        sum(col("__t") * (col("__t") - 1)).as("__t2"))
    val vt = tieSum("__v")
      .select((keys.map(col) ++ Seq(col("__t25").as("__vt25"),
        col("__t2").as("__vt2"))): _*)
    val ot = tieSum("__o")
      .select((keys.map(col) :+ col("__t2").as("__ot2")): _*)
    val n = base.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
    val nD = col("n_rows").cast("double")
    val sD = col("s_stat").cast("double")
    val varS = (nD * (nD - lit(1.0)) * (lit(2.0) * nD + lit(5.0)) -
      col("__vt25").cast("double")) / lit(18.0)
    val n0 = nD * (nD - lit(1.0)) / lit(2.0)
    val n1 = col("__vt2").cast("double") / lit(2.0)
    val n2 = col("__ot2").cast("double") / lit(2.0)
    val tauDen = (n0 - n1) * (n0 - n2)
    val zRaw = when(col("s_stat") > 0, (sD - lit(1.0)) / sqrt(varS))
      .when(col("s_stat") < 0, (sD + lit(1.0)) / sqrt(varS))
      .otherwise(lit(0.0))
    // the p-value reads the ROUNDED z the gate already proves
    // bit-identical, so its cross-engine parity is inherited
    val zOut = when(col("n_rows") >= 2 && varS > lit(0.0), round(zRaw, 6))
    n.join(s, keys).join(vt, keys).join(ot, keys)
      .select((keys.map(col) ++ Seq(
        col("n_rows"), col("s_stat"),
        when(tauDen > lit(0.0), round(sD / sqrt(tauDen), 6)).as("tau"),
        zOut.as("z_stat"))): _*)
      .withColumn("p_value",
        graft.functions.NormalDist.twoSidedP(col("z_stat")))
  }

  /** X27: Theil–Sen slope estimator per key (Theil 1950; Sen 1968) —
    * the ROBUST trend read (median of all pairwise slopes; breakdown
    * point ~29% vs least-squares' 0%), the companion [[counterStats]]
    * and `predictLinear` need when the series carries outliers the
    * mean-based slope would chase.
    *
    * Exactness: each pairwise slope divides an exact integer value
    * delta by an exact integer ord delta (ONE IEEE division — engine
    * deterministic), then quantizes to the fixed-point grid
    * (floor·10^scale, the [[tukeyOutliers]] convention) so the median
    * interpolation runs over integers and lands on the exact binary
    * .5 grid. Reported slope divides back to value units, round-6.
    *
    * Plan shape: designed for AGGREGATED series (the W12/W13 grid
    * convention): one (keys)-keyed self-join producing the m(m−1)/2
    * ordered pairs per key — GRID-sized squared, never raw volume
    * (a 365-point daily grid is 66k pairs; raw events never touch the
    * join) — then one exact-percentile aggregate. Keys with < 2
    * points drop.
    */
  def theilSen(df: DataFrame, keys: Seq[String], ord: Column,
      value: Column, scale: Int = 6): DataFrame = {
    val factor = math.pow(10.0, scale)
    val base = df
      .where(ord.isNotNull && value.isNotNull &&
        !isnan(value.cast("double")))
      .select((keys.map(col) :+ ord.cast("long").as("__o")) :+
        floor(value.cast("double") * lit(factor)).cast("decimal(38,0)")
          .as("__v"): _*)
    val a = base.select((keys.map(col) :+ col("__o").as("__oa")) :+
      col("__v").as("__va"): _*)
    val b = base.select((keys.map(col) :+ col("__o").as("__ob")) :+
      col("__v").as("__vb"): _*)
    a.join(b, keys).where(col("__ob") > col("__oa"))
      .withColumn("__s",
        floor((col("__vb") - col("__va")).cast("double") /
          (col("__ob") - col("__oa")).cast("double")))
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_pairs"),
        expr("percentile(__s, 0.5D)").as("__med"))
      .select((keys.map(col) ++ Seq(
        col("n_pairs"),
        round(col("__med") / lit(factor), 6).as("slope"))): _*)
  }
}
