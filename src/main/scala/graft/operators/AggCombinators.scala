package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ClickHouse aggregate-combinator surface — `groupArray(N)`,
  * `groupUniqArray`, `sumMap` — over the reference's ingested tables
  * (the analytics ClickHouse serves once rows land via
  * `/root/reference/internal/ingestion/clickhouse.go:74,107`; the
  * function family is public ClickHouse SQL surface).
  *
  * Determinism discipline: ClickHouse's own groupArray is
  * fold-order-dependent ("values are added in an indeterminate
  * order") — useless for a value-oracled engine. Every combinator
  * here imposes a caller-supplied total order INSIDE the aggregate
  * (sort_array over collected structs), so the result is a pure
  * function of the input set. One user-keyed partial+final
  * aggregation each — collect_list/collect_set partial-aggregate
  * map-side, so the shuffle carries per-group arrays, not rows.
  *
  * Scale bound (same as ClickHouse's): per-group state is the
  * group's collected values — callers cap it with `limit` semantics
  * at the query level when groups can be pathological.
  */
object AggCombinators {

  /** `groupArray`: values as an array ordered by `order` (made total
    * by appending the value itself as the last sort key), optionally
    * truncated to the first `limit` elements — ClickHouse
    * `groupArray(limit)(v)` with a deterministic order. Use inside
    * `.agg(...)`.
    */
  def groupArray(value: Column, order: Seq[Column],
      limit: Option[Int] = None): Column = {
    val fields = order.zipWithIndex.map { case (c, i) => c.as(s"__o$i") } :+
      value.as("__v")
    val sorted = sort_array(collect_list(struct(fields: _*)))
    val vals = transform(sorted, e => e("__v"))
    limit.fold(vals)(n => slice(vals, 1, n))
  }

  /** `groupArraySorted(k)` (ClickHouse): the k smallest (rank, item)
    * rows per key as a BOUNDED mergeable aggregate
    * ([[graft.functions.BoundedTopK]]). Unlike [[groupArray]]'s limit
    * arm — which collects the WHOLE group, then slices — the state
    * never exceeds k per group per input partition, so a hot key
    * cannot balloon the exchange and no task sorts raw volume (the
    * X12c execution shape with a numeric rank; negate the rank for
    * largest-k). Null rank or item rows skip. Output: keys :+
    * (rank, item-as-string), ascending (rank, item) per key.
    */
  def groupArraySorted(df: DataFrame, keys: Seq[String], rank: Column,
      item: Column, k: Int): DataFrame = {
    val agg = org.apache.spark.sql.functions.udaf(
      new graft.functions.BoundedTopK(k),
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.LONG,
        org.apache.spark.sql.Encoders.STRING))
    df.groupBy(keys.map(col): _*)
      .agg(agg(rank.cast("long"), item.cast("string")).as("__s"))
      .select((keys.map(col) :+ explode(col("__s.items")).as("__e")): _*)
      .select((keys.map(col) :+ col("__e.rank").as("rank")) :+
        col("__e.item").as("item"): _*)
  }

  /** `groupArrayLast(k)` (ClickHouse): the LAST k (rank, item) rows
    * per key under the rank order — the tail mirror of
    * [[groupArraySorted]], same bounded mergeable state
    * ([[graft.functions.BoundedTopK]] on the NEGATED rank keeps the k
    * largest with O(k) state per group per partition; a hot key
    * cannot balloon the exchange and no task sorts raw volume). Ties
    * at equal rank keep the ascending-smallest item (deterministic,
    * the groupArraySorted rule). Null rank or item rows skip.
    * Output: keys :+ (rank, item-as-string), ascending (rank, item)
    * per key — the kept set is the tail, the emission order the
    * natural read order.
    */
  def groupArrayLast(df: DataFrame, keys: Seq[String], rank: Column,
      item: Column, k: Int): DataFrame = {
    val agg = org.apache.spark.sql.functions.udaf(
      new graft.functions.BoundedTopK(k),
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.LONG,
        org.apache.spark.sql.Encoders.STRING))
    df.groupBy(keys.map(col): _*)
      .agg(agg((-rank.cast("long")).cast("long"), item.cast("string"))
        .as("__s"))
      .select((keys.map(col) :+
        explode(sort_array(transform(col("__s.items"), e =>
          struct((-e("rank")).as("rank"), e("item").as("item")))))
          .as("__e")): _*)
      .select((keys.map(col) :+ col("__e.rank").as("rank")) :+
        col("__e.item").as("item"): _*)
  }

  /** `groupArrayIntersect` (ClickHouse): the values present in EVERY
    * row's array per key. Null arrays drop (no vote); an empty array
    * participates and therefore forces an empty intersection — the
    * ClickHouse semantics. Returns EXPLODED (keys, `item`) rows
    * (ascending per key) rather than an array value, so the result
    * joins/filters without a second explode.
    *
    * Shape: per-row `array_distinct` then one (keys, value)
    * partial+final count (a value's count == the key's row count ⟺
    * present in every row), the |keys|-row totals joined back —
    * NO row-id machinery, no collect, nothing order-sensitive; both
    * aggregates map-side combine.
    */
  def groupArrayIntersect(df: DataFrame, keys: Seq[String],
      arr: Column): DataFrame = {
    val rows = df.where(arr.isNotNull)
      .select(keys.map(col) :+ array_distinct(arr).as("__a"): _*)
    val totals = rows.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n"))
    val counts = rows
      .select(keys.map(col) :+ explode(col("__a")).as("item"): _*)
      .groupBy(keys.map(col) :+ col("item"): _*)
      .agg(count(lit(1)).as("__c"))
    counts.join(broadcast(totals), keys)
      .where(col("__c") === col("__n"))
      .select(keys.map(col) :+ col("item"): _*)
  }

  /** `groupUniqArray`: distinct values, ascending — collect_set's
    * nondeterministic order repaired by array_sort. Use inside
    * `.agg(...)`.
    */
  def groupUniqArray(value: Column): Column = array_sort(collect_set(value))

  /** A32 `sparkbar(buckets)` (ClickHouse): per key, an inline unicode
    * bar chart of Σy over `buckets` equal x-intervals — the
    * one-glance series read a monitoring table renders next to its
    * numbers. Determinism convention (oracle-mirrored): x and y must
    * be integral (y ≥ 0 — counts/sums), bucket membership is exact
    * integer arithmetic b = (x − min_x)·buckets div (max_x − min_x + 1)
    * over the KEY's own range (integral `div`, DECIMAL-widened
    * operands), and the glyph level is ceil(8·s / max_s) on exact
    * DECIMAL integers — so the rendered string is bit-identical in
    * any engine at any magnitude (ClickHouse's own float scaling is
    * not). Empty and zero-sum buckets render ' '.
    *
    * Shape: one (keys, bucket) partial+final sum, then ONE keys-level
    * aggregate packing the ≤ `buckets` sums into a map — raw volume
    * reaches one shuffle, once; the render is a map-only transform
    * over a buckets-length sequence. Output: keys :+ (x_min, x_max,
    * bar).
    */
  def sparkbar(df: DataFrame, keys: Seq[String], x: Column, y: Column,
      buckets: Int): DataFrame = {
    require(buckets >= 1 && buckets <= 1024,
      s"buckets must be in [1, 1024]: $buckets")
    val glyphs = "▁▂▃▄▅▆▇█"
    val base = df
      .select((keys.map(col) :+ x.cast("long").as("__x")) :+
        y.cast("long").as("__y"): _*)
      .where(col("__x").isNotNull && col("__y").isNotNull)
    val ranges = base.groupBy(keys.map(col): _*)
      .agg(min(col("__x")).as("__lo"), max(col("__x")).as("__hi"))
    // NO broadcast hint on the range table: it is |keys|-cardinality
    // and unbounded, so forcing it onto every executor's heap is an
    // OOM hazard at high key cardinality — AQE broadcasts it anyway
    // whenever it is actually small
    val sums = base.join(ranges, keys)
      // bucket membership on the EXACT integer grid: `div` is
      // integral division (never the double `/`-then-cast, which is
      // inexact past 2^53); the numerator widens to DECIMAL so
      // (x − lo)·buckets cannot overflow a long at extreme ranges
      .withColumn("__b", expr(
        s"CAST(((CAST(__x AS DECIMAL(38,0)) - __lo) * $buckets) div " +
          "(CAST(__hi AS DECIMAL(38,0)) - __lo + 1) AS BIGINT)"))
      .groupBy((keys.map(col) :+ col("__b")): _*)
      .agg(sum(col("__y")).as("__s"),
        max(col("__lo")).as("__lo"), max(col("__hi")).as("__hi"))
    // glyph level = ceil(8s/mx), computed WITHOUT division: the
    // smallest L in 1..8 with 8s ≤ L·mx, found by counting satisfied
    // thresholds — exact DECIMAL products (8s can overflow a long
    // past 2^60), so the rendered string really is bit-identical in
    // any engine at any magnitude
    val level = (c: Column) => {
      val s8 = c.cast("decimal(38,0)") * lit(8)
      (lit(9) - size(filter(sequence(lit(1), lit(8)),
        l => s8 <= l.cast("decimal(38,0)") *
          col("__mx").cast("decimal(38,0)")))).cast("int")
    }
    sums.groupBy(keys.map(col): _*)
      .agg(map_from_entries(collect_list(
          struct(col("__b"), col("__s")))).as("__m"),
        max(col("__s")).as("__mx"),
        max(col("__lo")).as("x_min"), max(col("__hi")).as("x_max"))
      .withColumn("bar", concat_ws("",
        transform(sequence(lit(0L), lit(buckets - 1L)), i => {
          val s = element_at(col("__m"), i)
          when(s.isNull || s <= 0L || col("__mx") <= 0L, lit(" "))
            .otherwise(lit(glyphs).substr(level(s), lit(1)))
        })))
      .select((keys.map(col) ++ Seq(
        col("x_min"), col("x_max"), col("bar"))): _*)
  }

  /** `sumMap`: per group-key, point-wise sum of a map column — the
    * ClickHouse `sumMap(m)` combinator. Explode → re-aggregate →
    * reassemble sorted-by-key, so map equality is structural.
    * Two partial+final aggregations keyed (group, mapKey) then
    * (group); both partial-aggregate map-side, and the second's
    * state is the group's distinct key set (the map's natural size).
    * Groups whose maps are all empty/null survive with an empty map
    * (explode_outer keeps their row as a null entry; collect_list
    * drops the null struct, and map_from_entries of the empty array
    * is `{}`) — ClickHouse keeps such groups too. Returns
    * `keys :+ sum_map`.
    */
  /** `sumForEach`: per group-key, element-wise sum of an array column
    * — ClickHouse's `-ForEach` combinator applied to `sum`, the
    * aggregate that folds a table of equal-length vectors (feature
    * counts per position, per-dimension embedding stats) into one
    * vector per group. Position-keyed re-aggregation of the exploded
    * elements, then reassembly sorted by position — the same
    * mergeable two-level shape as [[sumMap]] (positions ARE map keys
    * here), so both levels partial-aggregate map-side and the shuffle
    * carries (group × dim) partial sums, never rows. Ragged inputs
    * follow ClickHouse: the result has the length of the LONGEST
    * array, shorter arrays contributing nothing to the tail
    * positions. Null/empty-array groups survive with an empty array.
    * Returns `keys :+ sum_foreach` (element order preserved; Spark's
    * posexplode position is 0-based, but only the order matters —
    * position never surfaces in the output). The intermediate explode
    * columns are aliased `__pos`/`__elem` so grouping keys named
    * `pos`/`col` cannot collide.
    */
  def sumForEach(df: DataFrame, keys: Seq[String], arr: Column): DataFrame = {
    val keyCols = keys.map(col)
    df.select(keyCols :+ posexplode_outer(arr).as(Seq("__pos", "__elem")): _*)
      .groupBy(keyCols :+ col("__pos"): _*)
      .agg(sum(col("__elem")).as("__s"))
      .groupBy(keyCols: _*)
      .agg(transform(sort_array(collect_list(
        when(col("__pos").isNotNull, struct(col("__pos"), col("__s"))))),
        e => e("__s")).as("sum_foreach"))
  }

  /** `groupArrayMovingSum(window)` / `groupArrayMovingAvg(window)`:
    * per group, the array of trailing-`window` moving sums (or avgs)
    * of `value` in caller-supplied `order` — ClickHouse's moving
    * combinator pair with the same determinism repair as
    * [[groupArray]] (the order is imposed INSIDE the aggregate, made
    * total by appending the value). Sums are computed in the exact
    * DECIMAL type of the input value (cast upstream — the caller owns
    * the money-vs-double decision); the avg face divides each exact
    * window sum by its actual window width (shorter at the head, the
    * ClickHouse convention) in one fixed double tree.
    *
    * Shape: ONE partial+final collect aggregation per group (the
    * shuffle carries per-group arrays), then a map-only `transform`
    * over the group-length array computes the prefix differences —
    * per-element cost O(window) via `slice`+`aggregate`, never a
    * second shuffle or a window operator. Group size is the caller's
    * scale bound, exactly as for [[groupArray]].
    */
  def groupArrayMovingSum(value: Column, order: Seq[Column],
      window: Int): Column = {
    require(window > 0, s"window must be positive: $window")
    val fields = order.zipWithIndex.map { case (c, i) => c.as(s"__o$i") } :+
      value.as("__v")
    val sorted = transform(
      sort_array(collect_list(struct(fields: _*))), e => e("__v"))
    // moving sum at 1-based position i = Σ sorted[max(1, i-window+1)..i]
    transform(sorted, (_, idx) => {
      val i = idx + 1
      val lo = greatest(i - window + 1, lit(1))
      aggregate(slice(sorted, lo, i - lo + 1),
        lit(java.math.BigDecimal.ZERO).cast("decimal(38,6)"),
        (acc, x) => acc + x.cast("decimal(38,6)"))
    })
  }

  /** The avg face of [[groupArrayMovingSum]]: each exact window sum
    * divided by its actual width, rounded to 6.
    */
  def groupArrayMovingAvg(value: Column, order: Seq[Column],
      window: Int): Column = {
    val sums = groupArrayMovingSum(value, order, window)
    transform(sums, (s, idx) => {
      val i = idx + 1
      val width = least(i, lit(window)).cast("double")
      round(s.cast("double") / width, 6)
    })
  }

  /** `exponentialMovingAverage`: the classic series EMA folded in
    * caller-imposed total order — ema_1 = v_1, ema_i = α·v_i +
    * (1−α)·ema_{i−1} — as ONE aggregate expression: sorted collect,
    * then `aggregate` over the tail seeded with the head. A recursive
    * definition has no order-free rewrite, so determinism comes from
    * imposing the fold order INSIDE the aggregate (the groupArray
    * discipline); the per-step expression is the same two-multiply-
    * one-add IEEE tree in any engine that folds the same order
    * (DuckDB's `list_reduce` — the oracle — does), so results are
    * bit-identical, not merely close. Group size is the caller's
    * scale bound, as for every collect-based combinator. Null values
    * must be filtered upstream (a null poisons the fold).
    */
  def exponentialMovingAverage(value: Column, order: Seq[Column],
      alpha: Double): Column = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1]: $alpha")
    val fields = order.zipWithIndex.map { case (c, i) => c.as(s"__o$i") } :+
      value.cast("double").as("__v")
    val sorted = transform(
      sort_array(collect_list(struct(fields: _*))), e => e("__v"))
    when(size(sorted) > 0,
      aggregate(
        slice(sorted, lit(2), greatest(size(sorted) - 1, lit(0))),
        element_at(sorted, 1),
        (acc, x) => lit(alpha) * x + lit(1.0 - alpha) * acc))
  }

  /** W14 / A23c: Holt's linear method (double exponential smoothing;
    * Holt 1957, the PromQL `holt_winters` function and every
    * monitoring stack's trend-aware forecast) — the [[
    * exponentialMovingAverage]] recurrence extended with a trend
    * state:
    *
    *   l_1 = v_1,  b_1 = v_2 − v_1
    *   l_t = α·v_t + (1−α)(l_{t−1} + b_{t−1})
    *   b_t = β(l_t − l_{t−1}) + (1−β)·b_{t−1}
    *   forecast(h) = l_n + h·b_n
    *
    * Same determinism argument as the EMA: the fold order is imposed
    * INSIDE the aggregate and each step is a fixed IEEE op tree, so
    * any engine folding the same order (DuckDB's recursive CTE — the
    * oracle) produces bit-identical states; with α = β = 0.5 (the
    * registered query's dials) every multiply is an exact
    * power-of-two scaling, so the whole fold is exact arithmetic
    * outright. Returns a struct column (n_samples, level, trend,
    * forecast) for use inside `.agg(...)`; groups with fewer than 2
    * points yield null level/trend/forecast (no trend is defined).
    * Null values must be filtered upstream.
    */
  def holtLinear(value: Column, order: Seq[Column], alpha: Double,
      beta: Double, horizon: Int): Column = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1]: $alpha")
    require(beta >= 0.0 && beta <= 1.0, s"beta must be in [0, 1]: $beta")
    val fields = order.zipWithIndex.map { case (c, i) => c.as(s"__o$i") } :+
      value.cast("double").as("__v")
    val sorted = transform(
      sort_array(collect_list(struct(fields: _*))), e => e("__v"))
    val n = size(sorted)
    val init = struct(
      element_at(sorted, 1).as("l"),
      (element_at(sorted, 2) - element_at(sorted, 1)).as("b"))
    // fold from t = 2 (the textbook iteration start; the t = 2 step
    // is an arithmetic near-identity given this init, and folding it
    // keeps the op sequence exactly the published recurrence)
    val fold = aggregate(
      slice(sorted, lit(2), greatest(n - 1, lit(0))),
      init,
      (acc, x) => {
        val l2 = lit(alpha) * x +
          lit(1.0 - alpha) * (acc("l") + acc("b"))
        struct(l2.as("l"),
          (lit(beta) * (l2 - acc("l")) +
            lit(1.0 - beta) * acc("b")).as("b"))
      })
    val ok = n >= 2
    struct(
      n.cast("long").as("n_samples"),
      when(ok, round(fold("l"), 6)).as("level"),
      when(ok, round(fold("b"), 6)).as("trend"),
      when(ok, round(fold("l") + lit(horizon.toDouble) * fold("b"), 6))
        .as("forecast"))
  }

  /** W14b: additive Holt–Winters (triple exponential smoothing;
    * Winters 1960; Hyndman & Athanasopoulos, "Forecasting: Principles
    * and Practice" §7.3) — [[holtLinear]] extended with a length-`m`
    * seasonal state, the form behind every seasonal capacity
    * forecast:
    *
    *   init (the standard simple convention):
    *     l_m = mean(v_1..v_m)
    *     b_m = (mean(v_{m+1}..v_{2m}) − mean(v_1..v_m)) / m
    *     s_i = v_i − l_m                       for i = 1..m
    *   for t = m+1..n:
    *     l_t = α(v_t − s_{t−m}) + (1−α)(l_{t−1} + b_{t−1})
    *     b_t = β(l_t − l_{t−1}) + (1−β)·b_{t−1}
    *     s_t = γ(v_t − l_{t−1} − b_{t−1}) + (1−γ)·s_{t−m}
    *   forecast(1) = l_n + b_n + s_{n+1−m}
    *
    * The seasonal state rides the fold accumulator as an m-slot
    * QUEUE (head = s_{t−m}, the index the recurrences read): each
    * step drops the head and appends s_t, so the accumulator stays
    * m+2 doubles regardless of series length. Same determinism
    * argument as [[holtLinear]]: fold order imposed inside the
    * aggregate, each step one fixed IEEE op tree (the oracle's
    * recursive CTE folds the identical tree; the seed sums fold from
    * the first element exactly like DuckDB's list_reduce) — and with
    * α = β = γ = 0.5 every multiply is an exact power-of-two scaling.
    * EXACTNESS LAW (spec): a constant-plus-seasonal integer series is
    * forecast exactly — l stays at the seasonal mean, b at 0, s at
    * the demeaned pattern, and forecast(1) reproduces the next value
    * bit-for-bit. Groups with fewer than 2m points yield null states
    * (the init needs two full periods). Null values must be filtered
    * upstream.
    */
  def holtWinters(value: Column, order: Seq[Column], alpha: Double,
      beta: Double, gamma: Double, period: Int): Column = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1]: $alpha")
    require(beta >= 0.0 && beta <= 1.0, s"beta must be in [0, 1]: $beta")
    require(gamma >= 0.0 && gamma <= 1.0, s"gamma must be in [0, 1]: $gamma")
    require(period >= 2, s"period must be >= 2: $period")
    val m = period
    val fields = order.zipWithIndex.map { case (c, i) => c.as(s"__o$i") } :+
      value.cast("double").as("__v")
    val sorted = transform(
      sort_array(collect_list(struct(fields: _*))), e => e("__v"))
    val n = size(sorted)
    val mD = lit(m.toDouble)
    val head = slice(sorted, 1, m)
    val second = slice(sorted, m + 1, m)
    // seed sums fold from the FIRST element (list_reduce semantics:
    // ((v1+v2)+..) — keeps -0.0 handling identical to the oracle)
    def seqSum(a: Column) = aggregate(
      slice(a, 2, m - 1), element_at(a, 1), (acc, x) => acc + x)
    val l0 = seqSum(head) / mD
    val b0 = (seqSum(second) / mD - l0) / mD
    val s0 = transform(head, x => x - l0)
    val init = struct(l0.as("l"), b0.as("b"), s0.as("s"))
    val fold = aggregate(
      slice(sorted, lit(m + 1), greatest(n - m, lit(0))),
      init,
      (acc, x) => {
        val sOld = element_at(acc("s"), 1)
        val l2 = lit(alpha) * (x - sOld) +
          lit(1.0 - alpha) * (acc("l") + acc("b"))
        val b2 = lit(beta) * (l2 - acc("l")) + lit(1.0 - beta) * acc("b")
        val s2 = lit(gamma) * (x - acc("l") - acc("b")) +
          lit(1.0 - gamma) * sOld
        struct(l2.as("l"), b2.as("b"),
          concat(slice(acc("s"), 2, m - 1), array(s2)).as("s"))
      })
    val ok = n >= 2 * m
    struct(
      n.cast("long").as("n_samples"),
      when(ok, round(fold("l"), 6)).as("level"),
      when(ok, round(fold("b"), 6)).as("trend"),
      when(ok, round(element_at(fold("s"), 1), 6)).as("season_next"),
      when(ok, round(fold("l") + fold("b") + element_at(fold("s"), 1), 6))
        .as("forecast"))
  }

  /** ClickHouse's `exponentialTimeDecayedSum` — the TIME-aware decay
    * read (the gap between points sets the decay, not the step
    * count, unlike [[exponentialMovingAverage]]): at each point k of
    * the t-ordered series,
    *
    *   S_k = Σ_{i≤k} x_i · 2^(−(t_k−t_i)/halflife)
    *
    * folded as the linear recurrence S_k = S_{k−1}·2^(−Δt/h) + x_k in
    * caller-imposed order (ClickHouse's λ form is exp(−Δt/λ); base-2
    * halflife here, λ = h/ln 2). Returns the per-row running series
    * as an array in `order` order. Determinism: when Δt/h is an
    * integer (bucket t to the halflife grid), every decay factor is
    * an EXACT power of two, so each step is exact IEEE scaling + add
    * and the series is bit-identical in any engine folding the same
    * order — the regime the oracle query runs in; fractional Δt/h is
    * supported but pow() may differ by ulps across libm
    * implementations. Group size is the caller's scale bound (the
    * collect-combinator posture); per-element emit makes the fold
    * O(n²) in group size — a per-key read face, not a corpus pass.
    * Null values must be filtered upstream.
    */
  def exponentialTimeDecayedSum(value: Column, time: Column,
      order: Seq[Column], halflife: Double): Column =
    timeDecayedSeries(value, time, order, halflife)((s, _, _) => s)

  /** The count face: C_k = Σ_{i≤k} 2^(−(t_k−t_i)/h) — ClickHouse
    * `exponentialTimeDecayedCount` (the value column is ignored
    * beyond row existence). */
  def exponentialTimeDecayedCount(time: Column, order: Seq[Column],
      halflife: Double): Column =
    timeDecayedSeries(lit(1.0), time, order, halflife)((_, c, _) => c)

  /** The avg face: S_k/C_k — ClickHouse `exponentialTimeDecayedAvg`,
    * a proper time-weighted mean of the recent past. */
  def exponentialTimeDecayedAvg(value: Column, time: Column,
      order: Seq[Column], halflife: Double): Column =
    timeDecayedSeries(value, time, order, halflife)((s, c, _) => s / c)

  /** The max face: M_k = max_{i≤k} x_i·2^(−(t_k−t_i)/h), folded as
    * M_k = max(M_{k−1}·2^(−Δt/h), x_k) — ClickHouse
    * `exponentialTimeDecayedMax`. */
  def exponentialTimeDecayedMax(value: Column, time: Column,
      order: Seq[Column], halflife: Double): Column =
    timeDecayedSeries(value, time, order, halflife)((_, _, m) => m)

  /** Shared fold for the four `exponentialTimeDecayed*` faces: one
    * sorted collect per group, one `aggregate` carrying
    * (t, S, C, M, out) — the three decay states ride a single pass
    * regardless of which face reads them (Catalyst prunes nothing
    * here, but the states are three doubles; the array is the cost).
    */
  private def timeDecayedSeries(value: Column, time: Column,
      order: Seq[Column], halflife: Double)(
      emit: (Column, Column, Column) => Column): Column = {
    require(halflife > 0.0, s"halflife must be positive: $halflife")
    val fields = order.zipWithIndex.map { case (c, i) => c.as(s"__o$i") } ++
      Seq(time.cast("double").as("__t"), value.cast("double").as("__v"))
    val sorted = sort_array(collect_list(struct(fields: _*)))
    val h1 = element_at(sorted, 1)
    when(size(sorted) > 0,
      aggregate(
        slice(sorted, lit(2), greatest(size(sorted) - 1, lit(0))),
        struct(h1("__t").as("t"), h1("__v").as("s"), lit(1.0).as("c"),
          h1("__v").as("m"),
          array(emit(h1("__v"), lit(1.0), h1("__v"))).as("out")),
        (acc, e) => {
          val d = pow(lit(2.0), (acc("t") - e("__t")) / lit(halflife))
          val s = acc("s") * d + e("__v")
          val c = acc("c") * d + lit(1.0)
          val m = greatest(acc("m") * d, e("__v"))
          struct(e("__t").as("t"), s.as("s"), c.as("c"), m.as("m"),
            concat(acc("out"), array(emit(s, c, m))).as("out"))
        },
        acc => acc("out")))
  }

  def sumMap(df: DataFrame, keys: Seq[String], mapCol: Column): DataFrame =
    foldMap(df, keys, mapCol, sum, "sum_map")

  /** `minMap` / `maxMap`: point-wise min/max of a map column per
    * group — the other two ClickHouse map combinators next to
    * [[sumMap]], same two-level explode → re-aggregate → reassemble
    * shape and the same empty-map and structural-equality semantics.
    */
  def minMap(df: DataFrame, keys: Seq[String], mapCol: Column): DataFrame =
    foldMap(df, keys, mapCol, min, "min_map")

  def maxMap(df: DataFrame, keys: Seq[String], mapCol: Column): DataFrame =
    foldMap(df, keys, mapCol, max, "max_map")

  private def foldMap(df: DataFrame, keys: Seq[String], mapCol: Column,
      agg: Column => Column, outName: String): DataFrame = {
    val keyCols = keys.map(col)
    df.select(keyCols :+ explode_outer(mapCol).as(Seq("__k", "__v")): _*)
      .groupBy(keyCols :+ col("__k"): _*)
      .agg(agg(col("__v")).as("__s"))
      .groupBy(keyCols: _*)
      .agg(map_from_entries(sort_array(collect_list(
        when(col("__k").isNotNull, struct(col("__k"), col("__s"))))))
        .as(outName))
  }

  /** `avgWeighted`: exact weighted mean Σ(v·w)/Σ(w) — both sums in
    * DECIMAL (order-free exact; v cast at `scale`, integral weights),
    * one guarded double division rounded to 6. Null values/weights
    * and non-positive weights drop, as in [[graft.operators.Histograms
    * .weightedQuantiles]]; an all-dropped group yields null. One
    * partial+final aggregate. Use inside `.agg(...)` via the returned
    * (sum, weight) pair — or the DataFrame face here.
    */
  def avgWeighted(df: DataFrame, keys: Seq[String], value: Column,
      weight: Column): DataFrame = {
    val ok = value.isNotNull && weight.isNotNull && weight > 0
    val v = when(ok, value.cast("decimal(18,6)"))
    val w = when(ok, weight.cast("long"))
    df.groupBy(keys.map(col): _*)
      .agg(
        sum(v * w).cast("decimal(38,6)").as("__vw"),
        sum(w).as("__w"))
      .select((keys.map(col) ++ Seq(
        coalesce(col("__w"), lit(0L)).as("w_total"),
        when(col("__w") > 0,
          round(col("__vw").cast("double") / col("__w").cast("double"), 6))
          .as("avg_weighted"))): _*)
  }
}
