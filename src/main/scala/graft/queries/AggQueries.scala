package graft.queries

import graft.Tables.table
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Aggregation queries (SURVEY.md §2.4 A1-A8).
  *
  * Float discipline: money/measure sums are accumulated as
  * DECIMAL(18,2|4) (exact, order-independent — Spark's partial
  * aggregation reorders addends, so double sums are NOT reproducible)
  * and cast to double at the end; the oracle does the identical cast.
  * Spark plans these as partial+final HashAggregate (A6) — map-side
  * combine before the shuffle, the 100 TB-safe aggregation shape.
  */
object AggQueries {

  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A11: groupArray(5) + groupUniqArray (ClickHouse aggregate
    // combinators, determinism repaired — order imposed INSIDE the
    // aggregate): each user's first five event types in time order,
    // plus their sorted distinct type set; serialized for the oracle
    "q_group_array" -> ((s, d) => {
      table(s, d, "events")
        .select(col("user_id"), graft.Tables.epochSeconds(col("ts")).as("ep"),
          col("event_id"), col("event_type"))
        .groupBy(col("user_id"))
        .agg(
          array_join(graft.operators.AggCombinators.groupArray(
            col("event_type"), Seq(col("ep"), col("event_id")), Some(5)), ",")
            .as("first5"),
          array_join(graft.operators.AggCombinators.groupUniqArray(
            col("event_type")), ",").as("uniq_types"))
        .orderBy(col("user_id"))
    }),

    // A12: sumMap — per user, event_type → exact decimal value sum as
    // a map (point-wise map merge); entries sorted by key and
    // serialized so the map is value-comparable across engines
    "q_sum_map" -> ((s, d) => {
      val ev = table(s, d, "events")
        .select(col("user_id"),
          map(col("event_type"), col("value").cast("decimal(18,2)")).as("m"))
      graft.operators.AggCombinators.sumMap(ev, Seq("user_id"), col("m"))
        .select(col("user_id"),
          array_join(transform(map_entries(col("sum_map")),
            e => concat(e("key"), lit(":"), e("value").cast("string"))), ",")
            .as("spend_map"))
        .orderBy(col("user_id"))
    }),

    // A12c: minMap + maxMap — the other two ClickHouse map
    // combinators, point-wise per-type value extrema as maps; sorted
    // entries serialized (the q_sum_map convention)
    "q_minmax_map" -> ((s, d) => {
      val ev = table(s, d, "events")
        .select(col("user_id"),
          map(col("event_type"), col("value").cast("decimal(18,2)")).as("m"))
      def ser(c: Column) = array_join(transform(map_entries(c),
        e => concat(e("key"), lit(":"), e("value").cast("string"))), ",")
      val mn = graft.operators.AggCombinators.minMap(ev, Seq("user_id"), col("m"))
      val mx = graft.operators.AggCombinators.maxMap(ev, Seq("user_id"), col("m"))
      mn.join(mx, Seq("user_id"))
        .select(col("user_id"), ser(col("min_map")).as("mins"),
          ser(col("max_map")).as("maxs"))
        .orderBy(col("user_id"))
    }),

    // A25: avgWeighted — exact weighted mean per event type under the
    // q_weighted_quantile weight convention (user_id%5+1)
    "q_avg_weighted" -> ((s, d) => {
      graft.operators.AggCombinators.avgWeighted(
        table(s, d, "events"), Seq("event_type"), col("value"),
        weight = col("user_id") % 5 + 1)
        .orderBy(col("event_type"))
    }),

    // A14: incremental materialized aggregate (Summing/Aggregating
    // MergeTree semantics) — the merge-algebra face: three ingest
    // slices partial-aggregated independently, merged, finalized.
    // The oracle is the DIRECT aggregate over all rows — the
    // operator's defining law (slice-invariance), checked value-level
    "q_matview" -> ((s, d) => {
      val ev = table(s, d, "events")
      val slices = (0 until 3).map(i =>
        ev.where(pmod(xxhash64(col("event_id")), lit(3)) === i))
      val partials = slices.map(sl => graft.operators.MatView.partialState(
        sl, Seq("event_type"), col("value"), col("user_id")))
      val merged = graft.operators.MatView.mergeStates(
        partials.reduce(_ unionByName _), Seq("event_type"))
      // sum_v stays DECIMAL(38,6) inside the operator (exactness is the
      // merge law); serialize it to its fixed-scale string form for the
      // cross-engine compare — same convention as q_sum_map
      graft.operators.MatView.finalizeState(merged, Seq("event_type"))
        .select(col("event_type"), col("n_rows"),
          col("sum_v").cast("string").as("sum_v"),
          col("min_v"), col("max_v"), col("avg_v"))
        .orderBy(col("event_type"))
    }),

    // A14 quantile state: the KLL member of the matview algebra, run
    // in its EXACT regime (every group holds <= ~55 values, far under
    // k=200, so no compaction fires and the merged sketch retains
    // every value) — which is what makes the inclusive-rank quantile
    // value-oracle-able: estimate = sorted[ceil(q*n)] (1-based). The
    // approximate regime is spec-tested (MatViewSpec) where no value
    // oracle can exist.
    "q_matview_quantiles" -> ((s, d) => {
      val ev = table(s, d, "events")
        .where(col("user_id") % 500 === 0 && col("value").isNotNull)
      val slices = (0 until 3).map(i =>
        ev.where(pmod(xxhash64(col("event_id")), lit(3)) === i))
      val partials = slices.map(sl => graft.operators.MatView.partialState(
        sl, Seq("event_type"), col("value"), col("user_id")))
      val merged = graft.operators.MatView.mergeStates(
        partials.reduce(_ unionByName _), Seq("event_type"))
      graft.operators.MatView.finalizeState(merged, Seq("event_type"))
        .select(col("event_type"), col("n_rows"),
          round(col("p50_v"), 4).as("p50_v"),
          round(col("p95_v"), 4).as("p95_v"))
        .orderBy(col("event_type"))
    }),

    // A18: theta-sketch set algebra (ClickHouse uniqTheta family) —
    // audience overlap over PRE-AGGREGATED states: per-segment
    // sketches built slice-wise, union-merged, then intersected /
    // differenced at read time without touching raw rows again. Run
    // in the exact regime (segment cardinalities ~20-200 << 2^12
    // retained hashes, so no sampling and every estimate is an exact
    // integer — value-oracle-able); the sampling regime is
    // spec-tested (AggApproxSpec) where no value oracle can exist.
    "q_theta_segments" -> ((s, d) => {
      import graft.functions.ThetaSketch._
      val ev = table(s, d, "events").where(col("user_id") % 7 === 0)
      val buyer = when(
        col("event_type") === "purchase" && col("value") >= 100,
        col("user_id").cast("string"))
      val errorer = when(
        col("event_type") === "error" && col("value") >= 100,
        col("user_id").cast("string"))
      val partials = (0 until 3).map(i =>
        ev.where(pmod(xxhash64(col("event_id")), lit(3)) === i)
          .agg(thetaAgg(buyer).as("sa"), thetaAgg(errorer).as("sb")))
      partials.reduce(_ unionByName _)
        .agg(thetaUnionAgg(col("sa")).as("sa"),
          thetaUnionAgg(col("sb")).as("sb"))
        .select(
          round(thetaEstimate(col("sa"))).cast("long").as("n_buyers"),
          round(thetaEstimate(col("sb"))).cast("long").as("n_errorers"),
          round(thetaIntersect(col("sa"), col("sb"))).cast("long").as("n_both"),
          round(thetaDiff(col("sa"), col("sb"))).cast("long").as("n_buyers_only"))
    }),

    // A41: exact bitmap set algebra (ClickHouse groupBitmap family,
    // r18 verdict task #3) — the EXACT integer-id complement of A18's
    // theta sketches: Roaring64 states built slice-wise and OR-merged
    // (the matview shape), then every read face exercised — pairwise
    // cardinalities (and/or/andnot/xor), min/max member recovery, and
    // the groupBitmapAnd/Xor STATE aggregates over a per-type segment
    // table (users present in ALL types / an ODD number of types).
    // Everything is an exact BIGINT, so the whole surface sits under
    // the value gate via DuckDB distinct-set arithmetic.
    "q_bitmap_segments" -> ((s, d) => {
      import graft.functions.BitmapAgg._
      val ev = table(s, d, "events")
      val buyer = when(
        col("event_type") === "purchase" && col("value") >= 100,
        col("user_id"))
      val errorer = when(
        col("event_type") === "error" && col("value") >= 100,
        col("user_id"))
      val partials = (0 until 3).map(i =>
        ev.where(pmod(xxhash64(col("event_id")), lit(3)) === i)
          .agg(bitmapAgg(buyer).as("sa"), bitmapAgg(errorer).as("sb")))
      val merged = partials.reduce(_ unionByName _)
        .agg(bitmapOrAgg(col("sa")).as("sa"),
          bitmapOrAgg(col("sb")).as("sb"))
      val perType = ev.groupBy(col("event_type"))
        .agg(bitmapAgg(col("user_id")).as("st"))
      val folded = perType.agg(
        bitmapAndAgg(col("st")).as("s_and"),
        bitmapXorAgg(col("st")).as("s_xor"))
      merged.crossJoin(folded).select(
        bitmapCardinality(col("sa")).as("n_buyers"),
        bitmapCardinality(col("sb")).as("n_errorers"),
        bitmapAndCardinality(col("sa"), col("sb")).as("n_both"),
        bitmapOrCardinality(col("sa"), col("sb")).as("n_either"),
        bitmapAndnotCardinality(col("sa"), col("sb")).as("n_buyers_only"),
        bitmapXorCardinality(col("sa"), col("sb")).as("n_sym_diff"),
        bitmapMin(col("sa")).as("min_buyer"),
        bitmapMax(col("sa")).as("max_buyer"),
        bitmapCardinality(col("s_and")).as("n_all_types"),
        bitmapCardinality(col("s_xor")).as("n_odd_types"))
    }),

    // A4b: uniqUpTo — exact distinct users per (type, day) up to 50,
    // the 51 sentinel beyond, with state bounded at 51 witnesses per
    // group (a cardinality spike can't balloon the exchange). Unlike
    // the sketch families this is value-oracle-able in BOTH regimes:
    // least(count(DISTINCT), N+1) reproduces the cap exactly
    "q_uniq_upto" -> ((s, d) => {
      val u = udaf(new graft.functions.UniqUpTo(50),
        org.apache.spark.sql.Encoders.STRING)
      table(s, d, "events")
        .withColumn("day",
          floor(graft.Tables.epochSeconds(col("ts")) / 86400L).cast("long"))
        .groupBy(col("event_type"), col("day"))
        .agg(u(col("user_id").cast("string")).as("n_users_upto"))
        .orderBy(col("event_type"), col("day"))
    }),

    // A16b: quantileExactWeighted — per event type, the weighted
    // median and p90 of value under per-row repeat counts (weight =
    // user_id%5+1, a deterministic integral weight): smallest value
    // whose cumulative weight reaches q·total, exact decimal
    // threshold arithmetic — no interpolation, no float accumulation
    "q_weighted_quantile" -> ((s, d) => {
      val ev = table(s, d, "events")
        .select(col("event_type"), round(col("value"), 2).as("v"),
          (col("user_id") % 5 + 1).as("w"), col("event_id"))
      graft.operators.Histograms.weightedQuantiles(ev, Seq("event_type"),
        value = col("v"), weight = col("w"), tiebreak = Seq(col("event_id")),
        qs = Seq(BigDecimal("0.5"), BigDecimal("0.9")))
        .orderBy(col("event_type"))
    }),

    // A12b: sumForEach — element-wise vector sum per label over the
    // embeddings table, in fixed-point (floor(x·1e6) as LONG per
    // element): float sums are accumulation-order-dependent, integer
    // sums are exact in any order, and the float→double→floor op
    // sequence is the same IEEE arithmetic in every engine
    "q_sum_foreach" -> ((s, d) => {
      val e = table(s, d, "embeddings")
        .select(col("label"),
          transform(col("embedding"),
            x => floor(x * lit(1000000.0)).cast("long")).as("fp"))
      graft.operators.AggCombinators.sumForEach(e, Seq("label"), col("fp"))
        .select(col("label"),
          array_join(transform(col("sum_foreach"), x => x.cast("string")), ",")
            .as("dims"))
        .orderBy(col("label"))
    }),

    // A13: topK heavy hitters — the Misra–Gries sketch Aggregator
    // (functions.TopK) run in its exact regime (capacity 64 >> 5
    // distinct event types), so the sketch output IS the exact top-3
    // and the plain GROUP BY oracle applies; the approximate regime
    // is spec-tested (TopKSpec) where no oracle can exist
    "q_topk_freq" -> ((s, d) => {
      val tk = udaf(new graft.functions.TopK(3, 64))
      table(s, d, "events")
        .agg(tk(col("event_type")).as("tk"))
        .select(explode(col("tk.items")).as("e"))
        .select(col("e.item").as("event_type"), col("e.cnt").as("n"))
        .orderBy(col("n").desc, col("event_type"))
    }),

    // A13b: topKWeighted — top sources by character VOLUME, the
    // weighted Misra–Gries arm, same exact-regime oracle discipline
    // (capacity 64 >> 20 sources)
    "q_topk_weighted" -> ((s, d) => {
      val tk = udaf(new graft.functions.TopKWeighted(3, 64))
      table(s, d, "documents")
        .agg(tk(col("source"), col("n_chars").cast("long")).as("tk"))
        .select(explode(col("tk.items")).as("e"))
        .select(col("e.item").as("source"), col("e.cnt").as("total_chars"))
        .orderBy(col("total_chars").desc, col("source"))
    }),

    // A19: intervalLengthSum — per user cohort, the union length of
    // the event intervals [ep, ep + (event_id%7+1)*30): overlapping
    // and touching intervals merge (gaps-and-islands), so the result
    // is covered seconds, not summed lengths
    "q_interval_length_sum" -> ((s, d) => {
      val ep = graft.Tables.epochSeconds(col("ts"))
      val iv = table(s, d, "events").select(
        (col("user_id") % 25).as("grp"), ep.as("s"),
        (ep + (col("event_id") % 7 + 1) * 30).as("e"))
      graft.operators.IntervalAgg.intervalLengthSum(
        iv, Seq("grp"), col("s"), col("e"))
        .orderBy(col("grp"))
    }),

    // A19b: maxIntersections(+Position) — the same interval set's peak
    // concurrency and the first instant it is reached (half-open
    // sweep: an end at p closes before a start at p opens)
    "q_max_intersections" -> ((s, d) => {
      val ep = graft.Tables.epochSeconds(col("ts"))
      val iv = table(s, d, "events").select(
        (col("user_id") % 25).as("grp"), ep.as("s"),
        (ep + (col("event_id") % 7 + 1) * 30).as("e"))
      graft.operators.IntervalAgg.maxIntersections(
        iv, Seq("grp"), col("s"), col("e"))
        .orderBy(col("grp"))
    }),

    // A20: Shannon entropy of the user-activity distribution per event
    // type — count-only rewrite H = log2(n) − Σ c·log2(c)/n, terms
    // rounded to 9 and summed as DECIMAL (order-free exact)
    "q_entropy" -> ((s, d) => {
      graft.operators.StatsAgg.entropy(
        table(s, d, "events"), Seq("event_type"), col("user_id"))
        .orderBy(col("event_type"))
    }),

    // A20b: Cramér's V association between event type and value band
    // per day-of-week — χ² over exact contingency counts, the same
    // round-9 DECIMAL term discipline; null values form their own band
    "q_cramers_v" -> ((s, d) => {
      val ep = graft.Tables.epochSeconds(col("ts"))
      val ev = table(s, d, "events").select(
        pmod(floor(ep / 86400L), lit(7)).cast("long").as("dow"),
        col("event_type"),
        when(col("value").isNotNull,
          least(floor(col("value") / 200.0), lit(4.0))).cast("long")
          .as("band"))
      graft.operators.StatsAgg.cramersV(
        ev, Seq("dow"), col("event_type"), col("band"))
        .orderBy(col("dow"))
    }),

    // A20c: the full association panel over the q_cramers_v triple —
    // χ², V, bias-corrected V, contingency coefficient, Theil's U
    // both directions, one corpus scan
    "q_association" -> ((s, d) => {
      val ep = graft.Tables.epochSeconds(col("ts"))
      val ev = table(s, d, "events").select(
        pmod(floor(ep / 86400L), lit(7)).cast("long").as("dow"),
        col("event_type"),
        when(col("value").isNotNull,
          least(floor(col("value") / 200.0), lit(4.0))).cast("long")
          .as("band"))
      graft.operators.StatsAgg.association(
        ev, Seq("dow"), col("event_type"), col("band"))
        .orderBy(col("dow"))
    }),

    // A21: boundingRatio — per event type, the slope between the
    // earliest and latest (ts, value) points, endpoints made total by
    // the event_id tiebreak (the W1 discipline)
    "q_bounding_ratio" -> ((s, d) => {
      graft.operators.StatsAgg.boundingRatio(
        table(s, d, "events"), Seq("event_type"),
        x = graft.Tables.epochSeconds(col("ts")), y = col("value"),
        tie = col("event_id"))
        .orderBy(col("event_type"))
    }),

    // A17b: skewPop/kurtPop — exact-moment shape statistics (Spark's
    // builtin skewness/kurtosis accumulate doubles in partition order,
    // cross-engine irreproducible): power sums of the fixed-point
    // value as DECIMAL(38,0), moments via one fixed double tree
    "q_moments" -> ((s, d) => {
      graft.operators.StatsAgg.moments(
        table(s, d, "events"), Seq("event_type"), col("value"))
        .orderBy(col("event_type"))
    }),

    // A17c: Welch's t between even- and odd-user cohorts per event
    // type — t and the Welch–Satterthwaite df from the same exact
    // power sums (the p-value needs the incomplete beta; out of scope)
    "q_welch_ttest" -> ((s, d) => {
      graft.operators.StatsAgg.welchTTest(
        table(s, d, "events"), Seq("event_type"), col("value"),
        cohort = col("user_id") % 2 === 0)
        .orderBy(col("event_type"))
    }),

    // A17d: Student's pooled-variance t between the same cohorts —
    // the equal-variance companion, same exact conditional power sums
    "q_student_ttest" -> ((s, d) => {
      graft.operators.StatsAgg.studentTTest(
        table(s, d, "events"), Seq("event_type"), col("value"),
        cohort = col("user_id") % 2 === 0)
        .orderBy(col("event_type"))
    }),

    // A35: paired t test — each event paired with its user-stream
    // predecessor (the repeated-measures design: "do values trend
    // within user streams, per type?"); differences enter as exact
    // integer fixed-point subtractions, one hash aggregate
    "q_paired_ttest" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(graft.Tables.epochSeconds(col("ts")), col("event_id"))
      val ev = table(s, d, "events")
        .where(col("value").isNotNull)
        .withColumn("prev", lag(col("value"), 1).over(w))
        .where(col("prev").isNotNull)
      graft.operators.StatsAgg.pairedTTest(
        ev, Seq("event_type"), x = col("value"), y = col("prev"))
        .orderBy(col("event_type"))
    }),

    // A26: Spearman rank correlation between value and user id per
    // event type — doubled average ranks are exact integers, Pearson
    // over them is Spearman exactly
    "q_rank_corr" -> ((s, d) => {
      graft.operators.StatsAgg.rankCorr(
        table(s, d, "events"), Seq("event_type"),
        x = col("value"), y = col("user_id"))
        .orderBy(col("event_type"))
    }),

    // A26b: Mann–Whitney U between even- and odd-user cohorts per
    // event type — pooled-sample doubled ranks, tie-corrected z
    "q_mann_whitney" -> ((s, d) => {
      graft.operators.StatsAgg.mannWhitneyUTest(
        table(s, d, "events")
          .where(col("user_id").isNotNull),
        Seq("event_type"), col("value"),
        cohort = col("user_id") % 2 === 0)
        .orderBy(col("event_type"))
    }),

    // A36: Kruskal–Wallis H across three user cohorts per event
    // type — pooled doubled ranks, tie-corrected, the k-group double
    // sum folded in group-label order so it is engine-deterministic
    "q_kruskal_wallis" -> ((s, d) => {
      graft.operators.StatsAgg.kruskalWallis(
        table(s, d, "events")
          .where(col("user_id").isNotNull),
        Seq("event_type"), col("value"),
        group = col("user_id") % 3)
        .orderBy(col("event_type"))
    }),

    // A39: Friedman test — days are blocks, event types treatments,
    // daily counts the scores: do the types keep the same volume
    // ordering day after day? Within-block doubled ranks,
    // treatment-ordered fold, tie-corrected
    "q_friedman" -> ((s, d) => {
      val day = floor(graft.Tables.epochSeconds(col("ts")) / 86400L)
        .cast("long").as("day")
      val daily = table(s, d, "events")
        .select(col("event_type"), day)
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).cast("double").as("cnt"))
        .withColumn("k", lit("all"))
      graft.operators.StatsAgg.friedman(
        daily, Seq("k"), block = col("day"),
        treatment = col("event_type"), value = col("cnt"))
        .orderBy(col("k"))
    }),

    // A38: PSI drift between the even-user (reference) and odd-user
    // (current) value distributions per event type — frozen reference
    // bin edges, integer bin assignment, add-one smoothing over the
    // FULL bin grid, round-9 DECIMAL term sum
    "q_psi" -> ((s, d) => {
      graft.operators.StatsAgg.psi(
        table(s, d, "events")
          .where(col("user_id").isNotNull),
        Seq("event_type"), col("value"),
        isReference = col("user_id") % 2 === 0, bins = 10)
        .orderBy(col("event_type"))
    }),

    // A37: Jarque–Bera normality test off the exact fixed-point
    // power sums — the moments machinery closed into one statistic
    "q_jarque_bera" -> ((s, d) => {
      graft.operators.StatsAgg.jarqueBera(
        table(s, d, "events"), Seq("event_type"), col("value"))
        .orderBy(col("event_type"))
    }),

    // A27: ROC AUC of value as a classifier for the even-user cohort
    // per event type — rank-sum identity collapsed to distinct-score
    // cells, exact integers until the final division
    "q_auc" -> ((s, d) => {
      graft.operators.StatsAgg.auc(
        table(s, d, "events").where(col("user_id").isNotNull),
        Seq("event_type"), score = col("value"),
        label = col("user_id") % 2 === 0)
        .orderBy(col("event_type"))
    }),

    // A27c: PR-AUC (average precision) of value as a classifier for
    // the even-user cohort — same cell collapse as q_auc, descending
    // tie-block convention, round-9 summed terms
    "q_pr_auc" -> ((s, d) => {
      graft.operators.StatsAgg.prAuc(
        table(s, d, "events").where(col("user_id").isNotNull),
        Seq("event_type"), score = col("value"),
        label = col("user_id") % 2 === 0)
        .orderBy(col("event_type"))
    }),

    // A27d: the full ROC curve at decile thresholds — exact confusion
    // counts per threshold from the same cell collapse
    "q_roc_curve" -> ((s, d) => {
      graft.operators.StatsAgg.rocCurve(
        table(s, d, "events").where(col("user_id").isNotNull),
        Seq("event_type"), score = floor(col("value") / 10.0),
        label = col("user_id") % 2 === 0)
        .orderBy(col("event_type"), col("threshold"))
    }),

    // A30: groupArraySorted(5) — per type the 5 smallest
    // (fixed-point value, event_id) rows via the bounded-state
    // aggregate; the oracle is the window row_number formulation
    "q_group_sorted" -> ((s, d) => {
      graft.operators.AggCombinators.groupArraySorted(
        table(s, d, "events").where(col("value").isNotNull),
        Seq("event_type"), rank = floor(col("value") * 100).cast("long"),
        item = col("event_id"), k = 5)
        .orderBy(col("event_type"), col("rank"), col("item"))
    }),

    // A33: Gini coefficient of the value mass per event type — the
    // inequality read over exact fixed-point rank sums; one per-key
    // sort (the exact-rank-statistic cost), everything else exact
    "q_gini" -> ((s, d) => {
      graft.operators.StatsAgg.gini(
        table(s, d, "events"), Seq("event_type"), col("value"))
        .orderBy(col("event_type"))
    }),

    // A34: corrMatrix over the embeddings' leading 6 dimensions per
    // label — the upper-triangle pairwise correlations from one
    // in-projection pair grid and one (label, i, j) hash aggregate
    "q_corr_matrix" -> ((s, d) => {
      graft.operators.StatsAgg.corrMatrix(
        table(s, d, "embeddings"), Seq("label"), col("embedding"),
        dims = 6)
        .orderBy(col("label"), col("i"), col("j"))
    }),

    // W4i: quantile_over_time — the PromQL *_over_time read: per
    // (type, day), count, exact-DECIMAL mean, and the continuous
    // p50/p95 of value (the A16 exact-percentile machinery re-keyed
    // by the time bucket)
    "q_quantile_over_time" -> ((s, d) => {
      val day = floor(graft.Tables.epochSeconds(col("ts")) / 86400L)
        .cast("long").as("day")
      val p = expr("percentile(value, array(0.5D, 0.95D))")
      table(s, d, "events")
        .where(col("value").isNotNull)
        .select(col("event_type"), day, col("value"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).as("__s"),
          p.as("__pq"))
        .select(col("event_type"), col("day"), col("n"),
          round(col("__s").cast("double") / col("n").cast("double"), 6)
            .as("avg_v"),
          round(element_at(col("__pq"), 1), 6).as("p50"),
          round(element_at(col("__pq"), 2), 6).as("p95"))
        .orderBy(col("event_type"), col("day"))
    }),

    // A30b: groupArrayLast(5) — the LAST five events per type by
    // event_id (insertion order), bounded O(k) state per group per
    // partition (BoundedTopK on the negated rank)
    "q_group_last" -> ((s, d) => {
      graft.operators.AggCombinators.groupArrayLast(
        table(s, d, "events").where(col("value").isNotNull),
        Seq("event_type"), rank = col("event_id"),
        item = floor(col("value") * 100).cast("long"), k = 5)
        .orderBy(col("event_type"), col("rank"), col("item"))
    }),

    // A32: sparkbar(20) — per type, the 20-bucket unicode bar chart
    // of daily event counts; exact integer bucket membership and
    // glyph levels make the rendered string engine-portable
    "q_sparkbar" -> ((s, d) => {
      val ev = table(s, d, "events").select(col("event_type"),
        floor(graft.Tables.epochSeconds(col("ts")) / 86400L)
          .cast("long").as("day"))
      graft.operators.AggCombinators.sparkbar(
        ev, Seq("event_type"), x = col("day"), y = lit(1L), buckets = 20)
        .orderBy(col("event_type"))
    }),

    // A27e: Brier score — the value's percent residue as a
    // probability forecast of the even-user outcome; MSE from exact
    // cell counts, round-9 summed terms
    "q_brier" -> ((s, d) => {
      graft.operators.StatsAgg.brierScore(
        table(s, d, "events").where(col("user_id").isNotNull),
        Seq("event_type"),
        score = (floor(col("value")) % 100) / 100.0,
        label = col("user_id") % 2 === 0)
        .orderBy(col("event_type"))
    }),

    // A27f: calibration/reliability table — 10 equal-width bins of
    // the same probability forecast, exact counts, round-9 score mass
    "q_calibration" -> ((s, d) => {
      graft.operators.StatsAgg.calibrationCurve(
        table(s, d, "events").where(col("user_id").isNotNull),
        Seq("event_type"),
        score = (floor(col("value")) % 100) / 100.0,
        label = col("user_id") % 2 === 0, bins = 10)
        .orderBy(col("event_type"), col("bin"))
    }),

    // A27g: expected calibration error — the scalar summary of
    // q_calibration's table, same bins, round-9 summed terms
    "q_ece" -> ((s, d) => {
      graft.operators.StatsAgg.expectedCalibrationError(
        table(s, d, "events").where(col("user_id").isNotNull),
        Seq("event_type"),
        score = (floor(col("value")) % 100) / 100.0,
        label = col("user_id") % 2 === 0, bins = 10)
        .orderBy(col("event_type"))
    }),

    // A27b: two-sample Kolmogorov–Smirnov D between the cohorts'
    // value distributions — exact integer numerator at every
    // distinct-value boundary
    "q_ks_test" -> ((s, d) => {
      graft.operators.StatsAgg.ksTest(
        table(s, d, "events").where(col("user_id").isNotNull),
        Seq("event_type"), col("value"),
        cohort = col("user_id") % 2 === 0)
        .orderBy(col("event_type"))
    }),

    // A17e: meanZTest — the known-variance member of the test panel;
    // population variances are inputs (pinned at the fixture's design
    // variance), means from the shared exact cohort power sums
    "q_mean_ztest" -> ((s, d) => {
      graft.operators.StatsAgg.meanZTest(
        table(s, d, "events"), Seq("event_type"), col("value"),
        cohort = col("user_id") % 2 === 0, var1 = 80000.0, var2 = 80000.0)
        .orderBy(col("event_type"))
    }),

    // X12c: bounded-state stratified sample — same md5-rank winner
    // set as the window form (q_strat_sample's rule), carried as O(k)
    // aggregate state instead of a per-stratum sort
    "q_sample_bounded" -> ((s, d) => {
      graft.operators.Curation.stratifiedSampleBounded(
        table(s, d, "events"), "event_id", Seq("event_type"), 5)
        .orderBy(col("event_type"), col("rank"))
    }),

    // A28: one-way ANOVA — do the 4 user-id cohorts share a mean
    // value per event type; per-group exact power sums, F from the
    // round-9-summed S1g²/ng terms
    "q_anova" -> ((s, d) => {
      graft.operators.StatsAgg.anova(
        table(s, d, "events"), Seq("event_type"), col("value"),
        group = col("user_id") % 4)
        .orderBy(col("event_type"))
    }),

    // A28b: Brown–Forsythe variance-homogeneity on the same
    // user-bucket groups — one-way ANOVA of |w − group median|
    // (doubled onto integers; F is scale-invariant)
    "q_brown_forsythe" -> ((s, d) => {
      graft.operators.StatsAgg.brownForsythe(
        table(s, d, "events"), Seq("event_type"), col("value"),
        group = col("user_id") % 4)
        .orderBy(col("event_type"))
    }),

    // A29: WOE / information value of the value band as a predictor
    // of the even-user label per event type; NULL value is a real
    // category (nulls-first ordering pinned cross-engine)
    "q_info_value" -> ((s, d) => {
      graft.operators.StatsAgg.informationValue(
        table(s, d, "events"), Seq("event_type"),
        category = when(col("value").isNotNull,
          least(floor(col("value") / 200.0), lit(4.0))).cast("long"),
        label = col("user_id") % 2 === 0)
        .orderBy(col("event_type"), col("category").asc_nulls_first)
    }),

    // A2d: PromQL histogram_quantile p95 over the bucketed value
    // histogram (the reference's latency-histogram read) — full
    // boundary grid incl. zero buckets for Prometheus-identical
    // interpolation
    "q_hist_quantile" -> ((s, d) => {
      val bounds = Seq(1.0, 5.0, 10.0, 50.0, 100.0, 200.0, 500.0)
      val ev = table(s, d, "events").where(col("value").isNotNull)
      val le = bounds.foldRight(lit(Double.PositiveInfinity)) {
        (b, acc) => when(col("value") <= b, lit(b)).otherwise(acc)
      }
      val counts = ev.groupBy(col("event_type"), le.as("le"))
        .agg(count(lit(1)).as("cnt"))
      val grid = ev.select("event_type").distinct()
        .select(col("event_type"), explode(array(
          (bounds :+ Double.PositiveInfinity).map(lit): _*)).as("le"))
      val full = grid.join(counts, Seq("event_type", "le"), "left")
        .na.fill(0L, Seq("cnt"))
      graft.operators.TimeSeries.histogramQuantile(full,
        Seq("event_type"), col("le"), col("cnt"), q = 0.95)
        .orderBy(col("event_type"))
    }),

    // A31: groupArrayIntersect — per user, the event types present in
    // EVERY active week's type set (weekly arrays built first, then
    // the count==row-count intersection; exploded output)
    "q_array_intersect" -> ((s, d) => {
      val ev = table(s, d, "events")
        .select(col("user_id"),
          floor(graft.Tables.epochSeconds(col("ts")) / 604800L)
            .cast("long").as("week"),
          col("event_type"))
      val daily = ev.groupBy(col("user_id"), col("week"))
        .agg(sort_array(collect_set(col("event_type"))).as("types"))
      graft.operators.AggCombinators.groupArrayIntersect(
        daily, Seq("user_id"), col("types"))
        .orderBy(col("user_id"), col("item"))
    }),

    // A23: groupArrayMovingAvg(3) — each user's trailing-3 moving
    // average of value in (ts, event_id) order, exact DECIMAL window
    // sums divided by actual width; serialized for the oracle
    "q_moving_avg" -> ((s, d) => {
      table(s, d, "events")
        .where(col("value").isNotNull)
        .select(col("user_id"), graft.Tables.epochSeconds(col("ts")).as("ep"),
          col("event_id"), col("value").cast("decimal(18,2)").as("v"))
        .groupBy(col("user_id"))
        .agg(array_join(transform(
          graft.operators.AggCombinators.groupArrayMovingAvg(
            col("v"), Seq(col("ep"), col("event_id")), window = 3),
          // fixed-scale DECIMAL serialization: double-to-string
          // sci-notation thresholds differ across engines
          x => x.cast("decimal(28,6)").cast("string")), ",").as("mv"))
        .orderBy(col("user_id"))
    }),

    // A24: exponentialMovingAverage(0.3) — per user, the EMA of the
    // value series in (ts, event_id) order; the fold order is imposed
    // inside the aggregate and the per-step IEEE tree matches the
    // oracle's list_reduce exactly, so the compare is bit-level
    "q_ema" -> ((s, d) => {
      table(s, d, "events")
        .where(col("value").isNotNull)
        .select(col("user_id"), graft.Tables.epochSeconds(col("ts")).as("ep"),
          col("event_id"), col("value"))
        .groupBy(col("user_id"))
        .agg(round(graft.operators.AggCombinators.exponentialMovingAverage(
          col("value"), Seq(col("ep"), col("event_id")), alpha = 0.3), 6)
          .as("ema"))
        .orderBy(col("user_id"))
    }),

    // W14: Holt's linear method (double exponential smoothing) — per
    // user, trend-aware level/trend states + a 5-step forecast; with
    // α = β = 0.5 every multiply is an exact power-of-two scaling, so
    // the fold is exact arithmetic and the compare is bit-level
    "q_holt_linear" -> ((s, d) => {
      table(s, d, "events")
        .where(col("value").isNotNull)
        .select(col("user_id"), graft.Tables.epochSeconds(col("ts")).as("ep"),
          col("event_id"), col("value"))
        .groupBy(col("user_id"))
        .agg(graft.operators.AggCombinators.holtLinear(
          col("value"), Seq(col("ep"), col("event_id")),
          alpha = 0.5, beta = 0.5, horizon = 5).as("__h"))
        .select(col("user_id"),
          col("__h.n_samples").as("n_samples"),
          col("__h.level").as("level"),
          col("__h.trend").as("trend"),
          col("__h.forecast").as("forecast"))
        .orderBy(col("user_id"))
    }),

    // W14b: additive Holt-Winters (triple exponential smoothing) —
    // per user, level/trend + a 7-slot seasonal queue; α = β = γ =
    // 0.5 makes every multiply an exact power-of-two scaling and the
    // compare bit-level
    "q_holt_winters" -> ((s, d) => {
      table(s, d, "events")
        .where(col("value").isNotNull)
        .select(col("user_id"), graft.Tables.epochSeconds(col("ts")).as("ep"),
          col("event_id"), col("value"))
        .groupBy(col("user_id"))
        .agg(graft.operators.AggCombinators.holtWinters(
          col("value"), Seq(col("ep"), col("event_id")),
          alpha = 0.5, beta = 0.5, gamma = 0.5, period = 7).as("__h"))
        .select(col("user_id"),
          col("__h.n_samples").as("n_samples"),
          col("__h.level").as("level"),
          col("__h.trend").as("trend"),
          col("__h.season_next").as("season_next"),
          col("__h.forecast").as("forecast"))
        .orderBy(col("user_id"))
    }),

    // A24b: exponentialTimeDecayed{Sum,Avg,Max} over hour-bucketed
    // events per user — Δt/halflife integral (halflife = 1 bucket),
    // so every decay factor is an exact power of two and the fold is
    // bit-identical to the oracle's recursive-CTE recurrence
    "q_time_decay" -> ((s, d) => {
      import graft.operators.AggCombinators._
      val hr = floor(graft.Tables.epochSeconds(col("ts")) / 3600L).as("hr")
      val ev = table(s, d, "events")
        .where(col("value").isNotNull)
        .select(col("user_id"), hr, col("event_id"), col("value"))
      // fixed-point micro-units: the decayed doubles are bit-identical
      // cross-engine, but round(x, 6) is NOT (Spark rounds the exact
      // decimal expansion, DuckDB rounds x*1e6) — floor(x*1e6) is the
      // same two IEEE ops in both engines
      def ser(c: Column) = array_join(transform(c,
        x => floor(x * lit(1000000.0)).cast("string")), ",")
      val ord = Seq(col("hr"), col("event_id"))
      ev.groupBy(col("user_id"))
        .agg(
          ser(exponentialTimeDecayedSum(col("value"), col("hr"), ord, 1.0))
            .as("decayed_sum"),
          ser(exponentialTimeDecayedAvg(col("value"), col("hr"), ord, 1.0))
            .as("decayed_avg"),
          ser(exponentialTimeDecayedMax(col("value"), col("hr"), ord, 1.0))
            .as("decayed_max"))
        .orderBy(col("user_id"))
    }),

    // W11: LTTB downsample — each event type's (epoch, value) series
    // reduced to 20 visually-faithful points. The sequential pick IS
    // SQL-oracle-able (recursive CTE carrying the anchor, the
    // q_funnel_gap/q_ema precedent); the inputs are scaled so every
    // bucket-centroid sum stays under 2^53 and is therefore EXACT in
    // doubles on both engines — the argmax comparisons are then
    // bit-identical with no summation-order sensitivity (x = epoch
    // seconds ~1.7e9 × ~111 pts/bucket ≈ 2e11; y = floor(value*1e6)
    // ≤ 4.9e8 × 111 ≈ 5.4e10). The IntervalStatsSpec laws still pin
    // endpoints, size, monotone x, and scalar-reference equality
    "q_lttb" -> ((s, d) => {
      graft.operators.TimeSeries.lttb(
        table(s, d, "events")
          .where(col("value").isNotNull)
          .select(col("event_type"),
            graft.Tables.epochSeconds(col("ts")).as("xx"),
            floor(col("value") * 1000000).as("value")),
        Seq("event_type"), x = col("xx"), y = col("value"), nOut = 20)
        .orderBy(col("event_type"), col("pos"))
    }),

    // A22: groupBitAnd/Or/Xor — ClickHouse's bitwise aggregate trio
    // over user ids per event type; Spark's builtin bit_and/bit_or/
    // bit_xor plan as ordinary partial+final hash aggregates
    "q_bit_agg" -> ((s, d) => {
      table(s, d, "events")
        .groupBy(col("event_type"))
        .agg(bit_and(col("user_id")).as("b_and"),
          bit_or(col("user_id")).as("b_or"),
          bit_xor(col("user_id")).as("b_xor"))
        .orderBy(col("event_type"))
    }),

    // A2c: equi-depth histogram — quantile-edged bins per event type
    // (the deterministic member of ClickHouse's histogram() family)
    "q_histogram_eq" -> ((s, d) => {
      graft.operators.Histograms.equiDepth(
        table(s, d, "events"), Seq("event_type"), col("value"), bins = 4)
        .orderBy(col("event_type"), col("bin"))
    }),

    // A9: PIVOT — daily event counts spread into one column per event
    // type. The pivot values are PINNED to the batch events table's
    // closed domain (click/error/purchase/signup/view at every SF —
    // NOT the streaming SyntheticSource's action list): an unpinned
    // pivot runs an extra distinct job to discover columns and its
    // column order is data-dependent — neither acceptable in a
    // registered deterministic query
    "q_pivot" -> ((s, d) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      table(s, d, "events")
        .select(expr("(ts div 1000000000) div 86400").as("day"), col("event_type"))
        .groupBy(col("day"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .na.fill(0L, types)
        .orderBy(col("day"))
    }),

    // A10: UNPIVOT/melt — lineitem's four measures to long form; the
    // inverse relational shape (Spark melt ↔ SQL UNION ALL oracle)
    "q_unpivot" -> ((s, d) => {
      table(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("double").as("quantity"),
          col("l_extendedprice").cast("double").as("extendedprice"),
          col("l_discount").cast("double").as("discount"),
          col("l_tax").cast("double").as("tax"))
        .unpivot(
          ids = Array(col("l_orderkey"), col("l_linenumber")),
          values = Array(col("quantity"), col("extendedprice"),
            col("discount"), col("tax")),
          variableColumnName = "measure", valueColumnName = "val")
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("measure"))
    }),

    // W9: hourly OHLC bars per event type — first/last by (ts,
    // event_id), high/low/count, all in ONE partial+final aggregate
    // (no window, no per-bucket sort)
    "q_ohlc" -> ((s, d) => {
      val ev = table(s, d, "events")
      graft.operators.TimeSeries.ohlcResample(
        ev, Seq("event_type"), graft.Tables.epochSeconds(col("ts")),
        tie = col("event_id"), value = col("value"),
        bucketSeconds = 3600L)
        .select(col("event_type"), col("bucket"),
          round(col("open"), 2).as("open"), round(col("high"), 2).as("high"),
          round(col("low"), 2).as("low"), round(col("close"), 2).as("close"),
          col("n"))
        .orderBy(col("event_type"), col("bucket"))
    }),

    // O4: gap-filled hourly resampling per event type — the engine
    // side of ClickHouse "ORDER BY ... WITH FILL" over the reference's
    // events table: every hour between each type's first and last
    // event, zero-filled counts, forward-filled hourly mean value.
    // Epoch-hour buckets are integer arithmetic end to end
    "q_resample_fill" -> ((s, d) => {
      val ev = table(s, d, "events")
      // ts is nanos-as-long (Tables contract); integer `div` equals
      // DuckDB's floor-div `//` on these always-positive timestamps
      graft.operators.TimeSeries.resampleFill(
        ev, "event_type",
        bucket = expr("(ts div 1000000000) div 3600"),
        value = col("value"))
        .orderBy(col("event_type"), col("bucket"))
    }),
    // O4 STEP/INTERPOLATE arm: 10-minute buckets, fill grid every 6
    // buckets (hourly) — ClickHouse `WITH FILL ... STEP 6 INTERPOLATE`.
    // Observed off-stride buckets are kept (grid ∪ observed) and the
    // hourly fill rows interpolate the mean linearly between the
    // surrounding observed points
    "q_resample_step" -> ((s, d) => {
      val ev = table(s, d, "events")
      graft.operators.TimeSeries.resampleFill(
        ev, "event_type",
        bucket = expr("(ts div 1000000000) div 600"),
        value = col("value"),
        step = 6L, interpolate = true)
        .orderBy(col("event_type"), col("bucket"))
    }),
    // A3/A6 flagship: TPC-H Q1 shape over lineitem.
    // The discounted-price terms multiply in EXACT decimal arithmetic:
    // casting a computed double product to decimal rounds half-up at a
    // boundary digit and engines disagree at the ulp level — only RAW
    // low-decimal columns are safe to cast (their doubles are never on
    // a rounding boundary).
    "q1_agg" -> ((s, d) => {
      val price = col("l_extendedprice").cast("decimal(18,2)")
      val disc = price * (lit(1).cast("decimal(5,4)") - col("l_discount").cast("decimal(5,4)"))
      val charge = disc * (lit(1).cast("decimal(5,4)") + col("l_tax").cast("decimal(5,4)"))
      table(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          // scale-10 decimal sums re-quantized to scale 4 before the
          // double cast: a 12-digit scale-4 decimal converts to double
          // exactly the same way in every engine (int < 2^53 over an
          // exact power of ten), while full-scale conversions differ
          // at the last ulp between Spark and DuckDB. Quantize via
          // round() (half-away-from-zero in both engines) — decimal
          // CAST would truncate in DuckDB but round HALF_UP in Spark.
          round(sum(disc), 4).cast("double").as("sum_disc_price"),
          round(sum(charge), 4).cast("double").as("sum_charge"),
          round(dsum(col("l_quantity")) / count(lit(1)), 4).as("avg_qty"),
          round(dsum(col("l_discount"), 4) / count(lit(1)), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // A1/A3/A4/A7: event analytics per type
    "q_agg_events" -> ((s, d) => {
      table(s, d, "events")
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("users"),
          dsum(col("value")).as("sum_value"),
          round(dsum(col("value")) / count(lit(1)), 4).as("avg_value"),
          max(col("value")).as("max_value"),
          min(col("value")).as("min_value"))
        .orderBy(col("event_type"))
    }),

    // A4: exact distinct per day
    "q_distinct_daily" -> ((s, d) => {
      table(s, d, "events")
        .groupBy(date_format(graft.Tables.tsSeconds(col("ts")), "yyyy-MM-dd").as("day"))
        .agg(countDistinct(col("user_id")).as("users"), count(lit(1)).as("n"))
        .orderBy(col("day"))
    }),

    // A15: cumulative distinct users per action — "users who have
    // done X by day d", rewritten scale-right: an expanding-window
    // COUNT(DISTINCT) rescans O(days · corpus); instead derive each
    // user's FIRST day doing the action (one keyed partial agg — a
    // user enters the cumulative count on that day, permanently) and
    // prefix-sum the per-day first-touch counts. The window runs over
    // ~|actions|·|days| aggregate rows, partitioned by action — never
    // the corpus, never single-partition
    "q_cumulative_users" -> ((s, d) => {
      val firstDay = table(s, d, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(min(date_format(graft.Tables.tsSeconds(col("ts")), "yyyy-MM-dd"))
          .as("day"))
      val perDay = firstDay.groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("new_users"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      perDay.withColumn("cum_users", sum(col("new_users")).over(w))
        .orderBy(col("event_type"), col("day"))
    }),

    // A2: bucketed latency-histogram analogue over the value measure
    "q_histogram" -> ((s, d) => {
      table(s, d, "events")
        .groupBy(floor(col("value") / 50.0).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy(col("bucket"))
    }),

    // A5: rollup over type × day
    "q_rollup" -> ((s, d) => {
      table(s, d, "events")
        .withColumn("day", date_format(graft.Tables.tsSeconds(col("ts")), "yyyy-MM-dd"))
        .rollup(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("event_type").asc_nulls_first, col("day").asc_nulls_first)
    }),

    // A5: cube over returnflag × linestatus
    "q_cube" -> ((s, d) => {
      table(s, d, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),

    // A5b: arbitrary GROUPING SETS — the general form rollup/cube
    // specialize: (flag, status), (flag), (status) but NOT the grand
    // total, a combination neither rollup nor cube expresses;
    // grouping_id disambiguates which set produced each row (the
    // NULL-vs-null-key ambiguity grouping sets introduce)
    "q_grouping_sets" -> ((s, d) => {
      table(s, d, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),

    // A7: conditional aggregation — error rate per user
    "q_count_if" -> ((s, d) => {
      table(s, d, "events")
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_errors"),
          round(sum(when(col("event_type") === "error", 1.0).otherwise(0.0)) / count(lit(1)), 6).as("error_rate"))
        .orderBy(col("user_id"))
    }),

    // A16: exact percentile family — `percentile` with multiple cut
    // points in ONE pass per group (sort-based within the aggregate
    // buffer; the exact complement of A4's approx sketches). Both
    // engines use the standard p·(n−1) linear-interpolation
    // definition; round(6) absorbs the last-ulp interpolation
    // arithmetic difference
    "q_percentiles" -> ((s, d) => {
      val p = expr("percentile(value, array(0.25D, 0.5D, 0.9D, 0.99D))")
      table(s, d, "events")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), p.as("pq"))
        .select(col("event_type"), col("n"),
          round(element_at(col("pq"), 1), 6).as("p25"),
          round(element_at(col("pq"), 2), 6).as("p50"),
          round(element_at(col("pq"), 3), 6).as("p90"),
          round(element_at(col("pq"), 4), 6).as("p99"))
        .orderBy(col("event_type"))
    }),

    // A44: Kaplan–Meier survival — per-cohort user-lifetime curve
    // with right-censoring (users still active in the final week are
    // censored, not churned); the running product is exp of one
    // window SUM over a fixed log tree, so the curve is value-oracled
    "q_survival" -> ((s, d) => {
      val day = floor(graft.Tables.epochSeconds(col("ts")) / 86400L)
        .cast("long")
      val ev = table(s, d, "events").select(
        col("user_id"), day.as("day"))
      val life = ev.groupBy(col("user_id")).agg(
        min(col("day")).as("t0"), max(col("day")).as("t1"))
      val maxDay = ev.agg(max(col("day")).as("md"))
      val subjects = life.crossJoin(broadcast(maxDay)).select(
        pmod(col("user_id"), lit(3L)).as("cohort"),
        (col("t1") - col("t0")).as("dur"),
        when(col("t1") < col("md") - lit(7L), 1).otherwise(0).as("ev"))
      graft.operators.StatsAgg.kaplanMeier(
        subjects, Seq("cohort"), col("dur"), col("ev"))
        .orderBy(col("cohort"), col("t"))
    }),

    // A44b: the same curve with Greenwood 95% bands — the variance
    // sum Σ d/(n(n−d)) is one more running window over the identical
    // risk grid; se/lo/hi derive from the UNROUNDED survival tree
    "q_survival_ci" -> ((s, d) => {
      val day = floor(graft.Tables.epochSeconds(col("ts")) / 86400L)
        .cast("long")
      val ev = table(s, d, "events").select(
        col("user_id"), day.as("day"))
      val life = ev.groupBy(col("user_id")).agg(
        min(col("day")).as("t0"), max(col("day")).as("t1"))
      val maxDay = ev.agg(max(col("day")).as("md"))
      val subjects = life.crossJoin(broadcast(maxDay)).select(
        pmod(col("user_id"), lit(3L)).as("cohort"),
        (col("t1") - col("t0")).as("dur"),
        when(col("t1") < col("md") - lit(7L), 1).otherwise(0).as("ev"))
      graft.operators.StatsAgg.kaplanMeierCi(
        subjects, Seq("cohort"), col("dur"), col("ev"))
        .orderBy(col("cohort"), col("t"))
    }),

    // A44c: Nelson-Aalen cumulative hazard + Fleming-Harrington
    // survival on the same lifetime grid — the additive estimator a
    // hazard dashboard plots; one grid pass, two more running windows
    "q_cum_hazard" -> ((s, d) => {
      val day = floor(graft.Tables.epochSeconds(col("ts")) / 86400L)
        .cast("long")
      val ev = table(s, d, "events").select(
        col("user_id"), day.as("day"))
      val life = ev.groupBy(col("user_id")).agg(
        min(col("day")).as("t0"), max(col("day")).as("t1"))
      val maxDay = ev.agg(max(col("day")).as("md"))
      val subjects = life.crossJoin(broadcast(maxDay)).select(
        pmod(col("user_id"), lit(3L)).as("cohort"),
        (col("t1") - col("t0")).as("dur"),
        when(col("t1") < col("md") - lit(7L), 1).otherwise(0).as("ev"))
      graft.operators.StatsAgg.nelsonAalen(
        subjects, Seq("cohort"), col("dur"), col("ev"))
        .orderBy(col("cohort"), col("t"))
    }),

    // A46: Cox proportional hazards — the log HAZARD RATIO of the
    // odd-user cohort, 3 Newton steps from beta = 0 on the log-rank
    // risk grid; fixed iteration count -> the learned model is under
    // the value gate (the X29/q_classifier_train discipline)
    "q_coxph" -> ((s, d) => {
      val day = floor(graft.Tables.epochSeconds(col("ts")) / 86400L)
        .cast("long")
      val ev = table(s, d, "events").select(
        col("user_id"), col("event_type"), day.as("day"))
      val life = ev.groupBy(col("event_type"), col("user_id")).agg(
        min(col("day")).as("t0"), max(col("day")).as("t1"))
      val maxDay = ev.agg(max(col("day")).as("md"))
      val subjects = life.crossJoin(broadcast(maxDay)).select(
        col("event_type"),
        (col("t1") - col("t0")).as("dur"),
        when(col("t1") < col("md") - lit(7L), 1).otherwise(0).as("ev"),
        pmod(col("user_id"), lit(2L)).cast("int").as("grp"))
      graft.operators.StatsAgg.coxPh(
        subjects, Seq("event_type"), col("dur"), col("ev"), col("grp"))
        .orderBy(col("event_type"))
    }),

    // A46b: multi-covariate Cox — the odd-user hazard ratio ADJUSTED
    // for an activity-tier covariate (exact quarter grid); 3 Newton
    // steps on the (S0, S1, S2) risk-moment grid, 2×2 Cramer solve,
    // the LEARNED coefficient pair under the value gate via the
    // unrolled-stage oracle
    "q_coxph_multi" -> ((s, d) => {
      val day = floor(graft.Tables.epochSeconds(col("ts")) / 86400L)
        .cast("long")
      val ev = table(s, d, "events").select(
        col("user_id"), col("event_type"), day.as("day"))
      val life = ev.groupBy(col("event_type"), col("user_id")).agg(
        min(col("day")).as("t0"), max(col("day")).as("t1"))
      val maxDay = ev.agg(max(col("day")).as("md"))
      val subjects = life.crossJoin(broadcast(maxDay)).select(
        col("event_type"),
        (col("t1") - col("t0")).as("dur"),
        when(col("t1") < col("md") - lit(7L), 1).otherwise(0).as("ev"),
        pmod(col("user_id"), lit(2L)).cast("double").as("x0"),
        (expr("CAST((user_id div 2) % 4 AS DOUBLE)") * lit(0.25)).as("x1"))
      graft.operators.StatsAgg.coxPhMulti(
        subjects, Seq("event_type"), col("dur"), col("ev"),
        Seq(col("x0"), col("x1")))
        .orderBy(col("event_type"))
    }),

    // A45b: Gehan–Breslow–Wilcoxon — the same grid weighted by the
    // total at risk n_t, sensitive to EARLY curve separation where
    // log-rank weights all event times equally
    "q_logrank_gehan" -> ((s, d) => {
      val day = floor(graft.Tables.epochSeconds(col("ts")) / 86400L)
        .cast("long")
      val ev = table(s, d, "events").select(
        col("user_id"), col("event_type"), day.as("day"))
      val life = ev.groupBy(col("event_type"), col("user_id")).agg(
        min(col("day")).as("t0"), max(col("day")).as("t1"))
      val maxDay = ev.agg(max(col("day")).as("md"))
      val subjects = life.crossJoin(broadcast(maxDay)).select(
        col("event_type"),
        (col("t1") - col("t0")).as("dur"),
        when(col("t1") < col("md") - lit(7L), 1).otherwise(0).as("ev"),
        pmod(col("user_id"), lit(2L)).cast("int").as("grp"))
      graft.operators.StatsAgg.gehanWilcoxonTest(
        subjects, Seq("event_type"), col("dur"), col("ev"), col("grp"))
        .orderBy(col("event_type"))
    }),

    // A46c: the three-covariate Cox — parity, activity tier AND
    // engagement tier, solved by the explicit symmetric 3×3 adjugate
    // so the p=3 LEARNED model rides the value gate too
    "q_coxph_multi3" -> ((s, d) => {
      val day = floor(graft.Tables.epochSeconds(col("ts")) / 86400L)
        .cast("long")
      val ev = table(s, d, "events").select(
        col("user_id"), col("event_type"), day.as("day"))
      val life = ev.groupBy(col("event_type"), col("user_id")).agg(
        min(col("day")).as("t0"), max(col("day")).as("t1"))
      val maxDay = ev.agg(max(col("day")).as("md"))
      val subjects = life.crossJoin(broadcast(maxDay)).select(
        col("event_type"),
        (col("t1") - col("t0")).as("dur"),
        when(col("t1") < col("md") - lit(7L), 1).otherwise(0).as("ev"),
        pmod(col("user_id"), lit(2L)).cast("double").as("x0"),
        (expr("CAST((user_id div 2) % 4 AS DOUBLE)") * lit(0.25)).as("x1"),
        (expr("CAST((user_id div 8) % 3 AS DOUBLE)") * lit(0.5)).as("x2"))
      graft.operators.StatsAgg.coxPhMulti(
        subjects, Seq("event_type"), col("dur"), col("ev"),
        Seq(col("x0"), col("x1"), col("x2")))
        .orderBy(col("event_type"))
    }),

    // A45: log-rank (Mantel–Cox) — do the even/odd user cohorts'
    // survival curves differ? Hypergeometric O−E over event times,
    // χ²(1) + Wilson–Hilferty p, the A44 significance companion
    "q_logrank" -> ((s, d) => {
      val day = floor(graft.Tables.epochSeconds(col("ts")) / 86400L)
        .cast("long")
      val ev = table(s, d, "events").select(
        col("user_id"), col("event_type"), day.as("day"))
      val life = ev.groupBy(col("event_type"), col("user_id")).agg(
        min(col("day")).as("t0"), max(col("day")).as("t1"))
      val maxDay = ev.agg(max(col("day")).as("md"))
      val subjects = life.crossJoin(broadcast(maxDay)).select(
        col("event_type"),
        (col("t1") - col("t0")).as("dur"),
        when(col("t1") < col("md") - lit(7L), 1).otherwise(0).as("ev"),
        pmod(col("user_id"), lit(2L)).cast("int").as("grp"))
      graft.operators.StatsAgg.logRankTest(
        subjects, Seq("event_type"), col("dur"), col("ev"), col("grp"))
        .orderBy(col("event_type"))
    }),

    // A43: winsorized + trimmed robust stats — clip/drop the value
    // tails at the exact per-group [p05, p95] fences (round-6 BEFORE
    // any comparison so boundary rows classify identically across
    // engines), then fixed mean/stddev trees over exact DECIMAL sums
    "q_winsorize" -> ((s, d) => {
      graft.operators.StatsAgg.winsorizedStats(
        table(s, d, "events"), Seq("event_type"), col("value"),
        lo = 0.05, hi = 0.95)
        .orderBy(col("event_type"))
    }),

    // A42: exact 2-feature OLS per group — value ~ hour-of-day +
    // user-bucket through the normal equations via the explicit
    // Cramer cofactor tree over DECIMAL-exact sufficient statistics
    // (one pass, 10 sums; the q_corr discipline widened to p=2).
    // Deterministic where SGD-family fits never are, hence oracle-able
    "q_linfit" -> ((s, d) => {
      val ev = table(s, d, "events")
      graft.operators.Regression.linearFit2(
        ev, Seq("event_type"),
        x1 = (pmod(graft.Tables.epochSeconds(col("ts")), lit(86400L)) /
          lit(3600L)).cast("long"),
        x2 = pmod(col("user_id"), lit(50L)),
        y = col("value"))
        .orderBy(col("event_type"))
    }),

    // A42c: ridge at λ=25 on the q_linfit design — the shrunken
    // Cramer solve (λ on the feature diagonal only) with the full
    // quadratic SSE; closed-form, so the regularized fit is under
    // the same value gate as OLS
    "q_ridge" -> ((s, d) => {
      val ev = table(s, d, "events")
      graft.operators.Regression.ridgeFit2(
        ev, Seq("event_type"),
        x1 = (pmod(graft.Tables.epochSeconds(col("ts")), lit(86400L)) /
          lit(3600L)).cast("long"),
        x2 = pmod(col("user_id"), lit(50L)),
        y = col("value"), lambda = 25.0)
        .orderBy(col("event_type"))
    }),

    // A17: correlation + regression per group — Pearson r and the
    // least-squares line of value-vs-hour-of-day. Built-in corr()/
    // regr_slope() accumulate DOUBLES in partition order (not
    // reproducible cross-engine); instead the five sufficient
    // statistics are DECIMAL-exact sums (order-free), and r/slope/
    // intercept derive from those exact numbers through one fixed
    // double expression tree — the X13/W4c numeric discipline
    "q_corr" -> ((s, d) => {
      val ev = table(s, d, "events")
        .select(col("event_type"),
          col("value").cast("decimal(18,2)").as("x"),
          (pmod(graft.Tables.epochSeconds(col("ts")), lit(86400L)) / lit(3600L))
            .cast("long").cast("decimal(18,2)").as("y"))
      val d2 = (c: Column) => c.cast("double")
      val agg = ev.groupBy(col("event_type")).agg(
        count(lit(1)).as("n"),
        sum(col("x")).cast("double").as("sx"),
        sum(col("y")).cast("double").as("sy"),
        sum((col("x") * col("y")).cast("decimal(38,6)")).cast("double").as("sxy"),
        sum((col("x") * col("x")).cast("decimal(38,6)")).cast("double").as("sxx"),
        sum((col("y") * col("y")).cast("decimal(38,6)")).cast("double").as("syy"))
      agg
        .withColumn("cov_n", col("sxy") - col("sx") * col("sy") / d2(col("n")))
        .withColumn("vx", col("sxx") - col("sx") * col("sx") / d2(col("n")))
        .withColumn("vy", col("syy") - col("sy") * col("sy") / d2(col("n")))
        .select(col("event_type"), col("n"),
          when(col("vx") > 1e-9 && col("vy") > 1e-9,
            round(col("cov_n") / sqrt(col("vx") * col("vy")), 6)).as("r"),
          when(col("vx") > 1e-9,
            round(col("cov_n") / col("vx"), 6)).as("slope"),
          when(col("vx") > 1e-9,
            round(col("sy") / d2(col("n")) -
              (col("cov_n") / col("vx")) * (col("sx") / d2(col("n"))), 6))
            .as("intercept"))
        .orderBy(col("event_type"))
    }),

    // A8: argmax-by-version via max_by — latest event per user
    // (partial-agg friendly alternative to the W1 window; see
    // VersionedDedup.latestByVersionAgg)
    "q_latest_by" -> ((s, d) => {
      table(s, d, "events")
        .groupBy(col("user_id"))
        .agg(
          max(col("event_id")).as("last_event_id"),
          max_by(col("event_type"), col("event_id")).as("last_type"),
          round(max_by(col("value"), col("event_id")), 2).as("last_value"),
          count(lit(1)).as("n"))
        .orderBy(col("user_id"))
    }),

    // A40: Benjamini–Hochberg q-values across the live test panel —
    // six tests per event_type (meanZ, Mann–Whitney, Mann–Kendall on
    // their exact-normal p; Welch on its Paulson t p; Kruskal–Wallis
    // and Jarque–Bera on their Wilson–Hilferty χ² p) corrected as ONE
    // 30-hypothesis family, exactly the monitoring read that decides
    // which per-key alarms to act on
    "q_fdr_adjust" -> ((s, d) => {
      val ev = table(s, d, "events")
      def tag(t: String, df: DataFrame, p: String = "p_value") =
        df.select(
          concat(lit(t), lit("|"), col("event_type")).as("hyp"),
          col(p).as("p_value"))
      val mz = graft.operators.StatsAgg.meanZTest(
        ev, Seq("event_type"), col("value"),
        cohort = col("user_id") % 2 === 0, var1 = 80000.0, var2 = 80000.0)
      val mwu = graft.operators.StatsAgg.mannWhitneyUTest(
        ev.where(col("user_id").isNotNull), Seq("event_type"),
        col("value"), cohort = col("user_id") % 2 === 0)
      val day = floor(graft.Tables.epochSeconds(col("ts")) / 86400L)
        .cast("long").as("day")
      val daily = ev.where(col("ts").isNotNull)
        .select(col("event_type"), day)
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).cast("double").as("cnt"))
      val mk = graft.operators.TimeSeries.mannKendall(
        daily, Seq("event_type"), ord = col("day"), value = col("cnt"))
      val we = graft.operators.StatsAgg.welchTTest(
        ev, Seq("event_type"), col("value"),
        cohort = col("user_id") % 2 === 0)
      val kw = graft.operators.StatsAgg.kruskalWallis(
        ev.where(col("user_id").isNotNull), Seq("event_type"),
        col("value"), group = (col("user_id") % 3).cast("string"))
      val jb = graft.operators.StatsAgg.jarqueBera(
        ev, Seq("event_type"), col("value"))
      // each feed MATERIALIZES its |keys|-row output before the BH
      // step (localCheckpoint — the k-means/BPE truncation pattern):
      // fusing six test plans under one union re-inflates the Φ/χ²
      // p-value trees through CollapseProject and costs ~10 s in
      // planning+codegen at sf0.1; materialized, the panel is six
      // independent jobs + a 30-row BH. This is also the production
      // shape — test outputs are computed once, the correction runs
      // on the panel, not on fused lineage.
      // r21: the six checkpoint jobs are INDEPENDENT (each reads the
      // events table, none reads another's output), so they submit
      // CONCURRENTLY from a small thread pool (guide §2.6 "overlap
      // independent jobs") — each job's tail otherwise left most
      // cores idle while the next feed waited (measured 4.1 s
      // sequential → ~2 s overlapped at sf0.1). Results are
      // unchanged: localCheckpoint materializes the same frame
      // whichever thread runs it, and the union order is the Seq
      // order, not completion order.
      val feeds = Seq(
        tag("meanz", mz), tag("mwu", mwu), tag("mk", mk),
        tag("welch", we, "p_approx"), tag("kw", kw, "p_approx"),
        tag("jb", jb, "p_approx"))
      val panel = graft.operators.ConcurrentJobs
        .materialize(feeds)
        .reduce(_ unionByName _)
      graft.operators.StatsAgg.fdrAdjust(
        panel, Seq.empty, p = col("p_value"), tie = col("hyp"))
        .orderBy(col("bh_rank"))
    }),

    // A40b: Storey q-values (π₀ λ-plugin, λ = 0.5) over a single-feed
    // 35-hypothesis panel — meanZ per (event_type, user_id%7 bucket).
    // One feed, so no localCheckpoint here (q_fdr_adjust stays the
    // registry's only materializing query); the panel is genuinely
    // mixed (some buckets drift, most do not), which is the regime
    // where the plugin's π̂₀ < 1 visibly sharpens q vs plain BH
    // A40c: Benjamini–Yekutieli on the same 35-hypothesis meanZ
    // panel — the harmonic c(m) inflation that survives arbitrary
    // dependence; cm an exact DECIMAL sum of 9-dp 1/j terms
    "q_fdr_by" -> ((s, d) => {
      val ev = table(s, d, "events")
        .withColumn("bucket", (col("user_id") % 7).cast("long"))
      val mz = graft.operators.StatsAgg.meanZTest(
        ev.where(col("user_id").isNotNull),
        Seq("event_type", "bucket"), col("value"),
        cohort = col("user_id") % 2 === 0, var1 = 80000.0, var2 = 80000.0)
      graft.operators.StatsAgg.fdrAdjustBY(
        mz.select(
          concat(col("event_type"), lit("|"), col("bucket")).as("hyp"),
          col("p_value")),
        Seq.empty, p = col("p_value"), tie = col("hyp"))
        .orderBy(col("bh_rank"))
    }),

    "q_fdr_storey" -> ((s, d) => {
      val ev = table(s, d, "events")
        .withColumn("bucket", (col("user_id") % 7).cast("long"))
      val mz = graft.operators.StatsAgg.meanZTest(
        ev.where(col("user_id").isNotNull),
        Seq("event_type", "bucket"), col("value"),
        cohort = col("user_id") % 2 === 0, var1 = 80000.0, var2 = 80000.0)
      graft.operators.StatsAgg.fdrAdjust(
        mz.select(
          concat(col("event_type"), lit("|"), col("bucket")).as("hyp"),
          col("p_value")),
        Seq.empty, p = col("p_value"), tie = col("hyp"),
        storeyLambda = Some(0.5))
        .orderBy(col("bh_rank"))
    }))

  /** One unrolled A46 Newton stage: beta table b{i} → b{i+1} over the
    * r2 risk grid — term trees token-for-token the operator's
    * (9-dp-quantized U/I contributions, exact DECIMAL sums, double
    * update guarded on the information).
    */
  private def coxStageSql(i: Int): String = {
    val eb = s"exp(b$i.b)"
    val den = s"(CAST(g.n0 AS DOUBLE) + CAST(g.n1 AS DOUBLE) * $eb)"
    s"""s$i AS (SELECT g.event_type, b$i.b,
       CAST(CASE WHEN g.d > 0 THEN
         round(CAST(g.d AS DOUBLE) * (CAST(g.n1 AS DOUBLE) * $eb / $den), 9)
         ELSE 0.0 END AS DECIMAL(20,9)) AS tu,
       CAST(CASE WHEN g.d > 0 THEN
         round(CAST(g.d AS DOUBLE) * (CAST(g.n1 AS DOUBLE) * $eb * CAST(g.n0 AS DOUBLE))
           / ($den * $den), 9)
         ELSE 0.0 END AS DECIMAL(20,9)) AS ti
       FROM r2 g JOIN b$i USING (event_type)),
     a$i AS (SELECT event_type, MAX(b) AS b,
         CAST(SUM(tu) AS DOUBLE) AS su, CAST(SUM(ti) AS DOUBLE) AS ii
       FROM s$i GROUP BY event_type),
     b${i + 1} AS (SELECT a$i.event_type,
         CASE WHEN a$i.ii > 1e-12
           THEN a$i.b + (CAST(c0.o1 AS DOUBLE) - a$i.su) / a$i.ii
           ELSE a$i.b END AS b
       FROM a$i JOIN c0 USING (event_type))"""
  }

  /** The shared A45/A46 lifetime + risk-grid CTE prefix. */
  private val coxGridSql: String =
    """e AS (SELECT user_id, event_type,
         CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 86400 AS day
       FROM events),
       u AS (SELECT event_type, user_id, MIN(day) AS t0, MAX(day) AS t1
         FROM e GROUP BY event_type, user_id),
       mx AS (SELECT MAX(day) AS md FROM e),
       s AS (SELECT event_type, t1 - t0 AS t,
           CASE WHEN t1 < md - 7 THEN 1 ELSE 0 END AS ev,
           CAST(user_id % 2 AS INT) AS g
         FROM u, mx),
       gr AS (SELECT event_type, t, COUNT(*) AS m,
           CAST(SUM(g) AS BIGINT) AS m1,
           CAST(SUM(ev) AS BIGINT) AS d,
           CAST(SUM(g * ev) AS BIGINT) AS d1
         FROM s GROUP BY event_type, t),
       r AS (SELECT *,
           CAST(SUM(m) OVER (PARTITION BY event_type) AS BIGINT) AS ntot,
           CAST(SUM(m1) OVER (PARTITION BY event_type) AS BIGINT) AS n1tot,
           CAST(COALESCE(SUM(m) OVER (PARTITION BY event_type ORDER BY t
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS nb,
           CAST(COALESCE(SUM(m1) OVER (PARTITION BY event_type ORDER BY t
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n1b
         FROM gr),
       r2 AS (SELECT *, n1tot - n1b AS n1,
           (ntot - nb) - (n1tot - n1b) AS n0 FROM r),
       c0 AS (SELECT event_type, MAX(ntot) AS n_subjects,
           CAST(SUM(d1) AS BIGINT) AS o1
         FROM r2 GROUP BY event_type),
       b0 AS (SELECT event_type, 0.0 AS b FROM c0)"""

  /** A46b lifetime + covariate grid CTE prefix: x0 = user parity,
    * x1 = quarter-grid activity tier ((user_id div 2) mod 4 · 0.25).
    */
  private val coxMultiGridSql: String =
    """e AS (SELECT user_id, event_type,
         CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 86400 AS day
       FROM events),
       u AS (SELECT event_type, user_id, MIN(day) AS t0, MAX(day) AS t1
         FROM e GROUP BY event_type, user_id),
       mx AS (SELECT MAX(day) AS md FROM e),
       s AS (SELECT event_type, t1 - t0 AS t,
           CASE WHEN t1 < md - 7 THEN 1 ELSE 0 END AS ev,
           CAST(user_id % 2 AS DOUBLE) AS x0,
           CAST((user_id // 2) % 4 AS DOUBLE) * 0.25 AS x1
         FROM u, mx),
       gr AS (SELECT event_type, t, COUNT(*) AS m,
           CAST(SUM(ev) AS BIGINT) AS d,
           CAST(SUM(CAST(ev * x0 AS DECIMAL(20,9))) AS DECIMAL(38,9)) AS sxe0,
           CAST(SUM(CAST(ev * x1 AS DECIMAL(20,9))) AS DECIMAL(38,9)) AS sxe1
         FROM s GROUP BY event_type, t),
       c0 AS (SELECT event_type, CAST(SUM(m) AS BIGINT) AS n_subjects,
           CAST(SUM(d) AS BIGINT) AS n_events
         FROM gr GROUP BY event_type),
       bb0 AS (SELECT event_type, 0.0 AS b0, 0.0 AS b1 FROM c0)"""

  /** One unrolled A46b Newton stage: subject weights at bb$i's β,
    * 9-dp-quantized DECIMAL moment sums per duration, reverse
    * cumulative risk windows, per-time U/I contributions, the per-key
    * aggregate, and (unless `last`) the 2×2 Cramer update to
    * bb${i+1} — token-for-token the operator's dataflow.
    */
  private def coxMultiStageSql(i: Int, last: Boolean = false): String = {
    def q(e: String) =
      s"CAST(SUM(CAST(round($e, 9) AS DECIMAL(30,9))) AS DECIMAL(38,9))"
    val win = "OVER (PARTITION BY event_type ORDER BY t " +
      "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)"
    val det = "(g.i00 * g.i11 - g.i01 * g.i01)"
    val core = s"""w$i AS (SELECT s.event_type, s.t, s.x0, s.x1,
         exp(b.b0 * s.x0 + b.b1 * s.x1) AS wv
       FROM s JOIN bb$i b USING (event_type)),
     a$i AS (SELECT event_type, t,
         ${q("wv")} AS a0,
         ${q("x0 * wv")} AS af0,
         ${q("x1 * wv")} AS af1,
         ${q("x0 * x0 * wv")} AS ap00,
         ${q("x0 * x1 * wv")} AS ap01,
         ${q("x1 * x1 * wv")} AS ap11
       FROM w$i GROUP BY event_type, t),
     r$i AS (SELECT event_type, t, d,
         CAST(sxe0 AS DOUBLE) AS sxe0d, CAST(sxe1 AS DOUBLE) AS sxe1d,
         CAST(SUM(a0) $win AS DOUBLE) AS s0,
         CAST(SUM(af0) $win AS DOUBLE) AS sf0,
         CAST(SUM(af1) $win AS DOUBLE) AS sf1,
         CAST(SUM(ap00) $win AS DOUBLE) AS sp00,
         CAST(SUM(ap01) $win AS DOUBLE) AS sp01,
         CAST(SUM(ap11) $win AS DOUBLE) AS sp11
       FROM a$i JOIN gr USING (event_type, t)),
     t$i AS (SELECT event_type,
         CAST(CASE WHEN d > 0 THEN
             round(sxe0d - CAST(d AS DOUBLE) * (sf0 / s0), 9)
           ELSE 0.0 END AS DECIMAL(20,9)) AS tu0,
         CAST(CASE WHEN d > 0 THEN
             round(sxe1d - CAST(d AS DOUBLE) * (sf1 / s0), 9)
           ELSE 0.0 END AS DECIMAL(20,9)) AS tu1,
         CAST(CASE WHEN d > 0 THEN
             round(CAST(d AS DOUBLE) * (sp00 / s0 - (sf0 / s0) * (sf0 / s0)), 9)
           ELSE 0.0 END AS DECIMAL(20,9)) AS ti00,
         CAST(CASE WHEN d > 0 THEN
             round(CAST(d AS DOUBLE) * (sp01 / s0 - (sf0 / s0) * (sf1 / s0)), 9)
           ELSE 0.0 END AS DECIMAL(20,9)) AS ti01,
         CAST(CASE WHEN d > 0 THEN
             round(CAST(d AS DOUBLE) * (sp11 / s0 - (sf1 / s0) * (sf1 / s0)), 9)
           ELSE 0.0 END AS DECIMAL(20,9)) AS ti11
       FROM r$i),
     g$i AS (SELECT event_type,
         CAST(SUM(tu0) AS DOUBLE) AS u0, CAST(SUM(tu1) AS DOUBLE) AS u1,
         CAST(SUM(ti00) AS DOUBLE) AS i00, CAST(SUM(ti01) AS DOUBLE) AS i01,
         CAST(SUM(ti11) AS DOUBLE) AS i11
       FROM t$i GROUP BY event_type)"""
    if (last) core
    else core + s""",
     bb${i + 1} AS (SELECT g.event_type,
         CASE WHEN $det > 1e-12 AND g.i00 > 0.0
           THEN round(b.b0 + (g.u0 * g.i11 - g.i01 * g.u1) / $det, 9)
           ELSE b.b0 END AS b0,
         CASE WHEN $det > 1e-12 AND g.i00 > 0.0
           THEN round(b.b1 + (g.i00 * g.u1 - g.u0 * g.i01) / $det, 9)
           ELSE b.b1 END AS b1
       FROM g$i g JOIN bb$i b USING (event_type))"""
  }

  /** A46c: the A46b generators widened to p = 3 (x2 = half-grid
    * engagement tier); moments/terms emitted by index loops, the
    * solve via the symmetric 3×3 adjugate — ONE tree shared with the
    * operator's Column face.
    */
  private val coxMulti3GridSql: String = {
    val sxe = (0 to 2).map(k =>
      s"CAST(SUM(CAST(ev * x$k AS DECIMAL(20,9))) AS DECIMAL(38,9)) AS sxe$k")
      .mkString(",\n           ")
    s"""e AS (SELECT user_id, event_type,
         CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 86400 AS day
       FROM events),
       u AS (SELECT event_type, user_id, MIN(day) AS t0, MAX(day) AS t1
         FROM e GROUP BY event_type, user_id),
       mx AS (SELECT MAX(day) AS md FROM e),
       s AS (SELECT event_type, t1 - t0 AS t,
           CASE WHEN t1 < md - 7 THEN 1 ELSE 0 END AS ev,
           CAST(user_id % 2 AS DOUBLE) AS x0,
           CAST((user_id // 2) % 4 AS DOUBLE) * 0.25 AS x1,
           CAST((user_id // 8) % 3 AS DOUBLE) * 0.5 AS x2
         FROM u, mx),
       gr AS (SELECT event_type, t, COUNT(*) AS m,
           CAST(SUM(ev) AS BIGINT) AS d,
           $sxe
         FROM s GROUP BY event_type, t),
       c0 AS (SELECT event_type, CAST(SUM(m) AS BIGINT) AS n_subjects,
           CAST(SUM(d) AS BIGINT) AS n_events
         FROM gr GROUP BY event_type),
       bb0 AS (SELECT event_type, 0.0 AS b0, 0.0 AS b1, 0.0 AS b2 FROM c0)"""
  }

  private val cox3Pairs = for (i <- 0 to 2; j <- i to 2) yield (i, j)

  /** The six adjugate entry expressions over i00..i22 column names
    * prefixed by `t` — (A00, A01, A02, A11, A12, A22), the operator's
    * cox3Adjugate token-for-token.
    */
  private def cox3AdjSql(t: String): Seq[String] = {
    val (a, b, c) = (s"$t.i00", s"$t.i01", s"$t.i02")
    val (d, e, f) = (s"$t.i11", s"$t.i12", s"$t.i22")
    Seq(
      s"($d * $f - $e * $e)",
      s"(-($b * $f - $c * $e))",
      s"($b * $e - $d * $c)",
      s"($a * $f - $c * $c)",
      s"(-($a * $e - $b * $c))",
      s"($a * $d - $b * $b)")
  }

  private def cox3DetSql(t: String): String = {
    val (a, b, c) = (s"$t.i00", s"$t.i01", s"$t.i02")
    val (d, e, f) = (s"$t.i11", s"$t.i12", s"$t.i22")
    s"($a * ($d * $f - $e * $e) - $b * ($b * $f - $c * $e) + $c * ($b * $e - $d * $c))"
  }

  private def coxMulti3StageSql(i: Int, last: Boolean = false): String = {
    def q(e: String) =
      s"CAST(SUM(CAST(round($e, 9) AS DECIMAL(30,9))) AS DECIMAL(38,9))"
    val win = "OVER (PARTITION BY event_type ORDER BY t " +
      "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)"
    val aCols = (s"${q("wv")} AS a0" +:
      ((0 to 2).map(k => s"${q(s"x$k * wv")} AS af$k") ++
        cox3Pairs.map { case (a, b) =>
          s"${q(s"x$a * x$b * wv")} AS ap$a$b" })).mkString(",\n         ")
    val rCols = ((0 to 2).map(k =>
      s"CAST(sxe$k AS DOUBLE) AS sxe${k}d") ++
      Seq(s"CAST(SUM(a0) $win AS DOUBLE) AS s0") ++
      (0 to 2).map(k => s"CAST(SUM(af$k) $win AS DOUBLE) AS sf$k") ++
      cox3Pairs.map { case (a, b) =>
        s"CAST(SUM(ap$a$b) $win AS DOUBLE) AS sp$a$b" })
      .mkString(",\n         ")
    val tCols = ((0 to 2).map(k =>
      s"""CAST(CASE WHEN d > 0 THEN
           round(sxe${k}d - CAST(d AS DOUBLE) * (sf$k / s0), 9)
         ELSE 0.0 END AS DECIMAL(20,9)) AS tu$k""") ++
      cox3Pairs.map { case (a, b) =>
        s"""CAST(CASE WHEN d > 0 THEN
             round(CAST(d AS DOUBLE) * (sp$a$b / s0 - (sf$a / s0) * (sf$b / s0)), 9)
           ELSE 0.0 END AS DECIMAL(20,9)) AS ti$a$b""" })
      .mkString(",\n         ")
    val gCols = ((0 to 2).map(k =>
      s"CAST(SUM(tu$k) AS DOUBLE) AS u$k") ++
      cox3Pairs.map { case (a, b) =>
        s"CAST(SUM(ti$a$b) AS DOUBLE) AS i$a$b" }).mkString(", ")
    val core = s"""w$i AS (SELECT s.event_type, s.t, s.x0, s.x1, s.x2,
         exp(b.b0 * s.x0 + b.b1 * s.x1 + b.b2 * s.x2) AS wv
       FROM s JOIN bb$i b USING (event_type)),
     a$i AS (SELECT event_type, t,
         $aCols
       FROM w$i GROUP BY event_type, t),
     r$i AS (SELECT event_type, t, d,
         $rCols
       FROM a$i JOIN gr USING (event_type, t)),
     t$i AS (SELECT event_type,
         $tCols
       FROM r$i),
     g$i AS (SELECT event_type, $gCols
       FROM t$i GROUP BY event_type)"""
    if (last) core
    else {
      val adj = cox3AdjSql("g")
      val det = cox3DetSql("g")
      val updates = (0 to 2).map { k =>
        val num = k match {
          case 0 => s"(${adj(0)} * g.u0 + ${adj(1)} * g.u1 + ${adj(2)} * g.u2)"
          case 1 => s"(${adj(1)} * g.u0 + ${adj(3)} * g.u1 + ${adj(4)} * g.u2)"
          case _ => s"(${adj(2)} * g.u0 + ${adj(4)} * g.u1 + ${adj(5)} * g.u2)"
        }
        s"""CASE WHEN $det > 1e-12 AND g.i00 > 0.0
             THEN round(b.b$k + $num / $det, 9)
             ELSE b.b$k END AS b$k"""
      }.mkString(",\n         ")
      core + s""",
     bb${i + 1} AS (SELECT g.event_type,
         $updates
       FROM g$i g JOIN bb$i b USING (event_type))"""
    }
  }

  private val baseOracles: Map[String, String] = Map(
    // A46c oracle: the p = 3 unrolled stages, adjugate solve and
    // Wald diagonal — every fragment emitted by the index-loop
    // generators above
    "q_coxph_multi3" -> {
      val adjF = cox3AdjSql("fo")
      val detF = cox3DetSql("fo")
      val seDefs = Seq(0 -> adjF(0), 1 -> adjF(3), 2 -> adjF(5)).map {
        case (k, akk) =>
          s"""CASE WHEN $detF > 1e-12 AND fo.i00 > 0.0
               THEN sqrt($akk / $detF) END AS se${k}r"""
      }.mkString(",\n             ")
      val zDefs = (0 to 2).map(k =>
        s"""CASE WHEN se${k}r IS NOT NULL AND se${k}r > 0.0
             THEN round(b$k / se${k}r, 6) END AS z$k""")
        .mkString(",\n             ")
      val outBlocks = (0 to 2).map { k =>
        s"""CASE WHEN se${k}r IS NOT NULL AND se${k}r > 0.0
             THEN round(b$k, 6) END AS beta$k,
           CASE WHEN se${k}r IS NOT NULL AND se${k}r > 0.0
             THEN round(exp(b$k), 6) END AS hr$k,
           CASE WHEN se${k}r IS NOT NULL AND se${k}r > 0.0
             THEN round(se${k}r, 6) END AS se$k,
           z$k,
           ${graft.functions.NormalDist.twoSidedPSql(s"z$k")} AS p$k"""
      }.mkString(",\n           ")
      s"""WITH $coxMulti3GridSql,
         ${coxMulti3StageSql(0)},
         ${coxMulti3StageSql(1)},
         ${coxMulti3StageSql(2)},
         ${coxMulti3StageSql(3, last = true)},
         fo AS (SELECT c0.event_type, c0.n_subjects, c0.n_events,
             b.b0, b.b1, b.b2,
             g.i00, g.i01, g.i02, g.i11, g.i12, g.i22
           FROM c0 JOIN g3 g USING (event_type)
             JOIN bb3 b USING (event_type)),
         fs AS (SELECT *,
             $seDefs
           FROM fo),
         fz AS (SELECT *,
             $zDefs
           FROM fs)
         SELECT event_type, n_subjects, n_events,
           $outBlocks
         FROM fz ORDER BY event_type"""
    },
    // A46b oracle: three unrolled Newton stages + a fourth info-only
    // stage at the fitted β; Wald se from the 2×2 inverse diagonal,
    // z per covariate, shared normal p trees
    "q_coxph_multi" -> (
      s"""WITH $coxMultiGridSql,
         ${coxMultiStageSql(0)},
         ${coxMultiStageSql(1)},
         ${coxMultiStageSql(2)},
         ${coxMultiStageSql(3, last = true)},
         fo AS (SELECT c0.event_type, c0.n_subjects, c0.n_events,
             b.b0, b.b1, g.i00, g.i01, g.i11,
             (g.i00 * g.i11 - g.i01 * g.i01) AS det
           FROM c0 JOIN g3 g USING (event_type)
             JOIN bb3 b USING (event_type)),
         fs AS (SELECT *,
             CASE WHEN det > 1e-12 AND i00 > 0.0
               THEN sqrt(i11 / det) END AS se0r,
             CASE WHEN det > 1e-12 AND i00 > 0.0
               THEN sqrt(i00 / det) END AS se1r
           FROM fo),
         fz AS (SELECT *,
             CASE WHEN se0r IS NOT NULL AND se0r > 0.0
               THEN round(b0 / se0r, 6) END AS z0,
             CASE WHEN se1r IS NOT NULL AND se1r > 0.0
               THEN round(b1 / se1r, 6) END AS z1
           FROM fs)
         SELECT event_type, n_subjects, n_events,
           CASE WHEN se0r IS NOT NULL AND se0r > 0.0
             THEN round(b0, 6) END AS beta0,
           CASE WHEN se0r IS NOT NULL AND se0r > 0.0
             THEN round(exp(b0), 6) END AS hr0,
           CASE WHEN se0r IS NOT NULL AND se0r > 0.0
             THEN round(se0r, 6) END AS se0,
           z0,
           """ + graft.functions.NormalDist.twoSidedPSql("z0") + s""" AS p0,
           CASE WHEN se1r IS NOT NULL AND se1r > 0.0
             THEN round(b1, 6) END AS beta1,
           CASE WHEN se1r IS NOT NULL AND se1r > 0.0
             THEN round(exp(b1), 6) END AS hr1,
           CASE WHEN se1r IS NOT NULL AND se1r > 0.0
             THEN round(se1r, 6) END AS se1,
           z1,
           """ + graft.functions.NormalDist.twoSidedPSql("z1") + s""" AS p1
         FROM fz ORDER BY event_type"""),
    // A46 oracle: the 3 Newton stages UNROLLED over the shared risk
    // grid, final information at the fitted beta, Wald z + shared
    // normal p — the operator's dataflow stage for stage
    "q_coxph" -> (
      s"""WITH $coxGridSql,
         ${coxStageSql(0)},
         ${coxStageSql(1)},
         ${coxStageSql(2)},
         fint AS (SELECT g.event_type, b3.b,
             CAST(CASE WHEN g.d > 0 THEN
               round(CAST(g.d AS DOUBLE) * (CAST(g.n1 AS DOUBLE) * exp(b3.b) * CAST(g.n0 AS DOUBLE))
                 / ((CAST(g.n0 AS DOUBLE) + CAST(g.n1 AS DOUBLE) * exp(b3.b))
                   * (CAST(g.n0 AS DOUBLE) + CAST(g.n1 AS DOUBLE) * exp(b3.b))), 9)
               ELSE 0.0 END AS DECIMAL(20,9)) AS ti
           FROM r2 g JOIN b3 USING (event_type)),
         af AS (SELECT event_type, MAX(b) AS b,
             CAST(SUM(ti) AS DOUBLE) AS ii
           FROM fint GROUP BY event_type),
         outc AS (SELECT c0.event_type, c0.n_subjects, c0.o1, af.b, af.ii
           FROM c0 JOIN af USING (event_type)),
         outz AS (SELECT *,
             CASE WHEN ii > 1e-12 THEN round(b * sqrt(ii), 6) END AS z
           FROM outc)
         SELECT event_type, n_subjects, o1,
           CASE WHEN ii > 1e-12 THEN round(b, 6) END AS beta,
           CASE WHEN ii > 1e-12 THEN round(exp(b), 6) END AS hazard_ratio,
           CASE WHEN ii > 1e-12 THEN round(1.0 / sqrt(ii), 6) END AS se,
           z,
           """ + graft.functions.NormalDist.twoSidedPSql("z") +
      """ AS p_value
         FROM outz ORDER BY event_type"""),
    "q_group_array" ->
      """WITH t AS (SELECT user_id,
           CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ep,
           event_id, event_type FROM events)
         SELECT user_id,
           array_to_string((list(event_type ORDER BY ep, event_id))[1:5], ',') AS first5,
           array_to_string(list(DISTINCT event_type ORDER BY event_type), ',') AS uniq_types
         FROM t GROUP BY user_id ORDER BY user_id""",
    "q_sum_map" ->
      """WITH t AS (SELECT user_id, event_type,
           CAST(value AS DECIMAL(18,2)) AS v FROM events),
         g AS (SELECT user_id, event_type, SUM(v) AS s
           FROM t GROUP BY user_id, event_type)
         SELECT user_id,
           string_agg(event_type || ':' || CAST(s AS VARCHAR), ','
             ORDER BY event_type) AS spend_map
         FROM g GROUP BY user_id ORDER BY user_id""",
    "q_minmax_map" ->
      """WITH t AS (SELECT user_id, event_type,
           CAST(value AS DECIMAL(18,2)) AS v FROM events),
         g AS (SELECT user_id, event_type, min(v) AS mn, max(v) AS mx
           FROM t GROUP BY user_id, event_type)
         SELECT user_id,
           string_agg(event_type || ':' || CAST(mn AS VARCHAR), ','
             ORDER BY event_type) AS mins,
           string_agg(event_type || ':' || CAST(mx AS VARCHAR), ','
             ORDER BY event_type) AS maxs
         FROM g GROUP BY user_id ORDER BY user_id""",
    "q_avg_weighted" ->
      """SELECT event_type,
           CAST(coalesce(sum(CASE WHEN value IS NOT NULL
             THEN user_id % 5 + 1 END), 0) AS BIGINT) AS w_total,
           round(CAST(sum(CAST(value AS DECIMAL(18,6))
               * (user_id % 5 + 1)) AS DOUBLE)
             / CAST(sum(CASE WHEN value IS NOT NULL
                 THEN user_id % 5 + 1 END) AS DOUBLE), 6) AS avg_weighted
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q_matview" ->
      """SELECT event_type, count(*) AS n_rows,
           CAST(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DECIMAL(38,6)) AS VARCHAR) AS sum_v,
           min(value) AS min_v, max(value) AS max_v,
           round(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
             / count(*), 4) AS avg_v
         FROM events GROUP BY event_type ORDER BY event_type""",
    // the KLL inclusive-rank convention, exactly: smallest value
    // whose inclusive rank >= q == the ceil(q*n)-th sorted value
    "q_matview_quantiles" ->
      """WITH t AS (SELECT event_type, value FROM events
           WHERE user_id % 500 = 0 AND value IS NOT NULL)
         SELECT event_type, count(*) AS n_rows,
           round(list_sort(list(value))[CAST(ceil(0.50*count(*)) AS INT)], 4) AS p50_v,
           round(list_sort(list(value))[CAST(ceil(0.95*count(*)) AS INT)], 4) AS p95_v
         FROM t GROUP BY event_type ORDER BY event_type""",
    // A16b: left-continuous inverse CDF under integral weights —
    // cum/tot window then min-past-threshold, identical both engines
    "q_weighted_quantile" ->
      """WITH b AS (SELECT event_type, round(value,2) AS v,
             user_id % 5 + 1 AS w, event_id FROM events),
         c AS (SELECT event_type, v, w,
             sum(w) OVER (PARTITION BY event_type ORDER BY v, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             sum(w) OVER (PARTITION BY event_type) AS tot FROM b)
         SELECT event_type,
           min(v) FILTER (WHERE cum >= 0.5 * tot) AS wq_50,
           min(v) FILTER (WHERE cum >= 0.9 * tot) AS wq_90
         FROM c GROUP BY event_type ORDER BY event_type""",
    // A12b: generate_subscripts aligns with unnest in DuckDB (pos is
    // 1-based there, 0-based in Spark — only the ORDER matters).
    // CAST(x AS DOUBLE) is load-bearing: DuckDB evaluates
    // float × decimal-literal in FLOAT, flooring a float-rounded
    // product one ulp away from Spark's double arithmetic.
    // The distinct-label left join matches Spark's empty/null-array
    // semantics: sumForEach keeps such groups with an empty array
    // (dims = ''), while a bare unnest would drop their label
    "q_sum_foreach" ->
      """WITH f AS (SELECT label, generate_subscripts(embedding, 1) AS pos,
             unnest(embedding) AS x FROM embeddings),
         g AS (SELECT label, pos,
             sum(CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS s
           FROM f GROUP BY label, pos),
         a AS (SELECT label,
             string_agg(CAST(s AS VARCHAR), ',' ORDER BY pos) AS dims
           FROM g GROUP BY label),
         l AS (SELECT DISTINCT label FROM embeddings)
         SELECT l.label, coalesce(a.dims, '') AS dims
         FROM l LEFT JOIN a USING (label) ORDER BY label""",
    // exact-regime theta set algebra == plain distinct-set arithmetic
    "q_theta_segments" ->
      """WITH e AS (SELECT user_id, event_type, value FROM events
           WHERE user_id % 7 = 0),
         a AS (SELECT DISTINCT user_id FROM e
           WHERE event_type = 'purchase' AND value >= 100),
         b AS (SELECT DISTINCT user_id FROM e
           WHERE event_type = 'error' AND value >= 100)
         SELECT (SELECT count(*) FROM a) AS n_buyers,
           (SELECT count(*) FROM b) AS n_errorers,
           (SELECT count(*) FROM a JOIN b USING(user_id)) AS n_both,
           (SELECT count(*) FROM a
             WHERE user_id NOT IN (SELECT user_id FROM b)) AS n_buyers_only""",
    // A41: exact bitmap algebra == plain distinct-set arithmetic (no
    // filter slice here, unlike theta: bitmaps are exact at ANY
    // cardinality, so the query runs the full events table)
    "q_bitmap_segments" ->
      """WITH a AS (SELECT DISTINCT user_id FROM events
           WHERE event_type = 'purchase' AND value >= 100),
         b AS (SELECT DISTINCT user_id FROM events
           WHERE event_type = 'error' AND value >= 100),
         tt AS (SELECT user_id, count(DISTINCT event_type) AS nt
           FROM events GROUP BY user_id),
         k AS (SELECT count(DISTINCT event_type) AS k FROM events)
         SELECT (SELECT count(*) FROM a) AS n_buyers,
           (SELECT count(*) FROM b) AS n_errorers,
           (SELECT count(*) FROM a JOIN b USING(user_id)) AS n_both,
           (SELECT count(*) FROM (SELECT user_id FROM a
              UNION SELECT user_id FROM b)) AS n_either,
           (SELECT count(*) FROM a
             WHERE user_id NOT IN (SELECT user_id FROM b)) AS n_buyers_only,
           (SELECT count(*) FROM a WHERE user_id NOT IN (SELECT user_id FROM b))
             + (SELECT count(*) FROM b WHERE user_id NOT IN (SELECT user_id FROM a))
             AS n_sym_diff,
           (SELECT min(user_id) FROM a) AS min_buyer,
           (SELECT max(user_id) FROM a) AS max_buyer,
           (SELECT count(*) FROM tt WHERE nt = (SELECT k FROM k)) AS n_all_types,
           (SELECT count(*) FROM tt WHERE nt % 2 = 1) AS n_odd_types""",
    "q_uniq_upto" ->
      """SELECT event_type,
           CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 86400 AS day,
           least(count(DISTINCT user_id), 51) AS n_users_upto
         FROM events GROUP BY 1, 2 ORDER BY event_type, day""",
    "q_topk_freq" ->
      """SELECT event_type, count(*) AS n FROM events
         GROUP BY event_type ORDER BY n DESC, event_type LIMIT 3""",
    "q_topk_weighted" ->
      """SELECT source, CAST(sum(n_chars) AS BIGINT) AS total_chars
         FROM documents
         GROUP BY source ORDER BY total_chars DESC, source LIMIT 3""",
    // A19: same gaps-and-islands sweep; aggregate outputs are
    // invariant under (s, e) tie order, so the window is total enough
    "q_interval_length_sum" ->
      """WITH iv AS (SELECT user_id % 25 AS grp,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS s,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT)
               + (event_id % 7 + 1) * 30 AS e
           FROM events),
         m AS (SELECT grp, s, e,
             max(e) OVER (PARTITION BY grp ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
           FROM iv),
         isl AS (SELECT grp, s, e,
             sum(CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END)
               OVER (PARTITION BY grp ORDER BY s, e
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
           FROM m),
         g AS (SELECT grp, island, count(*) AS n, max(e) - min(s) AS len
           FROM isl GROUP BY grp, island)
         SELECT grp, CAST(sum(n) AS BIGINT) AS n_intervals,
           count(*) AS n_islands, CAST(sum(len) AS BIGINT) AS union_len
         FROM g GROUP BY grp ORDER BY grp""",
    // A19b: (p, d) sweep — run-value SETS per tie block are
    // permutation-invariant, so max and first-max-position agree
    "q_max_intersections" ->
      """WITH iv AS (SELECT user_id % 25 AS grp,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS s,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT)
               + (event_id % 7 + 1) * 30 AS e
           FROM events),
         pts AS (SELECT grp, s AS p, 1 AS d FROM iv
           UNION ALL SELECT grp, e AS p, -1 AS d FROM iv),
         r AS (SELECT grp, p, d,
             sum(d) OVER (PARTITION BY grp ORDER BY p, d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
           FROM pts),
         mx AS (SELECT grp, max(run) AS mxv FROM r GROUP BY grp)
         SELECT r.grp, CAST(mx.mxv AS BIGINT) AS max_intersections,
           CAST(min(CASE WHEN r.run = mx.mxv THEN r.p END) AS BIGINT)
             AS position
         FROM r JOIN mx ON r.grp = mx.grp
         GROUP BY r.grp, mx.mxv ORDER BY r.grp""",
    // A20: identical count-only formula, log2 on exact integer counts,
    // round-9 DECIMAL term sums
    "q_entropy" ->
      """WITH c AS (SELECT event_type, user_id, count(*) AS c
           FROM events GROUP BY event_type, user_id),
         t AS (SELECT event_type,
             CAST(round(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE)), 9)
               AS DECIMAL(28,9)) AS term, c
           FROM c)
         SELECT event_type, CAST(sum(c) AS BIGINT) AS n_rows,
           count(*) AS n_categories,
           round(log2(CAST(sum(c) AS DOUBLE))
             - CAST(sum(term) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6)
             AS entropy
         FROM t GROUP BY event_type ORDER BY event_type""",
    // A20b: χ² via the observed-cells-only identity
    // Σ(o−e)²/e = Σ o²·n/(ra·cb) − n (empty cells contribute 0 to the
    // o²/e sum and Σe telescopes to n), round-9 DECIMAL term sums; NULL value = its own band, the
    // null guard pinned explicitly (least() skips nulls in BOTH
    // engines, which would silently fold nulls into band 4)
    "q_cramers_v" ->
      """WITH e AS (SELECT
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 86400 % 7
               AS dow,
             event_type,
             CAST(CASE WHEN value IS NOT NULL THEN
                 least(floor(CAST(value AS DOUBLE) / 200.0), 4.0) END
               AS BIGINT) AS band
           FROM events),
         cells AS (SELECT dow, event_type AS a, band AS b, count(*) AS o
           FROM e GROUP BY dow, event_type, band),
         m AS (SELECT dow, a, b, o,
             sum(o) OVER (PARTITION BY dow, a) AS ra,
             sum(o) OVER (PARTITION BY dow, b) AS cb,
             sum(o) OVER (PARTITION BY dow) AS n
           FROM cells),
         t AS (SELECT dow, a, b, o, n,
             CAST(round(
               CAST(o AS DOUBLE) * CAST(o AS DOUBLE) * CAST(n AS DOUBLE)
               / (CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE)),
               9) AS DECIMAL(28,9)) AS term
           FROM m)
         SELECT dow, CAST(n_rows AS BIGINT) AS n_rows,
           round(chi2, 6) AS chi2,
           CASE WHEN rc > 1 THEN
             round(sqrt(chi2 / CAST(n_rows AS DOUBLE)
               / CAST(rc - 1 AS DOUBLE)), 6)
           END AS cramers_v
         FROM (SELECT dow, max(n) AS n_rows,
             least(count(DISTINCT a)
                 + max(CASE WHEN a IS NULL THEN 1 ELSE 0 END),
               count(DISTINCT b)
                 + max(CASE WHEN b IS NULL THEN 1 ELSE 0 END)) AS rc,
             greatest(CAST(sum(term) AS DOUBLE) - CAST(max(n) AS DOUBLE),
               0.0) AS chi2
           FROM t GROUP BY dow)
         ORDER BY dow""",
    // A20c: same cell/margin machinery; marginal-entropy terms attach
    // to one representative row per margin group (order-free pick —
    // the term depends only on the margin sum); every tree mirrored
    // operand-for-operand
    "q_association" ->
      """WITH e AS (SELECT
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 86400 % 7
               AS dow,
             event_type,
             CAST(CASE WHEN value IS NOT NULL THEN
                 least(floor(CAST(value AS DOUBLE) / 200.0), 4.0) END
               AS BIGINT) AS band
           FROM events),
         cells AS (SELECT dow, event_type AS a, band AS b, count(*) AS o
           FROM e GROUP BY dow, event_type, band),
         m AS (SELECT dow, a, b, o,
             sum(o) OVER (PARTITION BY dow, a) AS ra,
             sum(o) OVER (PARTITION BY dow, b) AS cb,
             sum(o) OVER (PARTITION BY dow) AS n,
             row_number() OVER (PARTITION BY dow, a ORDER BY b) AS rna,
             row_number() OVER (PARTITION BY dow, b ORDER BY a) AS rnb
           FROM cells),
         t AS (SELECT dow, a, b, n,
             CAST(round(
               CAST(o AS DOUBLE) * CAST(o AS DOUBLE) * CAST(n AS DOUBLE)
               / (CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE)), 9)
               AS DECIMAL(28,9)) AS tchi,
             CAST(round(CAST(o AS DOUBLE) * log2(CAST(o AS DOUBLE)), 9)
               AS DECIMAL(28,9)) AS tab,
             CASE WHEN rna = 1 THEN
               CAST(round(CAST(ra AS DOUBLE) * log2(CAST(ra AS DOUBLE)), 9)
                 AS DECIMAL(28,9)) END AS ta,
             CASE WHEN rnb = 1 THEN
               CAST(round(CAST(cb AS DOUBLE) * log2(CAST(cb AS DOUBLE)), 9)
                 AS DECIMAL(28,9)) END AS tb
           FROM m),
         s AS (SELECT dow, max(n) AS n_rows,
             count(DISTINCT a)
               + max(CASE WHEN a IS NULL THEN 1 ELSE 0 END) AS r,
             count(DISTINCT b)
               + max(CASE WHEN b IS NULL THEN 1 ELSE 0 END) AS c,
             sum(tchi) AS schi, sum(tab) AS sab,
             sum(ta) AS sa, sum(tb) AS sb
           FROM t GROUP BY dow),
         f AS (SELECT dow, n_rows, r, c,
             CAST(n_rows AS DOUBLE) AS nd,
             CAST(r AS DOUBLE) AS rd, CAST(c AS DOUBLE) AS cd,
             greatest(CAST(schi AS DOUBLE) - CAST(n_rows AS DOUBLE), 0.0)
               AS chi2,
             log2(CAST(n_rows AS DOUBLE))
               - CAST(sa AS DOUBLE) / CAST(n_rows AS DOUBLE) AS ha,
             log2(CAST(n_rows AS DOUBLE))
               - CAST(sb AS DOUBLE) / CAST(n_rows AS DOUBLE) AS hb,
             log2(CAST(n_rows AS DOUBLE))
               - CAST(sab AS DOUBLE) / CAST(n_rows AS DOUBLE) AS hab
           FROM s),
         g AS (SELECT dow, n_rows, r, c, nd, rd, cd, chi2, ha, hb,
             greatest(ha + hb - hab, 0.0) AS mi,
             greatest(chi2 / nd - (rd - 1.0) * (cd - 1.0) / (nd - 1.0),
               0.0) AS phi2p,
             least(rd - (rd - 1.0) * (rd - 1.0) / (nd - 1.0),
               cd - (cd - 1.0) * (cd - 1.0) / (nd - 1.0)) - 1.0 AS bcden
           FROM f)
         SELECT dow, CAST(n_rows AS BIGINT) AS n_rows,
           round(chi2, 6) AS chi2,
           CASE WHEN least(r, c) > 1 THEN
             round(sqrt(chi2 / nd
               / (CAST(least(r, c) AS DOUBLE) - 1.0)), 6) END AS cramers_v,
           CASE WHEN n_rows > 1 AND bcden > 0.0 THEN
             round(sqrt(phi2p / bcden), 6) END AS cramers_v_bc,
           round(sqrt(chi2 / (chi2 + nd)), 6) AS contingency,
           CASE WHEN ha > 0.0 THEN round(least(mi / ha, 1.0), 6) END
             AS theils_u_ab,
           CASE WHEN hb > 0.0 THEN round(least(mi / hb, 1.0), 6) END
             AS theils_u_ba
         FROM g ORDER BY dow""",
    // A21: endpoint picks via directional row_number (the q_ohlc
    // tiebreak pattern); degenerate spans yield null
    "q_bounding_ratio" ->
      """WITH e AS (SELECT event_type,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS t,
             event_id, value FROM events),
         w AS (SELECT *,
             row_number() OVER (PARTITION BY event_type
               ORDER BY t, event_id) AS rn_a,
             row_number() OVER (PARTITION BY event_type
               ORDER BY t DESC, event_id DESC) AS rn_d
           FROM e)
         SELECT event_type,
           CAST(min(t) AS BIGINT) AS x_lo, CAST(max(t) AS BIGINT) AS x_hi,
           CASE WHEN max(t) > min(t) THEN
             round((max(CASE WHEN rn_d = 1 THEN CAST(value AS DOUBLE) END)
               - max(CASE WHEN rn_a = 1 THEN CAST(value AS DOUBLE) END))
               / CAST(max(t) - min(t) AS DOUBLE), 6)
           END AS bounding_ratio
         FROM w GROUP BY event_type ORDER BY event_type""",
    // A17b: HUGEINT power sums (exact, like Spark's DECIMAL(38,0));
    // hugeint→double and decimal→double both round-to-nearest the
    // same exact integer, so the moment tree sees identical inputs
    "q_moments" ->
      """WITH w AS (SELECT event_type,
             CAST(floor(CAST(value AS DOUBLE) * 100.0) AS HUGEINT) AS w
           FROM events WHERE value IS NOT NULL),
         s AS (SELECT event_type, count(*) AS n_rows,
             sum(w) AS s1, sum(w*w) AS s2, sum(w*w*w) AS s3,
             sum(w*w*w*w) AS s4
           FROM w GROUP BY event_type),
         m AS (SELECT event_type, n_rows,
             CAST(n_rows AS DOUBLE) AS n,
             CAST(s1 AS DOUBLE) / 100.0 AS d1,
             CAST(s2 AS DOUBLE) / 10000.0 AS d2,
             CAST(s3 AS DOUBLE) / 1000000.0 AS d3,
             CAST(s4 AS DOUBLE) / 100000000.0 AS d4
           FROM s),
         mm AS (SELECT event_type, n_rows, n, d1 / n AS mu,
             d2 / n - (d1/n) * (d1/n) AS m2,
             d3 / n - 3.0 * (d1/n) * d2 / n + 2.0 * (d1/n)*(d1/n)*(d1/n)
               AS m3,
             d4 / n - 4.0 * (d1/n) * d3 / n
               + 6.0 * (d1/n)*(d1/n) * d2 / n
               - 3.0 * (d1/n)*(d1/n)*(d1/n)*(d1/n) AS m4
           FROM m)
         SELECT event_type, n_rows, round(mu, 6) AS mean,
           CASE WHEN m2 > 1e-12
             THEN round(m3 / sqrt(m2*m2*m2), 6) END AS skew_pop,
           CASE WHEN m2 > 1e-12
             THEN round(m4 / (m2*m2), 6) END AS kurt_pop
         FROM mm ORDER BY event_type""",
    // A17c: same exact power-sum algebra, conditional per cohort
    "q_welch_ttest" ->
      ("""WITH w AS (SELECT event_type, user_id % 2 = 0 AS c,
             CAST(floor(CAST(value AS DOUBLE) * 100.0) AS HUGEINT) AS w
           FROM events WHERE value IS NOT NULL),
         s AS (SELECT event_type,
             count(*) FILTER (WHERE c) AS n1,
             count(*) FILTER (WHERE NOT c) AS n2,
             sum(w) FILTER (WHERE c) AS a1,
             sum(w*w) FILTER (WHERE c) AS b1,
             sum(w) FILTER (WHERE NOT c) AS a2,
             sum(w*w) FILTER (WHERE NOT c) AS b2
           FROM w GROUP BY event_type),
         m AS (SELECT event_type, n1, n2,
             CAST(a1 AS DOUBLE) / 100.0 / CAST(n1 AS DOUBLE) AS mu1,
             CAST(a2 AS DOUBLE) / 100.0 / CAST(n2 AS DOUBLE) AS mu2,
             (CAST(b1 AS DOUBLE) / 10000.0
               - CAST(n1 AS DOUBLE)
                 * (CAST(a1 AS DOUBLE)/100.0/CAST(n1 AS DOUBLE))
                 * (CAST(a1 AS DOUBLE)/100.0/CAST(n1 AS DOUBLE)))
               / (CAST(n1 AS DOUBLE) - 1.0) AS v1,
             (CAST(b2 AS DOUBLE) / 10000.0
               - CAST(n2 AS DOUBLE)
                 * (CAST(a2 AS DOUBLE)/100.0/CAST(n2 AS DOUBLE))
                 * (CAST(a2 AS DOUBLE)/100.0/CAST(n2 AS DOUBLE)))
               / (CAST(n2 AS DOUBLE) - 1.0) AS v2
           FROM s),
         t AS (SELECT event_type, n1, n2, mu1, mu2, v1, v2,
             v1 / CAST(n1 AS DOUBLE) + v2 / CAST(n2 AS DOUBLE) AS se2
           FROM m),
         fin AS (SELECT event_type, n1, n2,
           round(mu1, 6) AS mean1, round(mu2, 6) AS mean2,
           CASE WHEN n1 > 1 AND n2 > 1 AND se2 > 1e-12
             THEN round((mu1 - mu2) / sqrt(se2), 6) END AS t_stat,
           CASE WHEN n1 > 1 AND n2 > 1 AND se2 > 1e-12
             THEN round(se2 * se2 / (
               (v1 / CAST(n1 AS DOUBLE)) * (v1 / CAST(n1 AS DOUBLE))
                 / (CAST(n1 AS DOUBLE) - 1.0)
               + (v2 / CAST(n2 AS DOUBLE)) * (v2 / CAST(n2 AS DOUBLE))
                 / (CAST(n2 AS DOUBLE) - 1.0)), 6) END AS df
         FROM t)
         SELECT event_type, n1, n2, mean1, mean2, t_stat, df,
           """ + graft.functions.NormalDist.fUpperPSql(
        "(t_stat * t_stat)", "1", "df") +
      """ AS p_approx
         FROM fin ORDER BY event_type"""),
    // A35: the same lag pairing, exact HUGEINT difference sums
    "q_paired_ttest" ->
      ("""WITH e AS (SELECT event_type, user_id, event_id,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ep,
             CAST(value AS DOUBLE) AS v
           FROM events WHERE value IS NOT NULL),
         p AS (SELECT event_type, v,
             lag(v) OVER (PARTITION BY user_id
               ORDER BY ep, event_id) AS pv
           FROM e),
         d AS (SELECT event_type,
             CAST(floor(v * 100.0) AS HUGEINT)
               - CAST(floor(pv * 100.0) AS HUGEINT) AS wd
           FROM p WHERE pv IS NOT NULL),
         s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
             sum(wd) AS s1, sum(wd * wd) AS s2
           FROM d GROUP BY event_type),
         m AS (SELECT event_type, n_pairs,
             CAST(s1 AS DOUBLE) / 100.0 / CAST(n_pairs AS DOUBLE) AS mu,
             (CAST(s2 AS DOUBLE) / 10000.0
               - CAST(n_pairs AS DOUBLE)
                 * (CAST(s1 AS DOUBLE)/100.0/CAST(n_pairs AS DOUBLE))
                 * (CAST(s1 AS DOUBLE)/100.0/CAST(n_pairs AS DOUBLE)))
               / (CAST(n_pairs AS DOUBLE) - 1.0) AS vd
           FROM s),
         fin AS (SELECT event_type, n_pairs,
           CASE WHEN n_pairs > 0 THEN round(mu, 6) END AS mean_diff,
           CASE WHEN n_pairs > 1 AND vd > 1e-12 THEN
             round(mu / sqrt(vd / CAST(n_pairs AS DOUBLE)), 6)
           END AS t_stat,
           CASE WHEN n_pairs > 1 THEN CAST(n_pairs - 1 AS BIGINT)
             END AS df
         FROM m)
         SELECT event_type, n_pairs, mean_diff, t_stat, df,
           """ + graft.functions.NormalDist.fUpperPSql(
        "(t_stat * t_stat)", "1", "df") +
      """ AS p_approx
         FROM fin ORDER BY event_type"""),
    // A17d: same conditional power sums, pooled variance
    "q_student_ttest" ->
      ("""WITH w AS (SELECT event_type, user_id % 2 = 0 AS c,
             CAST(floor(CAST(value AS DOUBLE) * 100.0) AS HUGEINT) AS w
           FROM events WHERE value IS NOT NULL),
         s AS (SELECT event_type,
             count(*) FILTER (WHERE c) AS n1,
             count(*) FILTER (WHERE NOT c) AS n2,
             sum(w) FILTER (WHERE c) AS a1,
             sum(w*w) FILTER (WHERE c) AS b1,
             sum(w) FILTER (WHERE NOT c) AS a2,
             sum(w*w) FILTER (WHERE NOT c) AS b2
           FROM w GROUP BY event_type),
         m AS (SELECT event_type, n1, n2,
             CAST(a1 AS DOUBLE) / 100.0 / CAST(n1 AS DOUBLE) AS mu1,
             CAST(a2 AS DOUBLE) / 100.0 / CAST(n2 AS DOUBLE) AS mu2,
             (CAST(b1 AS DOUBLE) / 10000.0
               - CAST(n1 AS DOUBLE)
                 * (CAST(a1 AS DOUBLE)/100.0/CAST(n1 AS DOUBLE))
                 * (CAST(a1 AS DOUBLE)/100.0/CAST(n1 AS DOUBLE)))
               / (CAST(n1 AS DOUBLE) - 1.0) AS v1,
             (CAST(b2 AS DOUBLE) / 10000.0
               - CAST(n2 AS DOUBLE)
                 * (CAST(a2 AS DOUBLE)/100.0/CAST(n2 AS DOUBLE))
                 * (CAST(a2 AS DOUBLE)/100.0/CAST(n2 AS DOUBLE)))
               / (CAST(n2 AS DOUBLE) - 1.0) AS v2
           FROM s),
         t AS (SELECT event_type, n1, n2, mu1, mu2,
             ((CAST(n1 AS DOUBLE) - 1.0) * v1
               + (CAST(n2 AS DOUBLE) - 1.0) * v2)
               / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 2.0)
               * (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE))
               AS se2
           FROM m),
         fin AS (SELECT event_type, n1, n2,
           round(mu1, 6) AS mean1, round(mu2, 6) AS mean2,
           CASE WHEN n1 > 0 AND n2 > 0 AND n1 + n2 > 2 AND se2 > 1e-12
             THEN round((mu1 - mu2) / sqrt(se2), 6) END AS t_stat,
           CASE WHEN n1 + n2 > 2
             THEN CAST(n1 + n2 - 2 AS BIGINT) END AS df
         FROM t)
         SELECT event_type, n1, n2, mean1, mean2, t_stat, df,
           """ + graft.functions.NormalDist.fUpperPSql(
        "(t_stat * t_stat)", "1", "df") +
      """ AS p_approx
         FROM fin ORDER BY event_type"""),
    // A26: doubled average ranks (2·minrank + peers − 1, exact
    // integers) → Pearson over exact HUGEINT sums; one fixed double
    // tree mirrored operand-for-operand
    "q_rank_corr" ->
      """WITH e AS (SELECT event_type, value AS x, user_id AS y
           FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL),
         r AS (SELECT event_type,
             2 * rank() OVER (PARTITION BY event_type ORDER BY x)
               + count(*) OVER (PARTITION BY event_type, x) - 1 AS rx,
             2 * rank() OVER (PARTITION BY event_type ORDER BY y)
               + count(*) OVER (PARTITION BY event_type, y) - 1 AS ry
           FROM e),
         s AS (SELECT event_type, count(*) AS n_rows,
             sum(CAST(rx AS HUGEINT)) AS sx,
             sum(CAST(ry AS HUGEINT)) AS sy,
             sum(CAST(rx AS HUGEINT) * rx) AS sxx,
             sum(CAST(ry AS HUGEINT) * ry) AS syy,
             sum(CAST(rx AS HUGEINT) * ry) AS sxy
           FROM r GROUP BY event_type),
         v AS (SELECT event_type, n_rows,
             CAST(n_rows AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx,
             CAST(n_rows AS DOUBLE) * CAST(syy AS DOUBLE)
               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy,
             CAST(n_rows AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cv
           FROM s)
         SELECT event_type, CAST(n_rows AS BIGINT) AS n_rows,
           CASE WHEN vx > 0.0 AND vy > 0.0
             THEN round(cv / sqrt(vx) / sqrt(vy), 6) END AS rank_corr
         FROM v ORDER BY event_type""",
    // A26b: pooled-sample doubled ranks; tie term Σ(t³−t) folded as
    // the per-row Σ(t²−1)
    "q_mann_whitney" ->
      ("""WITH e AS (SELECT event_type, value AS v, user_id % 2 = 0 AS c
           FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL),
         r AS (SELECT event_type, c,
             2 * rank() OVER (PARTITION BY event_type ORDER BY v)
               + count(*) OVER (PARTITION BY event_type, v) - 1 AS r2,
             count(*) OVER (PARTITION BY event_type, v) AS t
           FROM e),
         s AS (SELECT event_type,
             count(*) FILTER (WHERE c) AS n1,
             count(*) FILTER (WHERE NOT c) AS n2,
             sum(CAST(r2 AS HUGEINT)) FILTER (WHERE c) AS r1x2,
             sum(CAST(t AS HUGEINT) * t - 1) AS ties
           FROM r GROUP BY event_type),
         u AS (SELECT event_type, n1, n2,
             CAST(n1 AS DOUBLE) AS n1d, CAST(n2 AS DOUBLE) AS n2d,
             CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) AS nd,
             (CAST(r1x2 AS DOUBLE)
               - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0)) / 2.0
               AS u1,
             CAST(ties AS DOUBLE) AS td
           FROM s),
         z AS (SELECT event_type, n1, n2, u1,
             n1d * n2d - u1 AS u2,
             n1d * n2d / 12.0
               * (nd + 1.0 - td / (nd * (nd - 1.0))) AS sigma2,
             n1d, n2d
           FROM u),
         fin AS (SELECT event_type, n1, n2,
           CASE WHEN n1 > 0 AND n2 > 0 THEN round(u1, 6) END AS u1,
           CASE WHEN n1 > 0 AND n2 > 0 THEN round(u2, 6) END AS u2,
           CASE WHEN n1 > 0 AND n2 > 0 AND sigma2 > 1e-12
             THEN round((u1 - n1d * n2d / 2.0) / sqrt(sigma2), 6)
           END AS z_stat
         FROM z)
         SELECT event_type, n1, n2, u1, u2, z_stat,
           """ + graft.functions.NormalDist.twoSidedPSql("z_stat") +
      """ AS p_value
         FROM fin ORDER BY event_type"""),
    // A36: pooled doubled ranks; Σ(2R_g)²/(4n_g) folded via ordered
    // list_reduce to mirror the Spark-side group-ordered aggregate
    "q_kruskal_wallis" ->
      ("""WITH e AS (SELECT event_type, value AS v,
             CAST(user_id % 3 AS VARCHAR) AS g
           FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL),
         r AS (SELECT event_type, g,
             2 * rank() OVER (PARTITION BY event_type ORDER BY v)
               + count(*) OVER (PARTITION BY event_type, v) - 1 AS r2,
             count(*) OVER (PARTITION BY event_type, v) AS t
           FROM e),
         ga AS (SELECT event_type, g, count(*) AS ng,
             sum(CAST(r2 AS HUGEINT)) AS rg
           FROM r GROUP BY event_type, g),
         ka AS (SELECT event_type, count(*) AS n_rows,
             sum(CAST(t AS HUGEINT) * t - 1) AS ties
           FROM r GROUP BY event_type),
         f AS (SELECT event_type, count(*) AS n_groups,
             list_reduce(
               list(CAST(rg AS DOUBLE) * CAST(rg AS DOUBLE)
                 / (4.0 * CAST(ng AS DOUBLE)) ORDER BY g),
               (a, b) -> a + b) AS hsum
           FROM ga GROUP BY event_type),
         h AS (SELECT f.event_type, ka.n_rows, f.n_groups,
             CAST(ka.n_rows AS DOUBLE) AS n, hsum,
             CAST(ka.ties AS DOUBLE) AS td
           FROM f JOIN ka USING (event_type)),
         fin AS (SELECT event_type, n_rows, n_groups,
           CASE WHEN n_groups >= 2 AND n_rows >= 2
             AND 1.0 - td / (n * n * n - n) > 1e-12
           THEN round(
             (12.0 / (n * (n + 1.0)) * hsum - 3.0 * (n + 1.0))
               / (1.0 - td / (n * n * n - n)), 6)
           END AS h_stat
         FROM h)
         SELECT event_type, n_rows, n_groups, h_stat,
           """ + graft.functions.NormalDist.chiSqUpperPSql(
        "h_stat", "(n_groups - 1)") +
      """ AS p_approx
         FROM fin ORDER BY event_type"""),
    // A39: within-block doubled ranks over complete blocks only,
    // treatment-ordered list_reduce fold, tie-corrected
    "q_friedman" ->
      ("""WITH daily AS (SELECT event_type,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 86400
               AS day,
             CAST(count(*) AS DOUBLE) AS cnt
           FROM events WHERE ts IS NOT NULL
           GROUP BY event_type, day),
         d AS (SELECT 'all' AS k, day AS b, event_type AS g, cnt AS v
           FROM daily),
         kt AS (SELECT k, count(DISTINCT g) AS kk FROM d GROUP BY k),
         bs AS (SELECT k, b, count(*) AS bsz FROM d GROUP BY k, b),
         c AS (SELECT d.k, d.b, d.g, d.v, kt.kk
           FROM d JOIN bs USING (k, b) JOIN kt USING (k)
           WHERE bs.bsz = kt.kk),
         r AS (SELECT k, b, g, kk,
             2 * rank() OVER (PARTITION BY k, b ORDER BY v)
               + count(*) OVER (PARTITION BY k, b, v) - 1 AS r2,
             count(*) OVER (PARTITION BY k, b, v) AS t
           FROM c),
         bt AS (SELECT k, g, sum(CAST(r2 AS HUGEINT)) AS rg
           FROM r GROUP BY k, g),
         bk AS (SELECT k, count(DISTINCT b) AS n_blocks,
             sum(CAST(t AS HUGEINT) * t - 1) AS ties, max(kk) AS kk
           FROM r GROUP BY k),
         f AS (SELECT k, count(*) AS n_treatments,
             list_reduce(
               list(CAST(rg AS DOUBLE) * CAST(rg AS DOUBLE) / 4.0
                 ORDER BY g),
               (a, b) -> a + b) AS qsum
           FROM bt GROUP BY k),
         z AS (SELECT f.k, bk.n_blocks, f.n_treatments, f.qsum,
             CAST(bk.n_blocks AS DOUBLE) AS n,
             CAST(bk.kk AS DOUBLE) AS kd,
             CAST(bk.ties AS DOUBLE) AS td, bk.kk
           FROM f JOIN bk USING (k)),
         fin AS (SELECT k, n_blocks, n_treatments, kk,
           CASE WHEN kk >= 2 AND n_blocks >= 1
             AND 1.0 - td / (n * kd * (kd * kd - 1.0)) > 1e-12
           THEN round(
             (12.0 / (n * kd * (kd + 1.0)) * qsum
               - 3.0 * n * (kd + 1.0))
               / (1.0 - td / (n * kd * (kd * kd - 1.0))), 6)
           END AS q_stat
         FROM z)
         SELECT k, n_blocks, n_treatments, q_stat,
           """ + graft.functions.NormalDist.chiSqUpperPSql(
        "q_stat", "(kk - 1)") +
      """ AS p_approx
         FROM fin ORDER BY k"""),
    // A38: reference-frozen equal-width bins, integer assignment,
    // add-one smoothing over the full grid, round-9 DECIMAL sum
    "q_psi" ->
      """WITH e AS (SELECT event_type,
             CAST(floor(CAST(value AS DOUBLE) * 100.0) AS BIGINT) AS w,
             user_id % 2 = 0 AS ref
           FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL),
         r AS (SELECT event_type, min(w) AS lo, max(w) AS hi
           FROM e WHERE ref GROUP BY event_type),
         b AS (SELECT e.event_type, ref,
             greatest(0, least(9, CAST(floor(
               CAST(w - lo AS DOUBLE) * 10
                 / CAST(hi - lo + 1 AS DOUBLE)) AS BIGINT))) AS bin
           FROM e JOIN r USING (event_type)),
         c AS (SELECT event_type, bin,
             count(*) FILTER (WHERE ref) AS cr,
             count(*) FILTER (WHERE NOT ref) AS cc
           FROM b GROUP BY event_type, bin),
         t AS (SELECT event_type,
             CAST(sum(cr) AS BIGINT) AS n_ref,
             CAST(sum(cc) AS BIGINT) AS n_cur
           FROM c GROUP BY event_type),
         g AS (SELECT t.event_type, t.n_ref, t.n_cur, gs.bin,
             coalesce(c.cr, 0) AS cr, coalesce(c.cc, 0) AS cc
           FROM t CROSS JOIN (SELECT unnest(range(0, 10)) AS bin) gs
           LEFT JOIN c ON c.event_type = t.event_type
             AND c.bin = gs.bin),
         terms AS (SELECT event_type, n_ref, n_cur,
             CAST(round(
               ((CAST(cc AS DOUBLE) + 1.0)
                   / (CAST(n_cur AS DOUBLE) + 10.0)
                 - (CAST(cr AS DOUBLE) + 1.0)
                   / (CAST(n_ref AS DOUBLE) + 10.0))
               * ln(((CAST(cc AS DOUBLE) + 1.0)
                   / (CAST(n_cur AS DOUBLE) + 10.0))
                 / ((CAST(cr AS DOUBLE) + 1.0)
                   / (CAST(n_ref AS DOUBLE) + 10.0))), 9)
               AS DECIMAL(28,9)) AS t9
           FROM g)
         SELECT event_type, n_ref, n_cur,
           CASE WHEN n_ref > 0 AND n_cur > 0
             THEN round(CAST(sum(t9) AS DOUBLE), 6) END AS psi
         FROM terms GROUP BY event_type, n_ref, n_cur
         ORDER BY event_type""",
    // A37: the q_moments power-sum tree extended to g1/g2 and
    // JB = n/6·(g1² + (g2−3)²/4)
    "q_jarque_bera" ->
      ("""WITH w AS (SELECT event_type,
             CAST(floor(CAST(value AS DOUBLE) * 100.0) AS HUGEINT) AS w
           FROM events WHERE value IS NOT NULL),
         s AS (SELECT event_type, count(*) AS n_rows,
             sum(w) AS s1, sum(w*w) AS s2, sum(w*w*w) AS s3,
             sum(w*w*w*w) AS s4
           FROM w GROUP BY event_type),
         m AS (SELECT event_type, n_rows,
             CAST(n_rows AS DOUBLE) AS n,
             CAST(s1 AS DOUBLE) / 100.0 AS d1,
             CAST(s2 AS DOUBLE) / 10000.0 AS d2,
             CAST(s3 AS DOUBLE) / 1000000.0 AS d3,
             CAST(s4 AS DOUBLE) / 100000000.0 AS d4
           FROM s),
         mm AS (SELECT event_type, n_rows, n,
             d2 / n - (d1/n) * (d1/n) AS m2,
             d3 / n - 3.0 * (d1/n) * d2 / n + 2.0 * (d1/n)*(d1/n)*(d1/n)
               AS m3,
             d4 / n - 4.0 * (d1/n) * d3 / n
               + 6.0 * (d1/n)*(d1/n) * d2 / n
               - 3.0 * (d1/n)*(d1/n)*(d1/n)*(d1/n) AS m4
           FROM m),
         g AS (SELECT event_type, n_rows, n, m2,
             m3 / sqrt(m2*m2*m2) AS g1,
             m4 / (m2*m2) AS g2
           FROM mm),
         fin AS (SELECT event_type, n_rows,
           CASE WHEN m2 > 1e-12 THEN round(g1, 6) END AS skew_pop,
           CASE WHEN m2 > 1e-12 THEN round(g2, 6) END AS kurt_pop,
           CASE WHEN m2 > 1e-12 THEN round(
             n / 6.0 * (g1 * g1 + (g2 - 3.0) * (g2 - 3.0) / 4.0), 6)
           END AS jb_stat
         FROM g)
         SELECT event_type, n_rows, skew_pop, kurt_pop, jb_stat,
           """ + graft.functions.NormalDist.chiSqUpperPSql(
        "jb_stat", "2") +
      """ AS p_approx
         FROM fin ORDER BY event_type"""),
    // A27: same cell collapse — p·(2·cb + t + 1) doubled rank sums
    "q_auc" ->
      """WITH e AS (SELECT event_type, value AS v, user_id % 2 = 0 AS c
           FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL),
         cells AS (SELECT event_type, v,
             count(*) FILTER (WHERE c) AS p,
             count(*) FILTER (WHERE NOT c) AS q
           FROM e GROUP BY event_type, v),
         m AS (SELECT event_type, p, q,
             coalesce(sum(p + q) OVER (PARTITION BY event_type ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
           FROM cells),
         s AS (SELECT event_type, sum(p) AS n1, sum(q) AS n2,
             sum(CAST(p AS HUGEINT) * (2 * cb + p + q + 1)) AS s2r
           FROM m GROUP BY event_type)
         SELECT event_type,
           CAST(n1 AS BIGINT) AS n_pos, CAST(n2 AS BIGINT) AS n_neg,
           CASE WHEN n1 > 0 AND n2 > 0 THEN
             round(((CAST(s2r AS DOUBLE)
                 - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0)) / 2.0)
               / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 6) END AS auc
         FROM s ORDER BY event_type""",
    // A27c: identical desc-ordered cell windows and round-9 terms
    "q_pr_auc" ->
      """WITH e AS (SELECT event_type, value AS v, user_id % 2 = 0 AS c
           FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL),
         cells AS (SELECT event_type, v,
             count(*) FILTER (WHERE c) AS p,
             count(*) FILTER (WHERE NOT c) AS q
           FROM e GROUP BY event_type, v),
         m AS (SELECT event_type, p,
             sum(p) OVER win AS ctp, sum(p + q) OVER win AS call,
             sum(p) OVER (PARTITION BY event_type) AS totp,
             sum(q) OVER (PARTITION BY event_type) AS totn
           FROM cells
           WINDOW win AS (PARTITION BY event_type ORDER BY v DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         t AS (SELECT event_type, totp, totn,
             CASE WHEN p > 0 THEN CAST(round(
               CAST(p AS DOUBLE) * CAST(ctp AS DOUBLE)
                 / (CAST(totp AS DOUBLE) * CAST(call AS DOUBLE)), 9)
               AS DECIMAL(28,9)) END AS tm
           FROM m),
         s AS (SELECT event_type, max(totp) AS n_pos, max(totn) AS n_neg,
             sum(tm) AS sm
           FROM t GROUP BY event_type)
         SELECT event_type,
           CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
           CASE WHEN n_pos > 0
             THEN round(CAST(sm AS DOUBLE), 6) END AS pr_auc
         FROM s ORDER BY event_type""",
    // A27d: identical desc cumulative windows over decile cells
    "q_roc_curve" ->
      """WITH e AS (SELECT event_type, floor(value / 10.0) AS v,
             user_id % 2 = 0 AS c
           FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL),
         cells AS (SELECT event_type, v,
             count(*) FILTER (WHERE c) AS p,
             count(*) FILTER (WHERE NOT c) AS q
           FROM e GROUP BY event_type, v),
         m AS (SELECT event_type, v,
             sum(p) OVER win AS n_tp, sum(q) OVER win AS n_fp,
             sum(p) OVER (PARTITION BY event_type) AS totp,
             sum(q) OVER (PARTITION BY event_type) AS totn
           FROM cells
           WINDOW win AS (PARTITION BY event_type ORDER BY v DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         SELECT event_type, CAST(v AS BIGINT) AS threshold,
           CAST(n_tp AS BIGINT) AS n_tp, CAST(n_fp AS BIGINT) AS n_fp,
           CASE WHEN totp > 0 THEN
             round(CAST(n_tp AS DOUBLE) / CAST(totp AS DOUBLE), 6)
             END AS tpr,
           CASE WHEN totn > 0 THEN
             round(CAST(n_fp AS DOUBLE) / CAST(totn AS DOUBLE), 6)
             END AS fpr
         FROM m ORDER BY event_type, threshold""",
    // W11: the LTTB sequential pick as a recursive CTE carrying the
    // anchor index (the q_funnel_gap DP / q_ema fold precedent).
    // Exactness contract: every bucket-centroid sum stays under 2^53
    // (inputs scaled in the registered query), so sum()/count() here
    // equals the engine's left-fold bit-for-bit with no
    // summation-order sensitivity; the per-bucket argmax is then
    // ORDER BY area DESC, idx ASC LIMIT 1 == the engine's strict->
    // earliest-tie rule
    "q_lttb" ->
      """WITH RECURSIVE pts AS (
           SELECT event_type, x, y,
             row_number() OVER (PARTITION BY event_type
               ORDER BY x, y) - 1 AS idx,
             count(*) OVER (PARTITION BY event_type) AS m
           FROM (SELECT event_type,
               CAST(epoch(date_trunc('second', ts)) AS DOUBLE) AS x,
               CAST(floor(value * 1000000) AS DOUBLE) AS y
             FROM events WHERE value IS NOT NULL)),
         big AS (SELECT DISTINCT event_type, m FROM pts WHERE m > 20),
         bkt AS (
           SELECT b.event_type, i.i,
             1 + (i.i * (b.m - 2)) // 18 AS lo,
             1 + ((i.i + 1) * (b.m - 2)) // 18 AS hi,
             CASE WHEN i.i = 17 THEN b.m
               ELSE 1 + ((i.i + 2) * (b.m - 2)) // 18 END AS nhi
           FROM big b, (SELECT unnest(range(18)) AS i) i),
         cent AS (
           SELECT k.event_type, k.i, k.lo, k.hi,
             sum(p.x) / count(*) AS cx, sum(p.y) / count(*) AS cy
           FROM bkt k JOIN pts p ON p.event_type = k.event_type
             AND p.idx >= k.hi AND p.idx < k.nhi
           GROUP BY k.event_type, k.i, k.lo, k.hi),
         sel AS (
           SELECT event_type, 0 AS step, 0 AS anchor FROM big
           UNION ALL
           SELECT s.event_type, s.step + 1,
             (SELECT p.idx
              FROM cent c, pts a, pts p
              WHERE c.event_type = s.event_type AND c.i = s.step
                AND a.event_type = s.event_type AND a.idx = s.anchor
                AND p.event_type = s.event_type
                AND p.idx >= c.lo AND p.idx < c.hi
              ORDER BY abs((a.x - c.cx) * (p.y - a.y)
                - (a.x - p.x) * (c.cy - a.y)) DESC, p.idx ASC
              LIMIT 1) AS anchor
           FROM sel s WHERE s.step < 18),
         picks AS (
           SELECT event_type, step AS pos, anchor AS idx FROM sel
           UNION ALL
           SELECT event_type, 19 AS pos, m - 1 AS idx FROM big
           UNION ALL
           SELECT event_type, idx AS pos, idx FROM pts WHERE m <= 20)
         SELECT q.event_type, p.x, p.y, CAST(q.pos AS BIGINT) AS pos
         FROM picks q JOIN pts p
           ON p.event_type = q.event_type AND p.idx = q.idx
         ORDER BY q.event_type, pos""",
    // A33: identical rank form; ties need no tiebreak (equal w values
    // contribute the same i·w in any order); HUGEINT mirror sums
    "q_gini" ->
      """WITH e AS (SELECT event_type,
             CAST(floor(CAST(value AS DOUBLE) * 100.0) AS HUGEINT) AS w
           FROM events
           WHERE value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))),
         f AS (SELECT event_type, w,
             CAST(row_number() OVER (PARTITION BY event_type
               ORDER BY w) AS HUGEINT) AS i
           FROM e WHERE w >= 0),
         a AS (SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_rows,
             sum(w) AS s, sum(i * w) AS si
           FROM f GROUP BY event_type)
         SELECT event_type, n_rows,
           CASE WHEN s > 0 THEN
             round((2.0 * CAST(si AS DOUBLE)
               - (CAST(n_rows AS DOUBLE) + 1.0) * CAST(s AS DOUBLE))
               / (CAST(n_rows AS DOUBLE) * CAST(s AS DOUBLE)), 6)
           END AS gini
         FROM a ORDER BY event_type""",
    // A34: the same pair grid via cross-joined ranges (j >= i), the
    // q_corr exact-sufficient-statistics tree per (label, i, j)
    "q_corr_matrix" ->
      """WITH p AS (SELECT label, ii.i AS i, jj.j AS j,
             CAST(floor(CAST(embedding[CAST(ii.i AS INT) + 1] AS DOUBLE)
               * 1000000.0) AS HUGEINT) AS x,
             CAST(floor(CAST(embedding[CAST(jj.j AS INT) + 1] AS DOUBLE)
               * 1000000.0) AS HUGEINT) AS y
           FROM embeddings
           CROSS JOIN (SELECT unnest(range(6)) AS i) ii
           CROSS JOIN (SELECT unnest(range(6)) AS j) jj
           WHERE jj.j >= ii.i AND embedding IS NOT NULL
             AND len(embedding) >= 6
             AND len(list_filter(embedding[1:6], e -> e IS NULL
               OR isnan(CAST(e AS DOUBLE)))) = 0),
         a AS (SELECT label, i, j, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
             CAST(sum(x * y) AS DOUBLE) AS sxy,
             CAST(sum(x * x) AS DOUBLE) AS sxx,
             CAST(sum(y * y) AS DOUBLE) AS syy
           FROM p GROUP BY label, i, j),
         c AS (SELECT label, i, j, n_rows,
             sxy - sx * sy / CAST(n_rows AS DOUBLE) AS cov_n,
             sxx - sx * sx / CAST(n_rows AS DOUBLE) AS vx,
             syy - sy * sy / CAST(n_rows AS DOUBLE) AS vy
           FROM a)
         SELECT label, i, j, n_rows,
           CASE WHEN vx > 0.0 AND vy > 0.0 THEN
             round(cov_n / sqrt(vx * vy), 6) END AS corr
         FROM c ORDER BY label, i, j""",
    // W4i: straight quantile_cont per (type, day); the mean rides
    // exact DECIMAL sums
    "q_quantile_over_time" ->
      """SELECT event_type,
           CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 86400
             AS day,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS avg_v,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.95), 6) AS p95
         FROM events WHERE value IS NOT NULL
         GROUP BY event_type, day ORDER BY event_type, day""",
    // A30b: row_number over the DESC rank picks the same tail set;
    // event_id is unique so the boundary has no ties to break
    "q_group_last" ->
      """SELECT event_type, rank, item FROM (
           SELECT event_type, event_id AS rank,
             CAST(CAST(floor(value * 100.0) AS BIGINT) AS VARCHAR) AS item,
             row_number() OVER (PARTITION BY event_type
               ORDER BY event_id DESC) AS rn
           FROM events WHERE value IS NOT NULL) t
         WHERE rn <= 5 ORDER BY event_type, rank, item""",
    // A32: identical integer bucket/level arithmetic; the grid cross
    // join renders empty buckets as spaces, string_agg ordered by
    // bucket reassembles the bar
    "q_sparkbar" ->
      """WITH e AS (SELECT event_type,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 86400
               AS x
           FROM events),
         r AS (SELECT event_type, min(x) AS lo, max(x) AS hi
           FROM e GROUP BY event_type),
         s AS (SELECT e.event_type,
             ((x - lo) * 20) // (hi - lo + 1) AS b,
             CAST(count(*) AS BIGINT) AS sm
           FROM e JOIN r USING (event_type)
           GROUP BY e.event_type, ((x - lo) * 20) // (hi - lo + 1)),
         m AS (SELECT event_type, max(sm) AS mx FROM s GROUP BY event_type),
         grid AS (SELECT r.event_type, r.lo, r.hi, gb.b
           FROM r CROSS JOIN (SELECT unnest(range(20)) AS b) gb),
         ch AS (SELECT g.event_type, g.lo, g.hi, g.b,
             CASE WHEN s.sm IS NULL OR s.sm <= 0 OR m.mx <= 0 THEN ' '
               ELSE substr('▁▂▃▄▅▆▇█',
                 CAST((s.sm * 8 + m.mx - 1) // m.mx AS INT), 1)
             END AS c
           FROM grid g
           LEFT JOIN s ON s.event_type = g.event_type AND s.b = g.b
           JOIN m ON m.event_type = g.event_type)
         SELECT event_type, max(lo) AS x_min, max(hi) AS x_max,
           string_agg(c, '' ORDER BY b) AS bar
         FROM ch GROUP BY event_type ORDER BY event_type""",
    // A30: the window row_number formulation of the same winner set
    "q_group_sorted" ->
      """SELECT event_type, rank, item FROM (
           SELECT event_type,
             CAST(floor(value * 100.0) AS BIGINT) AS rank,
             CAST(event_id AS VARCHAR) AS item,
             row_number() OVER (PARTITION BY event_type
               ORDER BY CAST(floor(value * 100.0) AS BIGINT),
                 CAST(event_id AS VARCHAR)) AS rn
           FROM events WHERE value IS NOT NULL) t
         WHERE rn <= 5 ORDER BY event_type, rank, item""",
    // A27e: identical cell counts and round-9 MSE terms
    "q_brier" ->
      """WITH e AS (SELECT event_type, (floor(value) % 100) / 100.0 AS v,
             user_id % 2 = 0 AS c
           FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL),
         cells AS (SELECT event_type, v,
             count(*) FILTER (WHERE c) AS p,
             count(*) FILTER (WHERE NOT c) AS q
           FROM e GROUP BY event_type, v),
         t AS (SELECT event_type, p + q AS nn,
             CAST(round(CAST(p AS DOUBLE) * (1.0 - v) * (1.0 - v)
               + CAST(q AS DOUBLE) * v * v, 9) AS DECIMAL(28,9)) AS tm
           FROM cells),
         s AS (SELECT event_type, sum(nn) AS n, sum(tm) AS sm
           FROM t GROUP BY event_type)
         SELECT event_type, CAST(n AS BIGINT) AS n_rows,
           CASE WHEN n > 0 THEN
             round(CAST(sm AS DOUBLE) / CAST(n AS DOUBLE), 6) END AS brier
         FROM s ORDER BY event_type""",
    // A27f: same bins, exact counts, round-9 score mass
    "q_calibration" ->
      """WITH e AS (SELECT event_type, (floor(value) % 100) / 100.0 AS v,
             user_id % 2 = 0 AS c
           FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL),
         cells AS (SELECT event_type, v,
             count(*) FILTER (WHERE c) AS p,
             count(*) FILTER (WHERE NOT c) AS q
           FROM e GROUP BY event_type, v),
         b AS (SELECT event_type,
             least(greatest(CAST(floor(v * 10) AS BIGINT), 0), 9) AS bin,
             p, q,
             CAST(round(v * CAST(p + q AS DOUBLE), 9) AS DECIMAL(28,9))
               AS m
           FROM cells),
         g AS (SELECT event_type, bin, sum(p + q) AS n, sum(p) AS np,
             sum(m) AS sm
           FROM b GROUP BY event_type, bin)
         SELECT event_type, bin, CAST(n AS BIGINT) AS n_rows,
           CAST(np AS BIGINT) AS n_pos,
           round(CAST(sm AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_score,
           round(CAST(np AS DOUBLE) / CAST(n AS DOUBLE), 6) AS pos_rate
         FROM g ORDER BY event_type, bin""",
    // A27g: the q_calibration bins folded with the same round-6 bin
    // columns, then round-9 weighted-gap terms
    "q_ece" ->
      """WITH e AS (SELECT event_type, (floor(value) % 100) / 100.0 AS v,
             user_id % 2 = 0 AS c
           FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL),
         cells AS (SELECT event_type, v,
             count(*) FILTER (WHERE c) AS p,
             count(*) FILTER (WHERE NOT c) AS q
           FROM e GROUP BY event_type, v),
         b AS (SELECT event_type,
             least(greatest(CAST(floor(v * 10) AS BIGINT), 0), 9) AS bin,
             p, q,
             CAST(round(v * CAST(p + q AS DOUBLE), 9) AS DECIMAL(28,9))
               AS m
           FROM cells),
         g AS (SELECT event_type, bin, sum(p + q) AS n, sum(p) AS np,
             sum(m) AS sm
           FROM b GROUP BY event_type, bin),
         r AS (SELECT event_type, n,
             round(CAST(sm AS DOUBLE) / CAST(n AS DOUBLE), 6)
               AS mean_score,
             round(CAST(np AS DOUBLE) / CAST(n AS DOUBLE), 6)
               AS pos_rate,
             sum(n) OVER (PARTITION BY event_type) AS tot
           FROM g),
         t AS (SELECT event_type, n, tot,
             CAST(round(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE)
               * abs(pos_rate - mean_score), 9) AS DECIMAL(28,9)) AS tm
           FROM r)
         SELECT event_type, CAST(sum(n) AS BIGINT) AS n_rows,
           round(CAST(sum(tm) AS DOUBLE), 6) AS ece
         FROM t GROUP BY event_type ORDER BY event_type""",
    // A27b: exact |cum1·n2 − cum2·n1| max at distinct-value cells
    "q_ks_test" ->
      ("""WITH e AS (SELECT event_type, value AS v, user_id % 2 = 0 AS c
           FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL),
         cells AS (SELECT event_type, v,
             count(*) FILTER (WHERE c) AS p,
             count(*) FILTER (WHERE NOT c) AS q
           FROM e GROUP BY event_type, v),
         m AS (SELECT event_type,
             sum(p) OVER win AS cp, sum(q) OVER win AS cq,
             sum(p) OVER (PARTITION BY event_type) AS n1,
             sum(q) OVER (PARTITION BY event_type) AS n2
           FROM cells
           WINDOW win AS (PARTITION BY event_type ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         s AS (SELECT event_type, max(n1) AS n1, max(n2) AS n2,
             max(abs(CAST(cp AS HUGEINT) * n2 - CAST(cq AS HUGEINT) * n1))
               AS dmax
           FROM m GROUP BY event_type),
         fin AS (SELECT event_type,
           CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           CASE WHEN n1 > 0 AND n2 > 0 THEN
             round(CAST(dmax AS DOUBLE)
               / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 6) END
             AS d_stat
         FROM s)
         SELECT event_type, n1, n2, d_stat,
           """ + graft.functions.NormalDist.ksPSql(
        "(sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) " +
          "/ (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))) * d_stat)") +
      """ AS p_approx
         FROM fin ORDER BY event_type"""),
    // A17e: the q_student_ttest cohort sums with the known-variance z
    "q_mean_ztest" ->
      ("""WITH w AS (SELECT event_type, user_id % 2 = 0 AS c,
             CAST(floor(CAST(value AS DOUBLE) * 100.0) AS HUGEINT) AS w
           FROM events WHERE value IS NOT NULL),
         s AS (SELECT event_type,
             count(*) FILTER (WHERE c) AS n1,
             count(*) FILTER (WHERE NOT c) AS n2,
             sum(w) FILTER (WHERE c) AS a1,
             sum(w) FILTER (WHERE NOT c) AS a2
           FROM w GROUP BY event_type),
         m AS (SELECT event_type, n1, n2,
             CAST(a1 AS DOUBLE) / 100.0 / CAST(n1 AS DOUBLE) AS mu1,
             CAST(a2 AS DOUBLE) / 100.0 / CAST(n2 AS DOUBLE) AS mu2,
             80000.0 / CAST(n1 AS DOUBLE)
               + 80000.0 / CAST(n2 AS DOUBLE) AS se2
           FROM s),
         fin AS (SELECT event_type, n1, n2,
           CASE WHEN n1 > 0 THEN round(mu1, 6) END AS mean1,
           CASE WHEN n2 > 0 THEN round(mu2, 6) END AS mean2,
           CASE WHEN n1 > 0 AND n2 > 0
             THEN round((mu1 - mu2) / sqrt(se2), 6) END AS z_stat
         FROM m)
         SELECT event_type, n1, n2, mean1, mean2, z_stat,
           """ + graft.functions.NormalDist.twoSidedPSql("z_stat") +
      """ AS p_value
         FROM fin ORDER BY event_type"""),
    // X12c: the identical min-5-by-md5-rank winner set, via the
    // window formulation DuckDB can express
    "q_sample_bounded" ->
      """SELECT event_type, rank, event_id FROM (
           SELECT event_type,
             md5(CAST(event_id AS VARCHAR)) AS rank,
             CAST(event_id AS VARCHAR) AS event_id,
             row_number() OVER (PARTITION BY event_type
               ORDER BY md5(CAST(event_id AS VARCHAR)),
                 CAST(event_id AS VARCHAR)) AS rn
           FROM events) t
         WHERE rn <= 5 ORDER BY event_type, rank""",
    // A2d: identical grid, cumulative windows, and interpolation tree
    "q_hist_quantile" ->
      """WITH e AS (SELECT event_type, CAST(value AS DOUBLE) AS v
           FROM events WHERE value IS NOT NULL),
         b(le) AS (VALUES (1.0),(5.0),(10.0),(50.0),(100.0),(200.0),
           (500.0),(CAST('infinity' AS DOUBLE))),
         a AS (SELECT event_type,
             CASE WHEN v <= 1.0 THEN 1.0 WHEN v <= 5.0 THEN 5.0
               WHEN v <= 10.0 THEN 10.0 WHEN v <= 50.0 THEN 50.0
               WHEN v <= 100.0 THEN 100.0 WHEN v <= 200.0 THEN 200.0
               WHEN v <= 500.0 THEN 500.0
               ELSE CAST('infinity' AS DOUBLE) END AS le
           FROM e),
         c AS (SELECT event_type, le, count(*) AS cnt FROM a
           GROUP BY 1, 2),
         g AS (SELECT t.event_type, b.le, coalesce(c.cnt, 0) AS cnt
           FROM (SELECT DISTINCT event_type FROM e) t
           CROSS JOIN b
           LEFT JOIN c ON c.event_type = t.event_type AND c.le = b.le),
         m AS (SELECT event_type, le, cnt,
             sum(cnt) OVER win AS cum,
             sum(cnt) OVER (PARTITION BY event_type) AS n,
             coalesce(lag(le) OVER win, 0.0) AS prevle
           FROM g
           WINDOW win AS (PARTITION BY event_type ORDER BY le)),
         s AS (SELECT event_type, n, le, prevle, cnt, cum,
             row_number() OVER (PARTITION BY event_type ORDER BY le)
               AS rn
           FROM m
           WHERE n > 0 AND CAST(cum AS DOUBLE)
             >= 0.95 * CAST(n AS DOUBLE))
         SELECT event_type, CAST(n AS BIGINT) AS n_obs,
           round(CASE WHEN isinf(le) THEN prevle
             ELSE prevle + (le - prevle)
               * (0.95 * CAST(n AS DOUBLE)
                 - CAST(cum - cnt AS DOUBLE))
               / CAST(cnt AS DOUBLE) END, 6) AS quantile
         FROM s WHERE rn = 1 ORDER BY event_type""",
    // A31: a type is in the intersection iff its distinct-week count
    // equals the user's active-week count
    "q_array_intersect" ->
      """WITH d AS (SELECT DISTINCT user_id,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 604800
               AS wk,
             event_type
           FROM events),
         nd AS (SELECT user_id, count(DISTINCT wk) AS n FROM d
           GROUP BY user_id),
         c AS (SELECT user_id, event_type AS item,
             count(DISTINCT wk) AS cd
           FROM d GROUP BY user_id, event_type)
         SELECT c.user_id, c.item
         FROM c JOIN nd USING (user_id) WHERE c.cd = nd.n
         ORDER BY user_id, item""",
    // A28: identical per-group power sums and round-9 term discipline
    "q_anova" ->
      ("""WITH e AS (SELECT event_type, user_id % 4 AS g,
             CAST(floor(value * 100.0) AS HUGEINT) AS w
           FROM events WHERE value IS NOT NULL),
         grp AS (SELECT event_type, g, count(*) AS ng,
             sum(w) AS s1, sum(w * w) AS s2
           FROM e GROUP BY event_type, g),
         t AS (SELECT event_type, ng, s1, s2,
             CAST(round(CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
               / CAST(ng AS DOUBLE), 9) AS DECIMAL(38,9)) AS tm
           FROM grp),
         a AS (SELECT event_type, sum(ng) AS n, count(*) AS k,
             sum(s1) AS sa, sum(s2) AS sb, sum(tm) AS p
           FROM t GROUP BY event_type),
         f AS (SELECT event_type, n, k,
             greatest(CAST(p AS DOUBLE)
               - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)
                 / CAST(n AS DOUBLE), 0.0) AS ssb,
             greatest(CAST(sb AS DOUBLE) - CAST(p AS DOUBLE), 0.0) AS ssw
           FROM a),
         fin AS (SELECT event_type, CAST(n AS BIGINT) AS n_rows,
           CAST(k AS BIGINT) AS n_groups,
           CASE WHEN k > 1 AND n > k AND ssw > 1e-9
             THEN round((ssb / (CAST(k AS DOUBLE) - 1.0))
               / (ssw / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))), 6)
             END AS f_stat,
           CASE WHEN k > 1 THEN CAST(k - 1 AS BIGINT) END AS df1,
           CASE WHEN n > k THEN CAST(n - k AS BIGINT) END AS df2
         FROM f)
         SELECT event_type, n_rows, n_groups, f_stat, df1, df2,
           """ + graft.functions.NormalDist.fUpperPSql(
        "f_stat", "df1", "df2") +
      """ AS p_approx
         FROM fin ORDER BY event_type"""),
    // A28b oracle: group medians on the quantized grid, doubled
    // absolute deviations, then the A28 ANOVA arms verbatim at
    // scale 0
    "q_brown_forsythe" ->
      ("""WITH e AS (SELECT event_type, user_id % 4 AS g,
             CAST(floor(value * 100.0) AS HUGEINT) AS w
           FROM events WHERE value IS NOT NULL),
         md AS (SELECT event_type, g,
             quantile_cont(w, 0.5) AS med
           FROM e GROUP BY event_type, g),
         z AS (SELECT e.event_type, e.g,
             abs(CAST(e.w AS DOUBLE) - md.med) * 2.0 AS z2
           FROM e JOIN md USING (event_type, g)),
         e2 AS (SELECT event_type, g,
             CAST(floor(z2 * 1.0) AS HUGEINT) AS w
           FROM z),
         grp AS (SELECT event_type, g, count(*) AS ng,
             sum(w) AS s1, sum(w * w) AS s2
           FROM e2 GROUP BY event_type, g),
         t AS (SELECT event_type, ng, s1, s2,
             CAST(round(CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
               / CAST(ng AS DOUBLE), 9) AS DECIMAL(38,9)) AS tm
           FROM grp),
         a AS (SELECT event_type, sum(ng) AS n, count(*) AS k,
             sum(s1) AS sa, sum(s2) AS sb, sum(tm) AS p
           FROM t GROUP BY event_type),
         f AS (SELECT event_type, n, k,
             greatest(CAST(p AS DOUBLE)
               - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)
                 / CAST(n AS DOUBLE), 0.0) AS ssb,
             greatest(CAST(sb AS DOUBLE) - CAST(p AS DOUBLE), 0.0) AS ssw
           FROM a),
         fin AS (SELECT event_type, CAST(n AS BIGINT) AS n_rows,
           CAST(k AS BIGINT) AS n_groups,
           CASE WHEN k > 1 AND n > k AND ssw > 1e-9
             THEN round((ssb / (CAST(k AS DOUBLE) - 1.0))
               / (ssw / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))), 6)
             END AS f_stat,
           CASE WHEN k > 1 THEN CAST(k - 1 AS BIGINT) END AS df1,
           CASE WHEN n > k THEN CAST(n - k AS BIGINT) END AS df2
         FROM f)
         SELECT event_type, n_rows, n_groups, f_stat, df1, df2,
           """ + graft.functions.NormalDist.fUpperPSql(
        "f_stat", "df1", "df2") +
      """ AS p_approx
         FROM fin ORDER BY event_type"""),
    // A29: same cell counts, keys-window totals, ln WOE trees; the
    // iv_total round-9 DECIMAL window sum mirrors Spark's
    "q_info_value" ->
      """WITH e AS (SELECT event_type,
             CASE WHEN value IS NOT NULL THEN
               CAST(least(floor(value / 200.0), 4.0) AS BIGINT)
               END AS category,
             user_id % 2 = 0 AS lbl
           FROM events WHERE user_id IS NOT NULL),
         cells AS (SELECT event_type, category,
             count(*) FILTER (WHERE lbl) AS n_pos,
             count(*) FILTER (WHERE NOT lbl) AS n_neg
           FROM e GROUP BY event_type, category),
         m AS (SELECT event_type, category, n_pos, n_neg,
             sum(n_pos) OVER (PARTITION BY event_type) AS pt,
             sum(n_neg) OVER (PARTITION BY event_type) AS nt
           FROM cells),
         w AS (SELECT event_type, category, n_pos, n_neg,
             n_pos > 0 AND n_neg > 0 AND pt > 0 AND nt > 0 AS defined,
             CAST(n_pos AS DOUBLE) / CAST(pt AS DOUBLE) AS rp,
             CAST(n_neg AS DOUBLE) / CAST(nt AS DOUBLE) AS rn
           FROM m)
         SELECT event_type, category,
           n_pos, n_neg,
           CASE WHEN defined THEN round(ln(rp / rn), 6) END AS woe,
           CASE WHEN defined
             THEN round((rp - rn) * ln(rp / rn), 6) END AS iv,
           round(CAST(sum(CASE WHEN defined THEN
               CAST(round((rp - rn) * ln(rp / rn), 9) AS DECIMAL(28,9))
               END) OVER (PARTITION BY event_type) AS DOUBLE), 6)
             AS iv_total
         FROM w ORDER BY event_type, category NULLS FIRST""",
    // A23: exact DECIMAL trailing-window sums / width; the window
    // frame is the same trailing-3 rows in both engines
    "q_moving_avg" ->
      """WITH e AS (SELECT user_id,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ep,
             event_id, CAST(value AS DECIMAL(18,2)) AS v
           FROM events WHERE value IS NOT NULL),
         m AS (SELECT user_id, ep, event_id,
             CAST(CAST(round(
               CAST(CAST(sum(v) OVER win AS DECIMAL(38,6)) AS DOUBLE)
               / CAST(least(row_number() OVER win, 3) AS DOUBLE), 6)
               AS DECIMAL(28,6)) AS VARCHAR) AS mv
           FROM e
           WINDOW win AS (PARTITION BY user_id ORDER BY ep, event_id, v
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))
         SELECT user_id,
           string_agg(CAST(mv AS VARCHAR), ',' ORDER BY ep, event_id, v)
             AS mv
         FROM m GROUP BY user_id ORDER BY user_id""",
    // A24: list_reduce folds in the same order over the same doubles
    // — the CASTs keep DuckDB's lambda in DOUBLE (bare 0.3 literals
    // are DECIMAL there and would truncate every step)
    "q_ema" ->
      """WITH e AS (SELECT user_id,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ep,
             event_id, CAST(value AS DOUBLE) AS v
           FROM events WHERE value IS NOT NULL)
         SELECT user_id,
           round(list_reduce(
             CAST(list(v ORDER BY ep, event_id) AS DOUBLE[]),
             (acc, x) -> CAST(0.3 AS DOUBLE) * x
               + CAST(0.7 AS DOUBLE) * acc), 6) AS ema
         FROM e GROUP BY user_id ORDER BY user_id""",
    // W14: the same coupled (l, b) recurrence folded in identical
    // order by a recursive CTE; α = β = 0.5 ⇒ exact power-of-two
    // scalings, bit-identical states
    "q_holt_linear" ->
      """WITH RECURSIVE e AS (SELECT user_id,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ep,
             event_id, CAST(value AS DOUBLE) AS v
           FROM events WHERE value IS NOT NULL),
         r AS (SELECT user_id, v,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ep, event_id) AS rn
           FROM e),
         cnt AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n
           FROM r GROUP BY user_id),
         f AS (
           SELECT a.user_id, CAST(1 AS BIGINT) AS rn,
             a.v AS l, b.v - a.v AS b
           FROM r a JOIN r b ON b.user_id = a.user_id
             AND a.rn = 1 AND b.rn = 2
           UNION ALL
           SELECT r.user_id, f.rn + 1,
             0.5 * r.v + 0.5 * (f.l + f.b),
             0.5 * ((0.5 * r.v + 0.5 * (f.l + f.b)) - f.l) + 0.5 * f.b
           FROM r JOIN f ON r.user_id = f.user_id AND r.rn = f.rn + 1),
         last AS (SELECT f.user_id, f.l, f.b
           FROM f JOIN cnt ON cnt.user_id = f.user_id AND f.rn = cnt.n)
         SELECT cnt.user_id, cnt.n AS n_samples,
           CASE WHEN cnt.n >= 2 THEN round(l.l, 6) END AS level,
           CASE WHEN cnt.n >= 2 THEN round(l.b, 6) END AS trend,
           CASE WHEN cnt.n >= 2 THEN round(l.l + 5.0 * l.b, 6)
             END AS forecast
         FROM cnt LEFT JOIN last l ON l.user_id = cnt.user_id
         ORDER BY cnt.user_id""",
    // W14b: the same coupled (l, b, s-queue) recurrence folded in
    // identical order by a recursive CTE carrying the seasonal array;
    // α = β = γ = 0.5 ⇒ exact power-of-two scalings, bit-identical;
    // the seed sums are list_reduce (fold from the first element),
    // mirrored exactly by the Spark side
    "q_holt_winters" ->
      """WITH RECURSIVE e AS (SELECT user_id,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ep,
             event_id, CAST(value AS DOUBLE) AS v
           FROM events WHERE value IS NOT NULL),
         r AS (SELECT user_id, v,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ep, event_id) AS rn
           FROM e),
         ls AS (SELECT user_id, list(v ORDER BY rn) AS vs,
             CAST(count(*) AS BIGINT) AS n
           FROM r GROUP BY user_id),
         ini AS (SELECT user_id, n,
             list_reduce(vs[1:7], (a, x) -> a + x) / 7.0 AS l0,
             (list_reduce(vs[8:14], (a, x) -> a + x) / 7.0
               - list_reduce(vs[1:7], (a, x) -> a + x) / 7.0) / 7.0 AS b0,
             list_transform(vs[1:7],
               x -> x - list_reduce(vs[1:7], (a, x2) -> a + x2) / 7.0) AS s0
           FROM ls),
         f AS (
           SELECT user_id, CAST(7 AS BIGINT) AS rn, l0 AS l, b0 AS b,
             CAST(s0 AS DOUBLE[]) AS s
           FROM ini
           UNION ALL
           SELECT r.user_id, f.rn + 1,
             0.5 * (r.v - f.s[1]) + 0.5 * (f.l + f.b),
             0.5 * ((0.5 * (r.v - f.s[1]) + 0.5 * (f.l + f.b)) - f.l)
               + 0.5 * f.b,
             list_append(f.s[2:],
               0.5 * (r.v - f.l - f.b) + 0.5 * f.s[1])
           FROM r JOIN f ON r.user_id = f.user_id AND r.rn = f.rn + 1),
         last AS (SELECT f.user_id, f.l, f.b, f.s
           FROM f JOIN ls ON ls.user_id = f.user_id AND f.rn = ls.n)
         SELECT ls.user_id, ls.n AS n_samples,
           CASE WHEN ls.n >= 14 THEN round(l.l, 6) END AS level,
           CASE WHEN ls.n >= 14 THEN round(l.b, 6) END AS trend,
           CASE WHEN ls.n >= 14 THEN round(l.s[1], 6) END AS season_next,
           CASE WHEN ls.n >= 14 THEN round(l.l + l.b + l.s[1], 6)
             END AS forecast
         FROM ls LEFT JOIN last l ON l.user_id = ls.user_id
         ORDER BY ls.user_id""",
    // A24b: the same linear recurrences, folded in identical order by
    // a recursive CTE; Δt/h integral → decay factors are exact powers
    // of two, each step exact IEEE scaling + add → bit-identical
    "q_time_decay" ->
      """WITH RECURSIVE e AS (SELECT user_id, event_id,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 3600 AS hr,
             CAST(value AS DOUBLE) AS x
           FROM events WHERE value IS NOT NULL),
         r AS (SELECT user_id, hr, x,
             row_number() OVER (PARTITION BY user_id
               ORDER BY hr, event_id) AS rn
           FROM e),
         f AS (
           SELECT user_id, rn, hr, x, x AS s, CAST(1.0 AS DOUBLE) AS c,
             x AS m
           FROM r WHERE rn = 1
           UNION ALL
           SELECT r.user_id, r.rn, r.hr, r.x,
             f.s * pow(2.0, CAST(f.hr - r.hr AS DOUBLE) / 1.0) + r.x,
             f.c * pow(2.0, CAST(f.hr - r.hr AS DOUBLE) / 1.0) + 1.0,
             greatest(f.m * pow(2.0, CAST(f.hr - r.hr AS DOUBLE) / 1.0),
               r.x)
           FROM r JOIN f ON r.user_id = f.user_id AND r.rn = f.rn + 1)
         SELECT user_id,
           string_agg(CAST(CAST(floor(s * 1000000.0) AS BIGINT)
             AS VARCHAR), ',' ORDER BY rn) AS decayed_sum,
           string_agg(CAST(CAST(floor(s / c * 1000000.0) AS BIGINT)
             AS VARCHAR), ',' ORDER BY rn) AS decayed_avg,
           string_agg(CAST(CAST(floor(m * 1000000.0) AS BIGINT)
             AS VARCHAR), ',' ORDER BY rn) AS decayed_max
         FROM f GROUP BY user_id ORDER BY user_id""",
    "q_bit_agg" ->
      """SELECT event_type,
           CAST(bit_and(user_id) AS BIGINT) AS b_and,
           CAST(bit_or(user_id) AS BIGINT) AS b_or,
           CAST(bit_xor(user_id) AS BIGINT) AS b_xor
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q_histogram_eq" ->
      """WITH s AS (SELECT event_type, value FROM events WHERE value IS NOT NULL),
         e AS (SELECT event_type,
             list_transform(quantile_cont(value, [0.0, 0.25, 0.5, 0.75, 1.0]),
               x -> floor(x * 10000.0 + 0.5) / 10000.0) AS edges
           FROM s GROUP BY event_type),
         a AS (SELECT s.event_type, s.value, e.edges,
             len(list_filter(e.edges[2:4], x -> s.value > x)) + 1 AS bin
           FROM s JOIN e USING (event_type))
         SELECT event_type, CAST(bin AS BIGINT) AS bin,
           edges[CAST(bin AS INT)] AS lo, edges[CAST(bin AS INT) + 1] AS hi,
           count(*) AS n_rows
         FROM a GROUP BY event_type, bin, lo, hi
         ORDER BY event_type, bin""",
    // A9: the portable form of PIVOT is conditional aggregation —
    // identical cells, engine-neutral column names
    "q_pivot" ->
      """SELECT day,
           CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS click,
           CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS error,
           CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
           CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
           CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS view
         FROM (SELECT CAST(epoch_ns(ts) // 1000000000 // 86400 AS BIGINT) AS day,
             event_type FROM events)
         GROUP BY day ORDER BY day""",
    // A10: UNPIVOT's portable form is a UNION ALL of one arm per measure
    "q_unpivot" ->
      """WITH b AS (SELECT l_orderkey, l_linenumber,
             CAST(l_quantity AS DOUBLE) AS quantity,
             CAST(l_extendedprice AS DOUBLE) AS extendedprice,
             CAST(l_discount AS DOUBLE) AS discount,
             CAST(l_tax AS DOUBLE) AS tax
           FROM lineitem)
         SELECT l_orderkey, l_linenumber, measure, val FROM (
           SELECT l_orderkey, l_linenumber, 'quantity' AS measure, quantity AS val FROM b
           UNION ALL
           SELECT l_orderkey, l_linenumber, 'extendedprice', extendedprice FROM b
           UNION ALL
           SELECT l_orderkey, l_linenumber, 'discount', discount FROM b
           UNION ALL
           SELECT l_orderkey, l_linenumber, 'tax', tax FROM b)
         ORDER BY l_orderkey, l_linenumber, measure""",
    // W9: open/close via directional row_number windows — the naive
    // formulation the one-aggregate Spark plan must reproduce; the
    // tiebreak (ts, event_id) matches the min_by/max_by struct order
    "q_ohlc" ->
      """WITH e AS (SELECT event_type,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS t,
             event_id, value FROM events),
         b AS (SELECT event_type, CAST((t - t % 3600) / 3600 AS BIGINT) AS bucket,
             t, event_id, value FROM e),
         w AS (SELECT *,
             row_number() OVER (PARTITION BY event_type, bucket
               ORDER BY t, event_id) AS rn_a,
             row_number() OVER (PARTITION BY event_type, bucket
               ORDER BY t DESC, event_id DESC) AS rn_d
           FROM b)
         SELECT event_type, bucket,
           round(max(CASE WHEN rn_a = 1 THEN value END), 2) AS open,
           round(max(value), 2) AS high,
           round(min(value), 2) AS low,
           round(max(CASE WHEN rn_d = 1 THEN value END), 2) AS close,
           count(*) AS n
         FROM w GROUP BY event_type, bucket
         ORDER BY event_type, bucket""",
    "q_resample_fill" ->
      """WITH e AS (SELECT event_type,
             CAST(epoch_ns(ts) // 1000000000 // 3600 AS BIGINT) AS bucket, value
           FROM events),
         c AS (SELECT event_type, bucket, count(*) AS cnt,
             round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
               / CAST(count(*) AS DOUBLE), 4) AS avg_value
           FROM e GROUP BY event_type, bucket),
         s AS (SELECT event_type, min(bucket) AS mn, max(bucket) AS mx
           FROM c GROUP BY event_type),
         g AS (SELECT event_type, unnest(generate_series(mn, mx)) AS bucket FROM s),
         j AS (SELECT g.event_type, g.bucket, coalesce(c.cnt, 0) AS cnt, c.avg_value
           FROM g LEFT JOIN c USING (event_type, bucket))
         SELECT event_type, bucket, CAST(cnt AS BIGINT) AS cnt,
           last_value(avg_value IGNORE NULLS) OVER (PARTITION BY event_type
             ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS avg_ffill
         FROM j ORDER BY event_type, bucket""",
    "q_resample_step" ->
      """WITH e AS (SELECT event_type,
             CAST(epoch_ns(ts) // 1000000000 // 600 AS BIGINT) AS bucket, value
           FROM events),
         c AS (SELECT event_type, bucket, count(*) AS cnt,
             round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
               / CAST(count(*) AS DOUBLE), 4) AS avg_value
           FROM e GROUP BY event_type, bucket),
         s AS (SELECT event_type, min(bucket) AS mn, max(bucket) AS mx
           FROM c GROUP BY event_type),
         g AS (SELECT event_type, unnest(generate_series(mn, mx, 6)) AS bucket FROM s
           UNION SELECT event_type, bucket FROM c),
         j AS (SELECT g.event_type, g.bucket, coalesce(c.cnt, 0) AS cnt, c.avg_value
           FROM g LEFT JOIN c USING (event_type, bucket)),
         k AS (SELECT event_type, bucket, cnt, avg_value,
             last_value(avg_value IGNORE NULLS) OVER wp AS avg_ffill,
             last_value(CASE WHEN avg_value IS NOT NULL THEN bucket END IGNORE NULLS)
               OVER wp AS pb,
             last_value(avg_value IGNORE NULLS) OVER wp AS pv,
             first_value(CASE WHEN avg_value IS NOT NULL THEN bucket END IGNORE NULLS)
               OVER wn AS nb,
             first_value(avg_value IGNORE NULLS) OVER wn AS nv
           FROM j
           WINDOW wp AS (PARTITION BY event_type ORDER BY bucket ROWS UNBOUNDED PRECEDING),
             wn AS (PARTITION BY event_type ORDER BY bucket
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         SELECT event_type, bucket, CAST(cnt AS BIGINT) AS cnt, avg_ffill,
           CASE WHEN nb IS NULL THEN pv
                WHEN nb = pb THEN pv
                ELSE floor((pv + (nv - pv) * CAST(bucket - pb AS DOUBLE)
                  / CAST(nb - pb AS DOUBLE)) * 10000.0 + 0.5) / 10000.0
           END AS avg_interp
         FROM k ORDER BY event_type, bucket""",
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4)))), 4) AS DOUBLE) AS sum_disc_price,
         CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4))) * (CAST(1 AS DECIMAL(5,4)) + CAST(l_tax AS DECIMAL(5,4)))), 4) AS DOUBLE) AS sum_charge,
         round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS avg_qty,
         round(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 4) AS avg_disc,
         COUNT(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q_agg_events" ->
      """SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS users,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
         round(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS avg_value,
         MAX(value) AS max_value, MIN(value) AS min_value
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q_distinct_daily" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         COUNT(DISTINCT user_id) AS users, COUNT(*) AS n
         FROM events GROUP BY 1 ORDER BY day""",
    "q_cumulative_users" ->
      """WITH f AS (SELECT user_id, event_type,
             min(strftime(date_trunc('day', ts), '%Y-%m-%d')) AS day
           FROM events GROUP BY user_id, event_type),
         p AS (SELECT event_type, day, COUNT(*) AS new_users
           FROM f GROUP BY event_type, day)
         SELECT event_type, day, new_users,
           CAST(SUM(new_users) OVER (PARTITION BY event_type ORDER BY day
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
         FROM p ORDER BY event_type, day""",
    "q_histogram" ->
      """SELECT CAST(floor(value / 50.0) AS BIGINT) AS bucket, COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1 ORDER BY bucket""",
    "q_rollup" ->
      """SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, COUNT(*) AS n
         FROM events GROUP BY ROLLUP(event_type, day)
         ORDER BY event_type NULLS FIRST, day NULLS FIRST""",
    "q_cube" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
         FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
         ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    // grouping_id bit order: both engines number bits left-to-right
    // over the grouping columns (flag=bit1, status=bit0)
    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
         CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus))
         ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "q_count_if" ->
      """SELECT user_id, COUNT(*) AS n,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
         round(SUM(CASE WHEN event_type = 'error' THEN 1.0 ELSE 0.0 END) / COUNT(*), 6) AS error_rate
         FROM events GROUP BY user_id ORDER BY user_id""",
    // A17: exact DECIMAL sufficient statistics → one fixed double
    // expression tree on both engines
    // A44 oracle: identical lifetime table, risk-set windows and
    // exp-of-log-sum product tree
    "q_survival" ->
      """WITH e AS (SELECT user_id,
           CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 86400 AS day
         FROM events),
         u AS (SELECT user_id, MIN(day) AS t0, MAX(day) AS t1
           FROM e GROUP BY user_id),
         mx AS (SELECT MAX(day) AS md FROM e),
         s AS (SELECT user_id % 3 AS cohort, t1 - t0 AS t,
             CASE WHEN t1 < md - 7 THEN 1 ELSE 0 END AS ev
           FROM u, mx),
         g AS (SELECT cohort, t, COUNT(*) AS n,
             CAST(SUM(ev) AS BIGINT) AS d
           FROM s GROUP BY cohort, t),
         r AS (SELECT *,
             CAST(SUM(n) OVER (PARTITION BY cohort) AS BIGINT)
               - CAST(COALESCE(SUM(n) OVER (PARTITION BY cohort ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS n_risk
           FROM g),
         k AS (SELECT *,
             CASE WHEN MAX(CASE WHEN d = n_risk THEN 1 ELSE 0 END)
                 OVER (PARTITION BY cohort ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
               THEN 0.0
               ELSE round(exp(SUM(CASE WHEN d > 0 AND d < n_risk
                 THEN ln(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE))
                 ELSE 0.0 END) OVER (PARTITION BY cohort ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
             END AS survival
           FROM r)
         SELECT cohort, t, n_risk, d, n - d AS censored, survival
         FROM k ORDER BY cohort, t""",
    // A44c oracle: identical grid, the running d/n and d/n² sums and
    // the exp(−H) tree
    "q_cum_hazard" ->
      """WITH e AS (SELECT user_id,
           CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 86400 AS day
         FROM events),
         u AS (SELECT user_id, MIN(day) AS t0, MAX(day) AS t1
           FROM e GROUP BY user_id),
         mx AS (SELECT MAX(day) AS md FROM e),
         s AS (SELECT user_id % 3 AS cohort, t1 - t0 AS t,
             CASE WHEN t1 < md - 7 THEN 1 ELSE 0 END AS ev
           FROM u, mx),
         g AS (SELECT cohort, t, COUNT(*) AS n,
             CAST(SUM(ev) AS BIGINT) AS d
           FROM s GROUP BY cohort, t),
         r AS (SELECT *,
             CAST(SUM(n) OVER (PARTITION BY cohort) AS BIGINT)
               - CAST(COALESCE(SUM(n) OVER (PARTITION BY cohort ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS n_risk
           FROM g),
         k AS (SELECT *,
             SUM(CASE WHEN d > 0
                 THEN CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)
                 ELSE 0.0 END) OVER (PARTITION BY cohort ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS h,
             SUM(CASE WHEN d > 0
                 THEN CAST(d AS DOUBLE) / (CAST(n_risk AS DOUBLE)
                   * CAST(n_risk AS DOUBLE))
                 ELSE 0.0 END) OVER (PARTITION BY cohort ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hv
           FROM r)
         SELECT cohort, t, n_risk, d, n - d AS censored,
           round(h, 6) AS cum_hazard,
           round(hv, 6) AS hazard_var,
           round(exp(-h), 6) AS survival_fh
         FROM k ORDER BY cohort, t""",
    // A44b oracle: identical grid + log tree, plus the Greenwood
    // running variance sum and the z = 1.959964 linear band over the
    // UNROUNDED survival — NULL once the curve hits zero
    "q_survival_ci" ->
      """WITH e AS (SELECT user_id,
           CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 86400 AS day
         FROM events),
         u AS (SELECT user_id, MIN(day) AS t0, MAX(day) AS t1
           FROM e GROUP BY user_id),
         mx AS (SELECT MAX(day) AS md FROM e),
         s AS (SELECT user_id % 3 AS cohort, t1 - t0 AS t,
             CASE WHEN t1 < md - 7 THEN 1 ELSE 0 END AS ev
           FROM u, mx),
         g AS (SELECT cohort, t, COUNT(*) AS n,
             CAST(SUM(ev) AS BIGINT) AS d
           FROM s GROUP BY cohort, t),
         r AS (SELECT *,
             CAST(SUM(n) OVER (PARTITION BY cohort) AS BIGINT)
               - CAST(COALESCE(SUM(n) OVER (PARTITION BY cohort ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS n_risk
           FROM g),
         k AS (SELECT *,
             MAX(CASE WHEN d = n_risk THEN 1 ELSE 0 END)
               OVER (PARTITION BY cohort ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dead,
             exp(SUM(CASE WHEN d > 0 AND d < n_risk
                 THEN ln(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE))
                 ELSE 0.0 END) OVER (PARTITION BY cohort ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS sraw,
             SUM(CASE WHEN d > 0 AND d < n_risk
                 THEN CAST(d AS DOUBLE) / (CAST(n_risk AS DOUBLE)
                   * CAST(n_risk - d AS DOUBLE))
                 ELSE 0.0 END) OVER (PARTITION BY cohort ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gvar
           FROM r),
         b AS (SELECT *, sraw * sqrt(gvar) AS seraw FROM k)
         SELECT cohort, t, n_risk, d, n - d AS censored,
           CASE WHEN dead = 1 THEN 0.0 ELSE round(sraw, 6) END AS survival,
           CASE WHEN dead = 1 THEN NULL ELSE round(seraw, 6) END AS se,
           CASE WHEN dead = 1 THEN NULL
             ELSE round(greatest(0.0, sraw - 1.959964 * seraw), 6) END AS ci_lo,
           CASE WHEN dead = 1 THEN NULL
             ELSE round(least(1.0, sraw + 1.959964 * seraw), 6) END AS ci_hi
         FROM b ORDER BY cohort, t""",
    // A45 oracle: identical risk windows (HUGEINT-cast), identical
    // 9-dp-quantized E/V terms, identical χ² + Wilson–Hilferty trees
    // A45b oracle: the q_logrank chain with n_t / n_t² weight factors
    // and the weighted integer observed sum
    "q_logrank_gehan" -> (
      """WITH e AS (SELECT user_id, event_type,
           CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 86400 AS day
         FROM events),
         u AS (SELECT event_type, user_id, MIN(day) AS t0, MAX(day) AS t1
           FROM e GROUP BY event_type, user_id),
         mx AS (SELECT MAX(day) AS md FROM e),
         s AS (SELECT event_type, t1 - t0 AS t,
             CASE WHEN t1 < md - 7 THEN 1 ELSE 0 END AS ev,
             CAST(user_id % 2 AS INT) AS g
           FROM u, mx),
         gr AS (SELECT event_type, t, COUNT(*) AS m,
             CAST(SUM(g) AS BIGINT) AS m1,
             CAST(SUM(ev) AS BIGINT) AS d,
             CAST(SUM(g * ev) AS BIGINT) AS d1
           FROM s GROUP BY event_type, t),
         r AS (SELECT *,
             CAST(SUM(m) OVER (PARTITION BY event_type) AS BIGINT) AS ntot,
             CAST(SUM(m1) OVER (PARTITION BY event_type) AS BIGINT) AS n1tot,
             CAST(COALESCE(SUM(m) OVER (PARTITION BY event_type ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS nb,
             CAST(COALESCE(SUM(m1) OVER (PARTITION BY event_type ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n1b
           FROM gr),
         r2 AS (SELECT *, ntot - nb AS n, n1tot - n1b AS n1 FROM r),
         terms AS (SELECT event_type, ntot, n1tot, n, d1,
             CAST(CASE WHEN d > 0 THEN
               round(CAST(n AS DOUBLE) * (CAST(d AS DOUBLE)
                 * (CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE))), 9)
               ELSE 0.0 END AS DECIMAL(30,9)) AS te,
             CAST(CASE WHEN d > 0 AND n > 1 THEN
               round(CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                 * (CAST(d AS DOUBLE) * (CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE))
                   * (1.0 - CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE))
                   * ((CAST(n AS DOUBLE) - CAST(d AS DOUBLE))
                     / (CAST(n AS DOUBLE) - 1.0))), 9)
               ELSE 0.0 END AS DECIMAL(30,9)) AS tv
           FROM r2),
         a AS (SELECT event_type, MAX(ntot) AS n_subjects,
             MAX(n1tot) AS n1_subjects,
             CAST(SUM(n * d1) AS BIGINT) AS o1,
             CAST(SUM(te) AS DOUBLE) AS e1r, CAST(SUM(tv) AS DOUBLE) AS v
           FROM terms GROUP BY event_type),
         c AS (SELECT *, CASE WHEN v > 1e-12 THEN
             round((CAST(o1 AS DOUBLE) - e1r) * (CAST(o1 AS DOUBLE) - e1r) / v, 6)
           END AS chi2 FROM a)
         SELECT event_type, n_subjects, n1_subjects, o1,
           round(e1r, 6) AS e1, chi2,
           """ + graft.functions.NormalDist.chiSqUpperPSql("chi2", "1") +
      """ AS p_approx
         FROM c ORDER BY event_type"""),

    "q_logrank" -> (
      """WITH e AS (SELECT user_id, event_type,
           CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 86400 AS day
         FROM events),
         u AS (SELECT event_type, user_id, MIN(day) AS t0, MAX(day) AS t1
           FROM e GROUP BY event_type, user_id),
         mx AS (SELECT MAX(day) AS md FROM e),
         s AS (SELECT event_type, t1 - t0 AS t,
             CASE WHEN t1 < md - 7 THEN 1 ELSE 0 END AS ev,
             CAST(user_id % 2 AS INT) AS g
           FROM u, mx),
         gr AS (SELECT event_type, t, COUNT(*) AS m,
             CAST(SUM(g) AS BIGINT) AS m1,
             CAST(SUM(ev) AS BIGINT) AS d,
             CAST(SUM(g * ev) AS BIGINT) AS d1
           FROM s GROUP BY event_type, t),
         r AS (SELECT *,
             CAST(SUM(m) OVER (PARTITION BY event_type) AS BIGINT) AS ntot,
             CAST(SUM(m1) OVER (PARTITION BY event_type) AS BIGINT) AS n1tot,
             CAST(COALESCE(SUM(m) OVER (PARTITION BY event_type ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS nb,
             CAST(COALESCE(SUM(m1) OVER (PARTITION BY event_type ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n1b
           FROM gr),
         r2 AS (SELECT *, ntot - nb AS n, n1tot - n1b AS n1 FROM r),
         terms AS (SELECT event_type, ntot, n1tot, d1,
             CAST(CASE WHEN d > 0 THEN
               round(CAST(d AS DOUBLE) * (CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE)), 9)
               ELSE 0.0 END AS DECIMAL(20,9)) AS te,
             CAST(CASE WHEN d > 0 AND n > 1 THEN
               round(CAST(d AS DOUBLE) * (CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE))
                 * (1.0 - CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE))
                 * ((CAST(n AS DOUBLE) - CAST(d AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)), 9)
               ELSE 0.0 END AS DECIMAL(20,9)) AS tv
           FROM r2),
         a AS (SELECT event_type, MAX(ntot) AS n_subjects,
             MAX(n1tot) AS n1_subjects, CAST(SUM(d1) AS BIGINT) AS o1,
             CAST(SUM(te) AS DOUBLE) AS e1r, CAST(SUM(tv) AS DOUBLE) AS v
           FROM terms GROUP BY event_type),
         c AS (SELECT *, CASE WHEN v > 1e-12 THEN
             round((CAST(o1 AS DOUBLE) - e1r) * (CAST(o1 AS DOUBLE) - e1r) / v, 6)
           END AS chi2 FROM a)
         SELECT event_type, n_subjects, n1_subjects, o1,
           round(e1r, 6) AS e1, chi2,
           """ + graft.functions.NormalDist.chiSqUpperPSql("chi2", "1") +
      """ AS p_approx
         FROM c ORDER BY event_type"""),
    // A43 oracle: identical round-6 fences, identical DECIMAL grids,
    // identical trees; product sums stay at full scale (no downscale
    // cast — DuckDB truncates where Spark rounds)
    "q_winsorize" ->
      """WITH e AS (SELECT event_type, CAST(value AS DOUBLE) AS v
           FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
         f AS (SELECT event_type,
             round(quantile_cont(v, 0.05), 6) AS plo,
             round(quantile_cont(v, 0.95), 6) AS phi
           FROM e GROUP BY event_type),
         j AS (SELECT e.event_type, e.v, f.plo, f.phi,
             (abs(f.plo) < 1e9 AND abs(f.phi) < 1e9) AS fok,
             CAST(CASE WHEN abs(f.plo) < 1e9 AND abs(f.phi) < 1e9
               THEN least(greatest(e.v, f.plo), f.phi) END
               AS DECIMAL(15,6)) AS c
           FROM e JOIN f USING (event_type)),
         a AS (SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CASE WHEN v < plo THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
             CAST(SUM(CASE WHEN v > phi THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
             bool_or(fok) AS fok,
             CAST(SUM(c) AS DOUBLE) AS s,
             CAST(SUM(c * c) AS DOUBLE) AS s2,
             CAST(SUM(CASE WHEN v >= plo AND v <= phi THEN c END) AS DOUBLE) AS ts,
             CAST(SUM(CASE WHEN v >= plo AND v <= phi THEN 1 ELSE 0 END) AS BIGINT) AS tn
           FROM j GROUP BY event_type)
         SELECT event_type, n, n_lo, n_hi,
           CASE WHEN fok
             THEN round(s / CAST(n AS DOUBLE), 6) END AS win_mean,
           CASE WHEN fok THEN round(sqrt(greatest(0.0,
             (s2 - s * s / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))), 6)
             END AS win_std,
           CASE WHEN fok AND tn > 0
             THEN round(ts / CAST(tn AS DOUBLE), 6) END AS trim_mean
         FROM a ORDER BY event_type""",
    // A42 oracle: the identical Cramer cofactor tree over the
    // identical DECIMAL-exact sums; betas/r2/rmse use the UNROUNDED
    // det ratios inside SSE exactly as the operator does
    "q_linfit" ->
      """WITH e AS (SELECT event_type,
           CAST(CAST(epoch(date_trunc('second', ts)) AS BIGINT) % 86400 // 3600
             AS DECIMAL(18,2)) AS x1,
           CAST(user_id % 50 AS DECIMAL(18,2)) AS x2,
           CAST(value AS DECIMAL(18,2)) AS y
         FROM events),
         a AS (SELECT event_type, COUNT(*) AS n,
             CAST(SUM(x1) AS DOUBLE) AS s1,
             CAST(SUM(x2) AS DOUBLE) AS s2,
             CAST(SUM(y)  AS DOUBLE) AS sy,
             CAST(SUM(CAST(x1 * x1 AS DECIMAL(38,6))) AS DOUBLE) AS s11,
             CAST(SUM(CAST(x1 * x2 AS DECIMAL(38,6))) AS DOUBLE) AS s12,
             CAST(SUM(CAST(x2 * x2 AS DECIMAL(38,6))) AS DOUBLE) AS s22,
             CAST(SUM(CAST(x1 * y  AS DECIMAL(38,6))) AS DOUBLE) AS s1y,
             CAST(SUM(CAST(x2 * y  AS DECIMAL(38,6))) AS DOUBLE) AS s2y,
             CAST(SUM(CAST(y * y   AS DECIMAL(38,6))) AS DOUBLE) AS syy
           FROM e GROUP BY event_type),
         c AS (SELECT *, CAST(n AS DOUBLE) AS nd,
             CAST(n AS DOUBLE) * (s11 * s22 - s12 * s12)
               - s1 * (s1 * s22 - s12 * s2)
               + s2 * (s1 * s12 - s11 * s2) AS det,
             sy * (s11 * s22 - s12 * s12)
               - s1 * (s1y * s22 - s12 * s2y)
               + s2 * (s1y * s12 - s11 * s2y) AS det0,
             CAST(n AS DOUBLE) * (s1y * s22 - s12 * s2y)
               - sy * (s1 * s22 - s12 * s2)
               + s2 * (s1 * s2y - s1y * s2) AS det1,
             CAST(n AS DOUBLE) * (s11 * s2y - s1y * s12)
               - s1 * (s1 * s2y - s1y * s2)
               + sy * (s1 * s12 - s11 * s2) AS det2
           FROM a),
         f AS (SELECT *,
             syy - ((det0 / det) * sy + (det1 / det) * s1y
               + (det2 / det) * s2y) AS sse,
             syy - sy * sy / nd AS tss
           FROM c)
         SELECT event_type, n,
           CASE WHEN abs(det) > 1e-6 THEN round(det0 / det, 6) END AS beta0,
           CASE WHEN abs(det) > 1e-6 THEN round(det1 / det, 6) END AS beta1,
           CASE WHEN abs(det) > 1e-6 THEN round(det2 / det, 6) END AS beta2,
           CASE WHEN abs(det) > 1e-6 AND tss > 1e-9
             THEN round(least(1.0, greatest(0.0, 1.0 - sse / tss)), 6) END AS r2,
           CASE WHEN abs(det) > 1e-6
             THEN round(sqrt(greatest(0.0, sse) / nd), 6) END AS rmse
         FROM f ORDER BY event_type""",
    // A42c oracle: the shifted-diagonal Cramer trees + the full
    // quadratic SSE, token-for-token the operator
    "q_ridge" ->
      """WITH e AS (SELECT event_type,
           CAST(CAST(epoch(date_trunc('second', ts)) AS BIGINT) % 86400 // 3600
             AS DECIMAL(18,2)) AS x1,
           CAST(user_id % 50 AS DECIMAL(18,2)) AS x2,
           CAST(value AS DECIMAL(18,2)) AS y
         FROM events),
         a AS (SELECT event_type, COUNT(*) AS n,
             CAST(SUM(x1) AS DOUBLE) AS s1,
             CAST(SUM(x2) AS DOUBLE) AS s2,
             CAST(SUM(y)  AS DOUBLE) AS sy,
             CAST(SUM(CAST(x1 * x1 AS DECIMAL(38,6))) AS DOUBLE) AS s11,
             CAST(SUM(CAST(x1 * x2 AS DECIMAL(38,6))) AS DOUBLE) AS s12,
             CAST(SUM(CAST(x2 * x2 AS DECIMAL(38,6))) AS DOUBLE) AS s22,
             CAST(SUM(CAST(x1 * y  AS DECIMAL(38,6))) AS DOUBLE) AS s1y,
             CAST(SUM(CAST(x2 * y  AS DECIMAL(38,6))) AS DOUBLE) AS s2y,
             CAST(SUM(CAST(y * y   AS DECIMAL(38,6))) AS DOUBLE) AS syy
           FROM e GROUP BY event_type),
         c AS (SELECT *, CAST(n AS DOUBLE) AS nd,
             s11 + 25.0 AS a11, s22 + 25.0 AS a22
           FROM a),
         cd AS (SELECT *,
             nd * (a11 * a22 - s12 * s12)
               - s1 * (s1 * a22 - s12 * s2)
               + s2 * (s1 * s12 - a11 * s2) AS det,
             sy * (a11 * a22 - s12 * s12)
               - s1 * (s1y * a22 - s12 * s2y)
               + s2 * (s1y * s12 - a11 * s2y) AS det0,
             nd * (s1y * a22 - s12 * s2y)
               - sy * (s1 * a22 - s12 * s2)
               + s2 * (s1 * s2y - s1y * s2) AS det1,
             nd * (a11 * s2y - s1y * s12)
               - s1 * (s1 * s2y - s1y * s2)
               + sy * (s1 * s12 - a11 * s2) AS det2
           FROM c),
         f AS (SELECT *,
             (det0 / det) * (det0 / det) * nd
               + (det1 / det) * (det1 / det) * s11
               + (det2 / det) * (det2 / det) * s22
               + 2.0 * (det0 / det) * (det1 / det) * s1
               + 2.0 * (det0 / det) * (det2 / det) * s2
               + 2.0 * (det1 / det) * (det2 / det) * s12
               - 2.0 * ((det0 / det) * sy + (det1 / det) * s1y
                 + (det2 / det) * s2y) + syy AS sse,
             syy - sy * sy / nd AS tss
           FROM cd)
         SELECT event_type, n,
           CASE WHEN abs(det) > 1e-6 THEN round(det0 / det, 6) END AS beta0,
           CASE WHEN abs(det) > 1e-6 THEN round(det1 / det, 6) END AS beta1,
           CASE WHEN abs(det) > 1e-6 THEN round(det2 / det, 6) END AS beta2,
           CASE WHEN abs(det) > 1e-6 AND tss > 1e-9
             THEN round(least(1.0, greatest(0.0, 1.0 - sse / tss)), 6) END AS r2,
           CASE WHEN abs(det) > 1e-6
             THEN round(sqrt(greatest(0.0, sse) / nd), 6) END AS rmse
         FROM f ORDER BY event_type""",
    "q_corr" ->
      """WITH e AS (SELECT event_type,
           CAST(value AS DECIMAL(18,2)) AS x,
           CAST((CAST(epoch(date_trunc('second', ts)) AS BIGINT) % 86400) // 3600
             AS DECIMAL(18,2)) AS y
         FROM events),
         a AS (SELECT event_type, COUNT(*) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx,
             CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x * y AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(x * x AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(y * y AS DECIMAL(38,6))) AS DOUBLE) AS syy
           FROM e GROUP BY event_type),
         c AS (SELECT *,
             sxy - sx * sy / CAST(n AS DOUBLE) AS cov_n,
             sxx - sx * sx / CAST(n AS DOUBLE) AS vx,
             syy - sy * sy / CAST(n AS DOUBLE) AS vy
           FROM a)
         SELECT event_type, n,
           CASE WHEN vx > 1e-9 AND vy > 1e-9
             THEN round(cov_n / sqrt(vx * vy), 6) END AS r,
           CASE WHEN vx > 1e-9 THEN round(cov_n / vx, 6) END AS slope,
           CASE WHEN vx > 1e-9
             THEN round(sy / CAST(n AS DOUBLE)
               - (cov_n / vx) * (sx / CAST(n AS DOUBLE)), 6) END AS intercept
         FROM c ORDER BY event_type""",
    "q_percentiles" ->
      """SELECT event_type, COUNT(*) AS n,
         round(quantile_cont(value, 0.25), 6) AS p25,
         round(quantile_cont(value, 0.5),  6) AS p50,
         round(quantile_cont(value, 0.9),  6) AS p90,
         round(quantile_cont(value, 0.99), 6) AS p99
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q_latest_by" ->
      """SELECT user_id, MAX(event_id) AS last_event_id,
         arg_max(event_type, event_id) AS last_type,
         round(arg_max(value, event_id), 2) AS last_value,
         COUNT(*) AS n
         FROM events GROUP BY user_id ORDER BY user_id""")

  /** A40 oracle: the six feed oracles verbatim as subqueries (their
    * p-values are independently gate-proven), then the BH step-up rule
    * as one rank window + one running min — the exact fdrAdjust tree.
    */
  val oracles: Map[String, String] = baseOracles +
    ("q_fdr_adjust" ->
      s"""WITH mz AS (SELECT 'meanz|' || event_type AS hyp, p_value
           FROM (${baseOracles("q_mean_ztest")})),
         mwu AS (SELECT 'mwu|' || event_type AS hyp, p_value
           FROM (${baseOracles("q_mann_whitney")})),
         mk AS (SELECT 'mk|' || event_type AS hyp, p_value
           FROM (${WindowQueries.oracles("q_mann_kendall")})),
         we AS (SELECT 'welch|' || event_type AS hyp,
             p_approx AS p_value
           FROM (${baseOracles("q_welch_ttest")})),
         kw AS (SELECT 'kw|' || event_type AS hyp,
             p_approx AS p_value
           FROM (${baseOracles("q_kruskal_wallis")})),
         jb AS (SELECT 'jb|' || event_type AS hyp,
             p_approx AS p_value
           FROM (${baseOracles("q_jarque_bera")})),
         panel AS (SELECT * FROM mz UNION ALL SELECT * FROM mwu
           UNION ALL SELECT * FROM mk UNION ALL SELECT * FROM we
           UNION ALL SELECT * FROM kw UNION ALL SELECT * FROM jb),
         fil AS (SELECT hyp AS tie, p_value FROM panel
           WHERE p_value IS NOT NULL),
         rk AS (SELECT tie, p_value,
             CAST(count(*) OVER () AS BIGINT) AS m,
             CAST(row_number() OVER (ORDER BY p_value ASC, tie ASC)
               AS BIGINT) AS bh_rank
           FROM fil),
         q AS (SELECT tie, p_value, bh_rank,
             round(least(1.0, min(p_value * CAST(m AS DOUBLE)
                 / CAST(bh_rank AS DOUBLE))
               OVER (ORDER BY p_value ASC, tie ASC
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)), 6)
               AS q_value
           FROM rk)
         SELECT tie, p_value, bh_rank, q_value FROM q ORDER BY bh_rank""") +
    // A40b: the q_mean_ztest tree generalized with the bucket key,
    // then the BH windows with Storey's λ = 0.5 π₀ plugin — the
    // UNROUNDED π̂₀ multiplies the tail-min exactly as fdrAdjust does
    // A40c oracle: the q_fdr_storey feed chain with the harmonic
    // c(m) factor — exact DECIMAL sum of 9-dp 1/j terms over a
    // generated series, q = min(1, cm·BH-tail-min)
    ("q_fdr_by" ->
      ("""WITH w AS (SELECT event_type, user_id % 7 AS bucket,
             user_id % 2 = 0 AS c,
             CAST(floor(CAST(value AS DOUBLE) * 100.0) AS HUGEINT) AS w
           FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL),
         s AS (SELECT event_type, bucket,
             count(*) FILTER (WHERE c) AS n1,
             count(*) FILTER (WHERE NOT c) AS n2,
             sum(w) FILTER (WHERE c) AS a1,
             sum(w) FILTER (WHERE NOT c) AS a2
           FROM w GROUP BY event_type, bucket),
         m0 AS (SELECT event_type, bucket, n1, n2,
             CAST(a1 AS DOUBLE) / 100.0 / CAST(n1 AS DOUBLE) AS mu1,
             CAST(a2 AS DOUBLE) / 100.0 / CAST(n2 AS DOUBLE) AS mu2,
             80000.0 / CAST(n1 AS DOUBLE)
               + 80000.0 / CAST(n2 AS DOUBLE) AS se2
           FROM s),
         fin AS (SELECT event_type, bucket,
           CASE WHEN n1 > 0 AND n2 > 0
             THEN round((mu1 - mu2) / sqrt(se2), 6) END AS z_stat
         FROM m0),
         pan AS (SELECT event_type || '|' || CAST(bucket AS VARCHAR) AS tie,
           """ + graft.functions.NormalDist.twoSidedPSql("z_stat") +
        """ AS p_value FROM fin),
         fil AS (SELECT tie, p_value FROM pan WHERE p_value IS NOT NULL),
         rk AS (SELECT tie, p_value,
             CAST(count(*) OVER () AS BIGINT) AS m,
             CAST(row_number() OVER (ORDER BY p_value ASC, tie ASC)
               AS BIGINT) AS bh_rank
           FROM fil),
         hm AS (SELECT CAST(SUM(CAST(round(1.0 / CAST(bh_rank AS DOUBLE), 9)
               AS DECIMAL(20,9))) AS DOUBLE) AS cmu
           FROM rk),
         q AS (SELECT tie, p_value, bh_rank,
             round(cmu, 6) AS cm,
             round(least(1.0, cmu *
               min(p_value * CAST(m AS DOUBLE) / CAST(bh_rank AS DOUBLE))
                 OVER (ORDER BY p_value ASC, tie ASC
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)), 6)
               AS q_value
           FROM rk CROSS JOIN hm)
         SELECT tie, p_value, bh_rank, cm, q_value FROM q
         ORDER BY bh_rank""")) +
    ("q_fdr_storey" ->
      ("""WITH w AS (SELECT event_type, user_id % 7 AS bucket,
             user_id % 2 = 0 AS c,
             CAST(floor(CAST(value AS DOUBLE) * 100.0) AS HUGEINT) AS w
           FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL),
         s AS (SELECT event_type, bucket,
             count(*) FILTER (WHERE c) AS n1,
             count(*) FILTER (WHERE NOT c) AS n2,
             sum(w) FILTER (WHERE c) AS a1,
             sum(w) FILTER (WHERE NOT c) AS a2
           FROM w GROUP BY event_type, bucket),
         m0 AS (SELECT event_type, bucket, n1, n2,
             CAST(a1 AS DOUBLE) / 100.0 / CAST(n1 AS DOUBLE) AS mu1,
             CAST(a2 AS DOUBLE) / 100.0 / CAST(n2 AS DOUBLE) AS mu2,
             80000.0 / CAST(n1 AS DOUBLE)
               + 80000.0 / CAST(n2 AS DOUBLE) AS se2
           FROM s),
         fin AS (SELECT event_type, bucket,
           CASE WHEN n1 > 0 AND n2 > 0
             THEN round((mu1 - mu2) / sqrt(se2), 6) END AS z_stat
         FROM m0),
         pan AS (SELECT event_type || '|' || CAST(bucket AS VARCHAR) AS tie,
           """ + graft.functions.NormalDist.twoSidedPSql("z_stat") +
        """ AS p_value FROM fin),
         fil AS (SELECT tie, p_value FROM pan WHERE p_value IS NOT NULL),
         rk AS (SELECT tie, p_value,
             CAST(count(*) OVER () AS BIGINT) AS m,
             CAST(row_number() OVER (ORDER BY p_value ASC, tie ASC)
               AS BIGINT) AS bh_rank
           FROM fil),
         pi AS (SELECT tie, p_value, m, bh_rank,
             least(1.0, greatest(1.0 / CAST(m AS DOUBLE),
               CAST(sum(CASE WHEN p_value > 0.5 THEN 1 ELSE 0 END)
                   OVER () AS DOUBLE)
                 / (CAST(m AS DOUBLE) * 0.5))) AS pi0u
           FROM rk),
         q AS (SELECT tie, p_value, bh_rank,
             round(pi0u, 6) AS pi0,
             round(least(1.0, pi0u *
               min(p_value * CAST(m AS DOUBLE) / CAST(bh_rank AS DOUBLE))
                 OVER (ORDER BY p_value ASC, tie ASC
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)), 6)
               AS q_value
           FROM pi)
         SELECT tie, p_value, bh_rank, pi0, q_value FROM q
         ORDER BY bh_rank"""))
}
