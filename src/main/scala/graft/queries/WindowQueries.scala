package graft.queries

import graft.Tables.table
import graft.operators.VersionedDedup
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function queries (SURVEY.md §2.5 W1-W5, §2.6 O1-O2).
  *
  * Ordering discipline: events.ts is only ordered AFTER truncation to
  * epoch seconds (cross-engine sub-second precision differs), so every
  * event-time window orders by (epoch_second, event_id) — a total,
  * engine-agnostic order.
  */
object WindowQueries {

  private def epochS = graft.Tables.epochSeconds(col("ts")).as("ep")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // W1 flagship — ReplacingMergeTree FINAL semantics over the event
    // stream viewed as a versioned upsert table (version = event_id,
    // delete marker = 'error'): the reference's app.users_cur query
    // contract (/root/reference/internal/ingestion/clickhouse.go:104-124).
    "q_current_state" -> ((s, d) => {
      VersionedDedup.currentState(
        table(s, d, "events"),
        keys = Seq("user_id"),
        version = col("event_id"),
        isDeleted = col("event_type") === "error")
        .select(col("user_id"), col("event_id").as("cur_version"),
          col("event_type").as("cur_type"), round(col("value"), 2).as("cur_value"),
          date_format(graft.Tables.tsSeconds(col("ts")), "yyyy-MM-dd HH:mm:ss").as("cur_ts"))
        .orderBy(col("user_id"))
    }),

    // W1e: batch MERGE INTO — even changes form the current-state
    // target, odd changes are the batch; the batch's latest row per
    // user wins (delete removes, upsert replaces/inserts), untouched
    // users carry over. The oracle mirrors the merge construction,
    // not a flat currentState over the union — the two differ
    // whenever a user's target version exceeds the batch's (MERGE
    // semantics: the batch is authoritative for matched keys)
    "q_merge_upsert" -> ((s, d) => {
      val ev = table(s, d, "events")
      val target = VersionedDedup.currentState(
        ev.where(col("event_id") % 2 === 0),
        keys = Seq("user_id"),
        version = col("event_id"),
        isDeleted = col("event_type") === "error")
      VersionedDedup.mergeInto(
        target, ev.where(col("event_id") % 2 === 1), Seq("user_id"),
        version = col("event_id"), isDelete = col("event_type") === "error")
        .select(col("user_id"), col("event_id").as("cur_version"),
          col("event_type").as("cur_type"),
          round(col("value"), 2).as("cur_value"))
        .orderBy(col("user_id"))
    }),

    // W1f: ClickHouse CollapsingMergeTree FINAL over the canonical
    // sign-writer stream derived from events: every state (non-error
    // event) is written +1 and cancelled by a -1 copy when its
    // successor arrives; a stream ending in 'error' is a delete — a
    // final cancel with no replacement. FINAL keeps each user's
    // latest uncancelled state; deleted users net to 0 and vanish
    "q_collapse_final" -> ((s, d) => {
      val ev = table(s, d, "events").select(col("user_id"), col("event_id"),
        col("event_type"), round(col("value"), 2).as("value"))
      val states = ev.where(col("event_type") =!= "error")
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      val packed = struct(col("event_id"), col("event_type"), col("value"))
      val plus = states.withColumn("sign", lit(1))
      val cancel = states
        .withColumn("__p", lag(packed, 1).over(w))
        .where(col("__p").isNotNull)
        .select(col("user_id"), col("__p.event_id").as("event_id"),
          col("__p.event_type").as("event_type"), col("__p.value").as("value"),
          lit(-1).as("sign"))
      val deleted = ev.groupBy(col("user_id"))
        .agg(max_by(col("event_type"), col("event_id")).as("__lt"))
        .where(col("__lt") === "error").select(col("user_id"))
      val del = states.groupBy(col("user_id"))
        .agg(max_by(packed, col("event_id")).as("__r"))
        .join(deleted, Seq("user_id"), "left_semi")
        .select(col("user_id"), col("__r.event_id").as("event_id"),
          col("__r.event_type").as("event_type"), col("__r.value").as("value"),
          lit(-1).as("sign"))
      graft.operators.Collapsing.collapseFinal(
        plus.unionByName(cancel).unionByName(del),
        keys = Seq("user_id"), sign = col("sign"), ordCols = Seq("event_id"))
        .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
        .orderBy(col("user_id"))
    }),

    // W1g: VersionedCollapsingMergeTree FINAL — same writer stream,
    // but the delete cancel is MIS-TARGETED at the user's FIRST
    // state (out-of-order delivery, the failure mode the versioned
    // engine exists for). Sign arithmetic alone would annihilate the
    // latest state; version matching annihilates only the (user,
    // version) pair it names, so the latest state survives — except
    // for single-state deleted users, whose one version nets to 0
    "q_collapse_versioned" -> ((s, d) => {
      val ev = table(s, d, "events").select(col("user_id"), col("event_id"),
        col("event_type"), round(col("value"), 2).as("value"))
      val states = ev.where(col("event_type") =!= "error")
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      val packed = struct(col("event_id"), col("event_type"), col("value"))
      val plus = states.withColumn("sign", lit(1))
      val cancel = states
        .withColumn("__p", lag(packed, 1).over(w))
        .where(col("__p").isNotNull)
        .select(col("user_id"), col("__p.event_id").as("event_id"),
          col("__p.event_type").as("event_type"), col("__p.value").as("value"),
          lit(-1).as("sign"))
      val deleted = ev.groupBy(col("user_id"))
        .agg(max_by(col("event_type"), col("event_id")).as("__lt"))
        .where(col("__lt") === "error").select(col("user_id"))
      val del = states.groupBy(col("user_id"))
        .agg(min_by(packed, col("event_id")).as("__r"))
        .join(deleted, Seq("user_id"), "left_semi")
        .select(col("user_id"), col("__r.event_id").as("event_id"),
          col("__r.event_type").as("event_type"), col("__r.value").as("value"),
          lit(-1).as("sign"))
      graft.operators.Collapsing.collapseVersionedFinal(
        plus.unionByName(cancel).unionByName(del),
        keys = Seq("user_id"), sign = col("sign"), versionCols = Seq("event_id"))
        .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
        .orderBy(col("user_id"))
    }),

    // Counter semantics (ClickHouse deltaSum + Prometheus rate): per
    // user, the event values read as a counter gauge sampled at event
    // times — sum positive deltas only (a drop is a counter reset),
    // count the resets, derive the mean per-second rate over the span
    "q_delta_sum" -> ((s, d) => {
      val ev = table(s, d, "events")
        .select(col("user_id"), col("event_id"),
          graft.Tables.epochSeconds(col("ts")).as("ep"), col("value"))
      graft.operators.TimeSeries.deltaSum(ev, Seq("user_id"),
        ord = Seq(col("ep"), col("event_id")), ts = col("ep"),
        value = col("value"))
        .select(col("user_id"), col("n_samples"), col("n_resets"),
          col("delta_sum").cast("string").as("delta_sum"),
          col("span_s"), col("rate_per_s"))
        .orderBy(col("user_id"))
    }),

    // W1c: SCD Type-2 history — the full validity-interval view of
    // the same versioned upsert stream q_current_state collapses:
    // every non-delete change becomes [valid_from, valid_to), a
    // delete closes its predecessor, null valid_to = current
    "q_scd2" -> ((s, d) => {
      VersionedDedup.scd2History(
        table(s, d, "events"),
        keys = Seq("user_id"),
        version = col("event_id"),
        effectiveTs = graft.Tables.epochSeconds(col("ts")),
        isDelete = col("event_type") === "error")
        .select(col("user_id"), col("event_id"), col("event_type"),
          round(col("value"), 2).as("value"),
          col("valid_from"), col("valid_to"), col("is_current"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // W1d: point-in-time slice — the table as the warehouse saw it
    // at 2024-01-15T00:00Z: one row per key whose interval covers
    // the instant; a pure range predicate over the W1c history
    "q_scd2_asof" -> ((s, d) => {
      val hist = VersionedDedup.scd2History(
        table(s, d, "events"),
        keys = Seq("user_id"),
        version = col("event_id"),
        effectiveTs = graft.Tables.epochSeconds(col("ts")),
        isDelete = col("event_type") === "error")
      VersionedDedup.asOf(hist, lit(1705276800L))
        .select(col("user_id"), col("event_id"), col("event_type"),
          round(col("value"), 2).as("value"),
          col("valid_from"), col("valid_to"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // W2/O2: per-group top-N (top 3 users per event type by count)
    "q_rank_topn" -> ((s, d) => {
      val counts = table(s, d, "events")
        .groupBy(col("event_type"), col("user_id")).agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("n").desc, col("user_id").asc)
      counts.withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .orderBy(col("event_type"), col("rn"))
    }),

    // W3: lag — inter-event gap per user in seconds
    "q_lag_gap" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ep"), col("event_id"))
      table(s, d, "events")
        .select(col("user_id"), col("event_id"), epochS)
        .withColumn("gap_s", col("ep") - lag(col("ep"), 1).over(w))
        .select(col("user_id"), col("event_id"), col("gap_s"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // W4: running sum per user (exact decimal accumulation)
    "q_running_sum" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      table(s, d, "events")
        .withColumn("run_value",
          sum(col("value").cast("decimal(18,2)")).over(w).cast("double"))
        .select(col("user_id"), col("event_id"), col("run_value"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // W4c: rolling z-score anomaly detection — daily event volume per
    // type vs its trailing-7-day baseline; the monitoring query an
    // observability plane (reference §3.3) runs over ingested counts.
    // Engine-portable numerics: the window aggregates are SUMS OF
    // LONGS (count, Σcnt, Σcnt²) — exact in any accumulation order —
    // and mean/variance/z are derived from those exact integers with
    // one fixed expression tree, so both engines produce the same
    // doubles bit-for-bit before the round(6)
    "q_anomaly" -> ((s, d) => {
      val daily = table(s, d, "events")
        .select(col("event_type"),
          floor(graft.Tables.epochSeconds(col("ts")) / lit(86400.0))
            .cast("long").as("day_id"))
        .groupBy(col("event_type"), col("day_id")).agg(count(lit(1)).as("cnt"))
      graft.operators.TimeSeries.rollingZScore(daily,
        keys = Seq("event_type"), ord = col("day_id"), value = col("cnt"),
        lookback = 7, minN = 3, threshold = 2.0)
        .select(col("event_type"), col("day_id"), col("cnt"),
          round(col("base_mean"), 6).as("base_mean"), col("z"), col("is_anomaly"))
        .orderBy(col("event_type"), col("day_id"))
    }),

    // W3b: first_value / last_value / nth_value — the session-frame
    // navigation family (whole-partition frame so last_value is the
    // true partition max position, not the running default)
    "q_first_last" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      table(s, d, "events")
        .select(col("user_id"), col("event_id"), col("event_type"))
        .withColumn("first_type", first(col("event_type")).over(w))
        .withColumn("last_type", last(col("event_type")).over(w))
        .withColumn("second_type", nth_value(col("event_type"), 2).over(w))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // W5: ntile + percent_rank + cume_dist over value within type —
    // the three distribution-position window functions on one sort
    "q_ntile" -> ((s, d) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value").asc, col("event_id").asc)
      table(s, d, "events")
        .select(col("event_id"), col("event_type"),
          ntile(4).over(w).cast("long").as("quartile"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"))
        .orderBy(col("event_id"))
    }),

    // W4b: time-based moving average — RANGE frame over epoch seconds
    // (rows in the trailing 1-hour window per user)
    "q_moving_avg" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ep"))
        .rangeBetween(-3600L, Window.currentRow)
      table(s, d, "events")
        .select(col("user_id"), col("event_id"), epochS, col("value"))
        // exact decimal window sum → double (exact: ≤15 digits) → one
        // correctly-rounded division; engines' avg() implementations
        // differ at the ulp, sum/count does not
        .withColumn("mavg",
          round(sum(col("value").cast("decimal(18,2)")).over(w).cast("double")
            / count(lit(1)).over(w), 4))
        .withColumn("nwin", count(lit(1)).over(w))
        .select(col("user_id"), col("event_id"), col("mavg"), col("nwin"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // A2b/A4b: exact continuous percentiles (approx_percentile and
    // approx_count_distinct are engine-specific sketches — tested in
    // AggApproxSpec against these exact values instead of an oracle)
    "q_quantiles" -> ((s, d) => {
      table(s, d, "events")
        .groupBy(col("event_type"))
        .agg(
          round(expr("percentile(value, 0.5)"), 4).as("p50"),
          round(expr("percentile(value, 0.95)"), 4).as("p95"),
          round(expr("percentile(value, 0.99)"), 4).as("p99"))
        .orderBy(col("event_type"))
    }),

    // O1: global top-k — Spark plans TakeOrderedAndProject (no full sort)
    "q_topk" -> ((s, d) => {
      table(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"), round(col("o_totalprice"), 2).as("price"))
        .orderBy(col("price").desc, col("o_orderkey").asc)
        .limit(10)
    }),

    // Batch sessionization: 30-minute-gap sessions per user —
    // lag + running sum of session-break flags (classic two-window form)
    "q_sessionize" -> ((s, d) => {
      val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ep"), col("event_id"))
      val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      table(s, d, "events")
        .select(col("user_id"), col("event_id"), epochS)
        .withColumn("brk",
          when(col("ep") - lag(col("ep"), 1).over(wOrd) > 1800L, 1L).otherwise(0L))
        .withColumn("session_id", sum(col("brk")).over(wRun))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ep")).as("t0"), max(col("ep")).as("t1"))
        .withColumn("duration_s", col("t1") - col("t0"))
        .select(col("user_id"), col("session_id"), col("n_events"), col("duration_s"))
        .orderBy(col("user_id"), col("session_id"))
    }),

    // W6: first-touch window funnel (ClickHouse windowFunnel family)
    // view → click → purchase within 24h of the user's first view;
    // output = users per completed level
    // W6h: sequenceNextNode (forward/first_match) — the event type
    // each user fires immediately after their first signup; one
    // whole-partition window + one aggregate on the same user hash
    "q_sequence_next" -> ((s, d) => {
      graft.operators.EventFunnels.sequenceNextNode(
        table(s, d, "events").select(col("user_id"),
          graft.Tables.epochSeconds(col("ts")).as("ep"),
          col("event_id"), col("event_type")),
        Seq("user_id"), ts = col("ep"), tie = col("event_id"),
        event = col("event_type"),
        matchCond = col("event_type") === "signup")
        .orderBy(col("user_id"))
    }),

    // W6i: what each user did right BEFORE their LAST purchase —
    // the backward/last_match arm of sequenceNextNode
    "q_sequence_prev" -> ((s, d) => {
      graft.operators.EventFunnels.sequencePrevNode(
        table(s, d, "events").select(col("user_id"),
          graft.Tables.epochSeconds(col("ts")).as("ep"),
          col("event_id"), col("event_type")),
        Seq("user_id"), ts = col("ep"), tie = col("event_id"),
        event = col("event_type"),
        matchCond = col("event_type") === "purchase")
        .orderBy(col("user_id"))
    }),

    "q_funnel" -> ((s, d) => {
      graft.operators.EventFunnels.windowFunnel(
        table(s, d, "events"), "user_id",
        ts = graft.Tables.epochSeconds(col("ts")), window = 86400L,
        steps = Seq(col("event_type") === "view",
          col("event_type") === "click",
          col("event_type") === "purchase"))
        .groupBy(col("level")).agg(count(lit(1)).as("n_users"))
        .orderBy(col("level"))
    }),

    // W8b: sequenceMatchEvents — the whole matched chain's per-step
    // event times (the earliest chain = the W6 stacked minima), one
    // user-keyed exchange, zero extra plan over the level read
    "q_sequence_events" -> ((s, d) => {
      graft.operators.EventFunnels.sequenceMatchEvents(
        table(s, d, "events"), "user_id",
        ts = graft.Tables.epochSeconds(col("ts")), window = 86400L,
        steps = Seq(col("event_type") === "view",
          col("event_type") === "click",
          col("event_type") === "purchase"))
        .orderBy(col("user_id"))
    }),

    // W6g: funnel conversion LAG — per converting user the anchor
    // time, the deepest-level time, and the latency between them;
    // the distribution a funnel dashboard quantiles (via A16) and
    // the axis the level histogram can't see. Same one-exchange
    // stacked-minima plan as q_funnel
    "q_funnel_time" -> ((s, d) => {
      graft.operators.EventFunnels.windowFunnelTimes(
        table(s, d, "events"), "user_id",
        ts = graft.Tables.epochSeconds(col("ts")), window = 86400L,
        steps = Seq(col("event_type") === "view",
          col("event_type") === "click",
          col("event_type") === "purchase"))
        .where(col("level") >= 2)
        .select(col("user_id"), col("level"), col("t_anchor"), col("t_conv"),
          (col("t_conv") - col("t_anchor")).as("lag_s"))
        .orderBy(col("user_id"))
    }),

    // W6b: strict funnel — same steps under strict_order (an
    // intervening tracked event kills the chain) + strict_increase
    // (same-timestamp ties don't chain)
    "q_funnel_strict" -> ((s, d) => {
      graft.operators.EventFunnels.windowFunnel(
        table(s, d, "events"), "user_id",
        ts = graft.Tables.epochSeconds(col("ts")), window = 86400L,
        steps = Seq(col("event_type") === "view",
          col("event_type") === "click",
          col("event_type") === "purchase"),
        strictIncrease = true, strictOrder = true)
        .groupBy(col("level")).agg(count(lit(1)).as("n_users"))
        .orderBy(col("level"))
    }),

    // W6c: gapped chain (ClickHouse sequenceMatch time conditions
    // `(?1)(?t<=3600)(?2)(?t<=3600)(?3)`) — each step within an hour
    // of the PREVIOUS step, not windowFunnel's single anchor window
    "q_funnel_gap" -> ((s, d) => {
      graft.operators.EventFunnels.gapFunnel(
        table(s, d, "events"), "user_id",
        ts = graft.Tables.epochSeconds(col("ts")),
        steps = Seq(col("event_type") === "view",
          col("event_type") === "click",
          col("event_type") === "purchase"),
        maxGaps = Seq(3600L, 3600L))
        .groupBy(col("level")).agg(count(lit(1)).as("n_users"))
        .orderBy(col("level"))
    }),

    // W6d: any-anchor funnel — ClickHouse windowFunnel's DEFAULT
    // semantics (every step-1 event is a candidate chain start),
    // beside W6's deterministic first-touch dashboard form
    "q_funnel_any" -> ((s, d) => {
      graft.operators.EventFunnels.windowFunnelAny(
        table(s, d, "events"), "user_id",
        ts = graft.Tables.epochSeconds(col("ts")), window = 86400L,
        steps = Seq(col("event_type") === "view",
          col("event_type") === "click",
          col("event_type") === "purchase"))
        .groupBy(col("level")).agg(count(lit(1)).as("n_users"))
        .orderBy(col("level"))
    }),

    // W6e: multi-tag funnel — OVERLAPPING step conditions (step 1 is
    // view-or-click, step 2 is click) under ClickHouse's
    // every-satisfied-condition tagging: one click event serves both
    // steps, where the first-match default would under-report
    "q_funnel_multi" -> ((s, d) => {
      graft.operators.EventFunnels.windowFunnel(
        table(s, d, "events"), "user_id",
        ts = graft.Tables.epochSeconds(col("ts")), window = 86400L,
        steps = Seq(col("event_type").isin("view", "click"),
          col("event_type") === "click",
          col("event_type") === "purchase"),
        strictIncrease = false, strictOrder = false, multiTag = true)
        .groupBy(col("level")).agg(count(lit(1)).as("n_users"))
        .orderBy(col("level"))
    }),

    // W6f: skew-guarded gapped funnel — the DP over each user's
    // EARLIEST 20 step-events only (deterministic truncation on
    // (t, step)); bounds the per-user collect_list state a
    // pathological hot user would otherwise balloon
    "q_funnel_capped" -> ((s, d) => {
      graft.operators.EventFunnels.gapFunnel(
        table(s, d, "events"), "user_id",
        ts = graft.Tables.epochSeconds(col("ts")),
        steps = Seq(col("event_type") === "view",
          col("event_type") === "click",
          col("event_type") === "purchase"),
        maxGaps = Seq(3600L, 3600L), maxEventsPerUser = 20)
        .groupBy(col("level")).agg(count(lit(1)).as("n_users"))
        .orderBy(col("level"))
    }),

    // W8: sequenceMatch (ClickHouse sequence family) — did the user
    // ever view → click → purchase, in time order, anything between?
    // Output = users per match flag (0/1)
    "q_sequence_match" -> ((s, d) => {
      graft.operators.EventFunnels.sequenceMatch(
        table(s, d, "events"), "user_id",
        ts = graft.Tables.epochSeconds(col("ts")), tieBreak = col("event_id"),
        conds = Seq(col("event_type") === "view",
          col("event_type") === "click",
          col("event_type") === "purchase"),
        pattern = "1.*2.*3")
        .groupBy(col("seq_match")).agg(count(lit(1)).as("n_users"))
        .orderBy(col("seq_match"))
    }),

    // W8b: sequenceCount — non-overlapping view→purchase conversions
    // per user (lazy quantifier: each match closes at the earliest
    // purchase, the maximal-count scan)
    "q_sequence_count" -> ((s, d) => {
      graft.operators.EventFunnels.sequenceCount(
        table(s, d, "events"), "user_id",
        ts = graft.Tables.epochSeconds(col("ts")), tieBreak = col("event_id"),
        conds = Seq(col("event_type") === "view",
          col("event_type") === "purchase"),
        pattern = "1.*?2")
        .orderBy(col("user_id"))
    }),

    // W7: cohort retention (ClickHouse retention family) — users
    // active on span-day 1 still active on day k, k = 1..7
    // W4f: nonNegativeDerivative — per-sample counter rate, drops
    // clamp to 0 (a reset, not a negative rate); null on first sample
    // or repeated timestamp
    "q_derivative" -> ((s, d) => {
      val ev = table(s, d, "events")
        .select(col("user_id"), col("event_id"),
          graft.Tables.epochSeconds(col("ts")).as("ep"), col("value"))
      graft.operators.TimeSeries.nonNegativeDerivative(ev, Seq("user_id"),
        ord = Seq(col("ep"), col("event_id")), ts = col("ep"),
        value = col("value"))
        .select(col("user_id"), col("event_id"), col("ep"),
          col("deriv_per_s"))
        .orderBy(col("user_id"), col("ep"), col("event_id"))
    }),

    // W4g: PromQL counter stats — irate/resets/changes per user
    // series in one lag window + one aggregate (the last row's deltas
    // arrive via max_by on the same sort, no reverse-order window)
    "q_counter_stats" -> ((s, d) => {
      val ev = table(s, d, "events")
        .where(col("value").isNotNull)
        .select(col("user_id"), col("event_id"),
          graft.Tables.epochSeconds(col("ts")).as("ep"), col("value"))
      graft.operators.TimeSeries.counterStats(ev, Seq("user_id"),
        ord = Seq(col("ep"), col("event_id")), ts = col("ep"),
        value = col("value"))
        .orderBy(col("user_id"))
    }),

    // W4h: predict_linear/deriv — per-type least-squares over the
    // (t, value) series, extrapolated 1h past the last sample; exact
    // DECIMAL power sums (globally re-based t), no window at all
    "q_predict_linear" -> ((s, d) => {
      val ev = table(s, d, "events")
        .select(col("event_type"),
          graft.Tables.epochSeconds(col("ts")).as("ep"), col("value"))
      graft.operators.TimeSeries.predictLinear(ev, Seq("event_type"),
        ts = col("ep"), value = col("value"), horizonSecs = 3600L)
        .orderBy(col("event_type"))
    }),

    // W12: classical additive seasonal decomposition — per type, the
    // daily event-count series split into trend (7-point centered MA)
    // + weekly seasonal indices (phase means of the exact detrended
    // numerators, re-centered) + residual; every emitted value rides
    // the exact fixed-point machinery so the whole table value-oracles
    "q_series_decompose" -> ((s, d) => {
      val day = floor(graft.Tables.epochSeconds(col("ts")) / 86400L)
        .cast("long").as("day")
      val daily = table(s, d, "events")
        .select(col("event_type"), day)
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).cast("double").as("cnt"))
      graft.operators.TimeSeries.seriesDecompose(
        daily, Seq("event_type"), ord = col("day"),
        value = col("cnt"), period = 7)
        .orderBy(col("event_type"), col("ord"))
    }),

    // W13: sample ACF over the daily event-count series, lags 0..10 —
    // exact integer centered terms (v·n − S), one double division per
    // lag, so the whole table value-oracles
    "q_autocorr" -> ((s, d) => {
      val day = floor(graft.Tables.epochSeconds(col("ts")) / 86400L)
        .cast("long").as("day")
      val daily = table(s, d, "events")
        .select(col("event_type"), day)
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).cast("double").as("cnt"))
      graft.operators.TimeSeries.autocorrelation(
        daily, Seq("event_type"), ord = col("day"),
        value = col("cnt"), maxLag = 10)
        .orderBy(col("event_type"), col("lag"))
    }),

    // W13b: the dominant-period pick off the same ACF — argmax over
    // lag >= 2, ties to the smallest lag
    "q_period_detect" -> ((s, d) => {
      val day = floor(graft.Tables.epochSeconds(col("ts")) / 86400L)
        .cast("long").as("day")
      val daily = table(s, d, "events")
        .select(col("event_type"), day)
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).cast("double").as("cnt"))
      graft.operators.TimeSeries.periodDetect(
        daily, Seq("event_type"), ord = col("day"),
        value = col("cnt"), maxLag = 10)
        .orderBy(col("event_type"))
    }),

    // W15: CUSUM changepoint over the daily event-count series —
    // argmax on the exact integer D_t = n·C_t − t·T, ties → earliest
    "q_cusum" -> ((s, d) => {
      val day = floor(graft.Tables.epochSeconds(col("ts")) / 86400L)
        .cast("long").as("day")
      val daily = table(s, d, "events")
        .select(col("event_type"), day)
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).cast("double").as("cnt"))
      graft.operators.TimeSeries.cusumChangepoint(
        daily, Seq("event_type"), ord = col("day"), value = col("cnt"))
        .orderBy(col("event_type"))
    }),

    // W18: Mann–Kendall trend test over the same daily grid — exact
    // integer pair signs and tie sums, the significance companion to
    // the Theil–Sen magnitude
    "q_mann_kendall" -> ((s, d) => {
      val day = floor(graft.Tables.epochSeconds(col("ts")) / 86400L)
        .cast("long").as("day")
      val daily = table(s, d, "events")
        .select(col("event_type"), day)
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).cast("double").as("cnt"))
      graft.operators.TimeSeries.mannKendall(
        daily, Seq("event_type"), ord = col("day"), value = col("cnt"))
        .orderBy(col("event_type"))
    }),

    // X27: Theil–Sen robust slope over the same daily grid —
    // grid-sized pairwise slopes, fixed-point-quantized exact median
    "q_theil_sen" -> ((s, d) => {
      val day = floor(graft.Tables.epochSeconds(col("ts")) / 86400L)
        .cast("long").as("day")
      val daily = table(s, d, "events")
        .select(col("event_type"), day)
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).cast("double").as("cnt"))
      graft.operators.TimeSeries.theilSen(
        daily, Seq("event_type"), ord = col("day"), value = col("cnt"))
        .orderBy(col("event_type"))
    }),

    // W16: MAD modified z-score per row — median/MAD on the exact
    // fixed-point grid, one fixed double tree for the score and flag
    "q_mad_zscore" -> ((s, d) => {
      graft.operators.TimeSeries.madZScore(
        table(s, d, "events")
          .select(col("event_type"), col("event_id"), col("value")),
        Seq("event_type"), tie = col("event_id"), value = col("value"))
        .orderBy(col("event_type"), col("tie"))
    }),

    // W17: one-step persistence forecast backtest over the daily
    // grid — MAE/RMSE exact-integer error sums, MASE scaled by the
    // in-sample weekly seasonal-naive
    "q_forecast_acc" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val day = floor(graft.Tables.epochSeconds(col("ts")) / 86400L)
        .cast("long").as("day")
      val daily = table(s, d, "events")
        .filter(col("ts").isNotNull)
        .select(col("event_type"), day)
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).cast("double").as("cnt"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val withF = daily.withColumn("fc", lag(col("cnt"), 1).over(w))
      graft.operators.TimeSeries.forecastAccuracy(
        withF, Seq("event_type"), ord = col("day"),
        actual = col("cnt"), forecast = col("fc"), period = 7)
        .orderBy(col("event_type"))
    }),

    // W4e: Tukey-fence outliers — rows outside [q1−1.5·IQR, q3+1.5·IQR]
    // of their type's value distribution; exact fixed-point quartile
    // grid makes the fence comparisons engine-exact
    "q_tukey" -> ((s, d) => {
      graft.operators.TimeSeries.tukeyOutliers(
        table(s, d, "events")
          .select(col("event_type"), col("event_id"), col("value")),
        Seq("event_type"), col("value"))
        .orderBy(col("event_type"), col("event_id"))
    }),

    // W10: first/last-touch attribution — every purchase credited to
    // its first and last click/view/signup touch within 24h, via the
    // keyed point-in-range bucket join + one min_by/max_by aggregate
    "q_attribution" -> ((s, d) => {
      val ev = table(s, d, "events")
        .withColumn("ep", graft.Tables.epochSeconds(col("ts")))
      graft.operators.EventFunnels.attribution(ev, "user_id",
        ts = col("ep"), tie = col("event_id"),
        eventType = col("event_type"), conversion = "purchase",
        sources = Seq("click", "signup", "view"), lookbackSecs = 86400L)
        .orderBy(col("user_id"), col("conv_ep"), col("conv_tie"))
    }),

    // W10b: multi-touch attribution — linear (1/n per touch) and
    // U-shaped (40/40/20 position-based) credit per source type;
    // every conversion distributes exactly 1.0
    "q_attribution_linear" -> ((s, d) => {
      val ev = table(s, d, "events")
        .withColumn("ep", graft.Tables.epochSeconds(col("ts")))
      graft.operators.EventFunnels.attributionWeighted(ev, "user_id",
        ts = col("ep"), tie = col("event_id"),
        eventType = col("event_type"), conversion = "purchase",
        sources = Seq("click", "signup", "view"), lookbackSecs = 86400L,
        model = "linear")
        .orderBy(col("source_type"))
    }),
    "q_attribution_ushaped" -> ((s, d) => {
      val ev = table(s, d, "events")
        .withColumn("ep", graft.Tables.epochSeconds(col("ts")))
      graft.operators.EventFunnels.attributionWeighted(ev, "user_id",
        ts = col("ep"), tie = col("event_id"),
        eventType = col("event_type"), conversion = "purchase",
        sources = Seq("click", "signup", "view"), lookbackSecs = 86400L,
        model = "u_shaped")
        .orderBy(col("source_type"))
    }),

    "q_retention" -> ((s, d) => {
      val ev = table(s, d, "events")
        .select(col("user_id"),
          to_date(graft.Tables.tsSeconds(col("ts"))).as("day"))
      // 1-row broadcast of the span's first day — no driver collect
      val d0 = ev.agg(min(col("day")).as("d0"))
      val idx = ev.crossJoin(broadcast(d0))
        .select(col("user_id"), (datediff(col("day"), col("d0")) + 1).as("dk"))
      val flags = graft.operators.EventFunnels.retention(
        idx, "user_id", (1 to 7).map(k => col("dk") === k))
      flags.select(col("user_id"),
        explode(array((1 to 7).map(k =>
          struct(lit(k.toLong).as("day_k"), col(s"r$k").as("flag"))): _*)).as("x"))
        .groupBy(col("x.day_k").as("day_k"))
        .agg(sum(col("x.flag")).as("n_retained"))
        .orderBy(col("day_k"))
    }))

  val oracles: Map[String, String] = Map(
    "q_current_state" ->
      """SELECT user_id, event_id AS cur_version, event_type AS cur_type,
         round(value, 2) AS cur_value,
         strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S') AS cur_ts
         FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
               FROM events)
         WHERE rn = 1 AND event_type <> 'error'
         ORDER BY user_id""",
    // W1e: the oracle mirrors the merge construction — target =
    // current state of the even changes, source latest per key wins
    // over it (delete removes, upsert replaces/inserts)
    "q_merge_upsert" ->
      """WITH tgt AS (SELECT user_id, event_id, event_type, value
           FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
                 FROM events WHERE event_id % 2 = 0)
           WHERE rn = 1 AND event_type <> 'error'),
         src AS (SELECT user_id, event_id, event_type, value
           FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
                 FROM events WHERE event_id % 2 = 1)
           WHERE rn = 1),
         merged AS (
           SELECT * FROM tgt WHERE user_id NOT IN (SELECT user_id FROM src)
           UNION ALL
           SELECT * FROM src WHERE event_type <> 'error')
         SELECT user_id, event_id AS cur_version, event_type AS cur_type,
           round(value, 2) AS cur_value
         FROM merged ORDER BY user_id""",
    // W1f: the oracle mirrors the sign-writer construction, then
    // applies the CollapsingMergeTree FINAL rule directly: net sign
    // per user decides survival, the latest +1 row is the survivor
    "q_collapse_final" ->
      """WITH ev AS (SELECT user_id, event_id, event_type, round(value,2) AS value FROM events),
         states AS (SELECT * FROM ev WHERE event_type <> 'error'),
         plus AS (SELECT user_id, event_id, event_type, value, 1 AS sign FROM states),
         prevs AS (SELECT user_id, lag(event_id) OVER w AS event_id,
                          lag(event_type) OVER w AS event_type, lag(value) OVER w AS value
                   FROM states WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
         cancel AS (SELECT user_id, event_id, event_type, value, -1 AS sign
                    FROM prevs WHERE event_id IS NOT NULL),
         last_ev AS (SELECT user_id, arg_max(event_type, event_id) AS lt FROM ev GROUP BY user_id),
         latest_state AS (SELECT user_id, arg_max(event_id, event_id) AS event_id,
                                 arg_max(event_type, event_id) AS event_type,
                                 arg_max(value, event_id) AS value
                          FROM states GROUP BY user_id),
         del AS (SELECT ls.user_id, ls.event_id, ls.event_type, ls.value, -1 AS sign
                 FROM latest_state ls JOIN last_ev le ON ls.user_id = le.user_id
                 WHERE le.lt = 'error'),
         feed AS (SELECT * FROM plus UNION ALL SELECT * FROM cancel UNION ALL SELECT * FROM del),
         fin AS (SELECT user_id, sum(sign) AS net,
                        arg_max(event_id, event_id) FILTER (WHERE sign = 1) AS event_id,
                        arg_max(event_type, event_id) FILTER (WHERE sign = 1) AS event_type,
                        arg_max(value, event_id) FILTER (WHERE sign = 1) AS value
                 FROM feed GROUP BY user_id)
         SELECT user_id, event_id, event_type, value FROM fin WHERE net > 0
         ORDER BY user_id""",
    // W1g: per-(user, version) nets, then the latest surviving
    // version per user — the version-matched collapse rule
    "q_collapse_versioned" ->
      """WITH ev AS (SELECT user_id, event_id, event_type, round(value,2) AS value FROM events),
         states AS (SELECT * FROM ev WHERE event_type <> 'error'),
         plus AS (SELECT user_id, event_id, event_type, value, 1 AS sign FROM states),
         prevs AS (SELECT user_id, lag(event_id) OVER w AS event_id,
                          lag(event_type) OVER w AS event_type, lag(value) OVER w AS value
                   FROM states WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
         cancel AS (SELECT user_id, event_id, event_type, value, -1 AS sign
                    FROM prevs WHERE event_id IS NOT NULL),
         last_ev AS (SELECT user_id, arg_max(event_type, event_id) AS lt FROM ev GROUP BY user_id),
         first_state AS (SELECT user_id, arg_min(event_id, event_id) AS event_id,
                                arg_min(event_type, event_id) AS event_type,
                                arg_min(value, event_id) AS value
                         FROM states GROUP BY user_id),
         del AS (SELECT fs.user_id, fs.event_id, fs.event_type, fs.value, -1 AS sign
                 FROM first_state fs JOIN last_ev le ON fs.user_id = le.user_id
                 WHERE le.lt = 'error'),
         feed AS (SELECT * FROM plus UNION ALL SELECT * FROM cancel UNION ALL SELECT * FROM del),
         perv AS (SELECT user_id, event_id, sum(sign) AS net,
                         max(event_type) FILTER (WHERE sign = 1) AS event_type,
                         max(value) FILTER (WHERE sign = 1) AS value
                  FROM feed GROUP BY user_id, event_id)
         SELECT user_id, arg_max(event_id, event_id) AS event_id,
                arg_max(event_type, event_id) AS event_type,
                arg_max(value, event_id) AS value
         FROM perv WHERE net > 0 GROUP BY user_id ORDER BY user_id""",
    // deltaSum: decimal-exact positive-delta sums (order-free), one
    // guarded double division rounded at the end
    "q_delta_sum" ->
      """WITH t AS (SELECT user_id, event_id,
                 CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ep,
                 CAST(value AS DECIMAL(18,6)) AS v FROM events),
         w AS (SELECT user_id, ep, v,
                 v - lag(v) OVER (PARTITION BY user_id ORDER BY ep, event_id) AS d FROM t),
         a AS (SELECT user_id, count(*) AS n_samples,
                 count(*) FILTER (WHERE d < 0) AS n_resets,
                 coalesce(sum(d) FILTER (WHERE d > 0), 0) AS ds,
                 max(ep) - min(ep) AS span_s
               FROM w GROUP BY user_id)
         SELECT user_id, n_samples, n_resets,
           CAST(CAST(ds AS DECIMAL(38,6)) AS VARCHAR) AS delta_sum, span_s,
           CASE WHEN span_s > 0 THEN round(CAST(ds AS DOUBLE) / CAST(span_s AS DOUBLE), 6) END AS rate_per_s
         FROM a ORDER BY user_id""",
    // W1c: lead() must see delete rows (they close predecessors)
    // before the delete filter drops them — same shape both engines
    "q_scd2" ->
      """WITH t AS (SELECT user_id, event_id, event_type, round(value, 2) AS value,
           CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS valid_from FROM events),
         w AS (SELECT *, lead(valid_from) OVER (PARTITION BY user_id ORDER BY event_id) AS valid_to
               FROM t)
         SELECT user_id, event_id, event_type, value, valid_from, valid_to,
           (valid_to IS NULL) AS is_current
         FROM w WHERE event_type <> 'error'
         ORDER BY user_id, event_id""",
    // W1d: the W1c CTE with the covering-interval predicate
    "q_scd2_asof" ->
      """WITH t AS (SELECT user_id, event_id, event_type, round(value, 2) AS value,
           CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS valid_from FROM events),
         w AS (SELECT *, lead(valid_from) OVER (PARTITION BY user_id ORDER BY event_id) AS valid_to
               FROM t)
         SELECT user_id, event_id, event_type, value, valid_from, valid_to
         FROM w WHERE event_type <> 'error'
           AND valid_from <= 1705276800
           AND (valid_to IS NULL OR valid_to > 1705276800)
         ORDER BY user_id, event_id""",
    "q_rank_topn" ->
      """SELECT event_type, user_id, n, rn FROM (
           SELECT event_type, user_id, COUNT(*) AS n,
             CAST(row_number() OVER (PARTITION BY event_type ORDER BY COUNT(*) DESC, user_id ASC) AS BIGINT) AS rn
           FROM events GROUP BY event_type, user_id)
         WHERE rn <= 3 ORDER BY event_type, rn""",
    "q_lag_gap" ->
      """WITH t AS (SELECT user_id, event_id,
           CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ep FROM events)
         SELECT user_id, event_id,
           ep - lag(ep, 1) OVER (PARTITION BY user_id ORDER BY ep, event_id) AS gap_s
         FROM t ORDER BY user_id, event_id""",
    "q_running_sum" ->
      """SELECT user_id, event_id,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_value
         FROM events ORDER BY user_id, event_id""",
    // W4c: integer window sums (exact in any order) → one fixed
    // double expression tree → round(6); NaN-vs-NULL at n_w<=1 never
    // surfaces because vr only feeds the guarded CASE
    "q_anomaly" ->
      """WITH daily AS (
           SELECT event_type,
             CAST(floor(CAST(epoch(date_trunc('second', ts)) AS BIGINT) / 86400.0) AS BIGINT) AS day_id,
             count(*) AS cnt
           FROM events GROUP BY 1, 2),
         w AS (SELECT event_type, day_id, cnt,
             count(*) OVER fr AS n_w,
             sum(cnt) OVER fr AS sm,
             sum(cnt * cnt) OVER fr AS ss
           FROM daily
           WINDOW fr AS (PARTITION BY event_type ORDER BY day_id
             ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
         calc AS (SELECT *,
             CASE WHEN n_w >= 1
               THEN CAST(sm AS DOUBLE) / CAST(n_w AS DOUBLE) END AS mean,
             CASE WHEN n_w >= 2
               THEN (CAST(ss AS DOUBLE) - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE)
                 / CAST(n_w AS DOUBLE)) / CAST(n_w - 1 AS DOUBLE) END AS vr
           FROM w),
         z AS (SELECT *,
             CASE WHEN n_w >= 3 AND vr > 1e-9
               THEN round((CAST(cnt AS DOUBLE) - mean) / sqrt(vr), 6) END AS z
           FROM calc)
         SELECT event_type, day_id, cnt, round(mean, 6) AS base_mean, z,
           (abs(z) > 2.0) AS is_anomaly
         FROM z ORDER BY event_type, day_id""",
    // W3b: identical whole-partition frame spelled out on both sides
    "q_first_last" ->
      """SELECT user_id, event_id, event_type,
         first_value(event_type) OVER w AS first_type,
         last_value(event_type) OVER w AS last_type,
         nth_value(event_type, 2) OVER w AS second_type
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         ORDER BY user_id, event_id""",
    "q_ntile" ->
      """SELECT event_id, event_type,
         CAST(ntile(4) OVER w AS BIGINT) AS quartile,
         round(percent_rank() OVER w, 6) AS pr,
         round(cume_dist() OVER w, 6) AS cd
         FROM events
         WINDOW w AS (PARTITION BY event_type ORDER BY value ASC, event_id ASC)
         ORDER BY event_id""",
    "q_moving_avg" ->
      """WITH t AS (SELECT user_id, event_id,
           CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ep, value FROM events)
         SELECT user_id, event_id,
           round(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
             / (COUNT(*) OVER w), 4) AS mavg,
           COUNT(*) OVER w AS nwin
         FROM t
         WINDOW w AS (PARTITION BY user_id ORDER BY ep
           RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
         ORDER BY user_id, event_id""",
    "q_quantiles" ->
      """SELECT event_type,
         round(quantile_cont(value, 0.5), 4) AS p50,
         round(quantile_cont(value, 0.95), 4) AS p95,
         round(quantile_cont(value, 0.99), 4) AS p99
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q_topk" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
         FROM orders ORDER BY price DESC, o_orderkey ASC LIMIT 10""",
    "q_sessionize" ->
      """WITH t AS (SELECT user_id, event_id,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ep FROM events),
         g AS (SELECT user_id, event_id, ep,
             CASE WHEN ep - lag(ep, 1) OVER (PARTITION BY user_id ORDER BY ep, event_id) > 1800
                  THEN 1 ELSE 0 END AS brk FROM t),
         s AS (SELECT user_id, ep,
             CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ep, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM g)
         SELECT user_id, session_id, COUNT(*) AS n_events,
           MAX(ep) - MIN(ep) AS duration_s
         FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id""",
    // W6g: the q_funnel stacked minima, collapsed per user with the
    // deepest-level time instead of the level histogram
    "q_funnel_time" ->
      """WITH e AS (SELECT user_id,
           CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS t,
           CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
             WHEN 'purchase' THEN 3 ELSE 0 END AS step
         FROM events
         WHERE event_type IN ('view', 'click', 'purchase')),
         a AS (SELECT user_id, t, step,
             min(CASE WHEN step = 1 THEN t END)
               OVER (PARTITION BY user_id) AS l1 FROM e),
         b AS (SELECT *, min(CASE WHEN step = 2 AND l1 IS NOT NULL
               AND t >= l1 AND t <= l1 + 86400 THEN t END)
             OVER (PARTITION BY user_id) AS l2 FROM a),
         c AS (SELECT *, min(CASE WHEN step = 3 AND l2 IS NOT NULL
               AND t >= l2 AND t <= l1 + 86400 THEN t END)
             OVER (PARTITION BY user_id) AS l3 FROM b),
         u AS (SELECT user_id, max(l1) AS l1, max(l2) AS l2, max(l3) AS l3
           FROM c GROUP BY user_id)
         SELECT user_id,
           CAST(CASE WHEN l3 IS NOT NULL THEN 3 ELSE 2 END AS INT) AS level,
           l1 AS t_anchor, coalesce(l3, l2) AS t_conv,
           coalesce(l3, l2) - l1 AS lag_s
         FROM u WHERE l2 IS NOT NULL ORDER BY user_id""",
    // W6h: the (t, event_id) struct order encoded as one BIGINT
    // (valid while event_id < 1e9 — true at every oracle SF), so
    // arg_min's pick is the same successor the Spark struct-min takes
    "q_sequence_next" ->
      """WITH e AS (SELECT user_id,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS t,
             event_id, event_type FROM events),
         m AS (SELECT user_id, min(CASE WHEN event_type = 'signup'
               THEN t * 1000000000 + event_id END) AS mk
           FROM e GROUP BY user_id),
         j AS (SELECT e.user_id, e.event_type,
             e.t * 1000000000 + e.event_id AS k, m.mk
           FROM e JOIN m USING (user_id))
         SELECT user_id, mk IS NOT NULL AS matched,
           CAST(mk // 1000000000 AS BIGINT) AS match_t,
           arg_min(event_type, k)
             FILTER (WHERE mk IS NOT NULL AND k > mk) AS next_node
         FROM j GROUP BY user_id, mk ORDER BY user_id""",
    // W6i: the mirrored encoding — max match key, arg_max below it
    "q_sequence_prev" ->
      """WITH e AS (SELECT user_id,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS t,
             event_id, event_type FROM events),
         m AS (SELECT user_id, max(CASE WHEN event_type = 'purchase'
               THEN t * 1000000000 + event_id END) AS mk
           FROM e GROUP BY user_id),
         j AS (SELECT e.user_id, e.event_type,
             e.t * 1000000000 + e.event_id AS k, m.mk
           FROM e JOIN m USING (user_id))
         SELECT user_id, mk IS NOT NULL AS matched,
           CAST(mk // 1000000000 AS BIGINT) AS match_t,
           arg_max(event_type, k)
             FILTER (WHERE mk IS NOT NULL AND k < mk) AS prev_node
         FROM j GROUP BY user_id, mk ORDER BY user_id""",
    "q_funnel" ->
      """WITH e AS (SELECT user_id,
           CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS t,
           CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
             WHEN 'purchase' THEN 3 ELSE 0 END AS step
         FROM events
         WHERE event_type IN ('view', 'click', 'purchase')),
         a AS (SELECT user_id, t, step,
             min(CASE WHEN step = 1 THEN t END)
               OVER (PARTITION BY user_id) AS l1 FROM e),
         b AS (SELECT *, min(CASE WHEN step = 2 AND l1 IS NOT NULL
               AND t >= l1 AND t <= l1 + 86400 THEN t END)
             OVER (PARTITION BY user_id) AS l2 FROM a),
         c AS (SELECT *, min(CASE WHEN step = 3 AND l2 IS NOT NULL
               AND t >= l2 AND t <= l1 + 86400 THEN t END)
             OVER (PARTITION BY user_id) AS l3 FROM b),
         u AS (SELECT user_id,
             max(CASE WHEN l3 IS NOT NULL THEN 3 WHEN l2 IS NOT NULL THEN 2
               WHEN l1 IS NOT NULL THEN 1 ELSE 0 END) AS level
           FROM c GROUP BY user_id)
         SELECT CAST(level AS INT) AS level, count(*) AS n_users
         FROM u GROUP BY level ORDER BY level""",
    // W8b: the q_funnel chained-minima CTE emitting the chain itself
    "q_sequence_events" ->
      """WITH e AS (SELECT user_id,
           CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS t,
           CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
             WHEN 'purchase' THEN 3 ELSE 0 END AS step
         FROM events
         WHERE event_type IN ('view', 'click', 'purchase')),
         a AS (SELECT user_id, t, step,
             min(CASE WHEN step = 1 THEN t END)
               OVER (PARTITION BY user_id) AS l1 FROM e),
         b AS (SELECT *, min(CASE WHEN step = 2 AND l1 IS NOT NULL
               AND t >= l1 AND t <= l1 + 86400 THEN t END)
             OVER (PARTITION BY user_id) AS l2 FROM a),
         c AS (SELECT *, min(CASE WHEN step = 3 AND l2 IS NOT NULL
               AND t >= l2 AND t <= l1 + 86400 THEN t END)
             OVER (PARTITION BY user_id) AS l3 FROM b)
         SELECT user_id,
           CAST(max(CASE WHEN l3 IS NOT NULL THEN 3
             WHEN l2 IS NOT NULL THEN 2
             WHEN l1 IS NOT NULL THEN 1 ELSE 0 END) AS INT) AS level,
           max(l1) AS t_1, max(l2) AS t_2, max(l3) AS t_3
         FROM c GROUP BY user_id ORDER BY user_id""",
    "q_funnel_gap" ->
      """WITH RECURSIVE e AS (SELECT user_id,
           CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS t,
           CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
             WHEN 'purchase' THEN 3 ELSE 0 END AS step
         FROM events
         WHERE event_type IN ('view', 'click', 'purchase')),
         o AS (SELECT user_id, t, step,
             row_number() OVER (PARTITION BY user_id ORDER BY t, step) AS rn
           FROM e),
         -- forward scan keeping the MAX achievable chain time per
         -- level: existence semantics (backtracking parity), where
         -- greedy minima would under-report
         scan AS (
           SELECT user_id, 0 AS rn, CAST(NULL AS BIGINT) AS m1,
                  CAST(NULL AS BIGINT) AS m2, CAST(NULL AS BIGINT) AS m3
           FROM (SELECT DISTINCT user_id FROM o)
           UNION ALL
           SELECT o.user_id, o.rn,
             CASE WHEN o.step = 1 THEN o.t ELSE s.m1 END,
             CASE WHEN o.step = 2 AND s.m1 IS NOT NULL
                  AND o.t <= s.m1 + 3600 THEN o.t ELSE s.m2 END,
             CASE WHEN o.step = 3 AND s.m2 IS NOT NULL
                  AND o.t <= s.m2 + 3600 THEN o.t ELSE s.m3 END
           FROM scan s JOIN o ON o.user_id = s.user_id AND o.rn = s.rn + 1),
         last AS (SELECT user_id, max(rn) AS mr FROM scan GROUP BY user_id),
         u AS (SELECT s.user_id,
             CASE WHEN m3 IS NOT NULL THEN 3 WHEN m2 IS NOT NULL THEN 2
               WHEN m1 IS NOT NULL THEN 1 ELSE 0 END AS level
           FROM scan s JOIN last l ON s.user_id = l.user_id AND s.rn = l.mr)
         SELECT CAST(level AS INT) AS level, count(*) AS n_users
         FROM u GROUP BY level ORDER BY level""",
    "q_funnel_strict" ->
      """WITH e AS (SELECT user_id,
           CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS t,
           CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
             WHEN 'purchase' THEN 3 ELSE 0 END AS step
         FROM events
         WHERE event_type IN ('view', 'click', 'purchase')),
         a AS (SELECT user_id, t, step,
             min(CASE WHEN step = 1 THEN t END)
               OVER (PARTITION BY user_id) AS l1 FROM e),
         b AS (SELECT *, min(CASE WHEN step = 2 AND l1 IS NOT NULL
               AND t > l1 AND t <= l1 + 86400 THEN t END)
             OVER (PARTITION BY user_id) AS l2 FROM a),
         c AS (SELECT *, min(CASE WHEN step = 3 AND l2 IS NOT NULL
               AND t > l2 AND t <= l1 + 86400 THEN t END)
             OVER (PARTITION BY user_id) AS l3 FROM b),
         g AS (SELECT *,
             sum(CASE WHEN t > l1 AND t < l2 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id) AS x2,
             sum(CASE WHEN t > l2 AND t < l3 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id) AS x3 FROM c),
         u AS (SELECT user_id,
             max(CASE
               WHEN l3 IS NOT NULL AND coalesce(x2, 0) = 0
                 AND coalesce(x3, 0) = 0 THEN 3
               WHEN l2 IS NOT NULL AND coalesce(x2, 0) = 0 THEN 2
               WHEN l1 IS NOT NULL THEN 1 ELSE 0 END) AS level
           FROM g GROUP BY user_id)
         SELECT CAST(level AS INT) AS level, count(*) AS n_users
         FROM u GROUP BY level ORDER BY level""",
    "q_funnel_any" ->
      """WITH RECURSIVE e AS (SELECT user_id,
           CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS t,
           CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
             WHEN 'purchase' THEN 3 ELSE 0 END AS step
         FROM events
         WHERE event_type IN ('view', 'click', 'purchase')),
         o AS (SELECT user_id, t, step,
             row_number() OVER (PARTITION BY user_id ORDER BY t, step) AS rn
           FROM e),
         -- forward scan keeping the MAX anchor t1 per level: the
         -- any-anchor existence DP (the window test is monotone in
         -- the anchor, so the max-anchor chain dominates)
         scan AS (
           SELECT user_id, 0 AS rn, CAST(NULL AS BIGINT) AS m1,
                  CAST(NULL AS BIGINT) AS m2, CAST(NULL AS BIGINT) AS m3
           FROM (SELECT DISTINCT user_id FROM o)
           UNION ALL
           SELECT o.user_id, o.rn,
             CASE WHEN o.step = 1 THEN greatest(coalesce(s.m1, o.t), o.t)
                  ELSE s.m1 END,
             CASE WHEN o.step = 2 AND s.m1 IS NOT NULL
                  AND o.t <= s.m1 + 86400
                  THEN greatest(coalesce(s.m2, s.m1), s.m1) ELSE s.m2 END,
             CASE WHEN o.step = 3 AND s.m2 IS NOT NULL
                  AND o.t <= s.m2 + 86400
                  THEN greatest(coalesce(s.m3, s.m2), s.m2) ELSE s.m3 END
           FROM scan s JOIN o ON o.user_id = s.user_id AND o.rn = s.rn + 1),
         last AS (SELECT user_id, max(rn) AS mr FROM scan GROUP BY user_id),
         u AS (SELECT s.user_id,
             CASE WHEN m3 IS NOT NULL THEN 3 WHEN m2 IS NOT NULL THEN 2
               WHEN m1 IS NOT NULL THEN 1 ELSE 0 END AS level
           FROM scan s JOIN last l ON s.user_id = l.user_id AND s.rn = l.mr)
         SELECT CAST(level AS INT) AS level, count(*) AS n_users
         FROM u GROUP BY level ORDER BY level""",
    "q_funnel_multi" ->
      """WITH e AS (
           SELECT user_id, CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS t,
             1 AS step FROM events WHERE event_type IN ('view', 'click')
           UNION ALL
           SELECT user_id, CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS t,
             2 AS step FROM events WHERE event_type = 'click'
           UNION ALL
           SELECT user_id, CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS t,
             3 AS step FROM events WHERE event_type = 'purchase'),
         a AS (SELECT user_id, t, step,
             min(CASE WHEN step = 1 THEN t END)
               OVER (PARTITION BY user_id) AS l1 FROM e),
         b AS (SELECT *, min(CASE WHEN step = 2 AND l1 IS NOT NULL
               AND t >= l1 AND t <= l1 + 86400 THEN t END)
             OVER (PARTITION BY user_id) AS l2 FROM a),
         c AS (SELECT *, min(CASE WHEN step = 3 AND l2 IS NOT NULL
               AND t >= l2 AND t <= l1 + 86400 THEN t END)
             OVER (PARTITION BY user_id) AS l3 FROM b),
         u AS (SELECT user_id,
             max(CASE WHEN l3 IS NOT NULL THEN 3 WHEN l2 IS NOT NULL THEN 2
               WHEN l1 IS NOT NULL THEN 1 ELSE 0 END) AS level
           FROM c GROUP BY user_id)
         SELECT CAST(level AS INT) AS level, count(*) AS n_users
         FROM u GROUP BY level ORDER BY level""",
    "q_funnel_capped" ->
      """WITH RECURSIVE e AS (SELECT user_id,
           CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS t,
           CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
             WHEN 'purchase' THEN 3 ELSE 0 END AS step
         FROM events
         WHERE event_type IN ('view', 'click', 'purchase')),
         -- the skew guard: each user's earliest 20 step-events only;
         -- the prefix keeps rn consecutive so the scan still walks it
         o AS (SELECT * FROM (SELECT user_id, t, step,
             row_number() OVER (PARTITION BY user_id ORDER BY t, step) AS rn
           FROM e) WHERE rn <= 20),
         scan AS (
           SELECT user_id, 0 AS rn, CAST(NULL AS BIGINT) AS m1,
                  CAST(NULL AS BIGINT) AS m2, CAST(NULL AS BIGINT) AS m3
           FROM (SELECT DISTINCT user_id FROM o)
           UNION ALL
           SELECT o.user_id, o.rn,
             CASE WHEN o.step = 1 THEN o.t ELSE s.m1 END,
             CASE WHEN o.step = 2 AND s.m1 IS NOT NULL
                  AND o.t <= s.m1 + 3600 THEN o.t ELSE s.m2 END,
             CASE WHEN o.step = 3 AND s.m2 IS NOT NULL
                  AND o.t <= s.m2 + 3600 THEN o.t ELSE s.m3 END
           FROM scan s JOIN o ON o.user_id = s.user_id AND o.rn = s.rn + 1),
         last AS (SELECT user_id, max(rn) AS mr FROM scan GROUP BY user_id),
         u AS (SELECT s.user_id,
             CASE WHEN m3 IS NOT NULL THEN 3 WHEN m2 IS NOT NULL THEN 2
               WHEN m1 IS NOT NULL THEN 1 ELSE 0 END AS level
           FROM scan s JOIN last l ON s.user_id = l.user_id AND s.rn = l.mr)
         SELECT CAST(level AS INT) AS level, count(*) AS n_users
         FROM u GROUP BY level ORDER BY level""",
    "q_sequence_match" ->
      """WITH e AS (SELECT user_id, event_id,
           CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS t,
           CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
             WHEN 'purchase' THEN 3 ELSE 0 END AS step
         FROM events),
         s AS (SELECT user_id,
             string_agg(CAST(step AS VARCHAR), '' ORDER BY t, event_id, step) AS sq
           FROM e WHERE step >= 1 GROUP BY user_id),
         m AS (SELECT user_id,
             CASE WHEN regexp_matches(sq, '1.*2.*3') THEN 1 ELSE 0 END AS seq_match
           FROM s)
         SELECT CAST(seq_match AS BIGINT) AS seq_match, count(*) AS n_users
         FROM m GROUP BY seq_match ORDER BY seq_match""",
    "q_sequence_count" ->
      """WITH e AS (SELECT user_id, event_id,
           CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS t,
           CASE event_type WHEN 'view' THEN 1 WHEN 'purchase' THEN 2
             ELSE 0 END AS step
         FROM events),
         s AS (SELECT user_id,
             string_agg(CAST(step AS VARCHAR), '' ORDER BY t, event_id, step) AS sq
           FROM e WHERE step >= 1 GROUP BY user_id)
         SELECT user_id,
           CAST(len(regexp_extract_all(sq, '1.*?2')) AS BIGINT) AS seq_count
         FROM s ORDER BY user_id""",
    // W4g: same lag window; the last row's deltas picked by the
    // descending row_number (engine: max_by on the ascending sort)
    "q_counter_stats" ->
      """WITH e AS (SELECT user_id, event_id,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ep,
             CAST(value AS DOUBLE) AS v
           FROM events WHERE value IS NOT NULL),
         w AS (SELECT user_id, ep, event_id, v,
             lag(v) OVER win AS pv,
             ep - lag(ep) OVER win AS dt,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ep DESC, event_id DESC) AS rnd
           FROM e
           WINDOW win AS (PARTITION BY user_id ORDER BY ep, event_id))
         SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(count(*) FILTER (WHERE v < pv) AS BIGINT) AS resets,
           CAST(count(*) FILTER (WHERE v <> pv) AS BIGINT) AS changes,
           max(CASE WHEN rnd = 1 THEN ep END) AS t_last,
           max(CASE WHEN rnd = 1 AND dt > 0 THEN
             round((CASE WHEN v < pv THEN v ELSE v - pv END)
               / CAST(dt AS DOUBLE), 6) END) AS irate
         FROM w GROUP BY user_id ORDER BY user_id""",
    // W4h: identical HUGEINT power sums (exact, like the engine's
    // DECIMAL(38,0)); numerators subtracted exact, ratios in double
    "q_predict_linear" ->
      """WITH e AS (SELECT event_type,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS t,
             CAST(floor(CAST(value AS DOUBLE) * 100.0) AS HUGEINT) AS w
           FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
         t0 AS (SELECT min(t) AS tz FROM e),
         a AS (SELECT event_type,
             CAST(count(*) AS HUGEINT) AS n,
             sum(CAST(t - tz AS HUGEINT)) AS st,
             sum(w) AS sv,
             sum(CAST(t - tz AS HUGEINT) * w) AS stv,
             sum(CAST(t - tz AS HUGEINT) * CAST(t - tz AS HUGEINT)) AS stt,
             max(t) AS tmax, max(tz) AS tz
           FROM e CROSS JOIN t0 GROUP BY event_type),
         f AS (SELECT event_type, n, tmax, tz,
             CAST(n * stv - st * sv AS DOUBLE) AS num,
             CAST(n * stt - st * st AS DOUBLE) AS den,
             CAST(sv AS DOUBLE) / CAST(n AS DOUBLE) AS meanv,
             CAST(st AS DOUBLE) / CAST(n AS DOUBLE) AS meant
           FROM a)
         SELECT event_type, CAST(n AS BIGINT) AS n_samples,
           CASE WHEN n > 1 AND den > 0.0 THEN
             round(num / den / 100.0, 6) END AS deriv_per_s,
           CASE WHEN n > 1 AND den > 0.0 THEN
             round((meanv + num / den
               * (CAST(tmax - tz + 3600 AS DOUBLE) - meant)) / 100.0, 6)
             END AS predict
         FROM f ORDER BY event_type""",
    // W12: identical fixed-point machinery — HUGEINT window sums,
    // exact detrended numerators, round-9 DECIMAL(28,9) phase means,
    // one double division per emitted value
    "q_series_decompose" ->
      """WITH daily AS (SELECT event_type,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 86400
               AS day,
             CAST(count(*) AS DOUBLE) AS cnt
           FROM events WHERE ts IS NOT NULL
           GROUP BY event_type, day),
         fp AS (SELECT event_type, day,
             CAST(floor(cnt * 1000000.0) AS HUGEINT) AS v
           FROM daily),
         b AS (SELECT event_type, day AS ord, v,
             row_number() OVER (PARTITION BY event_type ORDER BY day)
               AS rn,
             count(*) OVER (PARTITION BY event_type) AS n,
             sum(v) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS tsum
           FROM fp),
         r AS (SELECT *, (rn - 1) % 7 AS phase,
             rn > 3 AND rn <= n - 3 AS tok FROM b),
         t AS (SELECT *,
             CASE WHEN tok THEN
               round(CAST(tsum AS DOUBLE) / (7.0 * 1000000.0), 6)
             END AS trend,
             CASE WHEN tok THEN v * 7 - tsum END AS dnum FROM r),
         sp AS (SELECT event_type, phase,
             CAST(round(CAST(sum(dnum) AS DOUBLE)
               / (CAST(count(*) AS DOUBLE) * 7.0 * 1000000.0), 9)
               AS DECIMAL(28,9)) AS sraw
           FROM t WHERE tok GROUP BY event_type, phase),
         sc AS (SELECT event_type, phase,
             round(CAST(sraw - CAST(round(
               CAST(sum(sraw) OVER (PARTITION BY event_type) AS DOUBLE)
               / CAST(count(*) OVER (PARTITION BY event_type) AS DOUBLE),
               9) AS DECIMAL(28,9)) AS DOUBLE), 6) AS seasonal
           FROM sp)
         SELECT t.event_type, t.ord,
           round(CAST(v AS DOUBLE) / 1000000.0, 6) AS value,
           t.trend, sc.seasonal,
           CASE WHEN t.trend IS NOT NULL THEN
             round(CAST(v AS DOUBLE) / 1000000.0 - t.trend - sc.seasonal,
               6) END AS residual
         FROM t JOIN sc ON sc.event_type = t.event_type
           AND sc.phase = t.phase
         ORDER BY t.event_type, t.ord""",
    // W13: same exact-integer centering (v·n − S), HUGEINT products,
    // one double division per lag
    "q_autocorr" ->
      """WITH daily AS (SELECT event_type,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 86400
               AS day,
             CAST(count(*) AS DOUBLE) AS cnt
           FROM events WHERE ts IS NOT NULL
           GROUP BY event_type, day),
         b AS (SELECT event_type, day,
             CAST(floor(cnt * 1000000.0) AS HUGEINT) AS v,
             row_number() OVER (PARTITION BY event_type ORDER BY day)
               AS rn
           FROM daily),
         st AS (SELECT event_type, sum(v) AS s,
             CAST(count(*) AS HUGEINT) AS n
           FROM b GROUP BY event_type),
         c AS (SELECT b.event_type, rn, v * n - s AS cv
           FROM b JOIN st USING (event_type)),
         l AS (SELECT unnest(range(0, 11)) AS k),
         p AS (SELECT a.event_type, l.k, a.cv AS ca, b2.cv AS cb
           FROM c a CROSS JOIN l
           JOIN c b2 ON b2.event_type = a.event_type
             AND b2.rn = a.rn + l.k),
         nk AS (SELECT event_type, k, sum(ca * cb) AS nkv,
             CAST(count(*) AS BIGINT) AS n_pairs
           FROM p GROUP BY event_type, k),
         n0 AS (SELECT event_type, nkv AS d FROM nk WHERE k = 0)
         SELECT nk.event_type, CAST(k AS BIGINT) AS lag, n_pairs,
           CASE WHEN d > 0 THEN
             round(CAST(nkv AS DOUBLE) / CAST(d AS DOUBLE), 6)
           END AS acf
         FROM nk JOIN n0 USING (event_type)
         ORDER BY event_type, lag""",
    // W13b: the argmax over the same ACF, lag >= 2, ties → smallest
    "q_period_detect" ->
      """WITH daily AS (SELECT event_type,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 86400
               AS day,
             CAST(count(*) AS DOUBLE) AS cnt
           FROM events WHERE ts IS NOT NULL
           GROUP BY event_type, day),
         b AS (SELECT event_type, day,
             CAST(floor(cnt * 1000000.0) AS HUGEINT) AS v,
             row_number() OVER (PARTITION BY event_type ORDER BY day)
               AS rn
           FROM daily),
         st AS (SELECT event_type, sum(v) AS s,
             CAST(count(*) AS HUGEINT) AS n
           FROM b GROUP BY event_type),
         c AS (SELECT b.event_type, rn, v * n - s AS cv
           FROM b JOIN st USING (event_type)),
         l AS (SELECT unnest(range(0, 11)) AS k),
         p AS (SELECT a.event_type, l.k, a.cv AS ca, b2.cv AS cb
           FROM c a CROSS JOIN l
           JOIN c b2 ON b2.event_type = a.event_type
             AND b2.rn = a.rn + l.k),
         nk AS (SELECT event_type, k, sum(ca * cb) AS nkv
           FROM p GROUP BY event_type, k),
         n0 AS (SELECT event_type, nkv AS d FROM nk WHERE k = 0),
         acf AS (SELECT nk.event_type, CAST(k AS BIGINT) AS lag,
             CASE WHEN d > 0 THEN
               round(CAST(nkv AS DOUBLE) / CAST(d AS DOUBLE), 6)
             END AS acf
           FROM nk JOIN n0 USING (event_type)),
         r AS (SELECT event_type, lag AS period, acf,
             row_number() OVER (PARTITION BY event_type
               ORDER BY acf DESC, lag ASC) AS rk
           FROM acf WHERE lag >= 2 AND acf IS NOT NULL)
         SELECT event_type, period, acf FROM r WHERE rk = 1
         ORDER BY event_type""",
    // W15: exact integer D_t = n·C_t − t·T; argmax |D|, ties earliest
    "q_cusum" ->
      """WITH daily AS (SELECT event_type,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 86400
               AS day,
             CAST(count(*) AS DOUBLE) AS cnt
           FROM events WHERE ts IS NOT NULL
           GROUP BY event_type, day),
         b AS (SELECT event_type, day,
             CAST(floor(cnt * 1000000.0) AS HUGEINT) AS v,
             row_number() OVER (PARTITION BY event_type ORDER BY day)
               AS rn,
             sum(CAST(floor(cnt * 1000000.0) AS HUGEINT))
               OVER (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
           FROM daily),
         st AS (SELECT event_type, sum(v) AS t, sum(v * v) AS s2,
             CAST(count(*) AS HUGEINT) AS n
           FROM b GROUP BY event_type),
         d AS (SELECT b.event_type, b.day, rn,
             c * n - CAST(rn AS HUGEINT) * t AS dd, n, t, s2
           FROM b JOIN st USING (event_type)
           WHERE CAST(rn AS HUGEINT) < n),
         p AS (SELECT *, row_number() OVER (PARTITION BY event_type
             ORDER BY abs(dd) DESC, rn ASC) AS pick
           FROM d),
         f AS (SELECT event_type, n, day, abs(dd) AS add,
             CAST(n AS DOUBLE) AS nd,
             CAST(abs(dd) AS DOUBLE) AS maxd,
             CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
               - (CAST(t AS DOUBLE) / CAST(n AS DOUBLE))
               * (CAST(t AS DOUBLE) / CAST(n AS DOUBLE)) AS sigma2
           FROM p WHERE pick = 1)
         SELECT event_type, CAST(n AS BIGINT) AS n_rows, day AS cp_ord,
           round(maxd / (nd * 1000000.0), 6) AS cusum_abs,
           CASE WHEN sigma2 > 0.0 THEN round(least(1.0,
             2.0 * exp(-2.0 * (maxd / (sqrt(sigma2) * nd * sqrt(nd)))
               * (maxd / (sqrt(sigma2) * nd * sqrt(nd))))), 6) END
             AS p_approx
         FROM f ORDER BY event_type""",
    // W16: medians on the exact fixed-point grid (.5/.25 — the
    // tukey argument one level deeper); identical z tree
    "q_mad_zscore" ->
      """WITH w AS (SELECT event_type, event_id AS tie, value,
             floor(CAST(value AS DOUBLE) * 100.0) AS wv
           FROM events WHERE value IS NOT NULL),
         m AS (SELECT event_type, quantile_cont(wv, 0.5) AS med
           FROM w GROUP BY event_type),
         d AS (SELECT w.event_type, w.tie, w.value, w.wv, m.med,
             abs(w.wv - m.med) AS dev
           FROM w JOIN m USING (event_type)),
         md AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad
           FROM d GROUP BY event_type)
         SELECT d.event_type, d.tie, d.value,
           CASE WHEN mad > 0.0
             THEN floor(0.6745 * (wv - med) / mad * 1000000.0)
               / 1000000.0 END AS robust_z,
           CASE WHEN mad > 0.0
             THEN abs(0.6745 * (wv - med) / mad) > 3.5 END AS is_outlier
         FROM d JOIN md USING (event_type)
         ORDER BY d.event_type, d.tie""",
    // W17: exact-integer error sums; MASE = MAE / seasonal-naive MAE
    "q_forecast_acc" ->
      """WITH daily AS (SELECT event_type,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 86400
               AS day,
             CAST(count(*) AS DOUBLE) AS cnt
           FROM events WHERE ts IS NOT NULL
           GROUP BY event_type, day),
         w AS (SELECT event_type, day,
             CAST(floor(cnt * 1000000.0) AS HUGEINT) AS a,
             lag(CAST(floor(cnt * 1000000.0) AS HUGEINT), 1)
               OVER (PARTITION BY event_type ORDER BY day) AS f,
             lag(CAST(floor(cnt * 1000000.0) AS HUGEINT), 7)
               OVER (PARTITION BY event_type ORDER BY day) AS sn
           FROM daily),
         s AS (SELECT event_type,
             count(f) AS n_scored,
             sum(abs(a - f)) AS se,
             sum((a - f) * (a - f)) AS se2,
             count(sn) AS nsn,
             sum(abs(a - sn)) AS ssn
           FROM w GROUP BY event_type)
         SELECT event_type, n_scored,
           round(CAST(se AS DOUBLE) / CAST(n_scored AS DOUBLE)
             / 1000000.0, 6) AS mae,
           round(sqrt(CAST(se2 AS DOUBLE) / CAST(n_scored AS DOUBLE))
             / 1000000.0, 6) AS rmse,
           CASE WHEN nsn > 0 AND ssn > 0 THEN
             round((CAST(se AS DOUBLE) / CAST(n_scored AS DOUBLE)
                 / 1000000.0)
               / (CAST(ssn AS DOUBLE) / CAST(nsn AS DOUBLE)
                 / 1000000.0), 6) END AS mase
         FROM s WHERE n_scored > 0 ORDER BY event_type""",
    // W18: exact integer pair signs, tie-corrected variance, tau-b
    "q_mann_kendall" ->
      ("""WITH daily AS (SELECT event_type,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 86400
               AS day,
             CAST(count(*) AS DOUBLE) AS cnt
           FROM events WHERE ts IS NOT NULL
           GROUP BY event_type, day),
         fp AS (SELECT event_type, day AS o,
             CAST(floor(cnt * 1000000.0) AS HUGEINT) AS v
           FROM daily),
         s AS (SELECT a.event_type,
             CAST(sum(CAST(sign(CAST(b.v - a.v AS DOUBLE)) AS BIGINT))
               AS BIGINT) AS s_stat
           FROM fp a JOIN fp b ON b.event_type = a.event_type
             AND b.o > a.o
           GROUP BY a.event_type),
         vt AS (SELECT event_type,
             sum(t * (t - 1) * (2 * t + 5)) AS v25,
             sum(t * (t - 1)) AS v2
           FROM (SELECT event_type, v, count(*) AS t
             FROM fp GROUP BY event_type, v)
           GROUP BY event_type),
         ot AS (SELECT event_type, sum(t * (t - 1)) AS o2
           FROM (SELECT event_type, o, count(*) AS t
             FROM fp GROUP BY event_type, o)
           GROUP BY event_type),
         nn AS (SELECT event_type, count(*) AS n_rows
           FROM fp GROUP BY event_type),
         z AS (SELECT nn.event_type, n_rows, s_stat,
             CAST(n_rows AS DOUBLE) AS nd, CAST(s_stat AS DOUBLE) AS sd,
             CAST(v25 AS DOUBLE) AS v25d, CAST(v2 AS DOUBLE) AS v2d,
             CAST(o2 AS DOUBLE) AS o2d
           FROM nn JOIN s USING (event_type) JOIN vt USING (event_type)
             JOIN ot USING (event_type)),
         fin AS (SELECT event_type, n_rows, s_stat,
           CASE WHEN (nd * (nd - 1.0) / 2.0 - v2d / 2.0)
               * (nd * (nd - 1.0) / 2.0 - o2d / 2.0) > 0.0
             THEN round(sd / sqrt((nd * (nd - 1.0) / 2.0 - v2d / 2.0)
               * (nd * (nd - 1.0) / 2.0 - o2d / 2.0)), 6) END AS tau,
           CASE WHEN n_rows >= 2
               AND (nd * (nd - 1.0) * (2.0 * nd + 5.0) - v25d) / 18.0
                 > 0.0
             THEN round(CASE
               WHEN s_stat > 0 THEN (sd - 1.0)
                 / sqrt((nd * (nd - 1.0) * (2.0 * nd + 5.0) - v25d)
                   / 18.0)
               WHEN s_stat < 0 THEN (sd + 1.0)
                 / sqrt((nd * (nd - 1.0) * (2.0 * nd + 5.0) - v25d)
                   / 18.0)
               ELSE 0.0 END, 6) END AS z_stat
         FROM z)
         SELECT event_type, n_rows, s_stat, tau, z_stat,
           """ + graft.functions.NormalDist.twoSidedPSql("z_stat") +
      """ AS p_value
         FROM fin ORDER BY event_type"""),
    // X27: grid-sized pairwise slopes, one double division each,
    // fixed-point-quantized before the exact interpolated median
    "q_theil_sen" ->
      """WITH daily AS (SELECT event_type,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 86400
               AS day,
             CAST(count(*) AS DOUBLE) AS cnt
           FROM events WHERE ts IS NOT NULL
           GROUP BY event_type, day),
         fp AS (SELECT event_type, day AS o,
             CAST(floor(cnt * 1000000.0) AS HUGEINT) AS v
           FROM daily),
         p AS (SELECT a.event_type,
             floor(CAST(b.v - a.v AS DOUBLE) / CAST(b.o - a.o AS DOUBLE))
               AS s
           FROM fp a JOIN fp b ON b.event_type = a.event_type
             AND b.o > a.o)
         SELECT event_type, count(*) AS n_pairs,
           round(quantile_cont(s, 0.5) / 1000000.0, 6) AS slope
         FROM p GROUP BY event_type ORDER BY event_type""",
    "q_derivative" ->
      """WITH e AS (SELECT user_id, event_id,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ep,
             CAST(value AS DOUBLE) AS v
           FROM events),
         w AS (SELECT user_id, event_id, ep, v,
             lag(v) OVER win AS pv, lag(ep) OVER win AS pt
           FROM e
           WINDOW win AS (PARTITION BY user_id ORDER BY ep, event_id))
         SELECT user_id, event_id, ep,
           CASE WHEN ep - pt > 0 THEN
             round(greatest(v - pv, 0.0) / CAST(ep - pt AS DOUBLE), 6)
             END AS deriv_per_s
         FROM w ORDER BY user_id, ep, event_id""",
    "q_tukey" ->
      """WITH w AS (SELECT event_type, event_id, value,
             floor(CAST(value AS DOUBLE) * 100.0) AS wv
           FROM events WHERE value IS NOT NULL),
         q AS (SELECT event_type,
             quantile_cont(wv, 0.25) AS q1, quantile_cont(wv, 0.75) AS q3
           FROM w GROUP BY event_type),
         f AS (SELECT event_type, q1 - 1.5 * (q3 - q1) AS lo,
             q3 + 1.5 * (q3 - q1) AS hi FROM q)
         SELECT w.event_type, w.event_id, w.value,
           round(lo / 100.0, 6) AS lo_fence,
           round(hi / 100.0, 6) AS hi_fence
         FROM w JOIN f USING (event_type)
         WHERE w.wv < f.lo OR w.wv > f.hi
         ORDER BY w.event_type, w.event_id""",
    "q_attribution_linear" ->
      """WITH e AS (SELECT user_id, event_id,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ep,
             event_type
           FROM events),
         c AS (SELECT user_id, ep AS conv_ep, event_id AS conv_tie
           FROM e WHERE event_type = 'purchase'),
         s AS (SELECT user_id, ep AS sep, event_id AS stie,
             event_type AS stype
           FROM e WHERE event_type IN ('click', 'signup', 'view')),
         j AS (SELECT c.user_id, c.conv_ep, c.conv_tie,
             s.stype, s.sep, s.stie
           FROM c JOIN s ON s.user_id = c.user_id
             AND s.sep >= c.conv_ep - 86400 AND s.sep <= c.conv_ep),
         p AS (SELECT *,
             row_number() OVER (PARTITION BY user_id, conv_ep, conv_tie
               ORDER BY sep, stie, stype) AS rk,
             count(*) OVER (PARTITION BY user_id, conv_ep, conv_tie)
               AS n
           FROM j),
         t AS (SELECT stype,
             CASE WHEN rk = n THEN
               CAST(1 AS DECIMAL(28,9))
                 - CAST(n - 1 AS DECIMAL(10,0))
                   * CAST(round(1.0 / CAST(n AS DOUBLE), 9)
                       AS DECIMAL(10,9))
             ELSE
               CAST(round(1.0 / CAST(n AS DOUBLE), 9) AS DECIMAL(28,9))
             END AS w9
           FROM p)
         SELECT stype AS source_type, count(*) AS n_touches,
           round(CAST(sum(w9) AS DOUBLE), 6) AS credit
         FROM t GROUP BY stype ORDER BY source_type""",
    "q_attribution_ushaped" ->
      """WITH e AS (SELECT user_id, event_id,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ep,
             event_type
           FROM events),
         c AS (SELECT user_id, ep AS conv_ep, event_id AS conv_tie
           FROM e WHERE event_type = 'purchase'),
         s AS (SELECT user_id, ep AS sep, event_id AS stie,
             event_type AS stype
           FROM e WHERE event_type IN ('click', 'signup', 'view')),
         j AS (SELECT c.user_id, c.conv_ep, c.conv_tie,
             s.stype, s.sep, s.stie
           FROM c JOIN s ON s.user_id = c.user_id
             AND s.sep >= c.conv_ep - 86400 AND s.sep <= c.conv_ep),
         p AS (SELECT *,
             row_number() OVER (PARTITION BY user_id, conv_ep, conv_tie
               ORDER BY sep, stie, stype) AS rk,
             count(*) OVER (PARTITION BY user_id, conv_ep, conv_tie)
               AS n
           FROM j),
         t AS (SELECT stype,
             CASE WHEN rk = n THEN
               CAST(1 AS DECIMAL(28,9)) -
                 CASE WHEN n = 1 THEN CAST(0 AS DECIMAL(28,9))
                   WHEN n = 2 THEN CAST(0.5 AS DECIMAL(28,9))
                   ELSE CAST(0.4 AS DECIMAL(28,9))
                     + CAST(n - 2 AS DECIMAL(10,0))
                       * CAST(round(0.2 / (CAST(n AS DOUBLE) - 2.0), 9)
                           AS DECIMAL(10,9))
                 END
             ELSE
               CAST(round(CASE WHEN n = 1 THEN 1.0 WHEN n = 2 THEN 0.5
                 WHEN rk = 1 THEN 0.4
                 ELSE 0.2 / (CAST(n AS DOUBLE) - 2.0) END, 9)
                 AS DECIMAL(28,9))
             END AS w9
           FROM p)
         SELECT stype AS source_type, count(*) AS n_touches,
           round(CAST(sum(w9) AS DOUBLE), 6) AS credit
         FROM t GROUP BY stype ORDER BY source_type""",
    "q_attribution" ->
      """WITH e AS (SELECT user_id, event_id,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ep,
             event_type
           FROM events),
         c AS (SELECT user_id, ep AS conv_ep, event_id AS conv_tie
           FROM e WHERE event_type = 'purchase'),
         s AS (SELECT user_id, ep AS sep, event_id AS stie,
             event_type AS stype
           FROM e WHERE event_type IN ('click', 'signup', 'view')),
         j AS (SELECT c.user_id, c.conv_ep, c.conv_tie,
             s.stype, s.sep, s.stie
           FROM c JOIN s ON s.user_id = c.user_id
             AND s.sep >= c.conv_ep - 86400 AND s.sep <= c.conv_ep),
         p AS (SELECT *,
             row_number() OVER (PARTITION BY user_id, conv_ep, conv_tie
               ORDER BY sep, stie, stype) AS rf,
             row_number() OVER (PARTITION BY user_id, conv_ep, conv_tie
               ORDER BY sep DESC, stie DESC, stype DESC) AS rl
           FROM j),
         f AS (SELECT user_id, conv_ep, conv_tie,
             stype AS first_type, sep AS first_ep FROM p WHERE rf = 1),
         l AS (SELECT user_id, conv_ep, conv_tie,
             stype AS last_type, sep AS last_ep FROM p WHERE rl = 1)
         SELECT c.user_id, c.conv_ep, c.conv_tie,
           f.first_type, f.first_ep, l.last_type, l.last_ep
         FROM c
           LEFT JOIN f USING (user_id, conv_ep, conv_tie)
           LEFT JOIN l USING (user_id, conv_ep, conv_tie)
         ORDER BY user_id, conv_ep, conv_tie""",
    "q_retention" ->
      """WITH e AS (SELECT user_id,
           CAST(date_trunc('day', ts) AS DATE) AS day FROM events),
         m AS (SELECT min(day) AS d0 FROM e),
         x AS (SELECT user_id, date_diff('day', d0, day) + 1 AS dk FROM e, m),
         f AS (SELECT user_id,
             max(CASE WHEN dk = 1 THEN 1 ELSE 0 END) AS f1,
             max(CASE WHEN dk = 2 THEN 1 ELSE 0 END) AS f2,
             max(CASE WHEN dk = 3 THEN 1 ELSE 0 END) AS f3,
             max(CASE WHEN dk = 4 THEN 1 ELSE 0 END) AS f4,
             max(CASE WHEN dk = 5 THEN 1 ELSE 0 END) AS f5,
             max(CASE WHEN dk = 6 THEN 1 ELSE 0 END) AS f6,
             max(CASE WHEN dk = 7 THEN 1 ELSE 0 END) AS f7
           FROM x GROUP BY user_id)
         SELECT CAST(day_k AS BIGINT) AS day_k,
           CAST(sum(flag) AS BIGINT) AS n_retained FROM (
           SELECT 1 AS day_k, f1 AS flag FROM f
           UNION ALL SELECT 2, f1 * f2 FROM f
           UNION ALL SELECT 3, f1 * f3 FROM f
           UNION ALL SELECT 4, f1 * f4 FROM f
           UNION ALL SELECT 5, f1 * f5 FROM f
           UNION ALL SELECT 6, f1 * f6 FROM f
           UNION ALL SELECT 7, f1 * f7 FROM f)
         GROUP BY day_k ORDER BY day_k""")
}
