package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ST4-ST6/ST8: event-time analytics over the streaming events table
  * (SURVEY.md §2.9). The reference has no event-time aggregation — it
  * counts via Prometheus (internal/metrics/metrics.go:11-16) and
  * delegates analytics to ClickHouse; these are the engine-side
  * equivalents of those delegated queries, watermark-bounded so state
  * never grows with history (ST4, documented extension).
  */
object EventAnalytics {

  /** ST5: tumbling (or, with `slide`, sliding) windowed counts per
    * action — the streaming analogue of the reference's
    * events_generated_total counter viewed per scrape interval.
    */
  def windowedCounts(
      events: DataFrame, tsCol: String, actionCol: String,
      window_ : String, slide: Option[String] = None,
      watermark: String = "10 minutes"): DataFrame = {
    val w = slide match {
      case Some(s) => window(col(tsCol), window_, s)
      case None => window(col(tsCol), window_)
    }
    events
      .withWatermark(tsCol, watermark)
      .groupBy(w.as("win"), col(actionCol))
      .agg(count(lit(1)).as("n"))
      .select(col("win.start").as("win_start"), col("win.end").as("win_end"),
        col(actionCol), col("n"))
  }

  /** ST6: session windows — 30-minute-gap sessions per user, the
    * streaming form of the batch q_sessionize query.
    */
  def sessionCounts(
      events: DataFrame, tsCol: String, userCol: String,
      gap: String = "30 minutes", watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap).as("sess"), col(userCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col("sess.start").as("sess_start"), col("sess.end").as("sess_end"),
        col(userCol), col("n_events"))

  /** ST8: stream-static join — enrich the event stream with the
    * (batch) current-users dimension; the canonical query the
    * reference's dual pipeline exists to serve (README.md:112-121).
    * The static side is broadcast when small — no stream-side shuffle.
    */
  def enrich(
      events: DataFrame, staticDim: DataFrame,
      eventKey: Column, dimKey: Column): DataFrame =
    events.join(broadcast(staticDim), eventKey === dimKey, "left")

  /** ST8b: stream-STREAM join with an event-time interval constraint —
    * e.g. clicks joined to the purchases that follow them within
    * `horizon` (click-to-purchase attribution). Both sides carry
    * watermarks and the join condition bounds rightTs inside
    * [leftTs, leftTs + horizon]; that pair is what lets Spark derive a
    * state watermark for EACH buffer and EVICT rows once the other
    * side's watermark passes their interval end — without the time
    * bound, stream-stream join state grows with all history (the
    * unbounded-state trap, same class as a bare groupBy(user)). Inner
    * join: a match emits as soon as both rows have arrived; the state
    * drain is audited in the spec via the query's own
    * stateOperators.numRowsTotal.
    *
    * Scale: state per key ≈ rows inside the watermark+horizon span —
    * independent of history; the join shuffles both streams on the
    * key (micro-batch-sized exchanges). Column names must be distinct
    * across the two sides (the condition is built by name).
    */
  def joinStreamsWithin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      horizon: String, watermark: String = "10 minutes"): DataFrame =
    left.withWatermark(leftTs, watermark)
      .join(right.withWatermark(rightTs, watermark),
        expr(s"$leftKey = $rightKey AND $rightTs >= $leftTs " +
          s"AND $rightTs <= $leftTs + interval $horizon"))

  /** ST10c: streaming cohort retention — the W7 dashboard served
    * incrementally. Deliberately NOT `flatMapGroupsWithState`: keyed
    * on (tumbling cohort window, user), the conditional-max flags are
    * an ordinary streaming aggregation, so Spark's own watermark
    * eviction bounds the state (a bare `groupBy(user)` would grow
    * with the user population FOREVER — the unbounded-keyed-state
    * trap SURVEY §7 warns about; the cohort window in the key is what
    * makes eviction possible).
    *
    * Cohorts are epoch-aligned `spanDays`-day tumbling windows (the
    * alignment Spark's `window()` uses), so the in-window day index
    * is computable BEFORE the aggregation — from EPOCH SECONDS, not
    * a date cast: `cast(ts as long)` is timezone-independent exactly
    * like `window()`'s UTC-epoch alignment, where a session-timezone
    * `cast(ts as date)` would disagree with the window boundaries in
    * any non-UTC session. dk = pmod(epochS, span·86400) div 86400
    * + 1. Output per (cohort start, user): r_k = f_1 AND f_k,
    * k = 1..spanDays — identical flag algebra to the batch
    * `EventFunnels.retention`, cross-checked in the spec.
    */
  def cohortRetention(
      events: DataFrame, tsCol: String, userCol: String,
      spanDays: Int = 7, watermark: String = "10 minutes"): DataFrame = {
    require(spanDays >= 1 && spanDays <= 31, "spanDays in 1..31")
    val inWindowS = pmod(col(tsCol).cast("long"), lit(spanDays * 86400L))
    val dk = ((inWindowS - pmod(inWindowS, lit(86400L))) / lit(86400L))
      .cast("int").+(1).as("__dk")
    val flags = (1 to spanDays).map(k =>
      max(when(col("__dk") === k, 1L).otherwise(0L)).as(s"__f$k"))
    val agged = events
      .withWatermark(tsCol, watermark)
      .select(col(tsCol), col(userCol), dk)
      .groupBy(window(col(tsCol), s"$spanDays days").as("cohort"),
        col(userCol))
      .agg(flags.head, flags.tail: _*)
    val outs = Seq(col("cohort.start").as("cohort_start"), col(userCol)) ++
      (1 to spanDays).map { k =>
        (if (k == 1) col("__f1") else col("__f1") * col(s"__f$k")).as(s"r$k")
      }
    agged.select(outs: _*)
  }
}
