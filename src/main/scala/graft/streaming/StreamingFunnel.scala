package graft.streaming

import graft.operators.EventFunnels
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** ST10: streaming `windowFunnel` — the batch operator's exact
  * semantics (first-touch anchoring, optional strict modes) computed
  * incrementally over an event stream, robust to OUT-OF-ORDER arrival
  * within the watermark.
  *
  * Design: the closed form is order-insensitive (minima and counts
  * over a set — `EventFunnels.levelOf`, shared verbatim with the
  * batch property tests), so the streaming arm buffers each user's
  * step-tagged events and evaluates the fold ONCE, when the
  * event-time watermark passes the user's last activity plus `hold`.
  * One final (user, level) row per user, Append semantics.
  *
  * 100 TB state posture (SURVEY §7's streaming watch item):
  *  - only CONDITION-matching events enter state (the same pre-filter
  *    as batch);
  *  - once a step-1 anchor exists, events past `anchor + window` are
  *    never buffered — a late-arriving EARLIER anchor only shrinks
  *    that bound, so the prune is always safe; without an anchor,
  *    events below the current watermark are pruned instead (any
  *    future anchor must pass the late filter, so nothing below the
  *    watermark can ever sit inside a chain);
  *  - the whole buffer is evicted at the event-time timeout, so state
  *    is bounded by (funnel window ∪ watermark horizon) per active
  *    user, never by history. The eviction is spec-audited via
  *    `stateOperators.numRowsTotal` draining to zero
  *    (StreamingSpec ST10), the same audit the ST7 dedup state gets.
  */
object StreamingFunnel {

  /** Per-user buffered step events (epoch-second, step) plus the
    * user's true last-activity time. `lastSeen` is persisted rather
    * than re-derived from `events` because the buffer is PRUNED —
    * recomputing it from pruned events could move the timeout
    * earlier than real activity and emit prematurely.
    */
  case class FunnelState(events: Seq[(Long, Int)], lastSeen: Long)

  /** Sequence-arm state: (t, tie, step) triples — the tie-break rides
    * along so same-timestamp ordering matches the batch operator.
    */
  case class SeqState(events: Seq[(Long, Long, Int)], lastSeen: Long)

  /** `events` must carry an event-time column `tsCol` with a
    * watermark REQUIRED by the EventTimeTimeout (set here from
    * `watermark`). `steps` are the funnel conditions, first match
    * tags the event (identical to batch). Returns a streaming
    * Dataset of (user, level), one row per user emitted when the
    * watermark passes last-activity + `hold`.
    */
  def funnelLevels(
      events: DataFrame, user: String, tsCol: String,
      window: Long, steps: Seq[Column],
      watermark: String = "10 seconds", hold: Long = 10L,
      strictIncrease: Boolean = false,
      strictOrder: Boolean = false): Dataset[(String, Int)] = {
    val spark = events.sparkSession
    import spark.implicits._
    require(steps.nonEmpty, "funnel needs at least one step")
    val nSteps = steps.size
    events
      .withWatermark(tsCol, watermark)
      .select(col(user).cast("string").as("u"), col(tsCol).as("ts"),
        EventFunnels.stepTag(steps).as("step"))
      .where(col("step") >= 1)
      .as[(String, java.sql.Timestamp, Int)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, (String, Int)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (u, it, state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            val evs = state.getOption.map(_.events).getOrElse(Seq.empty)
            state.remove()
            Iterator.single((u, EventFunnels.levelOf(
              evs, nSteps, window, strictIncrease, strictOrder)))
          } else {
            val incoming = it.map(e => (e._2.getTime / 1000L, e._3)).toSeq
            val prior = state.getOption
            val merged = prior.map(_.events).getOrElse(Seq.empty) ++ incoming
            // anchor-bound prune: with an anchor a = min step-1 time,
            // events past a + window can never contribute (a can only
            // move EARLIER on late data, shrinking the bound further).
            // WITHOUT an anchor, events below the current watermark
            // are equally dead: any future anchor passes the late
            // filter (t >= watermark), and contributing to any level
            // or interloper count requires t >= anchor — so the
            // buffer stays watermark-bounded even for users that
            // never fire step 1.
            val anchor = merged.collect { case (t, 1) => t }
              .foldLeft(Option.empty[Long])((a, t) =>
                Some(a.fold(t)(math.min(_, t))))
            val kept = anchor match {
              case Some(a) => merged.filter { case (t, _) => t <= a + window }
              case None =>
                val wmS = state.getCurrentWatermarkMs() / 1000L
                merged.filter { case (t, _) => t >= wmS }
            }
            // lastSeen is monotone (true activity, immune to pruning)
            // so the timeout never regresses to an earlier instant
            val lastSeen = math.max(
              prior.map(_.lastSeen).getOrElse(Long.MinValue),
              incoming.map(_._1).max)
            state.update(FunnelState(kept, lastSeen))
            state.setTimeoutTimestamp(lastSeen * 1000L + hold * 1000L)
            Iterator.empty
          }
      }
  }

  /** ST10b: streaming `sequenceCount` — same skeleton (buffer
    * condition events, evaluate the shared closed form at watermark
    * timeout, Append one (user, count) row). Unlike the funnel there
    * is no window bound to prune against and every buffered event
    * contributes to the final count, so state is the user's
    * condition-matching events for the life of their activity burst —
    * the bound ClickHouse's own sequence functions carry; it is
    * released wholesale at the timeout. `tie` disambiguates
    * same-timestamp ordering exactly as the batch operator's
    * tieBreak.
    */
  def sequenceCounts(
      events: DataFrame, user: String, tsCol: String, tie: Column,
      conds: Seq[Column], pattern: String,
      watermark: String = "10 seconds", hold: Long = 10L): Dataset[(String, Long)] = {
    val spark = events.sparkSession
    import spark.implicits._
    require(conds.nonEmpty && conds.size <= 9,
      "sequence patterns support 1..9 conditions")
    events
      .withWatermark(tsCol, watermark)
      .select(col(user).cast("string").as("u"), col(tsCol).as("ts"),
        tie.cast("long").as("tie"), EventFunnels.stepTag(conds).as("step"))
      .where(col("step") >= 1)
      .as[(String, java.sql.Timestamp, Long, Int)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SeqState, (String, Long)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (u, it, state: GroupState[SeqState]) =>
          if (state.hasTimedOut) {
            val evs = state.getOption.map(_.events).getOrElse(Seq.empty)
            state.remove()
            Iterator.single((u, EventFunnels.sequenceCountOf(evs, pattern)))
          } else {
            val incoming = it.map(e =>
              (e._2.getTime / 1000L, e._3, e._4)).toSeq
            val prior = state.getOption
            val merged = prior.map(_.events).getOrElse(Seq.empty) ++ incoming
            val lastSeen = math.max(
              prior.map(_.lastSeen).getOrElse(Long.MinValue),
              incoming.map(_._1).max)
            state.update(SeqState(merged, lastSeen))
            state.setTimeoutTimestamp(lastSeen * 1000L + hold * 1000L)
            Iterator.empty
          }
      }
  }
}
