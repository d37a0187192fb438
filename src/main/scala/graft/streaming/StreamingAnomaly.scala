package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** ST12: streaming rolling z-score anomaly detection — the streaming
  * face of `TimeSeries.rollingZScore` (W4c), emitting one verdict row
  * per (key, closed bucket) as the event-time watermark finalizes
  * each bucket. The monitoring alert the reference's observability
  * plane (§3.3) implies, computed on the stream instead of a nightly
  * batch.
  *
  * Design: per key, open buckets accumulate counts as micro-batches
  * arrive (out-of-order within the watermark lands in the right
  * bucket — only the bucket id of an event matters, never arrival
  * order); a bucket is CLOSED — counted, scored, emitted, appended to
  * the trailing ring — once the watermark passes its end, so its
  * count can no longer change and the emitted verdict is final
  * (Append semantics). The score arithmetic is the scalar twin of the
  * batch operator's column expression tree: same exact integer sums,
  * same fixed double ops, same round(6) — parity is spec-asserted
  * row-for-row against `rollingZScore` on the identical events.
  *
  * State bound (the 100 TB posture): per key, at most `lookback`
  * closed (bucket, count) pairs — the baseline ring — plus the open
  * buckets inside the watermark horizon. Both are CONSTANTS per key
  * (horizon/bucketSeconds buckets at worst), never history-sized:
  * closing a bucket folds its events into one long before anything
  * is retained. An event-time timeout set to the earliest open
  * bucket's end keeps buckets closing even when a key goes quiet.
  */
object StreamingAnomaly {

  /** One finalized verdict; z/isAnomaly are None during warm-up
    * (fewer than minN trailing buckets) or on a σ²≈0 baseline —
    * exactly the batch operator's null rows.
    */
  case class ZAlert(key: String, bucket: Long, cnt: Long,
    z: Option[Double], isAnomaly: Option[Boolean])

  /** open: bucket id → partial count (still inside the watermark);
    * closed: trailing ring of finalized (bucket, count), ascending,
    * at most `lookback` entries.
    */
  case class ZState(open: Map[Long, Long], closed: Seq[(Long, Long)])

  /** Scalar twin of rollingZScore's column arithmetic: exact long
    * sums, one fixed double expression tree, HALF_UP round(6) —
    * Spark's `round` semantics.
    */
  def zOf(ring: Seq[Long], x: Long, minN: Int,
      threshold: Double): (Option[Double], Option[Boolean]) = {
    val n = ring.size
    if (n < minN) (None, None)
    else {
      val nn = n.toDouble
      val sm = ring.sum.toDouble
      val ss = ring.map(c => c * c).sum.toDouble
      val vr = (ss - sm * sm / nn) / (n - 1).toDouble
      if (vr > 1e-9) {
        val z = BigDecimal((x.toDouble - sm / nn) / math.sqrt(vr))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (Some(z), Some(math.abs(z) > threshold))
      } else (None, None)
    }
  }

  /** `events` must carry an event-time column `tsCol`; the watermark
    * set here both bounds disorder and drives bucket finalization.
    * Buckets are `floor(epochSeconds / bucketSeconds)` — the same
    * integral grid as the batch query's day_id.
    */
  def zScoreAlerts(
      events: DataFrame, key: String, tsCol: String,
      bucketSeconds: Long, lookback: Int, minN: Int = 3,
      threshold: Double = 2.0,
      watermark: String = "10 seconds"): Dataset[ZAlert] = {
    val spark = events.sparkSession
    import spark.implicits._
    require(bucketSeconds >= 1 && lookback >= 2 && minN >= 2,
      s"bad config: bucketSeconds=$bucketSeconds lookback=$lookback minN=$minN")
    events
      .withWatermark(tsCol, watermark)
      .select(col(key).cast("string").as("k"), col(tsCol).as("ts"))
      .as[(String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[ZState, ZAlert](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (k, it, state: GroupState[ZState]) =>
          val prior = state.getOption.getOrElse(ZState(Map.empty, Seq.empty))
          // fold new events into open buckets (empty on a timeout call)
          val open0 = it.foldLeft(prior.open) { case (m, (_, t)) =>
            val b = math.floorDiv(t.getTime / 1000L, bucketSeconds)
            m.updated(b, m.getOrElse(b, 0L) + 1L)
          }
          // a bucket is final once the watermark passes its end:
          // b < floor(wm / bucketSeconds) ⟺ (b+1)·bucketSeconds ≤ wm
          val wmB = math.floorDiv(
            state.getCurrentWatermarkMs() / 1000L, bucketSeconds)
          val (done, open) = open0.partition { case (b, _) => b < wmB }
          var ring = prior.closed
          val out = done.toSeq.sortBy(_._1).map { case (b, c) =>
            val (z, flag) = zOf(ring.map(_._2), c, minN, threshold)
            ring = (ring :+ (b, c)).takeRight(lookback)
            ZAlert(k, b, c, z, flag)
          }
          state.update(ZState(open, ring))
          // wake when the earliest open bucket becomes closable; a
          // key with no open buckets sleeps (its ring persists for
          // the next activity burst)
          if (open.nonEmpty)
            state.setTimeoutTimestamp((open.keys.min + 1) * bucketSeconds * 1000L)
          out.iterator
      }
  }
}
