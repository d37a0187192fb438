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

  def resampleFill(
      df: DataFrame, key: String, bucket: Column, value: Column): DataFrame = {
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
    val grid = spans.select(col(key),
      explode(sequence(col("mn"), col("mx"))).as("bucket"))
    val joined = grid.join(counts, Seq(key, "bucket"), "left")
      .na.fill(0L, Seq("cnt"))
    val w = Window.partitionBy(col(key)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    CacheLifecycle.releaseAfterAction(
      joined
        .withColumn("avg_ffill", last(col("avg_value"), ignoreNulls = true).over(w))
        .drop("avg_value"),
      counts)
  }
}
