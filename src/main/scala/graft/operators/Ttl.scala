package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** L4: age-based lifecycle — ClickHouse MergeTree `TTL` semantics
  * for the ingested tables the reference lands
  * (internal/ingestion/clickhouse.go's events table would carry
  * exactly this in production):
  *
  *  - `TTL ts + INTERVAL d DELETE` → [[expire]]: rows older than the
  *    horizon drop;
  *  - `TTL ts + INTERVAL d GROUP BY keys SET v = sum(v), ...` →
  *    [[rollup]]: rows past the horizon COLLAPSE to one aggregate
  *    row per (keys, coarse bucket) while younger rows stay raw —
  *    the "raw for a week, daily beyond" storage policy every
  *    metrics warehouse runs.
  *
  * Both take the reference instant as a COLUMN (`asOf`) rather than
  * wall-clock `now()`: the maintenance job pins one instant for the
  * whole pass (deterministic, replayable, oracle-checkable), exactly
  * how a TTL merge materializes one consistent cutoff.
  *
  * [[rollup]] output schema is uniform across both regimes — keys ++
  * (`row_id` nullable, `ts`, `n_rows`, `sum_v` DECIMAL(38,6)-exact,
  * `min_v`, `max_v`, `is_rolled`): a fresh row is the degenerate
  * aggregate of itself (n_rows = 1, sum = min = max = value, its own
  * row id and timestamp), a rolled row is the bucket aggregate with a
  * null row id and the bucket-start timestamp — so readers aggregate
  * the table uniformly and totals are invariant under the policy
  * (Σ sum_v and Σ n_rows equal the raw table's, the spec law).
  *
  * Scale shape: one age predicate splits the scan — on time-
  * partitioned storage each branch prunes to ITS partitions, so the
  * rollup pass reads old partitions once and rewrites them
  * aggregate-sized; the fresh branch is map-only and the rolled
  * branch is one partial+final aggregate on (keys, bucket). No
  * window, no shuffle of fresh rows.
  */
object Ttl {

  /** TTL DELETE: keep rows within `ttlSeconds` of `asOf` (a row
    * expires when ts + ttl < asOf — the ClickHouse boundary).
    */
  def expire(df: DataFrame, ts: Column, ttlSeconds: Long,
      asOf: Column): DataFrame = {
    require(ttlSeconds > 0, s"ttlSeconds must be positive: $ttlSeconds")
    df.where(ts.cast("long") + ttlSeconds >= asOf.cast("long"))
  }

  /** TTL GROUP BY: rows older than `ttlSeconds` collapse to one
    * aggregate row per (keys, `bucketSeconds` bucket); younger rows
    * pass through as degenerate aggregates of themselves (`rowId`
    * identifies them; rolled rows carry a null id).
    */
  def rollup(df: DataFrame, keys: Seq[String], rowId: Column,
      ts: Column, value: Column, ttlSeconds: Long, bucketSeconds: Long,
      asOf: Column): DataFrame = {
    require(ttlSeconds > 0, s"ttlSeconds must be positive: $ttlSeconds")
    require(bucketSeconds > 0, s"bucketSeconds must be positive: $bucketSeconds")
    val t = ts.cast("long")
    val isOld = t + ttlSeconds < asOf.cast("long")
    val dec = value.cast("decimal(28,6)")
    val fresh = df.where(!isOld).select((keys.map(col) ++ Seq(
      rowId.cast("long").as("row_id"),
      t.as("ts"),
      lit(1L).as("n_rows"),
      dec.cast("decimal(38,6)").as("sum_v"),
      value.cast("double").as("min_v"),
      value.cast("double").as("max_v"),
      lit(false).as("is_rolled"))): _*)
    val rolled = df.where(isOld)
      .groupBy((keys.map(col) :+ (t - pmod(t, lit(bucketSeconds))).as("ts")): _*)
      .agg(
        count(lit(1)).as("n_rows"),
        sum(dec).cast("decimal(38,6)").as("sum_v"),
        min(value.cast("double")).as("min_v"),
        max(value.cast("double")).as("max_v"))
      .select((keys.map(col) ++ Seq(
        lit(null).cast("long").as("row_id"),
        col("ts"), col("n_rows"), col("sum_v"), col("min_v"),
        col("max_v"), lit(true).as("is_rolled"))): _*)
    fresh.unionByName(rolled)
  }
}
