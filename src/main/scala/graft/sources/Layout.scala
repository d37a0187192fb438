package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Physical-layout helpers for the 100 TB posture (task spec:
  * "co-located joins via bucketing", "repartition/bucketing").
  *
  * Bucketing pre-hash-partitions a table on its join/agg key at WRITE
  * time; any later equi-join or groupBy on that key between tables
  * with the same bucket count runs with NO Exchange on either side
  * (EnsureRequirements recognizes the matching HashPartitioning).
  * For a fact table joined every day on the same key, this converts
  * the per-query shuffle of the big side into a one-time write cost —
  * the single biggest shuffle lever available to a recurring pipeline.
  *
  * Verified in LayoutSpec: the bucketed fact⋈fact join plan contains
  * zero shuffle exchanges.
  */
object Layout {

  /** Write `df` as a bucketed+sorted managed table. `buckets` should
    * match across tables that will join (and be sized so one bucket
    * of the biggest table fits an executor: rows/buckets ≈ task
    * input).
    */
  def writeBucketed(
      df: DataFrame, table: String, key: String, buckets: Int,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write
      .mode(mode)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Hash-repartition by key — the runtime (non-persistent) form of
    * the same co-location, for one-shot multi-use of an intermediate:
    * repartition once, then several joins/aggs on the same key reuse
    * the partitioning without further exchanges.
    */
  def colocate(df: DataFrame, key: String, partitions: Int): DataFrame =
    df.repartition(partitions, df(key))
}
