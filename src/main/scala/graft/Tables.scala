package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loader for the driver-provided star schema
  * (/root/repo/TESTDATA.md). At 100 TB these would be partitioned
  * directories (e.g. events partitioned by day); `spark.read.parquet`
  * on a directory picks that up unchanged, and every query in this
  * library filters/prunes through Catalyst so partition pruning and
  * predicate pushdown apply automatically.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Fixture generations have typed events.ts two ways: parquet
    // TIMESTAMP(NANOS), which Spark 4 refuses to read as a timestamp
    // (the legacy conf reads it as a nanosecond LongType), and plain
    // timestamp[us] (TIMESTAMP_NTZ). Downstream code is written against
    // one contract — ts is nanos-since-epoch as LongType — so normalize
    // a timestamp-typed ts here: under the pinned-UTC session,
    // unix_micros over the NTZ→TZ cast is the same wall-clock instant.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (df.columns.contains("ts") &&
        df.schema("ts").dataType.typeName.startsWith("timestamp"))
      df.withColumn("ts", unix_micros(col("ts").cast("timestamp")) * lit(1000L))
    else df
  }

  /** events.ts (nanos-as-long) → epoch seconds. The ns value (~1.7e18
    * for 2024) exceeds double's 2^53 mantissa, so float division would
    * corrupt it: strip the sub-second part with exact long arithmetic
    * first, then the decimal division is integral and exact. Matches
    * DuckDB `epoch(date_trunc('second', ts))` on the original ns
    * timestamp.
    */
  def epochSeconds(tsNanos: Column): Column = {
    val whole = tsNanos - pmod(tsNanos, lit(1000000000L))
    (whole.cast("decimal(38,0)") / lit(1000000000L)).cast("long")
  }

  /** events.ts (nanos-as-long) → second-truncated TimestampType. */
  def tsSeconds(tsNanos: Column): Column = timestamp_seconds(epochSeconds(tsNanos))
}
