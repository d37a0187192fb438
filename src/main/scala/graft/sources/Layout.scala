package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

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

  /** Z-ORDER layout (L3): interleave-bit (Morton) clustering on TWO
    * dimensions — the OPTIMIZE ZORDER BY of Delta/Iceberg, built from
    * plain Catalyst bit arithmetic. Sorting a table by the Morton
    * code of (x, y) makes every contiguous file cover a small
    * RECTANGLE of (x, y) space instead of a thin stripe of x, so
    * min/max file statistics prune on BOTH dimensions: a box
    * predicate (x BETWEEN … AND y BETWEEN …) skips files a
    * single-column sort must read. At 100 TB this is the difference
    * between scanning one dimension's stripe (all files for a y-only
    * predicate) and scanning O(√files) — the data-skipping complement
    * of [[writeBucketed]]'s shuffle elision, measured file-count-level
    * in LayoutSpec.
    *
    * [[mortonCode]] quantizes each dimension to `bits` bits by exact
    * integer min/max scaling — ((v − min)·(2^bits − 1)) div
    * max(max − min, 1) — then interleaves with the classic
    * spread-bits magic masks. Everything is integer shift/and/or on
    * longs (codegen'd, engine-portable: the oracle writes the same
    * expressions with `//`, `<<`, `&`, `|`), no UDF.
    *
    * Scale: the (min, max) bounds per dimension are one tiny
    * aggregate broadcast back (never a collect); the sort is
    * `repartitionByRange(zval)` + within-partition sort — the
    * standard parallel write path (range exchange on sampled bounds),
    * no global single-partition sort.
    */
  def spreadBits16(c: Column): Column = {
    val m = Seq(0x00FF00FFL, 0x0F0F0F0FL, 0x33333333L, 0x55555555L)
    val s = Seq(8, 4, 2, 1)
    m.zip(s).foldLeft(c.bitwiseAND(lit(0xFFFFL))) { case (acc, (mask, sh)) =>
      acc.bitwiseOR(shiftleft(acc, sh)).bitwiseAND(lit(mask))
    }
  }

  /** Morton code of two pre-quantized values in [0, 2^16): x gets the
    * even bits, y the odd bits.
    */
  def mortonCode(x: Column, y: Column): Column =
    spreadBits16(x).bitwiseOR(shiftleft(spreadBits16(y), 1))

  /** Exact nonnegative integer division as Column arithmetic: strip
    * the remainder first so the double division is of an exact
    * multiple (exact for any inputs < 2^53) — a bare `/`+truncate
    * could round a just-under-integer quotient UP across the floor.
    */
  private def idiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /** Exact integer quantization of `v` from its [min, max] range onto
    * [0, 2^bits): ((v − min)·(2^bits − 1)) div max(max − min, 1).
    * Inputs must be integral; (max−min)·(2^bits−1) must fit 2^53 —
    * true for any 32-bit dimension at bits ≤ 16.
    */
  def quantize(v: Column, lo: Column, hi: Column, bits: Int): Column =
    idiv((v - lo) * lit((1L << bits) - 1), greatest(hi - lo, lit(1L)))

  /** Append the Morton z-value of two integral dimensions and return
    * the frame sorted for a z-ordered write: range-partitioned and
    * sorted by (zval, tiebreak). Write the result with
    * `.write.parquet(...)` — each output file then covers a rectangle
    * of (x, y) space. `partitions` ≤ 0 (the default) sizes the write
    * to the session's `defaultParallelism` — one file per core slot
    * locally, one per executor slot on a cluster; pass an explicit
    * count to target a file-size budget instead.
    */
  def zorder(
      df: DataFrame, x: Column, y: Column, tiebreak: Column,
      bits: Int = 16, partitions: Int = 0): DataFrame = {
    val nParts =
      if (partitions > 0) partitions
      else df.sparkSession.sparkContext.defaultParallelism
    val bounds = df.agg(
      min(x.cast("long")).as("xlo"), max(x.cast("long")).as("xhi"),
      min(y.cast("long")).as("ylo"), max(y.cast("long")).as("yhi"))
    val withZ = df.crossJoin(broadcast(bounds))
      .withColumn("zval", mortonCode(
        quantize(x.cast("long"), col("xlo"), col("xhi"), bits),
        quantize(y.cast("long"), col("ylo"), col("yhi"), bits)))
      .drop("xlo", "xhi", "ylo", "yhi")
    withZ.repartitionByRange(nParts, col("zval"), tiebreak)
      .sortWithinPartitions(col("zval"), tiebreak)
  }
}
