package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval AGGREGATES over one interval set — the single-table
  * complement of [[IntervalJoin]] (J5b joins two interval sets): the
  * ClickHouse `intervalLengthSum` / `maxIntersections` /
  * `maxIntersectionsPosition` family, over the session/span intervals
  * the ingested events derive (reference evidence: the events table
  * `internal/ingestion/clickhouse.go:74-96`; the functions are public
  * ClickHouse SQL surface).
  *
  * Both operators use HALF-OPEN `[start, end)` semantics. For the
  * union length, touching intervals ([1,2) then [2,3)) form one
  * contiguous cover of length 2 — no gap, so they merge into one
  * island. For intersections they do NOT count as concurrently open
  * at the shared point: the sweep processes an end at p before a
  * start at p. The convention is pinned in the spec and mirrored in
  * the oracle SQL, so both engines agree bit-for-bit.
  *
  * Scale shape: each operator pays exactly ONE per-key window sort
  * (the unavoidable sweep — interval structure is an ordering fact,
  * like W4d's deltas), with every window in the plan sharing that one
  * Exchange+Sort, then collapses in partial+final aggregates before
  * any second exchange. Interval volume reaches one shuffle, once;
  * output is |keys| (or |keys × islands| internally) rows.
  */
object IntervalAgg {

  /** `intervalLengthSum`: per key, the total length of the UNION of
    * the (possibly overlapping) intervals — gaps-and-islands: a row
    * opens a new island iff its start exceeds the running max end of
    * every earlier-sorted interval; islands then aggregate
    * independently. Touching intervals ([1,2), [2,3)) merge (no gap).
    * Null bounds are dropped; rows must satisfy start <= end.
    * Output: keys :+ (n_intervals, n_islands, union_len).
    */
  def intervalLengthSum(df: DataFrame, keys: Seq[String],
      start: Column, end: Column): DataFrame = {
    val s = start.cast("long")
    val e = end.cast("long")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__s"), col("__e"))
    val prevMax = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__s"), col("__e"))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.where(s.isNotNull && e.isNotNull)
      .withColumn("__s", s).withColumn("__e", e)
      .withColumn("__new",
        when(col("__s") > coalesce(max(col("__e")).over(prevMax),
          lit(Long.MinValue)), 1L).otherwise(0L))
      .withColumn("__island", sum(col("__new")).over(w))
      .groupBy((keys.map(col) :+ col("__island")): _*)
      .agg(count(lit(1)).as("__n"),
        (max(col("__e")) - min(col("__s"))).as("__len"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__n")).as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(col("__len")).as("union_len"))
  }

  /** `maxIntersections` + `maxIntersectionsPosition`: per key, the
    * maximum number of simultaneously-open intervals and the FIRST
    * axis position where that maximum is reached. The sweep explodes
    * each interval to (start, +1) and (end, -1) events; ordering ends
    * before starts at equal positions gives the half-open convention
    * (touching intervals never count as 2). Null bounds are dropped;
    * rows must satisfy start <= end (an empty interval [p, p)
    * contributes nothing, exactly as the sweep processes its -1
    * first). Output: keys :+ (max_intersections, position).
    */
  def maxIntersections(df: DataFrame, keys: Seq[String],
      start: Column, end: Column): DataFrame = {
    val s = start.cast("long")
    val e = end.cast("long")
    // one scan, not a union of two: each interval explodes to its
    // (start, +1) and (end, -1) sweep events inside the projection
    val pts = df.where(s.isNotNull && e.isNotNull)
      .select(keys.map(col) :+ explode(array(
        struct(s.as("__p"), lit(1L).as("__d")),
        struct(e.as("__p"), lit(-1L).as("__d")))).as("__ev"): _*)
      .select(keys.map(col) ++ Seq(
        col("__ev.__p").as("__p"), col("__ev.__d").as("__d")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__p"), col("__d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(keys.map(col): _*)
    pts.withColumn("__run", sum(col("__d")).over(w))
      .withColumn("__mx", max(col("__run")).over(whole))
      .groupBy(keys.map(col): _*)
      .agg(max(col("__run")).as("max_intersections"),
        min(when(col("__run") === col("__mx"), col("__p"))).as("position"))
  }
}
