package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** W1 / flagship: "current state" view of a versioned upsert table —
  * ClickHouse ReplacingMergeTree `FINAL` semantics, the single
  * non-trivial query operator the reference's CDC pipeline depends on
  * (reference: internal/model/cdc.go:33-41 `_op/_lsn/_ts/is_deleted`,
  * internal/ingestion/clickhouse.go:104-124, README.md:121).
  *
  * Semantics: for each key keep the row with the maximum version
  * (tiebreak columns make the winner total/deterministic), then drop
  * rows whose surviving version is a delete.
  *
  * Scale notes (100 TB posture):
  *  - One hash-partition shuffle on `keys` — unavoidable for exact
  *    per-key dedup; AQE handles skewed keys (skew-join/partition
  *    split). For heavy-hitter keys, pre-aggregate with `max_by`
  *    (see [[latestByVersionAgg]]) which does a partial (map-side)
  *    aggregate before the shuffle, shipping one candidate row per
  *    key per input partition instead of every version.
  *  - If the table is bucketed/partitioned by key on disk, the
  *    shuffle disappears (Exchange elided by EnsureRequirements).
  */
object VersionedDedup {

  /** Window (`row_number`) formulation — general, keeps the whole row. */
  def latestByVersion(
      df: DataFrame,
      keys: Seq[String],
      version: Column,
      tiebreak: Seq[Column] = Nil): DataFrame = {
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy((version.desc +: tiebreak.map(_.desc)): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Aggregate (`max_by`) formulation — partial-agg friendly: Spark
    * plans HashAggregate(partial) -> Exchange -> HashAggregate(final),
    * so each input partition ships at most one candidate per key.
    * `ordCols` must be a lexicographically comparable version vector
    * (e.g. Seq(_lsn, _op)); all non-key columns are re-emitted from the
    * winning row's packed struct.
    */
  def latestByVersionAgg(
      df: DataFrame,
      keys: Seq[String],
      ordCols: Seq[String]): DataFrame = {
    val payload = df.columns.filterNot(keys.contains).toSeq
    val packed = struct(payload.map(col): _*)
    val ord = struct(ordCols.map(col): _*)
    val agg = df
      .groupBy(keys.map(col): _*)
      .agg(max_by(packed, ord).as("__row"))
    payload.foldLeft(agg)((d, c) => d.withColumn(c, col(s"__row.$c")))
      .drop("__row")
  }

  /** FINAL view: latest version per key, deletes dropped.
    * `isDeleted` is evaluated on the surviving row.
    */
  def currentState(
      df: DataFrame,
      keys: Seq[String],
      version: Column,
      isDeleted: Column,
      tiebreak: Seq[Column] = Nil): DataFrame =
    latestByVersion(df, keys, version, tiebreak).filter(!isDeleted)

  /** W1e: batch MERGE INTO — the CDC apply face as one operator
    * (Delta/Iceberg `MERGE INTO target USING source` with the
    * latest-wins source reduction): fold one change batch into a
    * current-state table. The source is first reduced to its latest
    * row per key (the W1 rule); then matched + delete removes the
    * target row, matched + non-delete replaces it, unmatched +
    * non-delete inserts, unmatched + delete is a no-op. `target`
    * must be current-state shaped (≤ 1 row per key — e.g.
    * [[currentState]] output); the result carries the target's
    * columns and is itself current-state shaped, so batches chain:
    * mergeInto(mergeInto(t, b1), b2) ≡ applying the concatenated log
    * when versions are batch-monotone. `tiebreak` totalizes the
    * within-batch winner when a batch can carry duplicate
    * (key, version) rows — same contract as [[latestByVersion]].
    *
    * Scale: the source is a CDC batch — MBs against a TB target — so
    * the touched-key anti join broadcasts; the target is scanned
    * once, never shuffled (no window over it, unlike re-running
    * [[currentState]] over the full log), which is the operator's
    * point: apply cost is O(target scan + batch), not O(history).
    */
  def mergeInto(
      target: DataFrame, source: DataFrame, keys: Seq[String],
      version: Column, isDelete: Column,
      tiebreak: Seq[Column] = Nil): DataFrame = {
    // the upsert projection selects target.columns from the source —
    // check the precondition here so a short batch fails with the
    // missing names, not a generic unresolved-column AnalysisException
    val missing = target.columns.filterNot(source.columns.contains)
    require(missing.isEmpty,
      s"mergeInto: source is missing target column(s): ${missing.mkString(", ")}")
    val latest = latestByVersion(source, keys, version, tiebreak)
    val touched = latest.select(keys.map(col): _*)
    val upserts = latest.withColumn("__del", isDelete)
      .filter(!col("__del"))
      .select(target.columns.map(col): _*)
    target.join(touched, keys, "left_anti").unionByName(upserts)
  }

  /** W1c: SCD Type-2 history — the temporal COMPLEMENT of
    * [[currentState]]: instead of keeping only each key's latest
    * version, turn the whole change log into validity intervals
    * (Kimball's slowly-changing-dimension type 2, the standard
    * warehouse shape a CDC feed like the reference's
    * internal/ingestion/cdc.go:25-85 ultimately lands as). Each
    * non-delete change row becomes one history row valid over
    * [valid_from, valid_to): valid_from is the change's effective
    * time, valid_to is the NEXT change's effective time for the same
    * key (delete changes close their predecessor's interval but emit
    * no row of their own), and a null valid_to marks the key's
    * current, still-open version (`is_current`).
    *
    * `version` must totally order changes within a key (e.g. LSN);
    * `effectiveTs` is the business time stamped on the interval
    * bounds and need not equal the ordering column.
    *
    * Scale (100 TB posture): exactly ONE hash-partition shuffle on
    * `keys` feeding one per-key window — identical cost to the
    * flagship [[latestByVersion]]; the delete filter happens after
    * `lead` (a delete's effective time must close the predecessor)
    * but before any downstream exchange, so closed-by-delete rows
    * never travel. Point-in-time lookup over the result is a plain
    * range predicate (valid_from <= t < coalesce(valid_to, inf)),
    * which Catalyst pushes into the scan when the history is stored
    * partitioned by key or bucketed on it.
    */
  def scd2History(
      df: DataFrame,
      keys: Seq[String],
      version: Column,
      effectiveTs: Column,
      isDelete: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(version)
    df.withColumn("valid_from", effectiveTs)
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .withColumn("__del", isDelete)
      .filter(!col("__del"))
      .drop("__del")
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** W1d: point-in-time (AS OF) slice of an SCD2 history — the query
    * the history exists to answer: each key's version in force at
    * instant `t`, i.e. valid_from ≤ t < valid_to (open intervals
    * extend to +∞). `asOf(hist, +∞)` ≡ the `is_current` slice ≡
    * [[currentState]]; at any earlier `t` it is the table as the
    * warehouse saw it then — a plain range predicate Catalyst pushes
    * into the scan, zero joins, zero windows. For histories stored
    * with [[writeHistoryPartitioned]], [[asOfPartitioned]] adds the
    * bucket bounds that turn the same predicate into directory-level
    * partition pruning.
    */
  def asOf(history: DataFrame, t: Column): DataFrame =
    history.filter(col("valid_from") <= t &&
      (col("valid_to").isNull || col("valid_to") > t))

  /** Sentinel valid_to bucket for OPEN intervals (valid_to null):
    * sorts above every real epoch-second bucket, so open rows survive
    * the `vt_bucket >= bucket(t)` pruning predicate for any t.
    */
  val openBucket: Long = Long.MaxValue / 2

  private def bucketOf(c: Column, bucketSeconds: Long): Column =
    // exact floorDiv as Column arithmetic (pmod is nonnegative, so
    // the double division is of an exact multiple — no FP rounding
    // for any epoch < 2^53)
    ((c - pmod(c, lit(bucketSeconds))) / lit(bucketSeconds)).cast("long")

  /** W1d storage face: write an SCD2 history partitioned on interval
    * TIME BUCKETS — `vf_bucket = floorDiv(valid_from, bucketSeconds)`
    * and `vt_bucket = floorDiv(valid_to, bucketSeconds)` (open
    * intervals get [[openBucket]]) — so a point-in-time read prunes
    * whole directories in BOTH directions: versions born after t
    * (vf_bucket > bucket(t)) and versions dead before t
    * (vt_bucket < bucket(t)) are never listed, let alone read. Only
    * files whose interval range straddles t survive; at 100 TB of
    * accumulated history that is the difference between scanning the
    * full table and scanning roughly one bucket's worth of
    * still-in-force rows. `bucketSeconds` sizes directories: one day
    * (86400) for a CDC feed with day-scale version lifetimes.
    */
  def writeHistoryPartitioned(
      history: DataFrame, path: String, bucketSeconds: Long,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    history
      .withColumn("vf_bucket", bucketOf(col("valid_from"), bucketSeconds))
      .withColumn("vt_bucket", coalesce(
        bucketOf(col("valid_to"), bucketSeconds), lit(openBucket)))
      .write.mode(mode).partitionBy("vf_bucket", "vt_bucket").parquet(path)

  /** Point-in-time read over a [[writeHistoryPartitioned]] store.
    * The row predicate is exactly [[asOf]]; the two bucket bounds are
    * IMPLIED by it (valid_from ≤ t ⇒ vf_bucket ≤ bucket(t);
    * valid_to > t or null ⇒ vt_bucket ≥ bucket(t)) but must be
    * spelled out — Catalyst cannot infer a partition-column bound
    * through the floor-div that derived it, so the reader states the
    * derived bounds and the scan's partition filters do the pruning
    * (asserted file-count-level in VersionedDedupSpec).
    */
  def asOfPartitioned(
      spark: SparkSession, path: String, t: Long,
      bucketSeconds: Long): DataFrame = {
    val tb = Math.floorDiv(t, bucketSeconds)
    asOf(spark.read.parquet(path), lit(t))
      .where(col("vf_bucket") <= tb && col("vt_bucket") >= tb)
      .drop("vf_bucket", "vt_bucket")
  }
}
