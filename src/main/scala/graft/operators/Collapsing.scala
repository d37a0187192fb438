package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ClickHouse CollapsingMergeTree / VersionedCollapsingMergeTree
  * `FINAL` semantics — the two sign-based merge engines completing the
  * MergeTree family next to Replacing (VersionedDedup), Summing /
  * Aggregating (MatView), and TTL (Ttl): the table engines the
  * reference's target database offers for exactly the CDC feed it
  * ingests (reference: internal/ingestion/clickhouse.go:74-124 writes
  * plain MergeTree; the collapsing engines are the public ClickHouse
  * alternative for the same upsert/delete stream).
  *
  * Write contract (ClickHouse's): a state writer cancels the previous
  * state row by re-writing an exact copy with `sign = -1` before
  * writing the replacement with `sign = +1`; a delete is a cancel with
  * no replacement. `FINAL` then shows, per sorting key, the latest
  * still-uncancelled state — or nothing when every state was
  * cancelled.
  *
  * Scale notes (100 TB posture): both faces are pure partial+final
  * hash aggregates on the sorting key — the filtered `max_by` packs a
  * single winning-candidate struct map-side, so the one unavoidable
  * key shuffle carries ≤ 1 candidate row + one running sign count per
  * key per input partition, never the raw ±1 row pairs. No window, no
  * join, no second exchange ([[collapseVersionedFinal]] adds one more
  * partial-agg level keyed (key, version), same shape). AQE's skew
  * split handles pathological keys; a table bucketed on the sorting
  * key elides the exchange entirely.
  */
object Collapsing {

  /** CollapsingMergeTree `FINAL`: per `keys`, keep the `ordCols`-latest
    * `sign = +1` row iff the key's net sign is positive (a writer that
    * cancelled every state — net ≤ 0 — leaves nothing; duplicate
    * cancels over-subtract exactly as in ClickHouse, whose docs call
    * that a writer bug, not an engine guarantee). `sign` must evaluate
    * to +1/-1; `ordCols` is the lexicographic version vector that makes
    * "latest" total (same contract as VersionedDedup.latestByVersionAgg).
    * Output: `keys` then the winner's payload columns (sign dropped —
    * a FINAL row is by definition an uncancelled +1).
    */
  def collapseFinal(
      df: DataFrame,
      keys: Seq[String],
      sign: Column,
      ordCols: Seq[String]): DataFrame = {
    val payload = df.columns.filterNot(keys.contains).toSeq
    val packed = struct(payload.map(col): _*)
    val ord = struct(ordCols.map(col): _*)
    // max_by skips null ordering values, so gating BOTH arguments on
    // sign = +1 restricts the winner search to state rows while the
    // ungated sum counts cancels too — one aggregate, two views.
    val agg = df
      .groupBy(keys.map(col): _*)
      .agg(
        sum(sign).as("__net"),
        max_by(when(sign === 1, packed), when(sign === 1, ord)).as("__row"))
      .filter(col("__net") > 0 && col("__row").isNotNull)
    payload.foldLeft(agg)((d, c) => d.withColumn(c, col(s"__row.$c")))
      .drop("__row", "__net")
  }

  /** VersionedCollapsingMergeTree `FINAL`: cancels only annihilate the
    * matching `(keys, version)` pair — out-of-order delivery of the
    * cancel and the next state cannot mis-collapse, which is the whole
    * point of the versioned engine. Per (keys, version) the net sign
    * decides survival; per key the max surviving version wins. Two
    * stacked partial+final aggregates, both map-side-combining; the
    * first's state is one candidate struct + a long per (key, version),
    * the second's one per key.
    */
  def collapseVersionedFinal(
      df: DataFrame,
      keys: Seq[String],
      sign: Column,
      versionCols: Seq[String]): DataFrame = {
    val payload =
      df.columns.filterNot(c => keys.contains(c) || versionCols.contains(c)).toSeq
    val packed = struct(payload.map(col): _*)
    val perVersion = df
      .groupBy((keys ++ versionCols).map(col): _*)
      .agg(
        sum(sign).as("__net"),
        max_by(when(sign === 1, packed), when(sign === 1, packed)).as("__row"))
      .filter(col("__net") > 0 && col("__row").isNotNull)
    val ver = struct(versionCols.map(col): _*)
    val full = struct((versionCols.map(col) :+ col("__row")): _*)
    val agg = perVersion
      .groupBy(keys.map(col): _*)
      .agg(max_by(full, ver).as("__win"))
    val unpackVersion = versionCols.foldLeft(agg)(
      (d, c) => d.withColumn(c, col(s"__win.$c")))
    payload.foldLeft(unpackVersion)(
      (d, c) => d.withColumn(c, col(s"__win.__row.$c")))
      .drop("__win")
  }
}
