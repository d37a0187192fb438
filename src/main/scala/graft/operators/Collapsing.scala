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

  /** When `sign` is a plain column reference, its name — so the
    * vestigial constant sign column can be excluded from the FINAL
    * payload. A computed sign expression has no column to exclude.
    */
  private def signName(sign: Column): Option[String] =
    org.apache.spark.sql.graftshim.ColumnBridge.expression(sign) match {
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        Some(a.name)
      case _ => None
    }

  /** CollapsingMergeTree `FINAL`: per `keys`, keep the `ordCols`-latest
    * `sign = +1` row iff the key's net sign is positive (a writer that
    * cancelled every state — net ≤ 0 — leaves nothing; duplicate
    * cancels over-subtract exactly as in ClickHouse, whose docs call
    * that a writer bug, not an engine guarantee). `sign` must evaluate
    * to +1/-1; `ordCols` is the lexicographic version vector that makes
    * "latest" total (same contract as VersionedDedup.latestByVersionAgg).
    * Output: `keys` then the winner's payload columns. When `sign` is a
    * plain column reference it is dropped from the payload (a FINAL row
    * is by definition an uncancelled +1, so the column would be the
    * constant 1); a computed sign expression leaves the input columns
    * untouched.
    */
  def collapseFinal(
      df: DataFrame,
      keys: Seq[String],
      sign: Column,
      ordCols: Seq[String]): DataFrame = {
    val drop = signName(sign)
    val payload =
      df.columns.filterNot(c => keys.contains(c) || drop.contains(c)).toSeq
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
    *
    * Candidate rule within one (keys, version): by the ClickHouse write
    * contract every surviving `+1` row of a version is an identical
    * copy, so the default picks any state row (constant ordering —
    * works for any payload type, including non-orderable maps). Callers
    * whose writers CAN emit distinct duplicates pass `ordCols` to make
    * the pick deterministic; those columns must then be orderable.
    */
  def collapseVersionedFinal(
      df: DataFrame,
      keys: Seq[String],
      sign: Column,
      versionCols: Seq[String],
      ordCols: Seq[String] = Nil): DataFrame = {
    val drop = signName(sign)
    val payload = df.columns.filterNot(c =>
      keys.contains(c) || versionCols.contains(c) || drop.contains(c)).toSeq
    val packed = struct(payload.map(col): _*)
    val candOrd: Column =
      if (ordCols.isEmpty) lit(1) else struct(ordCols.map(col): _*)
    val perVersion = df
      .groupBy((keys ++ versionCols).map(col): _*)
      .agg(
        sum(sign).as("__net"),
        max_by(when(sign === 1, packed), when(sign === 1, candOrd)).as("__row"))
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
