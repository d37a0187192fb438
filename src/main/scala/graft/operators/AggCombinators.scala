package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ClickHouse aggregate-combinator surface — `groupArray(N)`,
  * `groupUniqArray`, `sumMap` — over the reference's ingested tables
  * (the analytics ClickHouse serves once rows land via
  * `/root/reference/internal/ingestion/clickhouse.go:74,107`; the
  * function family is public ClickHouse SQL surface).
  *
  * Determinism discipline: ClickHouse's own groupArray is
  * fold-order-dependent ("values are added in an indeterminate
  * order") — useless for a value-oracled engine. Every combinator
  * here imposes a caller-supplied total order INSIDE the aggregate
  * (sort_array over collected structs), so the result is a pure
  * function of the input set. One user-keyed partial+final
  * aggregation each — collect_list/collect_set partial-aggregate
  * map-side, so the shuffle carries per-group arrays, not rows.
  *
  * Scale bound (same as ClickHouse's): per-group state is the
  * group's collected values — callers cap it with `limit` semantics
  * at the query level when groups can be pathological.
  */
object AggCombinators {

  /** `groupArray`: values as an array ordered by `order` (made total
    * by appending the value itself as the last sort key), optionally
    * truncated to the first `limit` elements — ClickHouse
    * `groupArray(limit)(v)` with a deterministic order. Use inside
    * `.agg(...)`.
    */
  def groupArray(value: Column, order: Seq[Column],
      limit: Option[Int] = None): Column = {
    val fields = order.zipWithIndex.map { case (c, i) => c.as(s"__o$i") } :+
      value.as("__v")
    val sorted = sort_array(collect_list(struct(fields: _*)))
    val vals = transform(sorted, e => e("__v"))
    limit.fold(vals)(n => slice(vals, 1, n))
  }

  /** `groupUniqArray`: distinct values, ascending — collect_set's
    * nondeterministic order repaired by array_sort. Use inside
    * `.agg(...)`.
    */
  def groupUniqArray(value: Column): Column = array_sort(collect_set(value))

  /** `sumMap`: per group-key, point-wise sum of a map column — the
    * ClickHouse `sumMap(m)` combinator. Explode → re-aggregate →
    * reassemble sorted-by-key, so map equality is structural.
    * Two partial+final aggregations keyed (group, mapKey) then
    * (group); both partial-aggregate map-side, and the second's
    * state is the group's distinct key set (the map's natural size).
    * Groups whose maps are all empty/null survive with an empty map
    * (explode_outer keeps their row as a null entry; collect_list
    * drops the null struct, and map_from_entries of the empty array
    * is `{}`) — ClickHouse keeps such groups too. Returns
    * `keys :+ sum_map`.
    */
  /** `sumForEach`: per group-key, element-wise sum of an array column
    * — ClickHouse's `-ForEach` combinator applied to `sum`, the
    * aggregate that folds a table of equal-length vectors (feature
    * counts per position, per-dimension embedding stats) into one
    * vector per group. Position-keyed re-aggregation of the exploded
    * elements, then reassembly sorted by position — the same
    * mergeable two-level shape as [[sumMap]] (positions ARE map keys
    * here), so both levels partial-aggregate map-side and the shuffle
    * carries (group × dim) partial sums, never rows. Ragged inputs
    * follow ClickHouse: the result has the length of the LONGEST
    * array, shorter arrays contributing nothing to the tail
    * positions. Null/empty-array groups survive with an empty array.
    * Returns `keys :+ sum_foreach` (element order preserved; Spark's
    * posexplode position is 0-based, but only the order matters —
    * position never surfaces in the output). The intermediate explode
    * columns are aliased `__pos`/`__elem` so grouping keys named
    * `pos`/`col` cannot collide.
    */
  def sumForEach(df: DataFrame, keys: Seq[String], arr: Column): DataFrame = {
    val keyCols = keys.map(col)
    df.select(keyCols :+ posexplode_outer(arr).as(Seq("__pos", "__elem")): _*)
      .groupBy(keyCols :+ col("__pos"): _*)
      .agg(sum(col("__elem")).as("__s"))
      .groupBy(keyCols: _*)
      .agg(transform(sort_array(collect_list(
        when(col("__pos").isNotNull, struct(col("__pos"), col("__s"))))),
        e => e("__s")).as("sum_foreach"))
  }

  def sumMap(df: DataFrame, keys: Seq[String], mapCol: Column): DataFrame = {
    val keyCols = keys.map(col)
    df.select(keyCols :+ explode_outer(mapCol).as(Seq("__k", "__v")): _*)
      .groupBy(keyCols :+ col("__k"): _*)
      .agg(sum(col("__v")).as("__s"))
      .groupBy(keyCols: _*)
      .agg(map_from_entries(sort_array(collect_list(
        when(col("__k").isNotNull, struct(col("__k"), col("__s"))))))
        .as("sum_map"))
  }
}
