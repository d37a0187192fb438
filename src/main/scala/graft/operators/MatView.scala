package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental materialized aggregates — the Summing/Aggregating
  * MergeTree sibling of W1's ReplacingMergeTree FINAL dedup. The
  * reference's README recommends ReplacingMergeTree for its
  * current-state table (`/root/reference/README.md:121`);
  * Summing/AggregatingMergeTree are the other members of ClickHouse's
  * incremental-table-semantics family: per-key aggregate STATE
  * maintained as rows arrive, finalized at read time. `VersionedDedup`
  * reproduces Replacing FINAL; this operator reproduces the
  * aggregate-state face.
  *
  * The state is a commutative monoid so ingest order, slicing, and
  * replica merges cannot change the answer:
  *
  *  - `n_rows` — long counts, merged by sum;
  *  - `sum_v` — DECIMAL(38,6) exact sum (per-row cast from the input,
  *    then exact associative decimal addition — no float
  *    reassociation drift between the incremental and direct forms);
  *  - `min_v` / `max_v` — merged by min/max;
  *  - `hll_state` — a DataSketches HLL binary (Spark
  *    `hll_sketch_agg`), merged by `hll_union_agg` — the mergeable
  *    approx-distinct every AggregatingMergeTree deployment carries;
  *  - `kll_state` — a DataSketches KLL binary
  *    ([[graft.functions.QuantileSketch]]), merged by the KLL union —
  *    the mergeable quantile state (ClickHouse `quantilesState`),
  *    which is what lets an incremental latency-percentile dashboard
  *    (the reference's insert-latency histogram,
  *    internal/metrics/metrics.go:18-24, kept as a matview) refresh
  *    from state rows instead of re-scanning raw history.
  *
  * Laws (spec-pinned, and `q_matview`'s oracle checks the exact
  * columns value-level): for ANY partition of the input rows into
  * slices,
  *
  *   mergeStates(Σ partialState(slice)) == partialState(all rows)
  *
  * exactly for n/sum/min/max; the HLL union estimate is within sketch
  * tolerance of the directly-built sketch.
  *
  * Scale shape: `partialState` is one partial+final aggregation of
  * the slice (map-side combine, one shuffle on the keys);
  * `mergeStates` shuffles only state rows — |keys| rows per slice,
  * not data rows. That asymmetry is the whole point at 100 TB: the
  * big table is aggregated once per ingest slice while the
  * maintained view merges key-cardinality-sized states.
  */
object MatView {

  val stateCols: Seq[String] =
    Seq("n_rows", "sum_v", "min_v", "max_v", "hll_state", "kll_state")

  /** One state row per key over a slice of input rows. `value` feeds
    * n/sum/min/max; `distinctOn` feeds the HLL approx-distinct.
    */
  def partialState(df: DataFrame, keys: Seq[String], value: Column,
      distinctOn: Column): DataFrame =
    df.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n_rows"),
      // decimal(28,6) per-row leaves 10 digits of sum headroom inside
      // the decimal(38,6) the aggregate widens to — the same
      // DECIMAL-exact pattern q_sum_map proved cross-engine
      sum(value.cast("decimal(28,6)")).cast("decimal(38,6)").as("sum_v"),
      min(value.cast("double")).as("min_v"),
      max(value.cast("double")).as("max_v"),
      hll_sketch_agg(distinctOn).as("hll_state"),
      graft.functions.QuantileSketch.kllAgg(value).as("kll_state"))

  /** Merge any union of state frames back to one state row per key.
    * Closed over the state schema, so chains of merges (nightly
    * compactions, replica fan-in) need no special casing.
    */
  def mergeStates(states: DataFrame, keys: Seq[String]): DataFrame =
    states.groupBy(keys.map(col): _*).agg(
      sum(col("n_rows")).as("n_rows"),
      sum(col("sum_v")).cast("decimal(38,6)").as("sum_v"),
      min(col("min_v")).as("min_v"),
      max(col("max_v")).as("max_v"),
      hll_union_agg(col("hll_state")).as("hll_state"),
      graft.functions.QuantileSketch.kllMergeAgg(col("kll_state"))
        .as("kll_state"))

  /** The read face: derived columns a dashboard queries — avg from
    * the exact sum/count, the HLL estimate — while the raw state
    * stays mergeable underneath.
    */
  def finalizeState(state: DataFrame, keys: Seq[String]): DataFrame =
    state.select(keys.map(col) ++ Seq(
      col("n_rows"), col("sum_v"), col("min_v"), col("max_v"),
      // double-rounded avg (not decimal division): engine-portable
      // and scale-stable, the q_current_state rounding convention
      round(col("sum_v").cast("double") / col("n_rows"), 4).as("avg_v"),
      hll_sketch_estimate(col("hll_state")).as("approx_distinct"),
      graft.functions.QuantileSketch.kllQuantile(col("kll_state"), 0.5)
        .as("p50_v"),
      graft.functions.QuantileSketch.kllQuantile(col("kll_state"), 0.95)
        .as("p95_v"),
      graft.functions.QuantileSketch.kllQuantile(col("kll_state"), 0.99)
        .as("p99_v")): _*)
}
