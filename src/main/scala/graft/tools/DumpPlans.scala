package graft.tools

import graft.SparkEntry
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Regenerates PLANS.md: `explain("formatted")` for the annotated
  * pick list (sf0.001 inputs; plan shape is scale-independent).
  * Usage: runMain graft.tools.DumpPlans
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.001"
    val picks = Seq(
      "q_scan_project" -> "S3/P8 -- pushdown + pruning reach the parquet scan",
      "q1_agg" -> "A3/A6 -- partial->final hash aggregation (map-side combine)",
      "q_join_broadcast" -> "J1 -- dims broadcast; the fact side never shuffles",
      "q_join_asof" -> "J6 -- as-of via union + one shuffle + running window (no LxR blowup)",
      "q_join_skew" -> "J8 -- salted skew join: small side replicated per salt via explode(sequence) (Generate below the join build side). At this SF the planner broadcasts the replicated dim -- salting then costs nothing; when the dim is too big to broadcast (the case salting exists for) the join shuffles on (key, salt) so one hot key spreads over N reducers instead of melting one -- that shape is pinned in PlanSpec with broadcast disabled",
      "q_current_state" -> "W1 flagship -- FINAL semantics: one hash partition by key",
      "q_topk" -> "O1 -- TakeOrderedAndProject, no global sort",
      "q_cosine_topk" -> "X3 -- broadcast query side + codegen float_dot scoring",
      "q_join_q5" -> "J1b -- 6-table star+snowflake: dims broadcast, facts shuffle once each",
      "q_embed_neardup_lsh" -> "X3 scale path -- candidate stages shuffle id-only pairs (no vector payloads); vectors join back only for the cosine verify",
      "q_cdc_translate" -> "P1-P6 -- one narrow stage, from_json evaluated once behind the Generate barrier, consulted-fields-only envelope schema",
      "q_strip_spans" -> "X2 span dedup -- grams shuffle as fixed-width md5 hashes, never w-token strings; stats via partial agg; corpus reconstructs map-only (q_dedup_clusters is iterative -- the pair pipeline materializes once, one full-width contraction pass rewrites edges to label space, later rounds touch only the shrinking residue, see GraphOps scaladoc)",
      "q_curation_pipeline" -> "X6-X13 composite -- scrub, repetition filter, split, pack fused into one plan: three column-pruned corpus scans (no CSE across join branches), doc_id-keyed equi-joins, repetition filter prunes before the shard-scoped packing window, no intermediate corpus materialized",
      "q_budget_select" -> "X15 -- global budget prefix WITHOUT a global sort: the only single-partition window runs over the per-score aggregate (|distinct scores| rows); offsets broadcast back onto the corpus, the __prev <= budget filter prunes whole score buckets before the corpus-side window, and that window exchanges hashpartitioning(score) -- parallel, never SinglePartition",
      "q_line_filter" -> "X14 -- C4 line cleaning is one map-only project over the scan: the only exchange is the registered query's final presentation orderBy (rangepartitioning); the operator itself never shuffles, asserted in CurationSpec. The higher-order filter lambda is interpreted but stays inside the scan's project stage",
      "q_resample_fill" -> "O4 -- WITH FILL parity: raw events collapse to a (key, bucket) partial+final agg BEFORE any grid stage (the only scan of the input); the sequence explode and left join are sized by the output grid and co-partitioned on the join keys; the forward fill is one window per key",
      "q_resample_step" -> "O4 STEP/INTERPOLATE arm -- same agg-first shape; the stride grid unions the OBSERVED buckets (one extra distinct over output-grid-sized rows, skipped entirely at step=1), and interpolation adds prev/next-observed tracking on the SAME (key, bucket) exchange as the forward fill: the plan has ONE Exchange before the window stack, and the three Window operators (ffill+prev share the preceding frame, next needs the following frame) reuse that one sort -- INTERPOLATE costs zero extra shuffles",
      "q_funnel" -> "W6 windowFunnel -- the level minima are N stacked whole-partition Window operators over ONE user-keyed Exchange + Sort (each level consumes the previous, so they stay separate operators, but none re-sorts or re-shuffles); the per-user max(level) agg rides the SAME user hash with no exchange, and the only other shuffle is the final level histogram -- (levels+1) rows per task",
      "q_sequence_count" -> "W8 sequenceCount -- group-then-order WITHOUT a window shuffle: sort_array(collect_list(struct(t, tie, step))) builds each user's ordered digit string inside ONE ObjectHashAggregate (partial collect map-side, final after the single user-keyed Exchange); the regex count is a map-only project on the aggregate output",
      "q_topk_freq" -> "A13 topK sketch -- the Misra-Gries Aggregator plans as partial ObjectHashAggregate -> single-partition final: every partition reduces to an O(capacity) counter map, so the Exchange moves 32 tiny structs (one per task), not rows -- the 100 TB heavy-hitters shape (contrast: exact GROUP BY event_type shuffles |distinct| rows, fine here, fatal at high cardinality)",
      "q_histogram_eq" -> "A2c equi-depth histogram -- two deliberate corpus passes: pass 1 collapses to |groups| quantile-edge rows (partial+final percentile agg), pass 2 re-scans with the edge table BROADCAST back (BroadcastHashJoin, no corpus shuffle) and assigns bins via a codegen HOF over the <=5-element edge array; the only row-count-sized exchange is the final (group, bin) partial+final count -- at 100 TB the edge table is |groups|x(bins+1) doubles, always broadcastable",
      "q_decontam_bloom" -> "X6b Bloom decontamination -- the bitmap probe (xxhash64 double hashing + getbit on one array<long> plan constant) sits INSIDE the corpus scan's filter stage, below the verify BroadcastHashJoin: clean grams die in the scan without ever reaching the join, and the join's probe volume is ~|hits| + FP%*|clean| instead of |corpus grams|; the benchmark side is computed once (cached across the bitmap build and the join build side)",
      "q_funnel_any" -> "W6d any-anchor funnel -- the exact existence DP (max anchor per level) runs as an aggregate() HOF over sort_array(collect_list(struct(t, step))) INSIDE one user-keyed ObjectHashAggregate: partial collect map-side, single Exchange, the whole per-user scan evaluated in the final aggregate's projection -- no Window operator, no second shuffle; the level histogram is the only other (tiny) exchange. Same shape carries q_funnel_gap's per-step-gap DP",
      "q_funnel_capped" -> "W6f skew-guarded funnel -- the maxEventsPerUser row_number Window rides the SAME user-keyed Exchange the DP aggregate uses (ONE hashpartitioning(user) exchange in the whole plan), and its rn <= cap Filter sits BETWEEN the window and the ObjectHashAggregate: per-user collect_list state is bounded at cap rows before any collect happens -- the hot-user guard costs a sort, never a shuffle",
      "q_funnel_multi" -> "W6e multi-tag funnel -- ClickHouse every-satisfied-condition tagging is a Generate (explode of the <=nSteps-element satisfied-step array) INSIDE the scan's narrow stage, below the one user-keyed Exchange: overlapping conditions multiply rows by at most the step count BEFORE the shuffle, and the stacked window minima shape is identical to q_funnel's from the Exchange up",
      "q_matview" -> "A14 incremental materialized aggregate -- each ingest slice collapses to |keys| state rows via its own partial+final aggregate (map-side combine), the Union then feeds the merge aggregate whose input is 3x|keys| STATE rows, not data rows: the merge stage's exchange moves kilobytes at any corpus size -- the asymmetry AggregatingMergeTree exists for (ObjectHashAggregate carries the HLL binary union)",
      "q_bm25" -> "X19 BM25 retrieval -- the isin(query terms) Filter sits directly on the exploded token Generate inside the corpus scan's narrow stage, so every downstream exchange is |matched postings|-sized, never |corpus tokens|; corpus stats (N, avgdl) and per-term df are broadcast tiny aggregates (BroadcastHashJoin / BroadcastNestedLoopJoin over 1-row and |terms|-row sides); the per-doc score sum is one partial+final aggregate over matches and the top-k is TakeOrderedAndProject -- no global sort, no posting-list materialization",
      "q_semdedup" -> "X18 SemDeDup -- centroid assignment is the IVF shape (corpus x BroadcastNestedLoopJoin(centroids), partial-agg min_by argmax: no window, no corpus sort), computed ONCE into an operator-scoped cache (InMemoryTableScan feeds both pair sides and the output join; CacheLifecycle releases it after the consuming action); the pair stage shuffles on hashpartitioning(cell) and the quadratic cosine work runs inside cell-local SortMergeJoin blocks (|D|^2/nlist pair mass at the sqrt-n default); the dup-flag join is id-only (vectors never re-shuffle) and the distinct dup-id side is aggregate-bounded, broadcastable at scale",
      "q_join_interval" -> "J5b interval overlap join -- each interval side explodes to its covered time buckets inside its own narrow stage (Generate below the join), the join itself is EQUI on the bucket id with the exact-overlap verify and the first-shared-bucket exactly-once rule evaluated in the join condition: a hash/sort-merge join Spark can shuffle-partition and AQE can skew-split, where the raw theta predicate would plan BroadcastNestedLoopJoin and distribute nothing",
      "q_join_asof_near" -> "J6d nearest as-of -- the same union + ONE user-keyed Exchange + ONE Sort as the directional arms; the backward running carry (last over preceding frame) and the forward probe (first over following frame) are two frames over that single sort inside the Window stage, and the smaller-gap pick is a map-only projection: no join, no second shuffle, |L|+|R| rows end to end",
      "q_boilerplate_lines" -> "X20 cross-doc boilerplate -- the doc-frequency pass is the plan's one line-keyed exchange (partial distinct + count combine map-side over the exploded lines); the frequent set -- provably bounded by avgLinesPerDoc/minDocFrac -- broadcasts into a LeftAnti BroadcastHashJoin so the corpus is never shuffled by line for the removal; order-preserving reassembly is one doc-keyed ObjectHashAggregate over (pos, line) structs",
      "q_shuffle_shard" -> "X21 training shuffle-shard -- ONE hashpartitioning(shard) Exchange + per-shard Sort + row_number Window: exactly the repartition(shard).sortWithinPartitions(key) write path a shard writer runs, parallelism = shard count, no global-order window anywhere",
      "q_scd2" -> "W1c SCD2 history -- identical plan skeleton to the W1 flagship: ONE hashpartitioning(user_id) Exchange + per-key Sort feeding a single Window (lead), the delete Filter applied after the window but before any further exchange; the validity-interval view costs exactly the current-state view's shuffle",
      "q_dsir_select" -> "X22 DSIR -- both bucket-distribution aggregates collapse to <= 256 rows via partial+final HashAggregate (map-side combine over the exploded bigrams), the log-ratio table is a BroadcastHashJoin build side (bounded by the bucket constant, never by data), scoring is the second corpus scan -> broadcast join -> doc-keyed partial agg, and the top-400 is TakeOrderedAndProject -- no corpus self-join, no window over data rows",
      "q_anomaly" -> "W4c rolling z-score -- raw events collapse to the (type, day) partial+final count agg FIRST; the z-score window (count/sum/sum-of-squares over the 7-PRECEDING frame) runs over that aggregate-sized table on one hashpartitioning(event_type) Exchange -- the window never sees event volume",
      "q_zorder" -> "S8/L3 z-order -- the (min, max) bounds are a 1-row aggregate broadcast back (BroadcastNestedLoopJoin over the single row, never a collect); quantize + spread-bits + interleave are pure codegen'd integer ops inside one Project; the clustering sort is rangepartitioning(zval) -- the parallel write path, no single-partition sort",
      "q_join_bloom" -> "J9 bloom-pruned join -- the xxhash64+getbit bitmap probe is a Filter inside the fact scan's codegen stage, BELOW the join: rows that cannot match die before the exchange, so the join moves ~|matches|+FP% instead of |fact| (the 30x task-metrics measurement: 3,000,056 -> 3,135 exchange rows); no false negatives makes the result bit-identical to the plain join, which IS the oracle",
      "q_funnel_time" -> "W6g conversion lag -- the SAME funnelCore stacked-minima Window stack as q_funnel on ONE user-keyed Exchange + Sort; the latency view only changes the collapse aggregate (level, anchor, deepest-level time), so the marginal cost over the level histogram is zero shuffles",
      "q_decontam_frac" -> "X6c graded decontamination -- same broadcast asymmetry as q_decontaminate but a LEFT BroadcastHashJoin (clean grams must reach the denominator), one doc-keyed partial+final agg computes count and hit-sum together; the fraction is a map-only projection on the aggregate output -- the corpus is exploded once and never shuffled by gram",
      "q_paragraph_dedup" -> "X24 corpus-global paragraph dedup -- the keeper table is ONE line-keyed partial+final min(struct(doc,pos)) aggregate (hot lines -- the 100%-df empty/boilerplate lines -- collapse in the map-side combine before the exchange); the keep-decision is a LeftSemi join keyed on the full (line, doc, pos) triple, so every join key matches at most one row and line skew never reaches it; reassembly is the X20 doc-keyed (pos, line) struct-sort aggregate",
      "q_merge_upsert" -> "W1e MERGE INTO -- the target is scanned once and NEVER windowed: the batch reduces to latest-per-key in its own (batch-sized) Window, its touched-key projection feeds a LeftAnti join against the target, and the survivors union in -- apply cost is O(target scan + batch) where re-running currentState over the concatenated log would re-shuffle and re-sort the full history every batch",
      "q_oov_rate" -> "X4b OOV rate -- the vocab side collapses to 256 rows (partial+final count agg + TakeOrderedAndProject) and broadcasts; the corpus side is explode -> BroadcastHashJoin LEFT -> doc-keyed partial+final agg: occurrence-level coverage with zero token-keyed shuffles of the corpus",
      "q_join_point_range" -> "J5c point-in-range join -- ranges explode to covered buckets in their narrow stage (Generate below the join), each point computes its ONE bucket map-only, and the join is EQUI on the bucket id with the exact lo <= p < hi verify in the condition: a shuffle-partitionable hash join (AQE-skew-splittable) where the raw theta predicate would plan a nested loop; no dedup anywhere because a point has exactly one bucket",
      "q_ohlc" -> "W9 OHLC resample -- ONE partial+final ObjectHashAggregate: min_by/max_by carry (value, (ts, tie)) pairs through the map-side combine so the exchange moves one candidate per (key, bucket) per task, and the plan contains zero Window operators -- the first/last-value window formulation would exchange and sort the full event volume for the same four numbers")
    val sb = new StringBuilder
    sb ++= "# PLANS -- physical-plan evidence for the 100 TB posture\n\n"
    sb ++= "`explain(\"formatted\")` output (sf0.001 inputs; plan shape is scale-independent).\n"
    sb ++= "Generated by tools/DumpPlans -- regenerate after operator changes.\n"
    for ((name, why) <- picks) {
      val df = SparkEntry.queries(name)(spark, sf)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        // elide giant array literals (the Bloom bitmap constant) -- the
        // shape matters here, not 64k longs of bitmap
        .replaceAll("\\[[-0-9,\\s]{500,}\\]", "[<large array literal elided>]")
      sb ++= s"\n## $name\n\n$why\n\n```\n$plan```\n"
    }
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    println("PLANS_WRITTEN=" + sb.length)
    spark.stop()
  }
}
