package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan assertions (SURVEY.md §4.2 "verify with explain"):
  * the 100 TB posture is checked, not assumed — pushdown reaches the
  * scan, small dims broadcast, top-k avoids the full sort, partial
  * aggregation runs before the shuffle.
  */
class PlanSpec extends SparkSpec with NeedsTestdata {

  private val sf = "/root/testdata/sf0.001"
  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("S3: filter is pushed to the parquet scan and columns pruned") {
    val p = plan(SparkEntry.queries("q_scan_project")(spark, sf))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate"),
      s"no pushed filter in:\n$p")
    assert(p.contains("ReadSchema") && !p.contains("l_comment"),
      "scan should not read unprojected columns")
  }

  test("J1: dimension joins are broadcast (no shuffle of the fact side)") {
    val p = plan(SparkEntry.queries("q_join_broadcast")(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"expected BroadcastHashJoin:\n$p")
  }

  test("O1: order-by + limit plans TakeOrderedAndProject, not a global sort") {
    val p = plan(SparkEntry.queries("q_topk")(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), s"expected TakeOrderedAndProject:\n$p")
  }

  test("A6: aggregation is partial -> final (map-side combine before shuffle)") {
    val p = plan(SparkEntry.queries("q1_agg")(spark, sf))
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"expected partial+final agg:\n$p")
  }

  test("whole-stage codegen applies to the scan-filter-project pipeline") {
    // executedPlan stringifies as an unfinalized AdaptiveSparkPlan with
    // no codegen markers; codegen explain mode compiles the subtrees
    val df = SparkEntry.queries("q_filter_events")(spark, sf)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(p.contains("WholeStageCodegen"), s"expected codegen:\n$p")
  }

  test("J5: range join broadcasts the band table (BroadcastNestedLoopJoin)") {
    val p = plan(SparkEntry.queries("q_join_range")(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin"), s"expected BNLJ:\n$p")
  }

  test("X3: brute-force top-k broadcasts the query side") {
    val p = plan(SparkEntry.queries("q_cosine_topk")(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query side should broadcast:\n$p")
  }

  test("Q3 shape: top-k over the aggregate plans TakeOrderedAndProject") {
    val p = plan(SparkEntry.queries("q_join_q3")(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), s"expected TakeOrderedAndProject:\n$p")
  }

  test("Q5 shape: region/nation dims broadcast in the 6-table join") {
    val p = plan(SparkEntry.queries("q_join_q5")(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast dims:\n$p")
  }

  test("X2: simhash pair verify is codegen'd bit_count(xor), not an interpreted HOF") {
    val p = plan(SparkEntry.queries("q_simhash_pairs")(spark, sf))
    assert(p.contains("bit_count"), s"expected bit_count verify:\n$p")
    assert(!p.contains("zip_with") && !p.contains("aggregate("),
      s"HOF lambda (CodegenFallback) must not be on the pair-verify path:\n$p")
  }

  test("X3: IVF corpus-cell assignment is a partial+final min_by agg, not a window sort") {
    val p = plan(SparkEntry.queries("q_ann_ivf")(spark, sf))
    // min_by over struct(-distance, cent_id): argmax on distance with an
    // ascending id tiebreak that works for any orderable id type
    assert(p.contains("min_by"), s"expected min_by argmax assignment:\n$p")
    // exactly one Window remains: the query-side keep=nProbe ranking
    // and the final per-query top-k (the |corpus|*nlist side must not
    // sort); centroid selection is a TakeOrdered, not a global sort
    assert(p.contains("TakeOrderedAndProject"), s"centroids via TakeOrdered:\n$p")
  }

  test("A28: ANOVA is two hash aggregates end to end — no Window touches raw volume") {
    val p = plan(SparkEntry.queries("q_anova")(spark, sf))
    assert(!p.contains("Window"), s"ANOVA must not plan a window:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      s"expected two partial+final aggregate pairs:\n$p")
  }

  test("X12c: bounded sample plans an ObjectHashAggregate; no Window over raw volume") {
    val p = plan(SparkEntry.queries("q_sample_bounded")(spark, sf))
    assert(p.contains("ObjectHashAggregate"),
      s"expected the BoundedSample aggregate:\n$p")
    assert(!p.contains("Window"),
      s"the bounded form must not fall back to a window sort:\n$p")
  }

  test("X3: LSH ANN joins bucket keys with a broadcast query side, no cross product") {
    val p = plan(SparkEntry.queries("q_ann_lsh")(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"bucket join should broadcast queries:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"LSH path must never form the all-pairs product:\n$p")
  }

  test("X3: LSH near-dup pairs equi-join on (table, bucket), no cross product") {
    val p = plan(SparkEntry.queries("q_embed_neardup_lsh")(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"blocked near-dup must not form the all-pairs product:\n$p")
    assert(p.contains("float_dot"), s"verify must use the codegen dot:\n$p")
  }

  test("P1: the CDC envelope parse stays behind its Generate barrier (no from_json inlining)") {
    // without the explode(array(...)) barrier, CollapseProject inlines
    // the CodegenFallback from_json into every star-expanded output
    // column — 16 copies measured, 40% slower; the single-eval
    // conditional form has exactly 4 textual occurrences
    val p = SparkEntry.queries("q_cdc_translate")(spark, sf)
      .queryExecution.optimizedPlan.toString
    val n = "from_json".r.findAllIn(p).size
    assert(n <= 4, s"from_json inlined $n times — the parse-once barrier regressed:\n$p")
  }

  test("J6: as-of join is one shuffle (union+window), no nested-loop join") {
    val p = plan(SparkEntry.queries("q_join_asof")(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"as-of must not materialize the cross product:\n$p")
    assert(p.contains("RunningWindowFunction") || p.contains("Window"),
      s"expected running window:\n$p")
  }

  test("X6: semantic decon broadcasts the benchmark; the corpus side never shuffles pre-agg") {
    val p = plan(SparkEntry.queries("q_decon_semantic")(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"benchmark embeddings must broadcast:\n$p")
    assert(p.contains("float_dot"), s"scoring must use the codegen dot:\n$p")
  }

  test("X11b: temperature mix broadcasts the derived rate table back onto the corpus") {
    val p = plan(SparkEntry.queries("q_temperature_mix")(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      s"rates (|domains| rows) must broadcast, never shuffle the corpus:\n$p")
  }

  test("X2: span dedup shuffles md5 gram hashes, not w-token strings") {
    val p = SparkEntry.queries("q_strip_spans")(spark, sf)
      .queryExecution.optimizedPlan.toString
    // the gram string must be consumed by md5 BEFORE any exchange:
    // the aggregate keys on the hash column, so no plan node carries
    // the raw gram past the projection that hashes it
    assert(p.contains("md5"), s"grams must be hashed:\n$p")
    val ep = plan(SparkEntry.queries("q_strip_spans")(spark, sf))
    assert(!ep.contains("CartesianProduct"),
      s"span dedup must never self-join the corpus:\n$ep")
  }

  test("X6-X13: the composite curation pipeline is one plan, filter before window") {
    val p = plan(SparkEntry.queries("q_curation_pipeline")(spark, sf))
    assert(!p.contains("CartesianProduct"), s"no cross product:\n$p")
    assert(p.contains("Window"), s"packing window must be present:\n$p")
    // the repetition filter joins are equi-joins on doc_id (broadcast
    // or shuffled) — row pruning happens before the packing window
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"repetition stats must run partial+final:\n$p")
  }

  test("X4: vocab top-k plans TakeOrderedAndProject over partial-agg counts") {
    val p = plan(SparkEntry.queries("q_vocab")(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k, not global sort:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final count agg:\n$p")
  }

  test("J2d: salted skew join keys the shuffle on (key, salt) with an exploded small side") {
    // at test SF the replicated dim is broadcastable, which would hide
    // the salted-shuffle shape the operator exists for — force the
    // shuffle form the way a too-big-to-broadcast dim would at scale
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan(SparkEntry.queries("q_join_skew")(spark, sf))
      assert(p.contains("__salt"), s"join must key on the salt column:\n$p")
      assert(p.contains("Generate explode"),
        s"small side must replicate via explode(sequence):\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"expected a shuffled equi-join on (key, salt):\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("X17: chunking is generate-over-scan — no exchange except the presentation sort") {
    val p = plan(SparkEntry.queries("q_chunk_overlap")(spark, sf))
    assert(p.contains("Generate posexplode"), s"expected posexplode windows:\n$p")
    assert("Exchange".r.findAllIn(p).size <= 1,
      s"chunking must not shuffle beyond the final orderBy:\n$p")
  }

  test("A9: pivot plans partial+final aggregation, no distinct-discovery job") {
    val p = plan(SparkEntry.queries("q_pivot")(spark, sf))
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"pivot counts must combine map-side:\n$p")
    // pinned values: the plan is a single agg over the scan — an
    // unpinned pivot would show a separate collect-distinct subtree
    assert("Scan parquet".r.findAllIn(p).size == 1,
      s"pinned pivot must scan once:\n$p")
  }

  test("W6: the funnel's window stack rides ONE user-keyed exchange + sort") {
    val p = plan(SparkEntry.queries("q_funnel")(spark, sf))
    // three dependent Window operators (l1..l3) but a single Sort and
    // a single hashpartitioning(user_id) exchange feeding them; the
    // only other exchanges are the tiny level histogram + presentation
    assert("Window".r.findAllIn(p).size >= 3, s"expected stacked windows:\n$p")
    assert("hashpartitioning\\(user_id".r.findAllIn(p).size == 1,
      s"funnel must exchange on user exactly once:\n$p")
    assert("Sort \\[user_id".r.findAllIn(p).size <= 1,
      s"the window stack must reuse one sort:\n$p")
  }

  test("W8: sequenceCount groups-then-orders inside ONE ObjectHashAggregate — no window shuffle") {
    val p = plan(SparkEntry.queries("q_sequence_count")(spark, sf))
    assert(p.contains("ObjectHashAggregate"), s"expected collect_list agg:\n$p")
    assert(!p.contains("Window"), s"sequence build must not use a window:\n$p")
    assert("Exchange".r.findAllIn(p).size <= 2,
      s"one user exchange + presentation sort only:\n$p")
  }

  test("A13: the topK sketch exchanges O(capacity) buffers, not rows") {
    val p = plan(SparkEntry.queries("q_topk_freq")(spark, sf))
    assert(p.contains("partial_topk"), s"expected partial sketch agg:\n$p")
    assert(p.contains("SinglePartition"),
      s"final agg merges per-task buffers on one partition:\n$p")
    // the sketch replaces a per-key groupBy: no hashpartitioning of
    // the item column anywhere
    assert(!p.contains("hashpartitioning(event_type"),
      s"sketch must not shuffle by item:\n$p")
  }

  test("X6b: the Bloom probe is a codegen filter inside the corpus scan stage") {
    requireTestdata()
    val docs = graft.Tables.table(spark, sf, "documents")
    val p = plan(graft.operators.Curation.decontaminateBloom(
      docs.where(col("doc_id") % 10 =!= 0),
      docs.where(col("doc_id") % 10 === 0),
      "doc_id", col("text"), 6))
    assert(p.contains("getbit"), s"expected bitmap probe:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"expected verify join:\n$p")
    // the probe must sit BELOW the join (filter side), i.e. inside
    // the same codegen stage as the corpus explode — no exchange
    // between the scan and the bloom filter
    val probeIdx = p.indexOf("getbit")
    val joinIdx = p.indexOf("BroadcastHashJoin")
    assert(probeIdx > joinIdx,
      s"probe should appear under the join in the plan tree:\n$p")
  }

  test("J2e: a selective dim predicate injects a runtime bloom pre-filter on the fact side") {
    // at 100 TB a shuffle join against a filtered dim moves the WHOLE
    // fact table unless the dim's selectivity reaches the fact scan;
    // Catalyst's InjectRuntimeFilter turns the dim filter into a
    // bloom_filter_agg subquery + might_contain guard on the fact
    // side, cutting shuffle volume to ~matching rows. The size
    // thresholds are production-tuned, so the scan-size floor is
    // zeroed here to reproduce the big-cluster decision at test SF
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevE = spark.conf.getOption("spark.sql.optimizer.runtime.bloomFilter.enabled")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val ev = Tables.table(spark, sf, "events")
      val dim = Tables.table(spark, sf, "customer")
        .where(col("c_acctbal") > 9000).select(col("c_custkey"))
      val p = ev.join(dim, ev("user_id") === dim("c_custkey"))
        .queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain") && p.contains("bloom_filter_agg"),
        s"expected a runtime bloom filter on the fact side:\n$p")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      prevE match {
        case Some(v) => spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", v)
        case None => spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.enabled")
      }
      spark.conf.unset(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    }
  }

  test("J9: bloom-pruned join equals the plain join and probes below the join") {
    requireTestdata()
    val li = Tables.table(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    val orders = Tables.table(spark, sf, "orders")
      .where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val pruned = graft.operators.BloomJoin.prunedEquiJoin(
      li, orders, "l_orderkey", "o_orderkey")
    val p = plan(pruned)
    assert(p.contains("getbit"), s"expected bitmap probe:\n$p")
    // probe sits on the big side's scan stage, under the join
    assert(p.indexOf("getbit") > p.indexOf("Join"),
      s"probe should appear under the join:\n$p")
    val plainRows = li.join(orders,
      li("l_orderkey") === orders("o_orderkey")).count()
    assert(pruned.count() === plainRows,
      "bloom pruning must be invisible in the result")
    // the prune actually removed rows before the join at this
    // selectivity (1-URGENT is ~1/5 of orders)
    val kept = li.where(graft.functions.Bloom.mightContain(
      graft.functions.Bloom.build(orders, col("o_orderkey")),
      col("l_orderkey"))).count()
    assert(kept < li.count(),
      s"prefilter kept all ${li.count()} rows — no pruning happened")
  }

  test("J9: non-inner/semi join types are rejected (exactness guard)") {
    import spark.implicits._
    val a = Seq((1L, "x")).toDF("k", "v")
    val b = Seq((1L, "y")).toDF("j", "w")
    intercept[IllegalArgumentException] {
      graft.operators.BloomJoin.prunedEquiJoin(a, b, "k", "j", "left")
    }
  }
}
