package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed connected components over a pair table — the missing
  * last step of every near-dup dedup pipeline (X1/X2/X3): candidate
  * generation emits PAIRS (`Dedup.minhashNearDup`,
  * `Dedup.simhashNearDup`, `Similarity.lshNearDupPairs`), but a
  * curation pass must drop all-but-one document per duplicate GROUP,
  * and near-dup similarity is not transitive-closed — a~b and b~c
  * without a~c still must collapse to one survivor. The reference has
  * no analogue (it implements no relational operators at all,
  * SURVEY.md §0); this is a north-star extension like the rest of
  * §2.10.
  *
  * Algorithm: min-label contraction (the star-contraction family of
  * Kiveris et al. "Connected Components in MapReduce and Beyond",
  * SoCC 2014; cf. Rastogi et al., ICDE 2013). Round 1 gives every
  * node the min of itself and its neighbors (one aggregation over the
  * symmetrized edge table), then CONTRACTS: every edge is rewritten
  * to (label(a), label(b)), self-loops dropped, duplicates removed.
  * Dense near-dup quasi-cliques — the dominant structure in an X2/X3
  * pair table — collapse to their minimum in that single round, so
  * the surviving edge table shrinks geometrically; later rounds
  * repeat min + contract on the residue, with each round's relabel
  * map resolved to a fixpoint by pointer-jumping over the (small)
  * active-representative set before it is applied. This replaces the
  * previous frontier-propagation form, whose floor was re-joining the
  * FULL edge table every round: here the full table is touched once
  * (the round-1 contraction) and every later round pays only for
  * still-unmerged inter-cluster edges.
  *
  * Scale posture at 100 TB: the full edge table is shuffled a bounded
  * number of times (symmetrize + round-1 min + the two round-1
  * rewrite joins), never per-round; all per-round state (contracted
  * edges, relabel maps) shrinks monotonically, and the global label
  * table is only ever touched by a join against the per-round relabel
  * map — which AQE broadcasts once the active set is small, the
  * common case after round 1. Fixpoint checks (`edges == 0`, `changed
  * == 0`) ride each round's `localCheckpoint` job as `observe()`
  * metrics — no separate count pass. Each round's result is
  * `localCheckpoint`ed: iterative self-referential plans otherwise
  * grow the lineage exponentially and re-execute every prior round at
  * each action. On a multi-executor cluster prefer reliable
  * `checkpoint` (HDFS-backed) for fault tolerance; local checkpoints
  * trade lineage-replay recovery for speed, the right default in an
  * interactive session.
  */
object GraphOps {

  /** Connected components of the undirected graph whose edges are
    * `pairs(src, dst)`. Returns one row per node that appears in at
    * least one edge: (node, cluster_id) where cluster_id is the
    * MINIMUM node id in the component — deterministic, engine-portable
    * (no Spark-internal hashing), and directly usable as the canonical
    * survivor id. Nodes with no edges are their own singleton
    * clusters; they are not emitted (callers that need them union the
    * isolated ids — [[dedupByCluster]] handles this implicitly via its
    * anti-join).
    *
    * Converges when the contracted edge table is empty; `maxIters` is
    * a safety bound on contraction rounds — chains resolve by pointer
    * halving within each round, so 20 rounds cover any residual
    * diameter up to ~2^20 hops, far past any real near-dup graph.
    */
  def connectedComponents(
      pairs: DataFrame, src: String, dst: String,
      maxIters: Int = 20): DataFrame = {
    def metricLong(o: org.apache.spark.sql.Observation, key: String): Long =
      o.get.getOrElse(key, null) match {
        case null => 0L // empty frame → no observed row → no change
        case n: java.lang.Number => n.longValue()
      }
    // materialize the pair table BEFORE symmetrizing: `pairs` is
    // usually the OUTPUT of a whole candidate+verify pipeline (LSH
    // signatures, bucket join, exact verify), and a union of two
    // projections of the raw plan executes that pipeline once per
    // branch — the single largest cost of every CC consumer, since
    // the upstream dwarfs the graph work (measured at 30×: the
    // pipeline is ~90% of cc_clusters wall). Checkpoint the pairs
    // once; the symmetrized view then reads cached blocks twice.
    val p0 = pairs.select(col(src).as("a"), col(dst).as("b"))
      .localCheckpoint()
    // symmetrize: min-label must flow both ways along an edge. No
    // distinct yet — the round-1 contraction below dedups in label
    // space, where self-loops are already gone, so a distinct here
    // would pay a full extra shuffle for volume the contraction drops
    // anyway. NOT checkpointed (r21): it is a map-only union over the
    // already-checkpointed p0, so its two consumers recompute it from
    // cached blocks for free — the old eager checkpoint here was one
    // whole extra job per CC call for bytes p0 already holds.
    val sym = p0.union(p0.select(col("b").as("a"), col("a").as("b")))

    // Round 1, fused: with round-0 labels all identities, the first
    // min is label_1(a) = min(a, min_nbr(a)) — one aggregation over
    // sym, no label join. LAZY checkpoint (r21): still truncates the
    // lineage for the loop rounds, but materializes inside the round-1
    // contraction job below instead of paying its own job — on a
    // quasi-clique pair graph (the common dedup shape) the loop never
    // runs and CC round 1 is now two jobs (p0, edges), not four.
    var labels = sym.groupBy(col("a").as("node"))
      .agg(min(col("b")).as("nmin"))
      .select(col("node"), least(col("node"), col("nmin")).as("comp"))
      .localCheckpoint(eager = false)

    // Round-1 contraction — the ONLY full-width edge pass: rewrite
    // every edge to (label(a), label(b)), drop self-loops, dedup.
    // Dense quasi-cliques whose min touches every member collapse
    // here outright (all edges become self-loops), so the surviving
    // table holds only inter-cluster / chain structure. Invariant
    // kept from here on: every `comp` value is either a settled root
    // (label(v) = v, no surviving edges) or a node still present in
    // `edges` — so the per-round relabel fold below reaches every
    // dangling pointer.
    val e0 = org.apache.spark.sql.Observation("cc_edges_0")
    var edges = sym
      .join(labels.select(col("node").as("na"), col("comp").as("la")),
        col("a") === col("na"))
      .join(labels.select(col("node").as("nb"), col("comp").as("lb")),
        col("b") === col("nb"))
      .select(col("la").as("a"), col("lb").as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
      .observe(e0, count(lit(1L)).as("edges"))
      .localCheckpoint()
    p0.unpersist()
    var remaining = metricLong(e0, "edges")
    var iters = 1
    while (remaining > 0 && iters < maxIters) {
      // min over contracted neighbors — a shuffle over the RESIDUAL
      // edge table only, then pointer-halve the relabel map against
      // itself until idempotent (nl(nl(n)) == nl(n)). The map's
      // domain is the active representative set, which shrinks
      // geometrically, so these self-joins are small; resolving fully
      // here is what lets the label fold below stay a single join per
      // round with no end-of-loop resolution pass.
      var nl = edges.groupBy(col("a").as("n"))
        .agg(min(col("b")).as("mb"))
        .select(col("n"), least(col("n"), col("mb")).as("c"))
        .localCheckpoint()
      var chains = 1L
      var hops = 0
      while (chains > 0 && hops < maxIters) {
        val o = org.apache.spark.sql.Observation(s"cc_ptr_${iters}_$hops")
        val next = nl
          .join(nl.select(col("n").as("rn"), col("c").as("rc")),
            col("c") === col("rn"), "left")
          .select(col("n"), col("c").as("c0"),
            coalesce(col("rc"), col("c")).as("c"))
          .observe(o, sum(when(col("c") =!= col("c0"), 1L).otherwise(0L))
            .as("changed"))
          .select(col("n"), col("c"))
          .localCheckpoint()
        chains = metricLong(o, "changed")
        nl.unpersist()
        nl = next
        hops += 1
      }
      // contract: rewrite surviving edges through the resolved map,
      // drop self-loops (merged clusters vanish), dedup parallel
      // edges. Fixpoint check rides the checkpoint job as observe().
      val eo = org.apache.spark.sql.Observation(s"cc_edges_$iters")
      val nextEdges = edges
        .join(nl.select(col("n").as("na"), col("c").as("ca")),
          col("a") === col("na"))
        .join(nl.select(col("n").as("nb"), col("c").as("cb")),
          col("b") === col("nb"))
        .select(col("ca").as("a"), col("cb").as("b"))
        .where(col("a") =!= col("b"))
        .distinct()
        .observe(eo, count(lit(1L)).as("edges"))
        .localCheckpoint()
      // fold the round's relabels into the global table: comp values
      // outside the map are settled roots and pass through. AQE
      // broadcasts nl once the active set is small — the common case
      // after round 1 — making this a map-side pass over labels.
      val prev = labels
      labels = labels
        .join(nl.select(col("n").as("rn"), col("c").as("rc")),
          col("comp") === col("rn"), "left")
        .select(col("node"), coalesce(col("rc"), col("comp")).as("comp"))
        .localCheckpoint()
      prev.unpersist()
      edges.unpersist()
      nl.unpersist()
      edges = nextEdges
      remaining = metricLong(eo, "edges")
      iters += 1
    }
    edges.unpersist()
    labels
  }

  /** Near-dup dedup, end to end: keep exactly one document per
    * connected near-dup cluster (the one with the minimum id) plus
    * every document that is in no pair at all. `pairs` is any
    * candidate+verify pair table over `docs(id)` — X2/X3 output plugs
    * in directly.
    *
    * Scale: the loser set is (cluster size - 1) summed over clusters —
    * proportional to the DUPLICATED mass, typically a few percent of
    * the corpus — so the anti-join broadcasts when small and degrades
    * to a single co-partitioned shuffle otherwise; the corpus is never
    * shuffled more than once and never collected.
    */
  def dedupByCluster(
      docs: DataFrame, id: String,
      pairs: DataFrame, src: String, dst: String,
      maxIters: Int = 20): DataFrame = {
    val losers = connectedComponents(pairs, src, dst, maxIters)
      .where(col("comp") =!= col("node"))
      .select(col("node").as(id))
    docs.join(losers, Seq(id), "left_anti")
  }

  /** Near-dup cluster diagnostics — the report a dedup pipeline reads
    * before committing to a survivor rule: for each cluster SIZE, how
    * many clusters have it and how many documents they hold. Sizes
    * count PAIRED nodes only (singletons never enter the pair table;
    * their count is `|corpus| − Σ docs_in_clusters`, a subtraction the
    * caller can do against its own corpus count). The duplicated mass
    * = Σ (size − 1) over clusters = docs a min-survivor dedup would
    * drop.
    *
    * Scale: CC's output is one row per paired node (the duplicated
    * mass, not the corpus); both aggregations after it are partial-agg
    * shuffles over that bounded set, the second over ≤ max-cluster-size
    * distinct keys.
    */
  def clusterSizeStats(
      pairs: DataFrame, src: String, dst: String,
      maxIters: Int = 20): DataFrame = {
    connectedComponents(pairs, src, dst, maxIters)
      .groupBy(col("comp")).agg(count(lit(1)).as("size"))
      .groupBy(col("size"))
      .agg(count(lit(1)).as("n_clusters"),
        (count(lit(1)) * col("size")).as("n_docs"))
      .select(col("size"), col("n_clusters"), col("n_docs"))
  }

  /** Quality-weighted cluster survivor — [[dedupByCluster]] with the
    * survivor rule a production pipeline actually wants: per near-dup
    * cluster keep the member with the HIGHEST `score` (tie → minimum
    * id), not the arbitrary min-id member. The min-id rule exists for
    * oracle-ability; this rule keeps the longest/cleanest/highest-LM
    * copy of each duplicated document, which is the whole point of
    * choosing a survivor.
    *
    * Contract: every node in `pairs` must appear in `docs` (the pair
    * table is derived FROM the corpus, so this holds by construction
    * for every X2/X3 producer); a paired id missing from `docs` would
    * silently leave its cluster via the inner membership join. Rows
    * with a null `score` are excluded from the winner contest (a null
    * would otherwise sort ahead of every real score under the struct
    * ordering and steal the survivorship) but still lose to whichever
    * scored member wins — the conservative reading of "no defined
    * quality"; a cluster whose members are ALL unscored elects no
    * winner and is kept whole.
    *
    * Scale: identical shape to [[dedupByCluster]] plus one
    * cluster-keyed partial-agg argmax over the CLUSTER MEMBERS only
    * (the duplicated mass, not the corpus): members join their scores
    * (id-keyed, co-partitioned with the label table), `min_by` over
    * (−score, id) picks the winner with map-side combine — no window,
    * no per-cluster sort. The corpus still shuffles at most once in
    * the final anti-join.
    */
  def dedupByClusterBest(
      docs: DataFrame, id: String, score: Column,
      pairs: DataFrame, src: String, dst: String,
      maxIters: Int = 20): DataFrame = {
    val members = connectedComponents(pairs, src, dst, maxIters)
    val scored = members.join(
      docs.select(col(id).as("node"), score.as("__q")), Seq("node"))
    // winner contest over non-null scores only: a null __q negates to
    // null, and nulls sort FIRST in ascending struct comparison, so an
    // unguarded min_by would crown the unscored member
    val winners = scored.where(col("__q").isNotNull).groupBy(col("comp"))
      .agg(min_by(col("node"), struct((-col("__q")).as("nq"), col("node")))
        .as("winner"))
    val losers = scored.join(winners, Seq("comp"))
      .where(col("node") =!= col("winner"))
      .select(col("node").as(id))
    docs.join(losers, Seq(id), "left_anti")
  }

  /** X2e: triangle enumeration over an undirected edge set — the
    * cluster-SHAPE read on the near-dup pair graph: connected
    * components say "these belong together", triangle density says
    * HOW (a star — one template page linking near-copies — has zero
    * triangles; a true clique of mutual near-dups is triangle-dense),
    * which is the confidence signal behind choosing a survivor rule.
    *
    * Algorithm: the degree-ordered "forward" method (Schank & Wagner
    * 2005) as three equi-joins — orient every edge toward the higher
    * (degree, id) rank, form wedges at each source between its two
    * out-neighbours ordered by rank, close each wedge with the
    * oriented (v → w) edge. Each triangle's vertices have a unique
    * rank order, so it is emitted EXACTLY once; the orientation
    * bounds per-vertex out-degree by O(√|E|), which is what caps the
    * wedge volume on the skewed degree distributions dedup graphs
    * have (a naive id-ordered wedge join explodes on one hub vertex).
    * No window, no collect — degree table + three shuffled equi-joins.
    * Output: one row per triangle, vertices as (a, b, c) ascending.
    */
  def triangles(edges: DataFrame, src: String, dst: String): DataFrame = {
    // cached: the edge set feeds the degree count and both sides of
    // the wedge/closure joins — without the cache an expensive
    // upstream pair pipeline (LSH near-dup) re-derives per reference
    val und = edges
      .select(least(col(src), col(dst)).as("u"),
        greatest(col(src), col(dst)).as("v"))
      .where(col("u") < col("v")).distinct().cache()
    CacheLifecycle.releaseAfterAction(trianglesFromUnd(und), und)
  }

  /** [[triangles]] over an already-canonicalized (u < v, distinct)
    * edge frame; the caller owns caching.
    */
  private def trianglesFromUnd(und: DataFrame): DataFrame = {
    val deg = und.select(explode(array(col("u"), col("v"))).as("x"))
      .groupBy(col("x")).agg(count(lit(1)).as("d"))
    val withDeg = und
      .join(deg.select(col("x").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("x").as("v"), col("d").as("dv")), Seq("v"))
    val uLower = struct(col("du"), col("u")) < struct(col("dv"), col("v"))
    val oriented = withDeg.select(
      when(uLower, col("u")).otherwise(col("v")).as("s"),
      when(uLower, col("v")).otherwise(col("u")).as("t"),
      when(uLower, col("dv")).otherwise(col("du")).as("dt"))
    val wedges = oriented.select(col("s"), col("t").as("w1"), col("dt").as("d1"))
      .join(oriented.select(col("s"), col("t").as("w2"), col("dt").as("d2")),
        Seq("s"))
      .where(struct(col("d1"), col("w1")) < struct(col("d2"), col("w2")))
    wedges
      .join(oriented.select(col("t").as("w2"), col("s").as("w1")),
        Seq("w1", "w2"), "left_semi")
      .select(array_sort(array(col("s"), col("w1"), col("w2"))).as("__t"))
      .select(col("__t")(0).as("a"), col("__t")(1).as("b"),
        col("__t")(2).as("c"))
  }

  /** X2e: local clustering coefficient per node — triangles through
    * the node over its wedge capacity deg·(deg−1)/2: the per-node
    * form of the cluster-shape read (a template hub scores ~0, a
    * clique member 1). Derived from [[triangles]] (one explode + one
    * count per node) joined onto the degree table; degree-1 nodes
    * have no wedges → null coefficient. Output: (node, degree,
    * n_triangles, coeff round-6).
    */
  def clusteringCoefficient(edges: DataFrame, src: String,
      dst: String): DataFrame = {
    val und = edges
      .select(least(col(src), col(dst)).as("u"),
        greatest(col(src), col(dst)).as("v"))
      .where(col("u") < col("v")).distinct().cache()
    val deg = und.select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
    val perNode = trianglesFromUnd(und)
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
    val out = deg.join(perNode, Seq("node"), "left")
      .na.fill(0L, Seq("n_triangles"))
      .withColumn("coeff",
        when(col("degree") > 1, round(
          col("n_triangles").cast("double") * 2.0 /
            (col("degree") * (col("degree") - 1)).cast("double"), 6)))
    CacheLifecycle.releaseAfterAction(out, und)
  }
}
