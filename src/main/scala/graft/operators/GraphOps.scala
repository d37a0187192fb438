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
  * Algorithm: iterated min-label propagation with path halving — each
  * round every node takes the smallest label among itself, its
  * neighbors (one shuffle join + min-aggregate on the symmetrized
  * edge table), and its current label's OWN label (a second join:
  * pointer jumping). The pointer-jump step is what turns the naive
  * O(diameter) round count into O(log diameter) — label distance to
  * the component minimum better-than-doubles per round (the spec
  * drives a 33-node path to a fixpoint in <=10 rounds) — the same
  * doubling idea as the Hash-to-Min / two-phase CC algorithms of
  * Rastogi et al. (ICDE 2013) and Kiveris et al. "Connected
  * Components in MapReduce and Beyond" (SoCC 2014), recast as two
  * DataFrame joins per round so Catalyst/AQE plan each one.
  *
  * Scale posture at 100 TB: every round is two equi-joins keyed on
  * node ids (shuffle-partitioned alike, no broadcast of anything
  * O(|V|)), and the label set only ever shrinks toward component
  * minima — no state grows. Near-dup graphs in practice are dense
  * quasi-cliques of tiny diameter, so 3-5 rounds converge; the
  * fixpoint check (`changed == 0`) is an `observe()` metric collected
  * by the SAME job that materializes the round's checkpoint — one job
  * per round, no separate count pass. Each round's result is
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
    * Converges when no label changes; `maxIters` is a safety bound —
    * with path halving, 20 rounds cover any component diameter up to
    * ~2^20 hops, far past any real near-dup graph.
    */
  def connectedComponents(
      pairs: DataFrame, src: String, dst: String,
      maxIters: Int = 20): DataFrame = {
    // symmetrize: min-label must flow both ways along an edge. No
    // distinct — duplicate edges are harmless under min-aggregation
    // and deduplicating them here would cost a full extra shuffle.
    // localCheckpoint: `pairs` is usually the OUTPUT of a whole
    // candidate+verify pipeline (LSH signatures, bucket join, exact
    // verify); without materializing it here, every propagation round
    // would re-execute that entire upstream pipeline twice (measured
    // 11.6 s vs 4.2 s for q_dedup_clusters at sf0.1).
    val sym = pairs.select(col(src).as("a"), col(dst).as("b"))
      .union(pairs.select(col(dst).as("a"), col(src).as("b")))
      .localCheckpoint()

    // Round 1 fused into initialization: with round-0 labels all
    // identities, the first neighbor-min is label_1(a) = min(a,
    // min_nbr(a)) — one aggregation over sym, no label join — and the
    // first pointer jump resolves identities, contributing nothing.
    // Fusing drops a distinct + two joins + one checkpoint from every
    // call (near-dup graphs converge in 3-5 rounds, so this is a
    // ~25% round-cost cut).
    var labels = sym.groupBy(col("a").as("node"))
      .agg(min(col("b")).as("nmin"))
      .select(col("node"), least(col("node"), col("nmin")).as("comp"))
      .localCheckpoint()
    // semi-naive (frontier) propagation: min-label flows over a
    // monotone semiring, so a neighbor whose label did NOT change last
    // round contributes exactly what it already contributed — only
    // CHANGED labels can lower anything this round. Joining edges
    // against the frontier instead of the full label table shrinks the
    // per-round matched-edge volume toward the still-active components
    // (after round 1 most labels are final in real near-dup graphs),
    // and once the frontier drops under the AQE broadcast threshold
    // the edge join stops shuffling entirely. The fused first round
    // changed exactly the labels now differing from their node id.
    var frontier = labels.where(col("comp") =!= col("node"))
    var iters = 1
    var changed = 1L
    while (changed > 0 && iters < maxIters) {
      // smallest CHANGED label among my neighbors (map-side partial
      // min, one shuffle keyed on the node id; unchanged neighbors'
      // contributions are already folded into `comp` from prior
      // rounds)
      val nbrMin = sym.join(frontier, sym("b") === frontier("node"))
        .groupBy(sym("a").as("node"))
        .agg(min(col("comp")).as("nmin"))
      val stepped = labels.join(nbrMin, Seq("node"), "left")
        .select(col("node"), col("comp"),
          least(col("comp"), coalesce(col("nmin"), col("comp"))).as("c1"))
      // path halving: follow my (new) label's OWN current label —
      // comp values are node ids, so they resolve against `labels`
      val ptr = labels.select(col("node").as("pnode"), col("comp").as("pcomp"))
      // fixpoint check rides the checkpoint job as an observe() metric
      // (verified: eager localCheckpoint fires CollectMetrics) — the
      // previous separate count() doubled the job count per round
      val obs = org.apache.spark.sql.Observation(s"cc_round_$iters")
      val next = stepped.join(ptr, stepped("c1") === ptr("pnode"), "left")
        .select(col("node"), col("comp"),
          least(col("c1"), coalesce(col("pcomp"), col("c1"))).as("newcomp"))
        .observe(obs, sum(when(col("newcomp") =!= col("comp"), 1L)
          .otherwise(0L)).as("changed"))
        .localCheckpoint()
      changed = obs.get.getOrElse("changed", null) match {
        case null => 0L // empty label frame → no rows → no change
        case n: java.lang.Number => n.longValue()
      }
      val prev = labels
      labels = next.select(col("node"), col("newcomp").as("comp"))
      // next round's frontier: nodes whose label just dropped (their
      // new value is what unchanged neighbors haven't seen). A cheap
      // filter over the round's checkpoint — no extra job or shuffle.
      frontier = next.where(col("newcomp") =!= col("comp"))
        .select(col("node"), col("newcomp").as("comp"))
      prev.unpersist()
      iters += 1
    }
    // the returned frame reads only the final checkpoint, never sym
    sym.unpersist()
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
}
