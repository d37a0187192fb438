package graft.operators

import graft.functions.VectorFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** X3 similarity search over an `array<float>` embedding column.
  *
  * Three tiers (SURVEY.md §2.10):
  *  - [[bruteForceTopK]] — exact k-NN: query×corpus join + per-query
  *    top-k window. Correctness baseline; cost |Q|·|C|. At 100 TB,
  *    broadcast the (small) query set so the corpus is scanned once
  *    with NO shuffle of the big side, and the top-k window runs on
  *    the (|Q|·k-bounded) partial results.
  *  - [[nearDupPairs]] — all-pairs above a cosine threshold, self-join
  *    form of the same pattern.
  *  - [[lshTopK]] — approximate path: random-hyperplane LSH buckets
  *    (VectorFns.lshBucket) restrict the join to same-bucket pairs;
  *    recall is tunable via `planes` (fewer planes → bigger buckets →
  *    higher recall, more work), and by default (planes = 0) the
  *    [[lshConfigFor]] measured rule sizes the buckets to the corpus.
  *    This is the 100 TB default.
  */
object Similarity {

  /** Measured LSH sizing rule: (planes, tables) for a corpus of `n`
    * vectors. Encodes BASELINE.md's crossover table rather than a
    * formula guess:
    *  - ≤ ~20k vectors: 8 planes × 8 tables (fastest measured config
    *    at the oracled SFs; 12×16 loses here to per-row hashing cost);
    *  - ~20k–100k: 12 planes × 16 tables (at 60k vectors, 8×8 loses
    *    to brute force 2.9× while 12×16 wins 2.2× — clustered corpora
    *    flood fixed-granularity buckets, so 2^planes must track |D|);
    *  - beyond, the same rule continued: the measured step 20k→100k
    *    (5× data) added 4 planes (16× buckets) and doubled tables, so
    *    each further 4× in |D| adds 2 planes (4× buckets, keeping
    *    per-bucket occupancy flat) and doubles tables (recall
    *    compensation: recall ≈ 1-(1-p^planes)^tables), capped at
    *    28 planes / 128 tables — past that, per-row hash cost
    *    dominates and IVF is the better tier. The first extrapolated
    *    tier is now MEASURED at 200k vectors (BASELINE.md round-8):
    *    14×32 beats the pinned 12×16 2.6× and all-pairs 8.6×, while
    *    the degenerate 8×8 no longer merely loses — it fills ~70 GB
    *    of candidate shuffle spill and dies. The rule is a disk-
    *    robustness guard as much as a speed dial.
    *
    * This is the library DEFAULT for [[lshNearDupPairs]] and
    * [[lshTopK]] (planes = 0 sentinel): without it a pinned config
    * silently degrades as the corpus grows — the one remaining
    * hand-tuned scale dial, now code.
    */
  def lshConfigFor(n: Long): (Int, Int) =
    if (n <= 20000L) (8, 8)
    else if (n <= 100000L) (12, 16)
    else {
      val quads = math.ceil(
        math.log(n.toDouble / 100000.0) / math.log(4.0)).toInt
      (math.min(12 + 2 * quads, 28), math.min(16L << quads, 128L).toInt)
    }

  /** Exact top-k neighbors for each query row.
    * Ranking is on cosine rounded to `roundTo` decimals with a total
    * id tiebreak, so results are stable under float reassociation
    * (O3 determinism rule).
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, id: String, vec: String,
      k: Int, roundTo: Int = 6): DataFrame = {
    // norms are precomputed per row BEFORE the pair join: one dot per
    // pair instead of three (cosine = dot / (|a||b|) is arithmetically
    // identical — norm(x) is the same double wherever it's computed)
    val q = broadcast(queries.select(col(id).as("query_id"), col(vec).as("qv"),
      VectorFns.norm2(col(vec)).as("qn")))
    val c = corpus.select(col(id).as("neighbor_id"), col(vec).as("cv"),
      VectorFns.norm2(col(vec)).as("cn"))
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(
        when(col("qn") * col("cn") === 0.0, 0.0)
          .otherwise(VectorFns.dot(col("qv"), col("cv")) / (col("qn") * col("cn"))),
        roundTo))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** X6 semantic decontamination: flag corpus vectors whose embedding
    * sits above `minCos` cosine of ANY benchmark vector — the
    * embedding-space complement of n-gram decontamination
    * (`Curation.decontaminate`), catching paraphrased benchmark
    * leakage that shares no verbatim n-gram. Returns one row per
    * contaminated corpus id: (id, n_hits, max_cos).
    *
    * Scale: same posture as the n-gram form — benchmarks are MBs
    * while the corpus is TBs, so the benchmark side is broadcast and
    * scored map-only against the stream of corpus vectors (a
    * BroadcastNestedLoopJoin by construction: every corpus row scores
    * every benchmark row — |C|·|B| codegen'd dots, embarrassingly
    * parallel, no corpus shuffle); the only shuffle is the corpus-id
    * partial-agg of hit counts. For benchmark sets too big to
    * broadcast-scan (millions of vectors), [[lshNearDupPairs]]'s
    * bucketed form between the two tables is the dial, same as the
    * self-join case.
    */
  def semanticContamination(
      corpus: DataFrame, benchmark: DataFrame, id: String, vec: String,
      minCos: Double, roundTo: Int = 6): DataFrame = {
    val b = broadcast(benchmark.select(col(id).as("bench_id"), col(vec).as("bv"),
      VectorFns.norm2(col(vec)).as("bn")))
    val c = corpus.select(col(id), col(vec).as("cv"),
      VectorFns.norm2(col(vec)).as("cn"))
    c.join(b, col(id) =!= col("bench_id"))
      .withColumn("cosine", round(
        when(col("cn") * col("bn") === 0.0, 0.0)
          .otherwise(VectorFns.dot(col("cv"), col("bv")) / (col("cn") * col("bn"))),
        roundTo))
      .filter(col("cosine") >= minCos)
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_hits"), max(col("cosine")).as("max_cos"))
  }

  /** Exact near-duplicate pairs: cosine(a,b) >= minCos, a.id < b.id.
    * Self cross-join bounded by blocking on `blockBy` when provided
    * (e.g. an LSH bucket column) — pass None only at test scale.
    */
  def nearDupPairs(
      df: DataFrame, id: String, vec: String,
      minCos: Double, roundTo: Int = 6,
      blockBy: Option[Column] = None): DataFrame = {
    val base = blockBy match {
      case Some(b) => df.withColumn("__blk", b)
      case None => df.withColumn("__blk", lit(0))
    }
    val a = base.select(col("__blk"), col(id).as("id_a"), col(vec).as("va"),
      VectorFns.norm2(col(vec)).as("na"))
    val b = base.select(col("__blk"), col(id).as("id_b"), col(vec).as("vb"),
      VectorFns.norm2(col(vec)).as("nb"))
    a.join(b, Seq("__blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", round(
        when(col("na") * col("nb") === 0.0, 0.0)
          .otherwise(VectorFns.dot(col("va"), col("vb")) / (col("na") * col("nb"))),
        roundTo))
      .filter(col("cosine") >= minCos)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** X18 SemDeDup — clustering-bounded semantic deduplication over an
    * embedding column (the public SemDeDup recipe, Abbas et al. 2023,
    * arXiv:2303.09540): assign every vector to its nearest of `nlist`
    * centroids, then form near-duplicate pairs ONLY inside a cell and
    * flag the survivor-rule loser of each pair. With nlist ≈ √n (the
    * [[ivfConfigFor]] default) the pair mass drops from |D|² to
    * ~|D|²/nlist ≈ |D|^1.5 under even cells — the bound that makes
    * embedding-cosine dedup tractable at web scale, at the cost of
    * missing cross-cell pairs (the paper's accepted trade; the
    * LSH-blocked [[lshNearDupPairs]] is the recall-dialed alternative).
    *
    * Output: one row per input vector — (id, cell, is_dup ∈ {0,1}).
    * Survivor rules, both deterministic:
    *  - default: a vector is a duplicate iff a SMALLER-id vector in
    *    its cell is within `minCos` (the min-id convention every
    *    dedup operator here uses — value-oracle-able).
    *  - `keepFarthest = true`: the paper's rule — of each near-dup
    *    pair, keep the member FARTHER from its centroid (lower
    *    assignment cosine; the "edge of the cluster" example), flag
    *    the closer one; ties fall back to min-id.
    *
    * Centroids: `iters = 0` (default) uses the md5-rank sampled
    * centroids ([[sampleCentroids]] — engine-portable, so the whole
    * operator has a value-level DuckDB oracle); `iters > 0` Lloyd-
    * trains them ([[trainCentroids]]) for cells shaped like the data's
    * clusters — better within-cell recall, same output contract,
    * spec-verified against the brute-force reference instead.
    *
    * Scale shape: assignment is the IVF scan (corpus × broadcast
    * centroids, map-only over the big side, partial-agg argmax),
    * computed ONCE and operator-scope cached (it feeds both pair
    * sides and the output join — uncached the plan re-runs the
    * centroid scan three times); the pair join shuffles once on the
    * cell id and the quadratic work is confined to within-cell
    * blocks. No global window, no driver loop.
    */
  /** The SemDeDup nearest-centroid cell assignment, shared by
    * [[semDedup]] and the ScaleBench pair-mass measurement (which
    * needs cell OCCUPANCY without paying for the within-cell pair
    * join): (__vid, v, cell, cdist). Same argmax-by-(d desc, cent_id
    * asc) as the IVF pipeline; map-only over the corpus against
    * broadcast centroids, one partial-aggregatable shuffle.
    */
  private[graft] def semDedupCells(
      df: DataFrame, id: String, vec: String,
      nlist: Int = 0, iters: Int = 0, nHint: Long = 0L): DataFrame = {
    val nl = if (nlist > 0) nlist else ivfConfigFor(autoSize(df, nHint))._1
    val cents = broadcast(
      if (iters <= 0) sampleCentroids(df, id, vec, nl)
      else trainCentroids(df, id, vec, nl, iters))
    val n = VectorFns.norm2(col("v")) * VectorFns.norm2(col("cent_vec"))
    df.select(col(id).as("__vid"), col(vec).as("v"))
      .join(cents, expr("true"))
      .withColumn("__d", when(n === 0.0, 0.0)
        .otherwise(VectorFns.dot(col("v"), col("cent_vec")) / n))
      .groupBy(col("__vid"))
      .agg(min_by(
        struct(col("v").as("v"), col("cent_id").as("c"), col("__d").as("d")),
        struct((-col("__d")).as("nd"), col("cent_id").as("c"))).as("__w"))
      .select(col("__vid"), col("__w.v").as("v"), col("__w.c").as("cell"),
        col("__w.d").as("cdist"))
  }

  def semDedup(
      df: DataFrame, id: String, vec: String, minCos: Double,
      nlist: Int = 0, iters: Int = 0, keepFarthest: Boolean = false,
      nHint: Long = 0L): DataFrame = {
    // nearest-centroid assignment, carrying the assignment cosine for
    // the keepFarthest rule; cached — it feeds both pair sides and the
    // output join
    val cells = semDedupCells(df, id, vec, nlist, iters, nHint).cache()
    val a = cells.select(col("cell"), col("__vid").as("id_a"),
      col("v").as("va"), col("cdist").as("da"),
      VectorFns.norm2(col("v")).as("na"))
    val b = cells.select(col("cell"), col("__vid").as("id_b"),
      col("v").as("vb"), col("cdist").as("db"),
      VectorFns.norm2(col("v")).as("nb"))
    val pairs = a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", round(
        when(col("na") * col("nb") === 0.0, 0.0)
          .otherwise(VectorFns.dot(col("va"), col("vb")) /
            (col("na") * col("nb"))), 6))
      .filter(col("cosine") >= minCos)
    val dups = (
      if (!keepFarthest) pairs.select(col("id_b").as("__dup"))
      else pairs.select(
        when(col("da") > col("db"), col("id_a"))
          .when(col("db") > col("da"), col("id_b"))
          .otherwise(col("id_b")).as("__dup"))).distinct()
    val out = cells.join(dups, cells("__vid") === dups("__dup"), "left")
      .select(col("__vid").as(id), col("cell"),
        col("__dup").isNotNull.cast("int").as("is_dup"))
    CacheLifecycle.releaseAfterAction(out, cells)
  }

  /** LSH-blocked near-duplicate pairs — the 100 TB form of
    * [[nearDupPairs]]: candidates are pairs sharing a (table, bucket)
    * key in ANY of `tables` independent hyperplane families
    * (OR-amplification), verified with the exact cosine >= minCos.
    * Never forms the |D|² cross product: the shuffle is keyed on
    * (table, bucket) and the pair join runs inside buckets of
    * ~|D|/2^planes rows. Recall for a pair at angle θ is
    * 1-(1-(1-θ/π)^planes)^tables — high for true near-dups, a
    * documented dial near the threshold (the same candidates-then-
    * verify contract as the MinHash text path).
    *
    * Sizing `planes`: 2^planes must grow with |D| — on clustered
    * corpora same-cluster members share sign patterns, so at fixed
    * planes the per-bucket pair work degenerates toward
    * Σ(cluster∩cell)² as the corpus grows (measured at a 10× corpus:
    * see BASELINE.md's crossover table). Trade recall back with more
    * tables (e.g. 8×8 → 12×16 keeps ~0.93 of the recall at ~8× fewer
    * candidates). Leaving `planes` at the 0 sentinel applies
    * [[lshConfigFor]] to a count of `df` — the measured rule, applied
    * by default. Cost honesty: that count is an EAGER job at
    * plan-build time — metadata-cheap for a parquet-backed scan, but
    * for a derived frame (filters, joins upstream) it executes the
    * whole upstream pipeline once just to size buckets. Chained
    * callers should pass explicit planes/tables, or pass `nHint` —
    * a caller-known (or catalog-stats-derived) corpus size that
    * feeds [[lshConfigFor]] WITHOUT any plan-build-time job.
    */
  def lshNearDupPairs(
      df: DataFrame, id: String, vec: String,
      minCos: Double, planes: Int = 0, dim: Int, tables: Int = 0,
      roundTo: Int = 6, nHint: Long = 0L): DataFrame = {
    val (np, nt) =
      if (planes > 0) (planes, if (tables > 0) tables else 4)
      else {
        // auto planes must not discard an explicitly pinned tables
        val (autoP, autoT) = lshConfigFor(autoSize(df, nHint))
        (autoP, if (tables > 0) tables else autoT)
      }
    val buckets = (v: Column) =>
      array((0 until nt).map(t => VectorFns.lshBucket(v, t, np, dim)): _*)
    // Candidate generation is ID-ONLY: the bucket explode, the bucket
    // self-join and the cross-table dedup all move 16-byte id pairs,
    // never the vectors. Carrying the two float[dim] payloads through
    // the candidate shuffles (the previous shape) multiplied shuffle
    // bytes by ~30× and dominated wall-clock at 10× corpus scale
    // (measured 119 s → the verify-join shape below: the candidate
    // stage is where the |D|²/2^planes mass lives, so it must be the
    // narrowest stage in the plan, not the widest).
    val keyed = df.select(col(id).as("__id"),
      posexplode(buckets(col(vec))).as(Seq("__t", "__blk")))
    val matched = keyed.select(col("__id").as("id_a"), col("__t"), col("__blk"))
      .join(keyed.select(col("__id").as("id_b"), col("__t"), col("__blk")),
        Seq("__t", "__blk"))
      .filter(col("id_a") < col("id_b"))
    val cand =
      if (nt == 1) matched.select("id_a", "id_b")
      else matched.select("id_a", "id_b").dropDuplicates("id_a", "id_b")
    // Verify: join the vectors back per side. At |candidates| ≪ |D|²
    // these are two hash joins keyed on the id — broadcastable when
    // the vector table fits, plain shuffle joins otherwise — followed
    // by the codegen dot product.
    val va = df.select(col(id).as("id_a"), col(vec).as("va"),
      VectorFns.norm2(col(vec)).as("na"))
    val vb = df.select(col(id).as("id_b"), col(vec).as("vb"),
      VectorFns.norm2(col(vec)).as("nb"))
    cand.join(va, "id_a").join(vb, "id_b")
      .withColumn("cosine", round(
        when(col("na") * col("nb") === 0.0, 0.0)
          .otherwise(VectorFns.dot(col("va"), col("vb")) / (col("na") * col("nb"))),
        roundTo))
      .filter(col("cosine") >= minCos)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** IVF-flat approximate top-k: the corpus is partitioned into
    * `nlist` cells by nearest centroid; each query probes its
    * `nProbe` nearest cells and ranks exactly within them. Centroids
    * are a deterministic uniform sample of the corpus (no training
    * loop — "IVF-flat with sampled centroids"; recall dial = nProbe).
    *
    * Scale shape: assignment is corpus × broadcast(centroids) — a
    * narrow map over the big side; the probe join hash-partitions on
    * the cell id, so each query compares against |corpus|/nlist ×
    * nProbe vectors instead of the full corpus. Corpus-side cell
    * assignment is a map-side-combinable `max_by` aggregation, NOT a
    * row_number window — no per-key sort of |corpus|·nlist rows.
    */
  /** IVF sizing rule from public IVF-flat practice (the FAISS
    * guideline family): nlist near sqrt(|corpus|), snapped to a power
    * of two and clamped to [16, 65536] (below ~256 vectors a finer
    * grid just makes empty cells; past 2^16 cells the centroid
    * broadcast and assignment scan dominate), and nProbe = nlist/8 —
    * the recall/throughput middle of the dial, cells-scanned ≈
    * |corpus|·nProbe/nlist ≈ |corpus|/8 per query. Callers pin
    * explicit values to move along the recall curve.
    *
    * MEASURED (BASELINE.md round-8 IVF table, ScaleBench ann paths):
    * the rule beats brute-force top-k 2.4× at 60k vectors with
    * recall@10 0.56 (hard-asserted at 30×, alongside a 0.5 recall
    * floor), while half/double-nlist brackets land within 25% — the
    * dial is flat near the optimum. Crossover vs brute force is
    * ~20k vectors for a 5%-of-corpus query mix: below that, use
    * [[bruteForceTopK]]. For top-k, prefer this tier over [[lshTopK]]
    * at every measured size (the LSH bucket rule is tuned for
    * near-dup pair mining, and its top-k recall collapses as the
    * corpus grows — 0.09 at 60k).
    */
  def ivfConfigFor(n: Long): (Int, Int) = {
    val pow = math.round(
      math.log(math.sqrt(math.max(1L, n).toDouble)) / math.log(2.0)).toInt
    val nlist = 1 << math.max(4, math.min(16, pow))
    (nlist, math.max(1, nlist / 8))
  }

  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, id: String, vec: String,
      k: Int, nlist: Int = 0, nProbe: Int = 0, nHint: Long = 0L): DataFrame = {
    val (nl, np) =
      if (nlist > 0) (nlist, if (nProbe > 0) nProbe else math.max(1, nlist / 8))
      else {
        // auto nlist must not discard an explicitly pinned nProbe
        val (autoL, autoP) = ivfConfigFor(autoSize(corpus, nHint))
        (autoL, if (nProbe > 0) nProbe else autoP)
      }
    ivfTopKPinned(corpus, queries, id, vec, k, nl, np)
  }

  /** The RETRIEVAL-grade IVF tier: [[ivfTopK]]'s pipeline with
    * (1) Lloyd-trained centroids ([[trainCentroids]]) in place of the
    * raw sample — cells shaped like the data's clusters instead of a
    * uniform draw, (2) a wider default probe (nProbe = nlist/2 — the
    * serving contract is recall first), and (3) the per-cell prune
    * ([[ivfPipeline]]) so the wide probe's ranking work stays in
    * nProbe·|Q| small sorts. The mining tier ([[ivfTopK]]) stays
    * as-is: sampled centroids keep it value-oracle-able and its
    * 0.5-ish recall is adequate for near-dup mining at a quarter of
    * the probe work.
    *
    * MEASURED (RecallCurve at 30× = 60k vectors, nlist 256,
    * BASELINE.md round-9 table): recall@10 by probed fraction at 2
    * Lloyd iters — 1/8: 0.59, 1/4: 0.78, 3/8: 0.88, **1/2: 0.94**;
    * doubling iters to 4 adds ≤ 0.01 everywhere. Total work at the
    * 1/2 default ≈ 0.75× brute force (probe |Q|·|C|/2 dots +
    * assignment and training ≈ 3·|C|·nlist), so the tier beats exact
    * search while clearing the 0.9 retrieval floor — both
    * hard-asserted in ScaleBench at 30×. On corpora with real
    * cluster structure the same recall arrives at narrower probes
    * (the spec's clustered fixture hits 0.9+ at nProbe = nlist/4);
    * this synthetic corpus is the weak-structure worst case.
    *
    * Cost honesty: training runs `iters` Lloyd passes UP FRONT
    * (eager jobs at call time, exactly like k-means) — over a
    * ~40-points-per-centroid hash sample since round 13, so each
    * pass scans nlist·40 rows, not the corpus (measured: recall@10
    * 0.9355 vs 0.9382 full-corpus at the 30× tier, wall 17.3 s vs
    * 22.1 s with brute at 21.2 s — the sample costs 0.003 recall and
    * restores the beats-brute margin). For a serving index the train
    * cost amortizes over every query batch; pass `iters = 0` to fall
    * back to sampled centroids.
    */
  /** Third auto-config rule (after [[lshConfigFor]]/[[ivfConfigFor]]):
    * target recall → probe width for the serving tier. Encodes the
    * MEASURED recall@10-vs-probed-fraction curve (RecallCurve at 30× =
    * 60k vectors, nlist 256, 2 Lloyd iters, BASELINE.md round-9
    * table): 1/8 → 0.59, 1/4 → 0.78, 3/8 → 0.88, 1/2 → 0.94. Returns
    * the narrowest measured fraction whose measured recall meets the
    * target; a target above the curve's top (> 0.94) anchors to
    * probe-everything (nProbe = nlist — the probe set covers the whole
    * corpus, so the search is exact and recall 1.0 by construction).
    * The synthetic fixture is the weak-cluster-structure worst case —
    * real corpora reach each recall at narrower probes, so the rule is
    * conservative in the safe direction.
    *
    * `clustered = true` switches to the MEASURED planted-cluster curve
    * (RecallCurve clustered mode at 30× = 60k vectors, 256 planted
    * clusters, σ 0.15, nlist 256, 2 Lloyd iters — BASELINE.md round-16
    * table): recall@10 = 1.0 at EVERY measured fraction down to 1/32,
    * because trained cells align with the data's clusters and a
    * query's whole neighborhood lives in its few nearest cells. The
    * rule returns 1/8 rather than the fixture's 1/32 floor — real
    * corpora have overlapping, unequal clusters, and 1/8 keeps a 4×
    * probe margin while still cutting the wide-probe default's work
    * 4× (measured 7.9 s vs 14.5 s at 30×). The weak-structure curve
    * stays the DEFAULT: with no knowledge of corpus structure, the
    * conservative assumption is the one that can only overshoot
    * recall, never undershoot it.
    */
  def servingConfigFor(nlist: Int, targetRecall: Double,
      clustered: Boolean = false): Int = {
    val curve =
      if (clustered)
        Seq(0.125 -> 1.0)
      else
        Seq(0.125 -> 0.59, 0.25 -> 0.78, 0.375 -> 0.88, 0.5 -> 0.94)
    val frac = curve.collectFirst { case (f, r) if r >= targetRecall => f }
      .getOrElse(1.0)
    math.max(1, math.ceil(nlist * frac).toInt)
  }

  def ivfTopKServing(
      corpus: DataFrame, queries: DataFrame, id: String, vec: String,
      k: Int, nlist: Int = 0, nProbe: Int = 0, iters: Int = 2,
      nHint: Long = 0L, targetRecall: Double = 0.0): DataFrame = {
    val nl =
      if (nlist > 0) nlist else ivfConfigFor(autoSize(corpus, nHint))._1
    // precedence: an explicit nProbe pin wins; then the recall-target
    // rule; then the historical nlist/2 default (== the rule at 0.9)
    val np =
      if (nProbe > 0) nProbe
      else if (targetRecall > 0.0) servingConfigFor(nl, targetRecall)
      else math.max(1, nl / 2)
    val cents =
      if (iters <= 0) sampleCentroids(corpus, id, vec, nl)
      else trainCentroids(corpus, id, vec, nl, iters, nHint)
    ivfPipeline(corpus, queries, id, vec, k, np, cents, perCellPrune = true)
  }

  /** Corpus size for the auto-config rules without an eager job when
    * the caller already knows it: `nHint > 0` wins outright; otherwise
    * fall back to the (plan-build-time, eager) `df.count()` that the
    * scaladocs of the auto paths document as the cost of autosizing.
    * At 100 TB pass the hint — a catalog rowCount, a manifest line
    * count, or one count done once and reused across calls.
    */
  private def autoSize(df: DataFrame, nHint: Long): Long =
    if (nHint > 0L) nHint else df.count()

  /** Deterministic sampled centroids WITHOUT an eager count() (which
    * would fire a full scan job every time the query is merely
    * built): the nlist lowest rows under a pseudo-random hash rank —
    * a uniform, lazy, single-pass TakeOrdered over the corpus. The
    * rank hash is md5-based (NOT Spark's xxhash64) so the selection
    * is engine-portable and the sampled-centroid operator has a
    * value-level oracle.
    */
  private def sampleCentroids(
      corpus: DataFrame, id: String, vec: String, nlist: Int): DataFrame = {
    val hashRank = pmod(
      conv(substring(md5(col(id).cast("string")), 1, 8), 16, 10).cast("long"),
      lit(1000003L))
    corpus.select(col(id).as("cent_id"), col(vec).as("cent_vec"))
      .orderBy(hashRank, col(id))
      .limit(nlist)
  }

  /** Lloyd-iterated (k-means) centroid refinement over the sampled
    * seeds — the quality step the SERVING tier needs: sampled
    * centroids make recall-adequate cells for near-dup mining, but
    * retrieval-grade recall requires cells shaped like the data's
    * actual clusters (measured: recall@10 0.56 at 60k vectors with
    * sampled centroids at nProbe = nlist/8).
    *
    * Each iteration: assign every corpus vector to its nearest
    * centroid by cosine (broadcast centroids, map-only over the big
    * side — the same narrow scan the query pipeline runs), then
    * recompute each cell's per-dimension MEAN. The mean is
    * accumulated in DECIMAL (posexplode to (cell, dim) rows, exact
    * associative addition), so the trained centroids are
    * bit-deterministic across runs and partitionings — float sum
    * reassociation cannot leak into cell boundaries. Cell identity
    * stays the seed centroid's id throughout; cells that lose all
    * members drop out (standard k-means emptying).
    *
    * Scale shape: per iteration, one |corpus|·nlist codegen dot scan
    * + one shuffle of |corpus|·dim narrow (cell, dim, value) rows.
    * Centroids materialize to the driver between iterations
    * (nlist·dim floats — KBs; the lineage would otherwise double per
    * iteration), exactly how distributed k-means keeps its state.
    */
  def trainCentroids(
      corpus: DataFrame, id: String, vec: String, nlist: Int,
      iters: Int, nHint: Long = 0L, perCellSample: Int = 40): DataFrame = {
    val spark = corpus.sparkSession
    // k-means sees a TRAINING SAMPLE of ~perCellSample points per
    // centroid (the FAISS training guideline), not the full corpus:
    // centroids are cell MEANS, and a ~40-point mean is already tight,
    // so recall is unchanged while each Lloyd pass scans
    // nlist·perCellSample rows instead of |corpus| — at scale the
    // training cost is bounded by the index size, not the data size.
    // Deterministic hash filter: training is reproducible run to run.
    val total = autoSize(corpus, nHint)
    val target = nlist.toLong * perCellSample
    val train =
      if (total <= target) corpus
      else corpus.where(pmod(xxhash64(col(id)), lit(1000003L)) <
        lit(math.max(1L, (target * 1000003L) / total)))
    var cents = sampleCentroids(corpus, id, vec, nlist)
    for (_ <- 0 until iters) {
      val b = broadcast(cents)
      val n = VectorFns.norm2(col("cv")) * VectorFns.norm2(col("cent_vec"))
      // per-ROW argmax (grouped on the id, not the vector: duplicate
      // vectors must each contribute to their cell's mean)
      val assigned = train.select(col(id).as("__vid"), col(vec).as("cv"))
        .join(b, expr("true"))
        .withColumn("__d", when(n === 0.0, 0.0)
          .otherwise(VectorFns.dot(col("cv"), col("cent_vec")) / n))
        .groupBy(col("__vid"))
        .agg(min_by(
          struct(col("cv").as("v"), col("cent_id").as("c")),
          struct((-col("__d")).as("nd"), col("cent_id").as("c"))).as("__w"))
        .select(col("__w.v").as("cv"), col("__w.c").as("cell"))
      val means = assigned
        .select(col("cell"), posexplode(col("cv")).as(Seq("__i", "__v")))
        .groupBy(col("cell"), col("__i"))
        .agg(avg(col("__v").cast("decimal(30,12)")).as("__m"))
        .groupBy(col("cell"))
        .agg(transform(
          array_sort(collect_list(struct(col("__i"), col("__m")))),
          x => x("__m").cast("float")).as("cent_vec"))
        .select(col("cell").as("cent_id"), col("cent_vec"))
      val rows = means.collect()
      cents = spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), means.schema)
    }
    cents
  }

  private def ivfTopKPinned(
      corpus: DataFrame, queries: DataFrame, id: String, vec: String,
      k: Int, nlist: Int, nProbe: Int): DataFrame =
    ivfPipeline(corpus, queries, id, vec, k, nProbe,
      sampleCentroids(corpus, id, vec, nlist), perCellPrune = false)

  /** The probe/score/rank pipeline shared by the mining and serving
    * tiers, parameterized by the centroid table. `perCellPrune` adds
    * a per-(query, cell) top-k stage before the global ranking:
    * provably identical output (the global top-k over probed cells
    * takes at most k rows from any one cell, and both stages rank by
    * the same (rounded cosine desc, neighbor_id) total order), but
    * the heavy sort runs over nProbe·|Q| small partitions instead of
    * |Q| partitions of nProbe·|corpus|/nlist rows — the shape that
    * matters when the serving tier probes WIDE.
    */
  /** Nearest-centroid assignment (shared by the pipeline, the index
    * build, and the indexed query path — ONE expression tree, so the
    * persisted-index results are bit-equal to the in-memory tiers').
    * keep = 1: argmax by (__d desc, cent_id asc) as a
    * partial-aggregatable min_by over a totally-ordered key — winner
    * identical to the window formulation, without sorting every
    * (row, centroid) pair inside each partition-by group. Only the
    * DISTANCE is negated (always a double); the cent_id tiebreak
    * stays in its natural ascending order, so string/any-orderable id
    * columns work on both paths.
    */
  private[graft] def assignCells(df: DataFrame, id: String, vec: String,
      cents: DataFrame, idOut: String, vecOut: String,
      keep: Int): DataFrame = {
    val n = VectorFns.norm2(col(vecOut)) * VectorFns.norm2(col("cent_vec"))
    val scored = df.select(col(id).as(idOut), col(vec).as(vecOut))
      .join(cents, expr("true"))
      .withColumn("__d", when(n === 0.0, 0.0)
        .otherwise(VectorFns.dot(col(vecOut), col("cent_vec")) / n))
    if (keep == 1) {
      scored.groupBy(col(idOut))
        .agg(min_by(
          struct(col(vecOut).as("v"), col("cent_id").as("c")),
          struct((-col("__d")).as("nd"), col("cent_id").as("c"))).as("__w"))
        .select(col(idOut), col("__w.v").as(vecOut), col("__w.c").as("cell"))
    } else {
      val w = Window.partitionBy(col(idOut))
        .orderBy(col("__d").desc, col("cent_id").asc)
      scored.withColumn("__r", row_number().over(w))
        .filter(col("__r") <= keep)
        .select(col(idOut), col(vecOut), col("cent_id").as("cell"))
    }
  }

  /** Probe + score + rank over a PRE-ASSIGNED corpus cell table —
    * the half of [[ivfPipeline]] the persisted index amortizes the
    * other half of. See [[ivfPipeline]] for the prune-identity note.
    */
  private[graft] def ivfScorePipeline(
      corpusCells: DataFrame, queryCells0: DataFrame, k: Int,
      perCellPrune: Boolean): DataFrame = {
    val queryCells = queryCells0
      .withColumn("qn", VectorFns.norm2(col("qv")))
    val corpusN = corpusCells.withColumn("cn", VectorFns.norm2(col("cv")))
    val scored = corpusN.join(queryCells, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(
        when(col("qn") * col("cn") === 0.0, 0.0)
          .otherwise(VectorFns.dot(col("qv"), col("cv")) / (col("qn") * col("cn"))),
        6))
    val pruned =
      if (!perCellPrune) scored
      else {
        val wc = Window.partitionBy(col("query_id"), col("cell"))
          .orderBy(col("cosine").desc, col("neighbor_id").asc)
        scored.withColumn("__cr", row_number().over(wc))
          .filter(col("__cr") <= k).drop("__cr")
      }
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    pruned.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** The probe/score/rank pipeline shared by the mining and serving
    * tiers, parameterized by the centroid table. `perCellPrune` adds
    * a per-(query, cell) top-k stage before the global ranking:
    * provably identical output (the global top-k over probed cells
    * takes at most k rows from any one cell, and both stages rank by
    * the same (rounded cosine desc, neighbor_id) total order), but
    * the heavy sort runs over nProbe·|Q| small partitions instead of
    * |Q| partitions of nProbe·|corpus|/nlist rows — the shape that
    * matters when the serving tier probes WIDE.
    */
  private def ivfPipeline(
      corpus: DataFrame, queries: DataFrame, id: String, vec: String,
      k: Int, nProbe: Int, centroids: DataFrame,
      perCellPrune: Boolean): DataFrame = {
    val cents = broadcast(centroids)
    val corpusCells = assignCells(corpus, id, vec, cents,
      "neighbor_id", "cv", keep = 1)
    val queryCells = assignCells(queries, id, vec, cents,
      "query_id", "qv", keep = nProbe)
    ivfScorePipeline(corpusCells, queryCells, k, perCellPrune)
  }

  /** X3e: the persisted IVF index — the vector-tier sibling of the
    * BM25 partitioned-postings trade ([[graft.operators.Retrieval]]
    * X19e): build ONCE per corpus version, serve MANY query batches
    * without re-paying the two per-call corpus costs every in-memory
    * tier carries — Lloyd training (eager jobs) and the full-corpus
    * nearest-centroid assignment (nlist dot products PER CORPUS ROW,
    * the dominant scan at any real size).
    *
    * Layout under `outDir`:
    *   centroids/  nlist (cent_id, cent_vec) rows — the trained
    *               codebook, KBs, broadcast at query time
    *   cells/      the corpus as (neighbor_id, cv, cell) PARTITIONED
    *               BY cell — a query batch reads only its probed
    *               cells (static partition pruning over ≤ nlist
    *               literal keys, the X19e convention)
    *   stats/      1 row (nlist, n_corpus) — written LAST, its
    *               _SUCCESS is the index's completeness marker
    *
    * Training/assignment use the SAME deterministic machinery as
    * [[ivfTopKServing]] ([[trainCentroids]] is bit-deterministic:
    * hash-sampled training set, DECIMAL cell means), and the query
    * path runs the SAME score tree — so the indexed results are
    * bit-equal to a fresh serving call at equal (nlist, nProbe, iters)
    * (spec-pinned). Pass `iters = 0` for the sampled-centroid
    * (mining-tier, value-oracle-able) codebook.
    */
  /** `centroids`: a PINNED codebook overrides training entirely (the
    * streaming store's parity contract rides this — see
    * [[graft.streaming.StreamingIvf]]); nlist then derives from it.
    */
  def buildIvfIndex(corpus: DataFrame, id: String, vec: String,
      outDir: String, nlist: Int = 0, iters: Int = 2,
      nHint: Long = 0L, centroids: DataFrame = null,
      attrs: Seq[String] = Nil): Unit = {
    val total = autoSize(corpus, nHint)
    val nl =
      if (centroids != null) centroids.count().toInt
      else if (nlist > 0) nlist else ivfConfigFor(total)._1
    val cents =
      if (centroids != null) centroids
      else if (iters <= 0) sampleCentroids(corpus, id, vec, nl)
      else trainCentroids(corpus, id, vec, nl, iters, nHint)
    val b = broadcast(cents)
    val assigned = assignCells(corpus, id, vec, b, "neighbor_id", "cv", keep = 1)
    // metadata columns ride INSIDE the cells segment (the production
    // vector-store layout: payload colocated with the vectors), so a
    // filtered read pushes its predicate into the same parquet scan —
    // one id-keyed join at BUILD time, amortized like the assignment
    val withAttrs =
      if (attrs.isEmpty) assigned
      else assigned.join(
        corpus.select((col(id).as("neighbor_id") +: attrs.map(col)): _*),
        "neighbor_id")
    withAttrs
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$outDir/cells")
    cents.write.mode("overwrite").parquet(s"$outDir/centroids")
    corpus.sparkSession.range(1).select(
      lit(nl).as("nlist"), lit(total).as("n_corpus"))
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/stats")
  }

  /** Retrieval against a [[buildIvfIndex]] index — semantics
    * identical to the in-memory tiers on the same codebook (same
    * assignment and score trees; per-cell prune on, which is
    * output-identical by the [[ivfPipeline]] note). nProbe resolution
    * follows [[ivfTopKServing]]: explicit pin > recall-target rule >
    * nlist/2. The cells read is partition-pruned to the query batch's
    * probed cells.
    */
  def ivfTopKIndexed(
      spark: org.apache.spark.sql.SparkSession, indexDir: String,
      queries: DataFrame, id: String, vec: String, k: Int,
      nProbe: Int = 0, targetRecall: Double = 0.0): DataFrame = {
    val st = spark.read.parquet(s"$indexDir/stats").head
    val nl = st.getAs[Int]("nlist")
    val np =
      if (nProbe > 0) nProbe
      else if (targetRecall > 0.0) servingConfigFor(nl, targetRecall)
      else math.max(1, nl / 2)
    val cents = broadcast(spark.read.parquet(s"$indexDir/centroids"))
    val queryCells = assignCells(queries, id, vec, cents,
      "query_id", "qv", keep = np)
    // probed cells across the batch: ≤ nlist literal partition keys
    // (bounded driver-side control, the X19e convention)
    val probed = queryCells.select(col("cell")).distinct()
      .collect().map(_.get(0)).toSeq
    val cells = spark.read.parquet(s"$indexDir/cells")
      .where(if (probed.isEmpty) lit(false)
        else col("cell").isin(probed: _*))
    ivfScorePipeline(cells, queryCells, k, perCellPrune = true)
  }

  /** X3h: METADATA-FILTERED retrieval against a [[buildIvfIndex]]
    * index built with `attrs` — "predicate ∧ top-k", every production
    * vector store's read. This is the PRE-FILTER arm: `pred` (over the
    * attr columns) is applied to the cells read BEFORE scoring, so it
    * pushes into the parquet scan (PushedFilters) alongside the
    * partition prune on probed cells, and the per-cell/global top-k
    * rank only FILTERED candidates — within the probed cells the
    * result is exact, with no post-hoc candMult gamble (retrieve
    * k·candMult then filter and hope ≥ k survive — the post-filter
    * failure mode this arm exists to avoid).
    *
    * What pre-filtering does NOT fix: a highly selective predicate
    * leaves few matching vectors per probed cell, so recall against
    * the FILTERED ground truth decays with selectivity — the standard
    * mitigation is probing wider, or below a survivor budget switching
    * to exact brute force over the filtered corpus, which the same
    * selectivity that hurts recall makes cheap. [[annFilteredTopK]]
    * encodes that measured crossover.
    */
  def ivfTopKFilteredIndexed(
      spark: org.apache.spark.sql.SparkSession, indexDir: String,
      queries: DataFrame, id: String, vec: String, k: Int,
      pred: Column, nProbe: Int = 0, targetRecall: Double = 0.0): DataFrame = {
    val st = spark.read.parquet(s"$indexDir/stats").head
    val nl = st.getAs[Int]("nlist")
    val np =
      if (nProbe > 0) nProbe
      else if (targetRecall > 0.0) servingConfigFor(nl, targetRecall)
      else math.max(1, nl / 2)
    val cents = broadcast(spark.read.parquet(s"$indexDir/centroids"))
    val queryCells = assignCells(queries, id, vec, cents,
      "query_id", "qv", keep = np)
    val probed = queryCells.select(col("cell")).distinct()
      .collect().map(_.get(0)).toSeq
    val cells = spark.read.parquet(s"$indexDir/cells")
      .where(if (probed.isEmpty) lit(false)
        else col("cell").isin(probed: _*))
      .where(pred)
      .select(col("neighbor_id"), col("cv"), col("cell"))
    ivfScorePipeline(cells, queryCells, k, perCellPrune = true)
  }

  /** The X3h dispatch rule, measured like [[lshConfigFor]]/X3g: count
    * the predicate's survivors with ONE pushed-filter scan over the
    * index cells (columnar count, no vectors read), then
    *
    *   survivors · |Q| ≤ bruteDotBudget → exact brute force over the
    *       filtered corpus (the brute pair join's cost IS its dot
    *       count; the same selectivity that risks the indexed arm's
    *       recall makes it cheap)
    *   otherwise → [[ivfTopKFilteredIndexed]]
    *
    * The budget is in DOT PRODUCTS, not survivors: the brute wall is
    * linear in survivors × queries while the indexed wall is near-flat
    * in both (partition prune + per-cell prune), so a flat survivor
    * threshold would flip with batch size. Pinned by
    * `SCALE_OUT_30x_annfilter_r19.json`: at |Q| = 100 the brute arm
    * won at EVERY measured selectivity up to 60k survivors (6M dots:
    * brute 1.21 s vs indexed 2.80 s at 30×), so 4M dots sits well
    * inside the measured win region; beyond it the indexed arm is
    * chosen conservatively — its measured worst-case loss inside the
    * region is bounded (~2.3×) while the brute arm's loss outside
    * grows without bound in survivors · |Q|.
    */
  def annFilteredTopK(
      spark: org.apache.spark.sql.SparkSession, indexDir: String,
      queries: DataFrame, id: String, vec: String, k: Int,
      pred: Column, nProbe: Int = 0,
      bruteDotBudget: Long = 4_000_000L): DataFrame = {
    val cells = spark.read.parquet(s"$indexDir/cells")
    val survivors = cells.where(pred).count()
    val nQ = queries.count()
    if (survivors * nQ <= bruteDotBudget) {
      val corpus = cells.where(pred)
        .select(col("neighbor_id").as(id), col("cv").as(vec))
      bruteForceTopK(corpus, queries, id, vec, k)
    } else
      ivfTopKFilteredIndexed(spark, indexDir, queries, id, vec, k, pred,
        nProbe = nProbe)
  }

  /** X3f: product-quantization (PQ) compressed residuals for the
    * persisted IVF index — the standard public next step past
    * IVF-flat (Jégou, Douze & Schmid 2011, "Product Quantization for
    * Nearest Neighbor Search": IVFADC) and the real 100 TB lever:
    * the SCAN-phase representation of each cell shrinks from
    * dim·4 bytes/vector to m code bytes (+1 float norm) — ~16× less
    * IO/memory on the probed-cell scan at the default (m = 8,
    * dim = 64) — while the exact vectors stay partitioned by cell for
    * the candidate re-rank, so FINAL scores are exact.
    *
    * Layout under `outDir` — the [[buildIvfIndex]] layout plus two:
    *   centroids/  the coarse codebook (trained like X3e)
    *   cells/      exact vectors partitioned by cell (the re-rank side)
    *   pqcodes/    (neighbor_id, code[m], norm) partitioned by cell —
    *               the compressed scan side
    *   pq/         the m×ks sub-codebooks (sub, code, cb_vec)
    *   stats/      (nlist, n_corpus, m, ks, dsub); _SUCCESS last
    *
    * Quantization is of RESIDUALS r = v − centroid(cell) (the IVFADC
    * convention — residuals concentrate near 0, so a small codebook
    * covers them): each of the m dsub-wide subvectors of r maps to
    * its nearest (L2) codeword, argmin computed as
    * argmax(dot − |cb|²/2) via the same min_by discipline as
    * [[assignCells]]. Sub-codebooks seed from a deterministic
    * md5-rank sample of ks residual rows (the [[sampleCentroids]]
    * convention, clamped to the corpus size) and refine with
    * `pqIters` Lloyd passes per subspace over a ~40-points-per-
    * codeword hash sample — all m subspaces in ONE keyed frame, cell
    * means in DECIMAL (the [[trainCentroids]] discipline), so the
    * codebooks are bit-deterministic and the training cost is bounded
    * by the codebook size, not the corpus.
    */
  def buildIvfPqIndex(corpus: DataFrame, id: String, vec: String,
      outDir: String, nlist: Int = 0, iters: Int = 2, m: Int = 8,
      ks: Int = 256, pqIters: Int = 2, nHint: Long = 0L): Unit = {
    val spark = corpus.sparkSession
    val total = autoSize(corpus, nHint)
    val nl = if (nlist > 0) nlist else ivfConfigFor(total)._1
    val cents =
      if (iters <= 0) sampleCentroids(corpus, id, vec, nl)
      else trainCentroids(corpus, id, vec, nl, iters, nHint)
    val b = broadcast(cents)
    val cells = assignCells(corpus, id, vec, b, "neighbor_id", "cv",
      keep = 1)
    val dim = corpus.select(size(col(vec))).head.getInt(0)
    require(dim % m == 0, s"dim $dim must be divisible by m = $m")
    val dsub = dim / m
    // residuals: v − coarse centroid of the vector's cell
    val resid = cells
      .join(b.select(col("cent_id").as("cell"), col("cent_vec")), "cell")
      .withColumn("rv", zip_with(col("cv"), col("cent_vec"),
        (x, c) => (x.cast("double") - c.cast("double")).cast("float")))
    // deterministic sub-codebook SEEDS: ks md5-rank-sampled residual
    // rows; codeword c of sub s = sample row c's s-th subvector.
    // Driver-side collect is bounded: ks rows × dim floats (KBs), an
    // index-build control structure like trainCentroids' per-iteration
    // codebook
    val hashRank = pmod(
      conv(substring(md5(col("neighbor_id").cast("string")), 1, 8),
        16, 10).cast("long"), lit(1000003L))
    val sampled = resid
      .select(col("neighbor_id"), col("rv"))
      .orderBy(hashRank, col("neighbor_id"))
      .limit(ks)
      .select(col("rv")).collect()
      .map(_.getSeq[Float](0).toArray)
    val ksEff = sampled.length
    import spark.implicits._
    def cbDf(rows: Seq[(Int, Int, Seq[Float])]) =
      rows.toDF("sub", "code", "cb_vec")
        .withColumn("cb_half",
          VectorFns.dot(col("cb_vec"), col("cb_vec")) / 2.0)
    var cbRows: Seq[(Int, Int, Seq[Float])] = for {
      s <- 0 until m; c <- 0 until ksEff
    } yield (s, c, sampled(c).slice(s * dsub, (s + 1) * dsub).toSeq)
    // Lloyd refinement per subspace (all m subspaces ride ONE frame
    // keyed by sub) over a ~40-points-per-codeword hash sample — the
    // trainCentroids discipline: sampled seeds alone leave residual
    // quantization too coarse for useful candidate ordering, two
    // k-means passes shape the codewords like the residual mass. Cell
    // means accumulate in DECIMAL → bit-deterministic codebooks.
    val target = ksEff.toLong * 40
    val train =
      if (total <= target) resid
      else resid.where(pmod(xxhash64(col("neighbor_id")), lit(1000003L)) <
        lit(math.max(1L, (target * 1000003L) / total)))
    val trainSubs = train.select(col("neighbor_id"),
      posexplode(transform(sequence(lit(0), lit(m - 1)),
        j => slice(col("rv"), j * lit(dsub) + 1, lit(dsub))))
        .as(Seq("sub", "subv")))
    for (_ <- 0 until pqIters.max(0)) {
      val assigned = trainSubs.join(broadcast(cbDf(cbRows)), "sub")
        .withColumn("__d",
          VectorFns.dot(col("subv"), col("cb_vec")) - col("cb_half"))
        .groupBy(col("neighbor_id"), col("sub"))
        .agg(min_by(struct(col("code"), col("subv")),
          struct((-col("__d")).as("nd"), col("code"))).as("__w"))
        .select(col("sub"), col("__w.code").as("code"),
          col("__w.subv").as("subv"))
      val means = assigned
        .select(col("sub"), col("code"),
          posexplode(col("subv")).as(Seq("__i", "__v")))
        .groupBy(col("sub"), col("code"), col("__i"))
        .agg(avg(col("__v").cast("decimal(30,12)")).as("__m"))
        .groupBy(col("sub"), col("code"))
        .agg(transform(
          array_sort(collect_list(struct(col("__i"), col("__m")))),
          x => x("__m").cast("float")).as("cb_vec"))
        .collect()
      // a codeword that attracts zero training points keeps its
      // PREVIOUS vector instead of vanishing from the codebook: code
      // values must stay dense 0..ksEff-1 because ivfPqTopK's LUT
      // lookup is POSITIONAL over the code-sorted codebook
      // (element_at(lut[s], code+1)) — dropping an empty code would
      // shift every higher code onto the wrong LUT entry
      val updated = means.map(r =>
        ((r.getInt(0), r.getInt(1)), r.getSeq[Float](2))).toMap
      cbRows = cbRows.map { case (s, c, v) =>
        (s, c, updated.getOrElse((s, c), v)) }
    }
    val cb = cbDf(cbRows)
    // encode: per (row, sub) the nearest codeword by L2 ⇔
    // argmax(dot(subv, cb) − |cb|²/2); then pack codes sub-ordered
    val subs = resid.select(col("neighbor_id"), col("cell"),
      VectorFns.norm2(col("cv")).as("norm"),
      posexplode(transform(sequence(lit(0), lit(m - 1)),
        j => slice(col("rv"), j * lit(dsub) + 1, lit(dsub))))
        .as(Seq("sub", "subv")))
    val coded = subs.join(broadcast(cb), "sub")
      .withColumn("__d",
        VectorFns.dot(col("subv"), col("cb_vec")) - col("cb_half"))
      .groupBy(col("neighbor_id"), col("sub"))
      .agg(min_by(col("code"),
          struct((-col("__d")).as("nd"), col("code"))).as("code"),
        max(col("cell")).as("cell"), max(col("norm")).as("norm"))
      .groupBy(col("neighbor_id"))
      .agg(transform(
          array_sort(collect_list(struct(col("sub"), col("code")))),
          x => x("code")).as("code"),
        max(col("cell")).as("cell"), max(col("norm")).as("norm"))
    coded.repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$outDir/pqcodes")
    cells.repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$outDir/cells")
    cents.write.mode("overwrite").parquet(s"$outDir/centroids")
    cb.drop("cb_half").write.mode("overwrite").parquet(s"$outDir/pq")
    spark.range(1).select(
      lit(nl).as("nlist"), lit(total).as("n_corpus"),
      lit(m).as("m"), lit(ksEff).as("ks"), lit(dsub).as("dsub"))
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/stats")
  }

  /** Retrieval against a [[buildIvfPqIndex]] index: IVFADC with exact
    * re-rank. Phase 1 (the cheap scan) reads ONLY pqcodes/ pruned to
    * the probed cells and scores every row by asymmetric-distance
    * lookup: approx_dot(q, v) ≈ dot(q, centroid(cell)) +
    * Σ_s LUT_q[s][code_s], where LUT_q[s][c] = dot(q_s, cb[s][c]) is
    * built once per query against the (m·ks·dsub)-float literal
    * codebook — per scanned row the work is m array lookups, not a
    * dim-wide dot. Phase 2 re-ranks the top `candMult·k` candidates
    * per query (per-cell then global prune, the [[ivfScorePipeline]]
    * discipline) EXACTLY against cells/ — the same rounded-cosine
    * score tree as every other tier, so the final (query, neighbor,
    * cosine, rank) rows are exact, and equal to the flat tiers'
    * whenever the candidate set covers the probed-cell top-k (the
    * registered query's spec-pinned regime).
    *
    * The 100 TB trade: phase 1's IO is the 16×-compressed codes;
    * phase 2 touches candMult·k·|Q| rows via a broadcast semi-join
    * against cell-pruned exact vectors. `candMult` dials candidate
    * recall against re-rank cost.
    */
  def ivfPqTopK(
      spark: org.apache.spark.sql.SparkSession, indexDir: String,
      queries: DataFrame, id: String, vec: String, k: Int,
      nProbe: Int = 0, targetRecall: Double = 0.0,
      candMult: Int = 5): DataFrame = {
    val st = spark.read.parquet(s"$indexDir/stats").head
    val nl = st.getAs[Int]("nlist")
    val m = st.getAs[Int]("m")
    val dsub = st.getAs[Int]("dsub")
    val np =
      if (nProbe > 0) nProbe
      else if (targetRecall > 0.0) servingConfigFor(nl, targetRecall)
      else math.max(1, nl / 2)
    val cents = broadcast(spark.read.parquet(s"$indexDir/centroids"))
    val queryCells = assignCells(queries, id, vec, cents,
      "query_id", "qv", keep = np)
    val probed = queryCells.select(col("cell")).distinct()
      .collect().map(_.get(0)).toSeq
    // the sub-codebooks as ONE nested literal (m·ks·dsub floats —
    // 64 KB at the 8×256×8 default): the LUT build is then a
    // codegen'd transform per query row, no per-row join
    val cbLocal = spark.read.parquet(s"$indexDir/pq")
      .orderBy(col("sub"), col("code"))
      .collect()
      .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_.getInt(1)).map(_.getSeq[Float](2)).toSeq)
    val cbLit = typedLit(cbLocal)
    // the LUT payload (m·ks doubles, ~16 KB/query) must never ride
    // the MULTIPLYING cell join — a sort-merge join deep-copies the
    // buffered row per match, turning a 60k-row scan into tens of GB
    // of row copies (measured 47 s at 30× before this split). So the
    // pairing and the payload travel separately:
    //  1. a SLIM (query_id, cell, __qc, qn) scalar table multiplies
    //     against the codes scan (cheap rows through whatever join
    //     AQE picks),
    //  2. the one-row-per-query LUT table joins BROADCAST on
    //     query_id — |Q|-sized build side, and under whole-stage
    //     codegen the ADC fold reads the build row's array in place,
    //     no per-match copy.
    val qPairs = queryCells
      .join(cents.select(col("cent_id").as("cell"), col("cent_vec")),
        "cell")
      .select(col("query_id"), col("cell"),
        VectorFns.dot(col("qv"), col("cent_vec")).as("__qc"),
        VectorFns.norm2(col("qv")).as("qn"))
    val qLut = queries
      .select(col(id).as("query_id"), col(vec).as("qv"))
      .withColumn("__lut",
        transform(sequence(lit(0), lit(m - 1)), s =>
          transform(element_at(cbLit, (s + 1).cast("int")), cbv =>
            VectorFns.dot(
              slice(col("qv"), s * lit(dsub) + 1, lit(dsub)), cbv))))
      .select(col("query_id"), col("__lut"))
    val codes = spark.read.parquet(s"$indexDir/pqcodes")
      .where(if (probed.isEmpty) lit(false)
        else col("cell").isin(probed: _*))
    // the ADC fold is UNROLLED over the m subspaces (m is a small
    // build-time constant): element_at chains stay inside whole-stage
    // codegen, where a higher-order `aggregate` would be a
    // CodegenFallback that forces every joined row — 16 KB LUT
    // included — to materialize for interpreted eval (measured: the
    // HOF form cost ~25 s of row copies at 30× that the unrolled
    // form doesn't pay)
    val adc = (0 until m).map(s =>
      element_at(element_at(col("__lut"), lit(s + 1)),
        (element_at(col("code"), lit(s + 1)) + 1).cast("int")))
      .reduce(_ + _)
    val approx = codes.join(qPairs, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .join(broadcast(qLut), Seq("query_id"))
      .withColumn("__a", col("__qc") + adc)
      .withColumn("__ac", when(col("qn") * col("norm") === 0.0, 0.0)
        .otherwise(col("__a") / (col("qn") * col("norm"))))
      // prune to scalars BEFORE the candidate windows (no wide
      // payload on the window exchange)
      .select(col("query_id"), col("neighbor_id"), col("cell"),
        col("__ac"))
    val candK = candMult * k
    val wc = Window.partitionBy(col("query_id"), col("cell"))
      .orderBy(col("__ac").desc, col("neighbor_id").asc)
    val wg = Window.partitionBy(col("query_id"))
      .orderBy(col("__ac").desc, col("neighbor_id").asc)
    val cand = approx
      .withColumn("__cr", row_number().over(wc))
      .filter(col("__cr") <= candK)
      .withColumn("__gr", row_number().over(wg))
      .filter(col("__gr") <= candK)
      .select(col("query_id"), col("neighbor_id"))
    // exact re-rank: the identical score tree as ivfScorePipeline, so
    // PQ changes WHICH rows are scored, never how
    val vecs = spark.read.parquet(s"$indexDir/cells")
      .where(if (probed.isEmpty) lit(false)
        else col("cell").isin(probed: _*))
      .withColumn("cn", VectorFns.norm2(col("cv")))
    val qVecs = queries.select(col(id).as("query_id"), col(vec).as("qv"))
      .withColumn("qn", VectorFns.norm2(col("qv")))
    val scored = vecs
      .join(broadcast(cand), Seq("neighbor_id"))
      .join(broadcast(qVecs), Seq("query_id"))
      .withColumn("cosine", round(
        when(col("qn") * col("cn") === 0.0, 0.0)
          .otherwise(VectorFns.dot(col("qv"), col("cv")) /
            (col("qn") * col("cn"))), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"),
        col("rank"))
  }

  /** Approximate top-k: LSH-bucketed join (same sign-pattern bucket
    * in at least one of `tables` independent hyperplane families),
    * then exact cosine rank within the candidate set.
    *
    * Tier guidance, measured (BASELINE.md round-8 IVF table): for
    * top-k retrieval this path LOSES to both [[bruteForceTopK]] and
    * [[ivfTopK]] at every measured size (0.85→18.3 s base→30× with
    * recall@10 collapsing to 0.09) — random-hyperplane buckets sized
    * by [[lshConfigFor]] only collide near-duplicates, and a top-10
    * neighborhood mostly sits at moderate cosine. Use it when the
    * task IS near-dup-grade (high-cosine k-NN); otherwise [[ivfTopK]]
    * past ~20k vectors, [[bruteForceTopK]] below.
    *
    * OR-amplification: a neighbor is a candidate if ANY table's
    * `planes`-bit sign pattern matches, so recall at fixed bucket
    * granularity rises as 1-(1-p^planes)^tables at linear cost in
    * `tables`. Each row posexplodes to `tables` (table, bucket) rows;
    * the join keys on BOTH so buckets from different families never
    * collide, and duplicate candidates from multiple agreeing tables
    * are collapsed before ranking.
    *
    * @param dim embedding dimensionality (hyperplanes are literal
    *            ±1 sign vectors of this length — see
    *            [[VectorFns.planeSigns]]; engine-portable, oracle-able)
    * @param planes 0 (default) sizes (planes, tables) from a corpus
    *               count via [[lshConfigFor]] — the measured scale
    *               rule; pass explicit values to pin a recall point
    * @param nHint  caller-known corpus size: skips the autosizing
    *               count job entirely (see [[lshNearDupPairs]])
    */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame, id: String, vec: String,
      k: Int, planes: Int = 0, dim: Int, tables: Int = 0,
      nHint: Long = 0L): DataFrame = {
    val (np, nt) =
      if (planes > 0) (planes, if (tables > 0) tables else 1)
      else {
        // auto planes must not discard an explicitly pinned tables
        val (autoP, autoT) = lshConfigFor(autoSize(corpus, nHint))
        (autoP, if (tables > 0) tables else autoT)
      }
    val buckets = (v: Column) =>
      array((0 until nt).map(t => VectorFns.lshBucket(v, t, np, dim)): _*)
    val q = queries.select(col(id).as("query_id"), col(vec).as("qv"),
      VectorFns.norm2(col(vec)).as("qn"),
      posexplode(buckets(col(vec))).as(Seq("__t", "__blk")))
    val c = corpus.select(col(id).as("neighbor_id"), col(vec).as("cv"),
      VectorFns.norm2(col(vec)).as("cn"),
      posexplode(buckets(col(vec))).as(Seq("__t", "__blk")))
    val matched = c.join(broadcast(q), Seq("__t", "__blk"))
      .filter(col("query_id") =!= col("neighbor_id"))
    // score BEFORE the cross-table dedup: the broadcast join is
    // map-side, so the cosine is computed without any shuffle and the
    // dedup then moves (query_id, neighbor_id, cosine) scalars — not
    // two float[dim] payloads per row. A multi-table duplicate costs
    // one redundant dot product instead of ~30× the shuffle bytes.
    val scored = matched.withColumn("cosine", round(
      when(col("qn") * col("cn") === 0.0, 0.0)
        .otherwise(VectorFns.dot(col("qv"), col("cv")) / (col("qn") * col("cn"))),
      6))
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
    // with a single table a pair can match at most once — skip the
    // dedup shuffle; with OR-amplification collapse multi-table hits
    val cand =
      if (nt == 1) scored
      else scored.dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    cand.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** The measured per-corpus-row overhead of the persisted-index arm
    * over brute force, in dot-product equivalents: probed-cell index
    * read + query-batch assignment + the deeper plan. Pinned by the
    * round-17 30× sweep (SCALE_OUT_30x_tier_r17.json, 60k rows,
    * f = 1/2): saved dots/row at the swept |Q| = 50/125/500/1000 gave
    * brute/indexed walls 1.6/3.5, 2.8/5.2, 7.7–8.4/9.2–11.2,
    * 48–83/12–13 s — brute still (narrowly) ahead at saved = 500,
    * indexed decisively ahead at saved = 1000 (brute's top-k window
    * shuffle starts SPILLING around 120M pair rows, so its wall goes
    * superlinear exactly where the index's probed scan doesn't). 600
    * sits mid-bracket; the r16 fixed-|Q| artifacts (brute wins at
    * saved = 50, clustered-indexed wins 6.4× at saved = 2625) land on
    * the same sides.
    */
  private val K_INDEXED = 600.0

  /** X3g: cost-based retrieval-tier chooser — the crossover between
    * brute / train-per-call IVF ("serving") / persisted-index IVF
    * ("indexed") encoded as a measured rule, the [[lshConfigFor]] /
    * [[ivfConfigFor]] precedent. Before this rule existed the
    * artifacts DOCUMENTED the crossover (r16: "at |Q|=100 brute wins
    * outright; at |Q|=3000 clustered the narrow probe wins 6.4×")
    * but callers had to know which tier to call.
    *
    * The model, in one currency (dot-products per corpus row):
    * brute scores |Q| dots/row. An IVF probe at fraction
    * f = nProbe/nlist scores |Q|·f, SAVING |Q|·(1−f); against that
    * the indexed arm pays [[K_INDEXED]] dots/row of overhead, and the
    * serving arm additionally re-pays codebook training + full-corpus
    * assignment — (iters+1) ≈ 3 assignment scans at nlist dots/row.
    * So:
    *   indexed wins iff |Q|·(1−f) > K_INDEXED
    *   serving wins iff |Q|·(1−f) > K_INDEXED + 3·nlist
    * with f from [[servingConfigFor]]'s recall curve (weak-structure
    * by default — the conservative curve that can only overshoot
    * recall). Both thresholds reproduce the observed regimes: the
    * serving margin at the 30× proportional slice (|Q|=3000, f=1/2:
    * saved 1500 vs threshold 600 + 768 = 1368) is thin — exactly the
    * measured "serving-beats-brute is thin-margin flaky" note.
    *
    * |Q| and |D| are the counts the caller already has (catalog
    * rowCounts at 100 TB); `clustered` narrows f via the planted-
    * cluster curve — let [[annTierAuto]] estimate it instead of
    * asserting it.
    */
  def annTierFor(nCorpus: Long, nQueries: Long, hasIndex: Boolean,
      targetRecall: Double = 0.9, clustered: Boolean = false): AnnTier = {
    val nl = ivfConfigFor(nCorpus)._1
    val np = servingConfigFor(nl, targetRecall, clustered)
    val saved = nQueries.toDouble * (1.0 - np.toDouble / nl)
    if (hasIndex) {
      if (saved > K_INDEXED) AnnTier.Indexed(np) else AnnTier.Brute
    } else if (saved > K_INDEXED + 3.0 * nl) AnnTier.Serving(nl, np)
    else AnnTier.Brute
  }

  /** Bounded structure probe behind [[annTierAuto]] — measures
    * whether the corpus has the cluster structure that makes the
    * narrow-probe curve safe, instead of requiring the caller to
    * assert it (the r16 gap: `servingConfigFor(clustered = true)`
    * was caller-asserted).
    *
    * Statistic: the mean ASSIGNMENT MARGIN — best-centroid cosine
    * minus second-best — over a ≤ `sampleN` hash sample against 16
    * md5-rank sampled centroids. On clustered data a vector sits
    * decisively inside one cell (large margin), which is precisely
    * the property that makes its neighbors co-resident and a narrow
    * probe sufficient; on unstructured data best ≈ second
    * (margin ~0) and narrow probes lose recall. Threshold 0.15
    * separates the planted-cluster fixture (measured margin ≈ 0.36 —
    * duplicate same-cluster centroid samples keep it well below the
    * within-cluster cosine) from the weak sin-lattice fixture
    * (≈ 0.06), ~2.5× on each side (both spec-pinned).
    *
    * Cost: one bounded sample scan + 16-row broadcast — thousands of
    * dots, amortized invisibly into any decision large enough for
    * the answer to matter ([[annTierAuto]] only calls it when the
    * weak- and clustered-curve decisions DISAGREE).
    */
  def estimateClustered(corpus: DataFrame, id: String, vec: String,
      nHint: Long = 0L, sampleN: Int = 4096,
      minMargin: Double = 0.15): Boolean =
    memoizedMargin(corpus, id, vec, nHint, sampleN) >= minMargin

  /** Session-lifetime memo of [[clusterMargin]], keyed by the corpus'
    * CANONICALIZED analyzed plan (+ column names + sampleN + nHint): the probe
    * measures a property of the corpus, so a serving loop that calls
    * [[annTierAuto]] per query batch over the same frame must pay the
    * sample scan ONCE, not per call (the r17 q_ann_auto driver-window
    * finding). Canonicalized-plan identity is how Spark itself keys
    * exchange/subquery reuse; it is exact for the same frame and for
    * alias-differing rewrites of it. Bounded at 64 entries (evicting
    * oldest — each entry holds a plan reference, so unbounded growth
    * would pin lineage). Staleness hazard: files mutated in place
    * under an identical plan mid-session would serve the old margin —
    * acceptable because the margin only ever narrows/widens the PROBE
    * of a recall-contract tier, never changes exact results.
    */
  private val marginMemo
      : java.util.Map[(Any, String, String, Int, Long), java.lang.Double] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[(Any, String, String, Int, Long), java.lang.Double](
        16, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[(Any, String, String, Int, Long), java.lang.Double])
            : Boolean = size() > 64
      })

  private def memoizedMargin(corpus: DataFrame, id: String, vec: String,
      nHint: Long, sampleN: Int): Double = {
    // nHint is part of the key: clusterMargin's sampling fraction
    // depends on autoSize(corpus, nHint), so a later call on the same
    // corpus under a DIFFERENT hint must not be served a margin
    // estimated at another sampling rate (r18 ADVICE). The raw hint —
    // not the resolved size — keeps the key free (resolving at
    // nHint = 0 would fire the count job memoization exists to avoid).
    val key = (corpus.queryExecution.analyzed.canonicalized: Any,
      id, vec, sampleN, nHint)
    val cached = marginMemo.get(key)
    if (cached != null) cached.doubleValue()
    else {
      val m = clusterMargin(corpus, id, vec, nHint, sampleN)
      marginMemo.put(key, java.lang.Double.valueOf(m))
      m
    }
  }

  /** The raw statistic behind [[estimateClustered]] (exposed for the
    * spec's fixture pinning): mean best-minus-second centroid-cosine
    * margin over a bounded hash sample.
    */
  private[graft] def clusterMargin(corpus: DataFrame, id: String,
      vec: String, nHint: Long = 0L, sampleN: Int = 4096): Double = {
    val n = autoSize(corpus, nHint)
    val samp =
      (if (n <= sampleN) corpus
       else corpus.where(
         pmod(xxhash64(col(id)), lit(1000003L)) <
           lit(math.max(1L, (sampleN.toLong * 1000003L) / n))))
        .select(col(id).as("__sid"), col(vec).as("__sv"))
    val cents = broadcast(sampleCentroids(samp, "__sid", "__sv", 16))
    val nn = VectorFns.norm2(col("__sv")) * VectorFns.norm2(col("cent_vec"))
    val scored = samp.join(cents, expr("true"))
      .withColumn("__c", when(nn === 0.0, 0.0)
        .otherwise(VectorFns.dot(col("__sv"), col("cent_vec")) / nn))
    val w = Window.partitionBy(col("__sid"))
      .orderBy(col("__c").desc, col("cent_id").asc)
    scored.withColumn("__r", row_number().over(w))
      .filter(col("__r") <= 2)
      .groupBy(col("__sid"))
      .agg((max(when(col("__r") === 1, col("__c"))) -
        max(when(col("__r") === 2, col("__c")))).as("__m"))
      .agg(avg(col("__m"))).head.getDouble(0)
  }

  /** [[annTierFor]] with the structure question answered by
    * measurement: probe [[estimateClustered]] ONLY when the weak- and
    * clustered-curve decisions disagree (when they agree, structure
    * cannot change the call and the probe's cost is pure waste).
    * An explicit `clustered` pin skips the probe entirely.
    */
  def annTierAuto(corpus: DataFrame, queries: DataFrame, id: String,
      vec: String, hasIndex: Boolean, nHint: Long = 0L,
      qHint: Long = 0L, targetRecall: Double = 0.9,
      clustered: Option[Boolean] = None): AnnTier = {
    val n = autoSize(corpus, nHint)
    val nq = autoSize(queries, qHint)
    clustered match {
      case Some(cl) => annTierFor(n, nq, hasIndex, targetRecall, cl)
      case None =>
        val weak = annTierFor(n, nq, hasIndex, targetRecall, clustered = false)
        val strong = annTierFor(n, nq, hasIndex, targetRecall, clustered = true)
        if (weak == strong) weak
        else annTierFor(n, nq, hasIndex, targetRecall,
          estimateClustered(corpus, id, vec, nHint = n))
    }
  }

  /** X3g dispatch face: one ANN entry point that runs whatever tier
    * [[annTierAuto]] picks — the production caller's "just retrieve"
    * API. All tiers emit the same (query_id, neighbor_id, cosine,
    * rank) shape with the same rounded-cosine + id-tiebreak ordering,
    * so the choice is semantics-transparent at full probe and a
    * recall contract otherwise. Pass `indexDir` when a persisted
    * [[buildIvfIndex]] index exists — the chooser then weighs the
    * indexed arm; without it only brute/serving compete.
    */
  def annTopKAuto(corpus: DataFrame, queries: DataFrame, id: String,
      vec: String, k: Int, indexDir: String = null, nHint: Long = 0L,
      qHint: Long = 0L, targetRecall: Double = 0.9,
      clustered: Option[Boolean] = None): DataFrame =
    annTierAuto(corpus, queries, id, vec, hasIndex = indexDir != null,
      nHint, qHint, targetRecall, clustered) match {
      case AnnTier.Brute =>
        bruteForceTopK(corpus, queries, id, vec, k)
      case AnnTier.Serving(nl, np) =>
        ivfTopKServing(corpus, queries, id, vec, k,
          nlist = nl, nProbe = np, nHint = nHint)
      case AnnTier.Indexed(np) =>
        ivfTopKIndexed(corpus.sparkSession, indexDir, queries,
          id, vec, k, nProbe = np)
    }
}

/** The ANN execution tiers [[Similarity.annTierFor]] chooses among:
  * exact brute force, train-per-call IVF at (nlist, nProbe), or the
  * persisted [[Similarity.buildIvfIndex]] index at nProbe.
  */
sealed trait AnnTier
object AnnTier {
  case object Brute extends AnnTier
  final case class Serving(nlist: Int, nProbe: Int) extends AnnTier
  final case class Indexed(nProbe: Int) extends AnnTier
}
