package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X19 BM25 lexical retrieval — score a bag-of-words query against a
  * document corpus with Okapi BM25 (Robertson & Zaragoza 2009, "The
  * Probabilistic Relevance Framework: BM25 and Beyond") and return the
  * top-k documents. The lexical complement of the ANN tier
  * ([[Similarity]]): ANN retrieves by embedding geometry, BM25 by exact
  * term statistics — a training-data pipeline needs both (hard-negative
  * mining, hybrid retrieval, benchmark-query decontamination by
  * retrieval rank).
  *
  * Per matched (doc, term):
  *   idf(t) = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))   (Lucene form —
  *     nonnegative for any df, unlike the raw Robertson idf)
  *   s(d,t) = idf(t) · tf · (k1+1) / (tf + k1 · (1 - b + b · dl/avgdl))
  * and score(d) = Σ_t s(d,t) over the query's distinct terms.
  *
  * Scale shape (the 100 TB posture):
  *  - the corpus scan filters to query terms BEFORE any shuffle — the
  *    `isin` predicate sits inside the exploded projection, so the only
  *    doc-keyed aggregation runs over matched postings (|matches|, not
  *    |corpus tokens| rows). No posting list materialization, no global
  *    index: BM25-as-a-query, the shape a one-off mining pass wants.
  *  - corpus stats (N, avgdl) are one tiny aggregate broadcast back;
  *    per-term df is a |terms|-row aggregate, also broadcast. Both are
  *    partial-aggregated map-side before their one narrow shuffle.
  *  - the doc length `dl` RIDES the exploded projection (it is
  *    functional on the doc id), so there is no doc-keyed (id, dl)
  *    join at any scale — the r21 optimization round deleted the
  *    corpus-cardinality exchange the previous shape paid for it.
  *  - final top-k is TakeOrderedAndProject (orderBy + limit fuse), no
  *    global sort materialization.
  *
  * Determinism: every INPUT to the score expression is exact (tf, df,
  * N, dl are integer counts — their double sums are exact, so avgdl is
  * too), and the per-term score is one fixed-shape IEEE expression tree
  * — bit-identical cross-engine. The only order-sensitive step would be
  * the per-doc SUM of term scores (double addition is not associative,
  * and shuffle order is arbitrary), so that sum runs DECIMAL-exact over
  * per-term scores rounded to 9 places — summation order can never
  * leak into the score (the X13 unigram-LM convention). Ties break on
  * doc id. `dl` counts ALL tokens of the doc (not just matches) per
  * the standard definition.
  */
object Retrieval {

  /** Fourth auto-config rule (after `Similarity.lshConfigFor` /
    * `ivfConfigFor` / `servingConfigFor`): the df-cap fraction for the
    * BM25 dense-match regime, by corpus size. Below `AutoDfCapMinDocs`
    * documents the cap is OFF (1.0) — small-corpus scoring stays exact
    * and every oracle SF is bit-unchanged; above it, terms in more
    * than 70% of documents are dropped before the postings join.
    *
    * Quality bound (why 0.7 is safe): a term with df = 0.7·N has
    * idf = ln(1 + 0.3/0.7) ≈ 0.36 versus ≈ ln(N/df) for informative
    * terms — its per-doc contribution is bounded by 0.36·(k1+1), and
    * because it appears in ~every candidate it shifts mostly the
    * LEVEL of scores, not the ranking (rank agreement vs uncapped is
    * hard-asserted in RetrievalSpec on the dense-band fixture).
    * Measured (Bm25CapBench, BASELINE.md): on the worst-case
    * shared-vocabulary fixture the 0.7 cap cuts the dense
    * |Q|·|corpus| aggregate 8.2 s → ~1 s at sf0.1 while keeping
    * top-1 picks and sub-cap rankings.
    *
    * This is the library DEFAULT for [[bm25JoinTopK]] (negative
    * `maxDfFraction` sentinel): the rule is evaluated INSIDE the plan
    * against the already-computed corpus-stats aggregate (a 1-row
    * broadcast), so choosing the cap costs zero extra jobs and the
    * same code sizes itself from sf0.001 to a 100 TB corpus.
    */
  def dfCapFor(nDocs: Long): Double =
    if (nDocs <= AutoDfCapMinDocs) 1.0 else 0.7

  /** Corpus-size floor below which the auto df-cap stays off: under
    * ~1000 docs a 70%-df term still carries usable signal relative to
    * the tiny collection, and the dense aggregate is bounded by the
    * corpus itself — capping buys nothing and perturbs exact small-
    * corpus scoring (the sf0.001/sf0.01 oracle regimes stay exact on
    * the default path by construction).
    */
  val AutoDfCapMinDocs: Long = 1000L

  /** X19b Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009,
    * "Reciprocal Rank Fusion outperforms Condorcet and individual
    * Rank Learning Methods"): merge N ranked candidate lists into one
    * by score(d) = Σ_lists 1/(c + rank_list(d)), the standard way a
    * hybrid retrieval pipeline combines a lexical (BM25) and a vector
    * (ANN) ranking without score calibration — only RANKS cross the
    * fusion boundary, so the lists' score scales never need to agree.
    *
    * Input lists are (id, score) frames; ranks are assigned here as
    * row_number over (score desc, id) — deterministic under ties and
    * identical cross-engine. A document absent from a list contributes
    * nothing for it (the RRF convention). The fused score sums
    * DECIMAL-exact over per-list terms rounded to 9 places (order-free,
    * the X13 convention), then rounds to 6 for the output.
    *
    * CONTRACT: each input list must be top-k-bounded by its producer —
    * an unbounded frame funnels through this function's per-list
    * global (single-partition) rank window and would serialize the
    * corpus through one task. Bounded-ness is the producer's job
    * (`bm25TopK`/`annTopK` emit ≤ k rows) and is not re-checked here;
    * id-uniqueness WITHIN a list, however, is enforced — a duplicate
    * id would inflate `n_lists` and double-count its fused score, so
    * each list is collapsed to its best (smallest) rank per id before
    * fusion.
    *
    * Scale shape: with the bounded contract, every window and the
    * fusion join run on k·|lists| rows regardless of corpus size; the
    * heavy lifting stays in the producers. `union of lists → groupBy
    * id` is one tiny shuffle.
    */
  def rrfFuse(
      lists: Seq[DataFrame], id: String, score: String, k: Int,
      c: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuse: no input rankings")
    val ranked = lists.zipWithIndex.map { case (df, i) =>
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col(score).desc, col(id))
      // per-list global window: input is a top-k list (bounded), so
      // the single-partition sort is over k rows, never the corpus.
      // groupBy/min collapses duplicate ids to their best rank (a
      // no-op for well-formed producers, insurance otherwise)
      df.select(col(id).as("__fid"),
        row_number().over(w).cast("double").as("__r"))
        .groupBy(col("__fid")).agg(min(col("__r")).as("__r"))
        .withColumn("__list", lit(i))
    }
    ranked.reduce(_ unionByName _)
      .withColumn("__term", round(lit(1.0) / (lit(c.toDouble) + col("__r")), 9)
        .cast("decimal(28,9)"))
      .groupBy(col("__fid"))
      .agg(round(sum(col("__term")).cast("double"), 6).as("rrf_score"),
        count(lit(1)).cast("long").as("n_lists"),
        min(col("__r")).cast("long").as("best_rank"))
      .select(col("__fid").as(id), col("rrf_score"), col("n_lists"),
        col("best_rank"))
      .orderBy(col("rrf_score").desc, col(id))
      .limit(k)
  }

  /** X19f: per-query RRF — [[rrfFuse]] generalized to a BATCH of
    * queries, the production read of a hybrid retrieval service:
    * each query's lexical list ([[bm25JoinTopKIndexed]]) and vector
    * list ([[graft.operators.Similarity.ivfTopKIndexed]]) fuse
    * independently, per query. Same term arithmetic (round-9 DECIMAL
    * per-list terms, round-6 fused score), same duplicate-id collapse
    * per (query, list); rank windows partition BY QUERY, so the
    * bounded contract becomes per-query: every window sorts ≤ k rows
    * within its query partition and |Q| is the parallelism floor —
    * no single-partition funnel at any query-batch size.
    *
    * Output: (queryId, id, rrf_score, n_lists, best_rank, rnk) —
    * top-`k` per query by (rrf_score desc, id).
    */
  def rrfFusePerQuery(
      lists: Seq[DataFrame], queryId: String, id: String, score: String,
      k: Int, c: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFusePerQuery: no input rankings")
    val ranked = lists.map { df =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__qid"))
        .orderBy(col(score).desc, col("__fid"))
      df.select(col(queryId).as("__qid"), col(id).as("__fid"), col(score))
        .withColumn("__r", row_number().over(w).cast("double"))
        .groupBy(col("__qid"), col("__fid")).agg(min(col("__r")).as("__r"))
    }
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__qid"))
      .orderBy(col("rrf_score").desc, col("__fid"))
    ranked.reduce(_ unionByName _)
      .withColumn("__term",
        round(lit(1.0) / (lit(c.toDouble) + col("__r")), 9)
          .cast("decimal(28,9)"))
      .groupBy(col("__qid"), col("__fid"))
      .agg(round(sum(col("__term")).cast("double"), 6).as("rrf_score"),
        count(lit(1)).cast("long").as("n_lists"),
        min(col("__r")).cast("long").as("best_rank"))
      .withColumn("rnk", row_number().over(wq).cast("long"))
      .where(col("rnk") <= k)
      .select(col("__qid").as(queryId), col("__fid").as(id),
        col("rrf_score"), col("n_lists"), col("best_rank"), col("rnk"))
  }

  /** X19c BM25 retrieval JOIN — every row of `queries` is a
    * bag-of-words query, scored against the whole corpus; returns the
    * top-k corpus docs per query. The many-query generalization of
    * [[bm25TopK]] and the retrieval-rank face of decontamination /
    * hard-negative mining: queries = benchmark or anchor documents,
    * output = the corpus docs a retriever would surface for each —
    * exactly the pairs to drop (decon) or mine (negatives).
    *
    * Scoring is identical to [[bm25TopK]] per (query, doc) pair over
    * the INTERSECTION of their term sets (query terms are distinct —
    * a query mentioning a word twice doesn't double its idf weight;
    * corpus-side tf does the frequency work, the standard BM25 query
    * model).
    *
    * Scale shape: the production regime is benchmark ≪ corpus, the
    * same asymmetry as `Curation.decontaminate` — the distinct
    * (query, term) set is broadcast, so corpus postings are filtered
    * AT the broadcast join with no corpus-side shuffle until the
    * (query, doc)-keyed partial aggregate over MATCHED postings; the
    * per-query top-k window partitions by query (query count =
    * parallelism floor). The corpus-cardinality (id, dl) join is the
    * same unavoidable exchange [[bm25TopK]] documents.
    */
  /** `maxDfFraction` bounds the dense-match regime: query terms whose
    * corpus document frequency exceeds `maxDfFraction · N` are dropped
    * BEFORE the postings join — the classic stopword/df-cap prune.
    * Rationale: a term in nearly every document has
    * idf ≈ ln(1 + 0.5/(df+0.5)) ≈ 0, so its score contribution is
    * near-noise, yet it alone can make every query match every
    * document and drive the (query, doc, term) aggregate to
    * |Q|·|corpus| (the measured worst case on the small-vocabulary
    * fixture: ~all 5k docs × all queries). Dropping it changes scores
    * only by the dropped near-zero terms (and `n_terms` by their
    * count); a query whose terms are ALL capped returns no rows.
    *
    * Default is the AUTO rule ([[dfCapFor]], negative sentinel):
    * off below [[AutoDfCapMinDocs]] docs, 0.7 at corpus scale — the
    * threshold is evaluated in-plan against the broadcast corpus
    * stats, so no extra job runs. Pass 1.0 to force exact scoring at
    * any size, or an explicit fraction to pin the cap (the registered
    * `q_bm25_join_capped` pins 0.7 for oracle determinism).
    *
    * BEHAVIOR CHANGE (since the auto rule landed): the default was
    * previously exact scoring (1.0). A caller on a corpus over
    * [[AutoDfCapMinDocs]] documents now has terms with df > 70%
    * silently dropped — scores, `n_terms`, and (for queries whose
    * terms are ALL that dense) result membership can differ from the
    * old default. Pass `maxDfFraction = 1.0` explicitly to keep the
    * old behavior.
    */
  def bm25JoinTopK(
      corpus: DataFrame, corpusId: String, corpusText: Column,
      queries: DataFrame, queryId: String, queryText: Column,
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      maxDfFraction: Double = -1.0): DataFrame = {
    val qTerms0 = queries.select(col(queryId).as("__qid"),
      explode(split(queryText, " ")).as("tok")).distinct()
    val stats = corpus
      .select(size(split(corpusText, " ")).cast("double").as("dl"))
      .agg(count(lit(1)).cast("double").as("n_docs"),
        avg(col("dl")).as("avgdl"))
    // r21 optimization (guide §2.3 "aggregate before you shuffle"):
    // postings are pre-aggregated to ONE row per (doc, term) BEFORE
    // any query id enters the plan. The old shape joined raw token
    // INSTANCES to the (query, term) set and counted tf per (query,
    // doc, term) — every corpus token was replicated once per query
    // sharing it before the partial aggregate (measured 6.6 s at
    // sf0.1 on the dense worst case, 4.0 s with the pre-agg). `dl`
    // rides the explode in the same pass (it is functional on the doc
    // id), which deletes the corpus-cardinality (id, dl) join the old
    // scaladoc called unavoidable. tf values, dl values and the
    // downstream score tree are bit-identical to the old shape
    // (RetrievalSpec's indexed-parity pins the same property).
    //
    // The df/cap plumbing differs by arm because the work it bounds
    // differs (both arms measured at sf0.1):
    //  - EXACT arm (maxDfFraction >= 1.0): no term is ever dropped, so
    //    the (doc, term) pre-aggregate is computed ONCE, cached, and
    //    feeds BOTH the df aggregate (a plain count per term — the
    //    postings table is already distinct per (doc, term)) and the
    //    scoring join. One corpus pass instead of the old two.
    //  - CAPPED/AUTO arm: df comes from a distinct pass (as before)
    //    and the cap prunes INSIDE the exploded scan projection of the
    //    tf pass — a capped term's postings die before the aggregate,
    //    so the dense band never reaches any shuffle (pre-aggregating
    //    it first, as the exact arm does, measured +1 s at sf0.1 —
    //    and at corpus scale would shuffle exactly the volume the cap
    //    exists to drop). The AUTO sentinel resolves IN-PLAN from the
    //    broadcast 1-row stats aggregate (dfCapFor mirrored as a
    //    when(): off below the doc floor, 0.7 above) — zero extra
    //    jobs to pick the cap.
    val qVocab = qTerms0.select(col("tok")).distinct()
    val explodedWithDl = corpus.select(col(corpusId).as("__did"),
      size(split(corpusText, " ")).cast("double").as("dl"),
      explode(split(corpusText, " ")).as("tok"))
    val (matchedPostings, cachedOpt) =
      if (maxDfFraction >= 1.0) {
        val tfq = explodedWithDl
          .join(broadcast(qVocab), "tok")
          .groupBy(col("__did"), col("tok"), col("dl"))
          .agg(count(lit(1)).cast("double").as("tf"))
          .cache()
        val dfreq = tfq.groupBy(col("tok"))
          .agg(count(lit(1)).cast("double").as("dfc"))
        (tfq.join(broadcast(qTerms0.join(broadcast(dfreq), "tok")), "tok"),
          Some(tfq))
      } else {
        val dfreq = corpus.select(col(corpusId).as("__did"),
            explode(split(corpusText, " ")).as("tok"))
          .join(broadcast(qVocab), "tok")
          .select(col("__did"), col("tok")).distinct()
          .groupBy(col("tok")).agg(count(lit(1)).cast("double").as("dfc"))
        val capExpr: Column =
          if (maxDfFraction < 0.0)
            when(col("n_docs") > AutoDfCapMinDocs, lit(0.7)).otherwise(lit(1.0))
          else lit(maxDfFraction)
        val keep = dfreq.crossJoin(stats)
          .where(col("dfc") <= capExpr * col("n_docs"))
          .select(col("tok"), col("dfc"))
        val tfk = explodedWithDl
          .join(broadcast(keep), "tok")
          .groupBy(col("__did"), col("tok"), col("dl"), col("dfc"))
          .agg(count(lit(1)).cast("double").as("tf"))
        (tfk.join(broadcast(qTerms0), "tok"), None)
      }
    val idf = log(lit(1.0) +
      (col("n_docs") - col("dfc") + 0.5) / (col("dfc") + 0.5))
    val norm = col("tf") + lit(k1) *
      (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))
    val scored = matchedPostings
      .crossJoin(broadcast(stats))
      .withColumn("__s", idf * col("tf") * lit(k1 + 1.0) / norm)
      .groupBy(col("__qid"), col("__did"))
      .agg(round(sum(round(col("__s"), 9).cast("decimal(28,9)"))
        .cast("double"), 6).as("score"),
        count(lit(1)).cast("long").as("n_terms"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__qid"))
      .orderBy(col("score").desc, col("__did"))
    val out = scored.withColumn("__rk", row_number().over(w).cast("long"))
      .where(col("__rk") <= k)
      .select(col("__qid").as(queryId), col("__did").as(corpusId),
        col("score"), col("n_terms"), col("__rk").as("rnk"))
    cachedOpt match {
      case Some(c) => CacheLifecycle.releaseAfterAction(out, c)
      case None => out
    }
  }

  /** `maxDfFraction` as in [[bm25JoinTopK]] (opt-in, default off):
    * terms with corpus df > maxDfFraction · N are dropped from the
    * score. With a literal term list there is no |Q|·|corpus| blowup
    * to prevent — here the cap bounds the (doc, term) match volume
    * and keeps single-query semantics aligned with the join form.
    */
  def bm25TopK(
      docs: DataFrame, id: String, text: Column, terms: Seq[String],
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      maxDfFraction: Double = 1.0): DataFrame = {
    require(terms.nonEmpty, "bm25TopK: empty query")
    // postings for the query terms only — the filter rides inside the
    // generate/project, so everything downstream is |matches|-sized;
    // dl rides the explode (functional on the doc id), which deletes
    // the corpus-cardinality (id, dl) join the old shape paid (r21,
    // guide §2.4 — values and score tree bit-identical)
    val matched = docs.select(col(id).as("__did"),
        size(split(text, " ")).cast("double").as("dl"),
        explode(split(text, " ")).as("tok"))
      .where(col("tok").isin(terms.map(lit): _*))
    // cached: the (doc, term) postings feed both the df aggregate and
    // the scoring join — one corpus pass instead of two
    val tf = matched.groupBy(col("__did"), col("tok"), col("dl"))
      .agg(count(lit(1)).cast("double").as("tf"))
      .cache()
    val stats = docs
      .select(size(split(text, " ")).cast("double").as("dl"))
      .agg(count(lit(1)).cast("double").as("n_docs"),
        avg(col("dl")).as("avgdl"))
    // tf is already one row per (doc, term): df is a plain count per
    // term — no second distinct pass over token instances
    val dfreq0 = tf.groupBy(col("tok"))
      .agg(count(lit(1)).cast("double").as("dfc"))
    val dfreq =
      if (maxDfFraction >= 1.0) dfreq0
      else dfreq0.crossJoin(stats)
        .where(col("dfc") <= lit(maxDfFraction) * col("n_docs"))
        .select(col("tok"), col("dfc"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("dfc") + 0.5) / (col("dfc") + 0.5))
    val norm = col("tf") + lit(k1) *
      (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))
    val out = tf.join(broadcast(dfreq), "tok")
      .crossJoin(broadcast(stats))
      .withColumn("__s", idf * col("tf") * lit(k1 + 1.0) / norm)
      .groupBy(col("__did"))
      .agg(round(sum(round(col("__s"), 9).cast("decimal(28,9)"))
        .cast("double"), 6).as("score"),
        count(lit(1)).cast("long").as("n_terms"))
      .select(col("__did").as(id), col("score"), col("n_terms"))
      .orderBy(col("score").desc, col(id))
      .limit(k)
    CacheLifecycle.releaseAfterAction(out, tf)
  }

  /** X19e: the partitioned-postings index — the inverted-index trade
    * the [[bm25JoinTopK]] scaladoc names. Build ONCE per corpus
    * version; retrieve MANY times without ever touching the corpus
    * again.
    *
    * Build: postings pre-aggregated to one row per (term, doc) —
    * (tok, doc, tf) with the doc length `dl` and the term's corpus
    * document frequency `dfc` DENORMALIZED onto the row — written
    * hash-partitioned on the term (`pb = pmod(xxhash64(tok),
    * nBuckets)`) and term-sorted within files, plus a 1-row stats
    * table (n_docs, avgdl, n_buckets). Denormalizing dl and dfc costs
    * one extra column pair on a (term, doc)-cardinality table and
    * removes BOTH query-time joins that make index-free BM25 pay a
    * corpus-cardinality exchange per retrieval: the (id, dl) join and
    * the df aggregate each run once, here.
    *
    * Query: the per-retrieval plan reads ONLY the postings partitions
    * containing some query term — the pruning keys are ≤ n_buckets
    * literals (a bounded driver-side collect, the Bloom-cap
    * convention), so partition pruning is static and the scan volume
    * is (query-vocabulary buckets / n_buckets) of the postings table,
    * with term-sorted row groups pruning further via tok min/max.
    * Matched postings then run the IDENTICAL score tree to
    * [[bm25JoinTopK]] (same operand order, same round-9 DECIMAL sum),
    * so indexed and index-free results are bit-equal at equal cap
    * settings (RetrievalSpec pins this).
    *
    * Scale shape (the 100 TB posture): build is the one corpus pass
    * (explode → two aggregates → one doc-keyed and one term-keyed
    * shuffle); `nBuckets` is the parallelism/pruning dial — size it so
    * a bucket's postings fit an executor's scan appetite (thousands at
    * 100 TB). Query-time cost is matched-postings-sized, independent
    * of corpus growth when the query vocabulary is stable — exactly
    * the regime the r14 scale measurement flagged (21-24 s re-exploding
    * a 30-100× corpus per retrieval; the index amortizes that pass).
    */
  def buildPostingsIndex(corpus: DataFrame, corpusId: String,
      corpusText: Column, outDir: String, nBuckets: Int = -1): Unit = {
    require(nBuckets > 0 || nBuckets == -1,
      s"nBuckets must be positive (or -1 = auto): $nBuckets")
    // AUTO bucket count (r21, guide §6 "small files hurt twice"): the
    // old fixed default (64) wrote 64 one-file partition directories
    // regardless of corpus size — at fixture scale every retrieval
    // paid 64 directory listings + parquet footer opens for a few KB
    // each (the pruned-scan stage measured ~1 s at sf0.1, almost all
    // per-file overhead). The rule sizes buckets at ≥ ~1000 docs of
    // postings each (file sizes past the tiny-file regime at small
    // corpora) and caps at 4096 (the "thousands at 100 TB" dial the
    // scale note names — ~250k docs of postings per bucket at 1e9
    // docs). Bucket count changes LAYOUT only: scores are bit-equal
    // at any nBuckets (RetrievalSpec pins indexed-vs-direct parity).
    val buckets =
      if (nBuckets > 0) nBuckets
      else math.min(4096L, math.max(4L, corpus.count() / 1000L)).toInt
    // dl rides the explode (functional on the doc id) — the build's
    // doc-keyed (id, dl) join deleted outright (r21, guide §2.4); the
    // denormalized dl value is bit-identical (same size(split) tree)
    val tf = corpus.select(col(corpusId).as("__did"),
        size(split(corpusText, " ")).cast("double").as("dl"),
        explode(split(corpusText, " ")).as("tok"))
      .groupBy(col("__did"), col("tok"), col("dl"))
      .agg(count(lit(1)).cast("double").as("tf"))
    // df from the (doc, term) table — one row per pair already, so the
    // distinct is free; full vocabulary (the index serves any query)
    val dfreq = tf.groupBy(col("tok"))
      .agg(count(lit(1)).cast("double").as("dfc"))
    val postings = tf.join(dfreq, "tok")
      .withColumn("pb", pmod(xxhash64(col("tok")), lit(buckets.toLong)))
    postings
      .repartition(col("pb"))
      .sortWithinPartitions(col("tok"), col("__did"))
      .write.mode("overwrite").partitionBy("pb")
      .parquet(s"$outDir/postings")
    // stats written LAST — its _SUCCESS is the index's completeness
    // marker (callers gate reuse on it, the scaledDir convention)
    corpus.select(size(split(corpusText, " ")).cast("double").as("dl"))
      .agg(count(lit(1)).cast("double").as("n_docs"),
        avg(col("dl")).as("avgdl"))
      .withColumn("n_buckets", lit(buckets))
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/stats")
  }

  /** Retrieval against a [[buildPostingsIndex]] index — semantics
    * identical to [[bm25JoinTopK]] on the index's corpus (same BM25
    * tree, same df-cap contract including the AUTO sentinel default,
    * same top-k tie-break), with the corpus replaced by the pruned
    * postings scan. See [[buildPostingsIndex]] for the cost shape.
    */
  def bm25JoinTopKIndexed(
      spark: org.apache.spark.sql.SparkSession, indexDir: String,
      corpusId: String, queries: DataFrame, queryId: String,
      queryText: Column, k: Int, k1: Double = 1.2, b: Double = 0.75,
      maxDfFraction: Double = -1.0): DataFrame = {
    // 1-row stats read — bounded driver-side control structure
    val st = spark.read.parquet(s"$indexDir/stats").head
    val nDocs = st.getAs[Double]("n_docs")
    val avgdl = st.getAs[Double]("avgdl")
    val nBuckets = st.getAs[Int]("n_buckets")
    val cap =
      if (maxDfFraction < 0.0) dfCapFor(nDocs.toLong) else maxDfFraction
    val qTerms = queries.select(col(queryId).as("__qid"),
      explode(split(queryText, " ")).as("tok")).distinct()
    // ≤ n_buckets literal partition keys: static pruning, never a scan
    // of buckets no query term hashes into
    val qb = qTerms
      .select(pmod(xxhash64(col("tok")), lit(nBuckets.toLong)).as("pb"))
      .distinct().collect().map(_.getLong(0)).toSeq
    val pruned = spark.read.parquet(s"$indexDir/postings")
      .where(if (qb.isEmpty) lit(false) else col("pb").isin(qb: _*))
      .where(col("dfc") <= lit(cap) * lit(nDocs))
    // Scan parallelism is bounded by the pruned FILE count (one file
    // per bucket; tiny parquet files don't split), but the query join
    // below expands each posting by the queries sharing its term —
    // CPU work the file count under-provisions. When the pruned scan
    // is narrower than the cluster, one cheap postings-sized exchange
    // buys full width for the expansion (r21; the q_bm25_join
    // repartition rationale). At scale the bucket count (thousands)
    // already exceeds the core count and the branch is a no-op —
    // scale-adaptive, not a local[32] constant.
    val width = spark.sparkContext.defaultParallelism
    val matched =
      (if (pruned.rdd.getNumPartitions < width) pruned.repartition(width)
       else pruned)
      .join(broadcast(qTerms), "tok")
    // IDENTICAL expression trees to bm25JoinTopK (operand order
    // included) — stats enter as literals carrying the same values the
    // direct arm computes in-plan, so scores are bit-equal
    val idf = log(lit(1.0) +
      (lit(nDocs) - col("dfc") + 0.5) / (col("dfc") + 0.5))
    val norm = col("tf") + lit(k1) *
      (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl))
    val scored = matched
      .withColumn("__s", idf * col("tf") * lit(k1 + 1.0) / norm)
      .groupBy(col("__qid"), col("__did"))
      .agg(round(sum(round(col("__s"), 9).cast("decimal(28,9)"))
        .cast("double"), 6).as("score"),
        count(lit(1)).cast("long").as("n_terms"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__qid"))
      .orderBy(col("score").desc, col("__did"))
    scored.withColumn("__rk", row_number().over(w).cast("long"))
      .where(col("__rk") <= k)
      .select(col("__qid").as(queryId), col("__did").as(corpusId),
        col("score"), col("n_terms"), col("__rk").as("rnk"))
  }
}
