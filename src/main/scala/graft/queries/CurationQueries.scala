package graft.queries

import graft.Tables.table
import graft.operators.Curation
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators over the `documents` table (SURVEY.md
  * §2.10 X6-X13): benchmark decontamination, repetition filtering,
  * PII redaction, deterministic splits, domain mixing and sequence
  * packing — the post-dedup hygiene stages of a pretraining data
  * pipeline, each with a full value-level DuckDB oracle.
  *
  * Shared conventions: the "benchmark" holdout is doc_id % 10 == 0 (a
  * deterministic 10% eval set — at sf0.01 its near-dup replicas give
  * 6 contaminated docs / 324 shared 6-grams, measured); all hash
  * decisions are md5-based (see [[Curation.hashBucket]]); repetition
  * thresholds are corpus-calibrated (dup_word_frac median 0.54 / p90
  * 0.68 / max 0.72; top_bigram_frac p90 0.069 / max 0.167 at sf0.01)
  * so the flag actually separates.
  */
object CurationQueries {

  /** X6 decontamination n-gram size: 6 verbatim tokens. Measured on
    * this corpus: n=4 admits random-collision noise (75 "contaminated"
    * docs), n>=5 isolates true near-dup replicas of benchmark docs
    * (6-7 docs); 6 is the smallest clearly-separating size, standing
    * in for the 13-gram rule on these 25-90-token documents.
    */
  val DecontamN = 6
  val PackBudget = 256
  val MaxDupWordFrac = 0.65
  val MaxTopBigramFrac = 0.08

  private val highQ = Seq("src0", "src1", "src2", "src3", "src4")
  private val midQ = Seq("src5", "src6", "src7", "src8", "src9")

  /** Per-domain sampling rate for X11 — a literal CASE (stand-in for a
    * broadcast-joined config table): full take of high-quality
    * domains, half of mid, quarter of the tail.
    */
  private def domainRate(source: Column): Column =
    when(source.isin(highQ: _*), 1.0)
      .when(source.isin(midQ: _*), 0.5)
      .otherwise(0.25)

  /** Synthetic per-document contact line prepended to the text so the
    * X8 redaction patterns FIRE on this PII-free corpus: a derived
    * email, phone and SSN per doc_id — deterministic, so the scrub
    * output is value-oracled end to end (3 redactions per document).
    */
  private def withContact(docs: DataFrame): DataFrame =
    docs.withColumn("raw",
      concat(
        lit("user"), col("doc_id").cast("string"),
        lit("@"), col("source"), lit(".example.com +1-555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" ssn "),
        lpad((col("doc_id") % 1000).cast("string"), 3, "0"),
        lit("-"),
        lpad((col("doc_id") % 100).cast("string"), 2, "0"),
        lit("-"),
        lpad(((col("doc_id") * 7) % 10000).cast("string"), 4, "0"),
        lit(" "), col("text")))

  /** Synthetic multi-line "page" per document for X14 — the corpus is
    * single-line by construction, so the line-filter fixture derives a
    * deterministic page from each doc: a good punctuated line, a
    * too-short line, doc_id-conditional boilerplate lines (lorem
    * ipsum / javascript / curly-brace markup), and a closing line
    * that only sometimes ends in terminal punctuation. Every rule of
    * the filter fires on some subset of docs, and the whole page is
    * an expression — value-oracled end to end (same pattern as
    * [[withContact]]).
    */
  private def withPage(docs: DataFrame): DataFrame =
    docs.withColumn("page",
      concat(
        col("text"), lit(".\nshort line\n"),
        when(col("doc_id") % 3 === 0,
          lit("lorem ipsum dolor sit amet consectetur.\n")).otherwise(lit("")),
        when(col("doc_id") % 5 === 0,
          lit("please enable javascript to view this page.\n")).otherwise(lit("")),
        when(col("doc_id") % 2 === 0,
          lit("{ nav: true }\n")).otherwise(lit("")),
        when(col("doc_id") % 4 =!= 0, concat(col("text"), lit(" again.")))
          .otherwise(lit("ends without punct"))))

  /** X15 token budget — roughly half the sf0.01 corpus's 27k tokens,
    * so the cut lands mid-score-bucket and the boundary arithmetic is
    * actually exercised (a budget beyond the corpus would degenerate
    * to keep-everything).
    */
  val BudgetTokens = 15000L

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // X14: C4-style line-level filtering over the derived page;
    // page_kept applies C4's page-level rule (>= 2 surviving lines)
    "q_line_filter" -> ((s, d) => {
      Curation.filterLines(withPage(table(s, d, "documents")), col("page"))
        .select(col("doc_id"), col("n_lines"), col("n_kept"),
          col("clean_text"), (col("n_kept") >= 2).as("page_kept"))
        .orderBy(col("doc_id"))
    }),

    // X7b: Gopher line-level repetition over the derived page plus a
    // closing line that DUPLICATES an existing line on every doc
    // (even ids repeat "short line", odd ids repeat the "again" line)
    // so both fractions are exercised and vary with the page shape
    "q_line_repetition" -> ((s, d) => {
      val paged = withPage(table(s, d, "documents")).withColumn("page",
        concat(col("page"),
          when(col("doc_id") % 2 === 0, lit("\nshort line"))
            .otherwise(concat(lit("\n"), col("text"), lit(" again.")))))
      Curation.lineRepetitionStats(paged, "doc_id", col("page"))
        .orderBy(col("doc_id"))
    }),

    // X16: text normalization over a derived dirty string — leading
    // spaces, a decomposed e+combining-acute (NFC composes to é), a
    // BEL control char, a tab and trailing spaces; every cleanup rule
    // fires on every doc and the result is value-oracled
    "q_normalize_text" -> ((s, d) => {
      // the first literal holds RAW bytes: two leading spaces,
      // ASCII cafe + combining acute U+0301 (decomposed; NFC composes
      // it), a space, then a BEL (U+0007) control char; the second is
      // tab + tail + trailing spaces
      val dirty = concat(lit("  café "), col("text"), lit("	tail  "))
      Curation.normalizeText(
        table(s, d, "documents").withColumn("raw", dirty), col("raw"))
        .select(col("doc_id"), col("clean_text"),
          length(col("clean_text")).cast("long").as("n_chars"), col("changed"))
        .orderBy(col("doc_id"))
    }),

    // X17: overlapping 32-token chunks advancing by 24 (8 shared
    // context tokens) — the embedding-store prep over these
    // 25-90-token docs yields 1-4 chunks each
    "q_chunk_overlap" -> ((s, d) => {
      Curation.chunkTokens(table(s, d, "documents"), "doc_id", col("text"),
        chunkTokens = 32, overlap = 8)
        .orderBy(col("doc_id"), col("chunk_id"))
    }),

    // X15: token-budget selection — highest vocabulary-richness docs
    // until the budget is spent; the oracle is the naive global-sort
    // form, the implementation is the bucket-offset plan
    "q_budget_select" -> ((s, d) => {
      val docs = table(s, d, "documents")
      Curation.selectByBudget(docs, "doc_id",
        score = size(array_distinct(split(col("text"), " "))),
        nTokens = size(split(col("text"), " ")),
        budgetTokens = BudgetTokens)
        .select(col("doc_id"), col("score"), col("n_tokens"), col("cum_tokens"))
        .orderBy(col("doc_id"))
    }),

    // X6-X13 composite: the curation stages compose into ONE Catalyst
    // plan — PII scrub (map-only) → repetition filter (doc-keyed
    // aggs) → deterministic split (map-only) → sequence packing
    // (shard-scoped window). The optimizer sees the whole pipeline:
    // no stage materializes an intermediate corpus, the repetition
    // filter prunes rows before the packing window, and each of the
    // plan's three corpus scans (scrub, token stats, bigram stats —
    // Spark does not CSE scans across join branches) reads only its
    // own pruned columns
    "q_curation_pipeline" -> ((s, d) => {
      val docs = table(s, d, "documents")
      val scrubbed = Curation.scrubPii(withContact(docs), col("raw"))
      val keepIds = Curation.repetitionStats(docs, "doc_id", col("text"),
        maxDupWordFrac = MaxDupWordFrac, maxTopBigramFrac = MaxTopBigramFrac)
        .where(!col("repetitive")).select(col("doc_id"))
      val kept = Curation.assignSplit(scrubbed.join(keepIds, "doc_id"), "doc_id")
      Curation.packSequences(kept, shard = "source", order = "doc_id",
        nTokens = size(split(col("scrubbed"), " ")), budget = PackBudget)
        .select(col("doc_id"), col("source"), col("split"), col("n_redactions"),
          col("n_tokens"), col("pack_id"), col("pack_pos"))
        .orderBy(col("doc_id"))
    }),

    // X6: benchmark decontamination — training docs sharing a verbatim
    // 6-gram with the (doc_id % 10 == 0) eval holdout
    "q_decontaminate" -> ((s, d) => {
      val docs = table(s, d, "documents")
      Curation.decontaminate(
        corpus = docs.where(col("doc_id") % 10 =!= 0),
        benchmark = docs.where(col("doc_id") % 10 === 0),
        id = "doc_id", text = col("text"), n = DecontamN)
        .orderBy(col("doc_id"))
    }),

    // X6b: the SAME decontamination through the Bloom prefilter —
    // identical result by construction (no false negatives + verify
    // join kills false positives), so it shares q_decontaminate's
    // oracle text; the point is the map-only bitmap probe that drops
    // clean grams inside the scan stage before any join
    "q_decontam_bloom" -> ((s, d) => {
      val docs = table(s, d, "documents")
      Curation.decontaminateBloom(
        corpus = docs.where(col("doc_id") % 10 =!= 0),
        benchmark = docs.where(col("doc_id") % 10 === 0),
        id = "doc_id", text = col("text"), n = DecontamN)
        .orderBy(col("doc_id"))
    }),

    // X7: Gopher-style repetition flags, corpus-calibrated thresholds
    "q_quality_repetition" -> ((s, d) => {
      Curation.repetitionStats(table(s, d, "documents"), "doc_id", col("text"),
        maxDupWordFrac = MaxDupWordFrac, maxTopBigramFrac = MaxTopBigramFrac)
        .orderBy(col("doc_id"))
    }),

    // X8: PII redaction over a derived contact line + the doc text
    "q_pii_scrub" -> ((s, d) => {
      Curation.scrubPii(withContact(table(s, d, "documents")), col("raw"))
        .select(col("doc_id"), col("scrubbed"), col("n_redactions"))
        .orderBy(col("doc_id"))
    }),

    // X9: deterministic hash train/val/test split (12/2/2 sixteenths)
    "q_split_assign" -> ((s, d) => {
      Curation.assignSplit(table(s, d, "documents"), "doc_id")
        .select(col("doc_id"), col("source"), col("split"))
        .orderBy(col("doc_id"))
    }),

    // X11: quality-weighted domain mixing — deterministic survivors
    "q_domain_mix" -> ((s, d) => {
      val docs = table(s, d, "documents")
      Curation.sampleByRate(docs, "doc_id", domainRate(col("source")))
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    }),

    // X11b: temperature-scaled domain mixing — α=0.5 up-weights small
    // sources; rates derived from the corpus itself (see
    // Curation.temperatureMix determinism note), budget 250 docs
    "q_temperature_mix" -> ((s, d) => {
      Curation.temperatureMix(table(s, d, "documents"), "doc_id", "source",
        alpha = 0.5, budgetDocs = 250L)
        .select(col("doc_id"), col("source"), round(col("rate"), 6).as("rate"))
        .orderBy(col("doc_id"))
    }),

    // X13b: CCNet head/middle/tail — per-source quality thirds over
    // the X13 unigram score; ordering on the ROUNDED score + doc_id
    // tiebreak so the bucket boundary is engine-portable
    "q_quality_buckets" -> ((s, d) => {
      val docs = table(s, d, "documents")
      val scored = Curation.unigramLogProb(docs, "doc_id", col("text"))
        .select(col("doc_id"), round(col("avg_logprob"), 6).as("avg_logprob"))
      Curation.qualityBuckets(
        docs.select(col("doc_id"), col("source")).join(scored, "doc_id"),
        "doc_id", "source", col("avg_logprob"))
        .select(col("doc_id"), col("source"), col("avg_logprob"), col("q_bucket"))
        .orderBy(col("doc_id"))
    }),

    // X13: unigram LM quality score — CCNet-style perplexity
    // filtering against the corpus's own unigram distribution
    "q_unigram_quality" -> ((s, d) => {
      Curation.unigramLogProb(table(s, d, "documents"), "doc_id", col("text"))
        .select(col("doc_id"), col("n_tokens"), round(col("avg_logprob"), 6).as("avg_logprob"))
        .orderBy(col("doc_id"))
    }),

    // X13c: bigram LM quality score — the word-ORDER quality axis
    // (mean bigram conditional log-prob under the corpus's own MLE
    // bigram model); unigrams see atypical words, this sees typical
    // words in atypical order
    "q_bigram_quality" -> ((s, d) => {
      Curation.bigramLogProb(table(s, d, "documents"), "doc_id", col("text"))
        .select(col("doc_id"), col("n_bigrams"),
          round(col("avg_logprob2"), 6).as("avg_logprob2"))
        .orderBy(col("doc_id"))
    }),

    // X13d: interpolated Kneser-Ney trigram quality score — the
    // SMOOTHED rung of the CCNet ladder: discounts every observed
    // trigram count and redistributes the mass through continuation-
    // count backoff, the axis MLE scores miss on once-seen n-grams
    "q_kn_trigram_quality" -> ((s, d) => {
      Curation.kneserNeyLogProb(table(s, d, "documents"), "doc_id", col("text"))
        .select(col("doc_id"), col("n_trigrams"),
          round(col("avg_logprob_kn"), 6).as("avg_logprob_kn"))
        .orderBy(col("doc_id"))
    }),

    // X12: deterministic stratified sample — exactly 10 docs per
    // (lang, source) cell by md5 rank; eval-set construction
    "q_stratified_sample" -> ((s, d) => {
      Curation.stratifiedSample(table(s, d, "documents"), "doc_id",
        strata = Seq("lang", "source"), k = 10)
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id"))
    }),

    // X12b: weighted sampling without replacement (A-Res) — 20 docs
    // per lang with inclusion probability ∝ n_chars; the quality-
    // weighted complement of q_stratified_sample's uniform draw
    "q_weighted_sample" -> ((s, d) => {
      Curation.weightedSample(table(s, d, "documents"), "doc_id",
        strata = Seq("lang"), weight = col("n_chars"), k = 20)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // X22: DSIR importance selection — top 400 raw docs whose hashed-
    // bigram distribution best matches the benchmark target set
    // (doc_id % 10 == 0, the X6 convention); 256 feature buckets.
    // TakeOrderedAndProject does the global top-k; the rank window
    // runs over the 400 surviving rows only (driver-side trivia,
    // the q_vocab pattern)
    "q_dsir_select" -> ((s, d) => {
      Curation.dsirLogWeights(table(s, d, "documents"), "doc_id",
        col("text"), isTarget = col("doc_id") % 10 === 0, buckets = 256)
        .select(col("doc_id"), col("n_feats"),
          round(col("logweight"), 6).as("logweight"))
        .orderBy(col("logweight").desc, col("doc_id")).limit(400)
        .withColumn("rk", row_number()
          .over(Window.orderBy(col("logweight").desc, col("doc_id")))
          .cast("long"))
        .orderBy(col("rk"))
    }),

    // X23: corpus data card — the per-domain datasheet row (Gebru et
    // al. 2021 "Datasheets for Datasets"; what a mixing/curation
    // decision reads first): docs, token/char volume, language
    // spread, length distribution. ONE scan, one partial+final agg —
    // the report costs a groupBy regardless of corpus size
    "q_data_card" -> ((s, d) => {
      table(s, d, "documents")
        .select(col("source"), col("lang"), col("n_chars"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          sum(col("n_chars")).as("total_chars"),
          countDistinct(col("lang")).as("n_langs"),
          min(col("n_tokens")).as("min_tokens"),
          max(col("n_tokens")).as("max_tokens"),
          round(sum(col("n_tokens")).cast("double") / count(lit(1)), 4)
            .as("avg_tokens"))
        .orderBy(col("source"))
    }),

    // X10: concat-and-chunk sequence packing, per-source shards
    "q_pack_sequences" -> ((s, d) => {
      val docs = table(s, d, "documents")
      Curation.packSequences(docs, shard = "source", order = "doc_id",
        nTokens = size(split(col("text"), " ")), budget = PackBudget)
        .select(col("doc_id"), col("source"), col("n_tokens"),
          col("start_offset"), col("pack_id"), col("pack_pos"))
        .orderBy(col("doc_id"))
    }),

    // X10b: best-fit-decreasing packing (Krell et al. 2021) — no doc
    // crosses a pack boundary (zero cross-document attention
    // contamination), BFD within md5-hash shards. All-integer
    // assignment → hash-exact oracle: the BFD loop replays as a
    // recursive CTE walking each shard's (len desc, doc_id) order with
    // the bin-remaining/fill arrays carried as lists
    "q_pack_bestfit" -> ((s, d) => {
      Curation.bestFitPack(table(s, d, "documents"), "doc_id",
        nTokens = size(split(col("text"), " ")), budget = PackBudget,
        shards = 4)
        .orderBy(col("doc_id"))
    }),

    // X20: corpus-level boilerplate removal over the derived page —
    // cross-document line frequency. "short line" (every doc), the
    // lorem/javascript/nav markers (1/3, 1/5, 1/2 of docs) and the
    // constant "ends without punct" closer (1/4) all cross the 15%
    // document-frequency threshold and vanish corpus-wide; each doc's
    // own text lines (near-dup clusters are far below 15%) survive
    "q_boilerplate_lines" -> ((s, d) => {
      Curation.dropBoilerplateLines(withPage(table(s, d, "documents")),
        "doc_id", col("page"), minDocFrac = 0.15)
        .orderBy(col("doc_id"))
    }),

    // X6c: contamination degree — overlap FRACTION per corpus doc
    // (same every-10th-doc benchmark slice as X6); clean docs appear
    // with n_hits 0 so a threshold policy reads one table
    "q_decontam_frac" -> ((s, d) => {
      val docs = table(s, d, "documents")
      Curation.contaminationFraction(
        corpus = docs.where(col("doc_id") % 10 =!= 0),
        benchmark = docs.where(col("doc_id") % 10 === 0),
        id = "doc_id", text = col("text"), n = DecontamN)
        .orderBy(col("doc_id"))
    }),

    // X24: CCNet-style corpus-global paragraph dedup over the derived
    // page — "short line" (every doc) and the modular marker lines
    // survive only in their first containing doc; every doc's own
    // text lines survive in place
    "q_paragraph_dedup" -> ((s, d) => {
      Curation.dedupParagraphs(withPage(table(s, d, "documents")),
        "doc_id", col("page"))
        .orderBy(col("doc_id"))
    }),

    // X21: deterministic global shuffle into 8 training shards —
    // md5-keyed permutation, (shard, pos) addresses
    "q_shuffle_shard" -> ((s, d) => {
      Curation.shuffleShard(table(s, d, "documents"), "doc_id",
        seed = "train", nShards = 8)
        .orderBy(col("shard"), col("pos"))
    }))

  private val rateSql =
    s"""CASE WHEN source IN (${highQ.map(x => s"'$x'").mkString(", ")}) THEN 1.0
          WHEN source IN (${midQ.map(x => s"'$x'").mkString(", ")}) THEN 0.5
          ELSE 0.25 END"""

  private val decontamOracle: String =
    s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       g AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t) - ${DecontamN - 2}),
           i -> array_to_string(t[CAST(i AS INT):CAST(i + ${DecontamN - 1} AS INT)], ' ')))) AS ng
         FROM tk WHERE len(t) >= $DecontamN),
       bench AS (SELECT DISTINCT ng FROM g WHERE doc_id % 10 = 0),
       corp AS (SELECT doc_id, ng FROM g WHERE doc_id % 10 <> 0)
       SELECT doc_id, count(*) AS n_hits
       FROM corp JOIN bench USING (ng)
       GROUP BY doc_id ORDER BY doc_id"""

  private val oracleRepetition: String =
    s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         base AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
             round(1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE), 6) AS dup_word_frac
           FROM tk),
         bg AS (SELECT doc_id, unnest(list_transform(range(1, len(t)),
             i -> t[CAST(i AS INT)] || ' ' || t[CAST(i AS INT) + 1])) AS b
           FROM tk WHERE len(t) >= 2),
         cnts AS (SELECT doc_id, b, count(*) AS cnt FROM bg GROUP BY doc_id, b),
         tb AS (SELECT doc_id,
             round(CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE), 6) AS top_bigram_frac
           FROM cnts GROUP BY doc_id)
         SELECT doc_id, n_tokens, dup_word_frac,
           coalesce(top_bigram_frac, 0.0) AS top_bigram_frac,
           (dup_word_frac > $MaxDupWordFrac
             OR coalesce(top_bigram_frac, 0.0) > $MaxTopBigramFrac) AS repetitive
         FROM base LEFT JOIN tb USING (doc_id) ORDER BY doc_id"""

  private val oraclePii: String =
    s"""WITH raw AS (SELECT doc_id,
             'user' || CAST(doc_id AS VARCHAR) || '@' || source || '.example.com +1-555-'
               || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
               || ' ssn ' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
               || '-' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
               || '-' || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0')
               || ' ' || text AS r
           FROM documents),
         prog AS (SELECT doc_id, r,
             regexp_replace(r, '${Curation.EmailRe}', '<EMAIL>', 'g') AS r1
           FROM raw),
         prog2 AS (SELECT doc_id, r, r1,
             regexp_replace(r1, '${Curation.SsnRe}', '<SSN>', 'g') AS r2
           FROM prog)
         SELECT doc_id,
           regexp_replace(r2, '${Curation.PhoneRe}', '<PHONE>', 'g') AS scrubbed,
           CAST(len(regexp_extract_all(r, '${Curation.EmailRe}'))
             + len(regexp_extract_all(r1, '${Curation.SsnRe}'))
             + len(regexp_extract_all(r2, '${Curation.PhoneRe}')) AS BIGINT) AS n_redactions
         FROM prog2 ORDER BY doc_id"""

  private val oracleSplit: String =
    """SELECT doc_id, source,
           CASE WHEN b < 12 THEN 'train' WHEN b < 14 THEN 'val' ELSE 'test' END AS split
         FROM (SELECT doc_id, source,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 16 AS b
           FROM documents)
         ORDER BY doc_id"""

  /** Composite oracle assembled by nesting the individually-verified
    * stage oracles as derived tables (ORDER BY in a subquery is
    * legal and ignored), then re-stating the packing window over the
    * SURVIVING docs only — identical survivor set on both sides.
    */
  private def pipelineOracle: String =
    s"""WITH scrub AS (SELECT doc_id, scrubbed, n_redactions FROM (${oraclePii})),
       rep AS (SELECT doc_id FROM (${oracleRepetition}) WHERE NOT repetitive),
       splitt AS (SELECT doc_id, source, split FROM (${oracleSplit})),
       kept AS (SELECT s.doc_id, sp.source, sp.split, s.n_redactions,
           CAST(len(string_split(s.scrubbed, ' ')) AS BIGINT) AS n_tokens
         FROM scrub s JOIN rep USING (doc_id) JOIN splitt sp USING (doc_id)),
       o AS (SELECT *, CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
           ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS start_offset
         FROM kept)
       SELECT doc_id, source, split, n_redactions, n_tokens,
         CAST(start_offset // $PackBudget AS BIGINT) AS pack_id,
         CAST(start_offset % $PackBudget AS BIGINT) AS pack_pos
       FROM o ORDER BY doc_id"""

  private val pageSql: String =
    """text || '.' || chr(10) || 'short line' || chr(10)
       || CASE WHEN doc_id % 3 = 0 THEN 'lorem ipsum dolor sit amet consectetur.' || chr(10) ELSE '' END
       || CASE WHEN doc_id % 5 = 0 THEN 'please enable javascript to view this page.' || chr(10) ELSE '' END
       || CASE WHEN doc_id % 2 = 0 THEN '{ nav: true }' || chr(10) ELSE '' END
       || CASE WHEN doc_id % 4 <> 0 THEN text || ' again.' ELSE 'ends without punct' END"""

  val oracles: Map[String, String] = Map(
    "q_line_filter" ->
      s"""WITH pg AS (SELECT doc_id, $pageSql AS page FROM documents),
         ls AS (SELECT doc_id, string_split(page, chr(10)) AS lines FROM pg),
         k AS (SELECT doc_id, len(lines) AS n_lines,
             list_filter(lines, l -> regexp_matches(trim(l), '[.!?"]$$')
               AND len(string_split(trim(l), ' ')) >= 3
               AND NOT contains(lower(trim(l)), 'lorem ipsum')
               AND NOT contains(lower(trim(l)), 'javascript')
               AND NOT contains(lower(trim(l)), '{')) AS kept
           FROM ls)
         SELECT doc_id, CAST(n_lines AS BIGINT) AS n_lines,
           CAST(len(kept) AS BIGINT) AS n_kept,
           array_to_string(kept, chr(10)) AS clean_text,
           len(kept) >= 2 AS page_kept
         FROM k ORDER BY doc_id""",
    "q_line_repetition" ->
      s"""WITH pg AS (SELECT doc_id, $pageSql
           || CASE WHEN doc_id % 2 = 0 THEN chr(10) || 'short line'
                ELSE chr(10) || text || ' again.' END AS page
           FROM documents),
         ls AS (SELECT doc_id, string_split(page, chr(10)) AS l FROM pg),
         base AS (SELECT doc_id, CAST(len(l) AS BIGINT) AS n_lines,
             round(1.0 - CAST(len(list_distinct(l)) AS DOUBLE)
               / CAST(len(l) AS DOUBLE), 6) AS dup_line_frac
           FROM ls),
         ex AS (SELECT doc_id, unnest(l) AS line FROM ls),
         cnts AS (SELECT doc_id, line, count(*) AS cnt
           FROM ex GROUP BY doc_id, line),
         ch AS (SELECT doc_id,
             CASE WHEN sum(cnt * len(line)) > 0
               THEN round(CAST(sum(CASE WHEN cnt > 1 THEN cnt * len(line)
                   ELSE 0 END) AS DOUBLE)
                 / CAST(sum(cnt * len(line)) AS DOUBLE), 6)
               ELSE 0.0 END AS dup_line_char_frac
           FROM cnts GROUP BY doc_id)
         SELECT doc_id, n_lines, dup_line_frac, dup_line_char_frac
         FROM base JOIN ch USING (doc_id) ORDER BY doc_id""",
    // X16: chr(769) = U+0301 combining acute, chr(7) = BEL, chr(9) =
    // tab — the same raw bytes the Spark fixture embeds; DuckDB's
    // nfc_normalize is the same Unicode NFC as the engine's codegen
    // expression, and RE2 interprets the identical \x character
    // classes
    "q_normalize_text" ->
      """WITH raw AS (SELECT doc_id,
             '  cafe' || chr(769) || ' ' || chr(7) || text || chr(9) || 'tail  ' AS r
           FROM documents),
         n AS (SELECT doc_id, r,
             trim(regexp_replace(regexp_replace(nfc_normalize(r),
               '[\x00-\x08\x0B-\x1F\x7F]', '', 'g'), '[ \t]+', ' ', 'g')) AS clean_text
           FROM raw)
         SELECT doc_id, clean_text,
           CAST(length(clean_text) AS BIGINT) AS n_chars,
           clean_text <> r AS changed
         FROM n ORDER BY doc_id""",
    // X17: generate_series start offsets (inclusive bound = the last
    // start still contributing a new token), clamped list slice
    "q_chunk_overlap" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n
           FROM documents),
         s AS (SELECT doc_id, toks, n,
             unnest(generate_series(0, greatest(n - 9, 0), 24)) AS start
           FROM t)
         SELECT doc_id,
           CAST(start // 24 AS BIGINT) AS chunk_id,
           CAST(least(32, n - start) AS BIGINT) AS n_chunk_tokens,
           array_to_string(toks[CAST(start + 1 AS INT):CAST(start + 32 AS INT)], ' ') AS chunk_text
         FROM s ORDER BY doc_id, chunk_id""",
    // the oracle IS the naive global-sort semantics the bucket-offset
    // implementation must reproduce exactly
    "q_budget_select" ->
      s"""WITH t AS (SELECT doc_id,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS score,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
           FROM documents),
         o AS (SELECT doc_id, score, n_tokens,
             CAST(sum(n_tokens) OVER (ORDER BY score DESC, doc_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
           FROM t)
         SELECT doc_id, score, n_tokens, cum_tokens
         FROM o WHERE cum_tokens <= $BudgetTokens ORDER BY doc_id""",
    "q_curation_pipeline" -> pipelineOracle,
    "q_decontaminate" -> decontamOracle,
    // X6c: the graded form — LEFT join keeps clean grams in the
    // denominator; sums cast to BIGINT (DuckDB sums to HUGEINT), the
    // fraction divides exact integers in DOUBLE then rounds 4 dp
    // (both engines round half-away-from-zero)
    "q_decontam_frac" ->
      s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         g AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t) - ${DecontamN - 2}),
             i -> array_to_string(t[CAST(i AS INT):CAST(i + ${DecontamN - 1} AS INT)], ' ')))) AS ng
           FROM tk WHERE len(t) >= $DecontamN),
         bench AS (SELECT DISTINCT ng FROM g WHERE doc_id % 10 = 0),
         corp AS (SELECT doc_id, ng FROM g WHERE doc_id % 10 <> 0)
         SELECT c.doc_id AS doc_id, count(*) AS n_grams,
           CAST(sum(CASE WHEN b.ng IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
           round(CAST(sum(CASE WHEN b.ng IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 4) AS overlap_frac
         FROM corp c LEFT JOIN bench b ON c.ng = b.ng
         GROUP BY c.doc_id ORDER BY c.doc_id""",
    // X6b: Bloom arm returns the identical exact result — same oracle
    "q_decontam_bloom" -> decontamOracle,
    "q_quality_repetition" -> oracleRepetition,
    "q_pii_scrub" -> oraclePii,
    "q_split_assign" -> oracleSplit,
    "q_domain_mix" ->
      s"""SELECT doc_id, source FROM (
           SELECT doc_id, source,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 10000 AS bp,
             $rateSql AS rate
           FROM documents)
         WHERE CAST(bp AS BIGINT) < CAST(round(rate * 10000.0) AS BIGINT)
         ORDER BY doc_id""",
    // X13b: nests the verified unigram oracle; ntile over the rounded
    // score + id tiebreak is the same standard SQL window both engines
    // implement (first buckets take the remainder rows)
    "q_quality_buckets" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
         c AS (SELECT token, CAST(count(*) AS DOUBLE) AS cnt FROM tok GROUP BY token),
         t AS (SELECT CAST(sum(CAST(cnt AS DECIMAL(38,6))) AS DOUBLE) AS tot FROM c),
         lp AS (SELECT token, ln(cnt / tot) AS lp FROM c CROSS JOIN t),
         s AS (SELECT doc_id,
             round(CAST(sum(CAST(lp AS DECIMAL(38,15))) AS DOUBLE)
               / CAST(count(*) AS DOUBLE), 6) AS avg_logprob
           FROM tok JOIN lp USING (token) GROUP BY doc_id),
         b AS (SELECT d.doc_id, d.source, s.avg_logprob,
             ntile(3) OVER (PARTITION BY d.source
               ORDER BY s.avg_logprob DESC, d.doc_id) AS nt
           FROM documents d JOIN s USING (doc_id))
         SELECT doc_id, source, avg_logprob,
           CASE WHEN nt = 1 THEN 'head' WHEN nt = 2 THEN 'middle'
             ELSE 'tail' END AS q_bucket
         FROM b ORDER BY doc_id""",
    // ln() parity note: last-ulp libm differences are ~1e-16 relative
    // and the score is rounded to 6 decimals — same accepted risk
    // class as double division elsewhere; sums are DECIMAL-exact
    "q_unigram_quality" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
         c AS (SELECT token, CAST(count(*) AS DOUBLE) AS cnt FROM tok GROUP BY token),
         t AS (SELECT CAST(sum(CAST(cnt AS DECIMAL(38,6))) AS DOUBLE) AS tot FROM c),
         lp AS (SELECT token, ln(cnt / tot) AS lp FROM c CROSS JOIN t)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           round(CAST(sum(CAST(lp AS DECIMAL(38,15))) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS avg_logprob
         FROM tok JOIN lp USING (token)
         GROUP BY doc_id ORDER BY doc_id""",
    // same ln() parity class as the unigram score; both count tables
    // are integer-valued doubles (sums exact in any order), the
    // per-doc sum is DECIMAL-exact
    "q_bigram_quality" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         bi AS (SELECT doc_id,
             unnest(list_transform(range(1, len(t)),
               i -> {'w1': t[CAST(i AS INT)], 'w2': t[CAST(i + 1 AS INT)]})) AS b
           FROM tk WHERE len(t) >= 2),
         b2 AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bi),
         c12 AS (SELECT w1, w2, CAST(count(*) AS DOUBLE) AS c12
           FROM b2 GROUP BY w1, w2),
         c1 AS (SELECT w1, sum(c12) AS c1 FROM c12 GROUP BY w1),
         lp AS (SELECT c12.w1, c12.w2, ln(c12 / c1) AS lp
           FROM c12 JOIN c1 USING (w1))
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           round(CAST(sum(CAST(lp AS DECIMAL(38,15))) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS avg_logprob2
         FROM b2 JOIN lp USING (w1, w2)
         GROUP BY doc_id ORDER BY doc_id""",
    // X13d: every model quantity is an exact integer count from ONE
    // trigram-type table; D = 0.75 exactly representable; identical
    // fixed double tree both sides (same ln() parity class as the MLE
    // arms); per-doc sum DECIMAL-exact
    "q_kn_trigram_quality" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         tri AS (SELECT doc_id,
             unnest(list_transform(range(1, len(t) - 1),
               i -> {'w1': t[CAST(i AS INT)], 'w2': t[CAST(i + 1 AS INT)],
                     'w3': t[CAST(i + 2 AS INT)]})) AS g
           FROM tk WHERE len(t) >= 3),
         t3g AS (SELECT doc_id, g.w1 AS w1, g.w2 AS w2, g.w3 AS w3 FROM tri),
         t3 AS (SELECT w1, w2, w3, CAST(count(*) AS DOUBLE) AS c3
           FROM t3g GROUP BY w1, w2, w3),
         ctx AS (SELECT w1, w2, sum(c3) AS c2,
             CAST(count(*) AS DOUBLE) AS n1p
           FROM t3 GROUP BY w1, w2),
         nvw AS (SELECT w2, w3, CAST(count(*) AS DOUBLE) AS nvw
           FROM t3 GROUP BY w2, w3),
         nvdot AS (SELECT w2, CAST(count(*) AS DOUBLE) AS nvdot
           FROM t3 GROUP BY w2),
         t2 AS (SELECT DISTINCT w2, w3 FROM t3),
         nfol AS (SELECT w2, CAST(count(*) AS DOUBLE) AS nfol
           FROM t2 GROUP BY w2),
         nend AS (SELECT w3, CAST(count(*) AS DOUBLE) AS nend
           FROM t2 GROUP BY w3),
         tot AS (SELECT CAST(count(*) AS DOUBLE) AS ntypes FROM t2),
         lp AS (SELECT w1, w2, w3,
             ln(greatest(c3 - 0.75, 0.0) / c2 +
               (0.75 * n1p / c2) *
               (greatest(nvw - 0.75, 0.0) / nvdot +
                 (0.75 * nfol / nvdot) * (nend / ntypes))) AS lp
           FROM t3 JOIN ctx USING (w1, w2) JOIN nvw USING (w2, w3)
             JOIN nvdot USING (w2) JOIN nfol USING (w2)
             JOIN nend USING (w3) CROSS JOIN tot)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
           round(CAST(sum(CAST(lp AS DECIMAL(38,15))) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS avg_logprob_kn
         FROM t3g JOIN lp USING (w1, w2, w3)
         GROUP BY doc_id ORDER BY doc_id""",
    // ln() parity: libm ln's last ulp is unpinned across engines — the
    // log-domain A-Res key rounds ln(u) to 9 dp BEFORE the correctly-
    // rounded IEEE division by w, id tiebreak, so the ORDER (hence the
    // selected set) is engine-portable at any weight magnitude
    "q_weighted_sample" ->
      """WITH s AS (SELECT doc_id, lang, n_chars,
           round(ln(
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 1000000000 + 1 AS DOUBLE)
               / 1000000000.0), 9) / CAST(n_chars AS DOUBLE) AS ky
           FROM documents WHERE n_chars IS NOT NULL AND CAST(n_chars AS DOUBLE) > 0.0),
         r AS (SELECT doc_id, lang, n_chars,
             row_number() OVER (PARTITION BY lang ORDER BY ky DESC, doc_id) AS rn
           FROM s)
         SELECT doc_id, lang, n_chars FROM r WHERE rn <= 20 ORDER BY doc_id""",
    // X23: integer sums (exact any order); the mean divides exact
    // integers — identical double both engines before the round
    "q_data_card" ->
      """WITH t AS (SELECT source, lang, n_chars,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
           FROM documents)
         SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           COUNT(DISTINCT lang) AS n_langs,
           MIN(n_tokens) AS min_tokens,
           MAX(n_tokens) AS max_tokens,
           round(CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*), 4) AS avg_tokens
         FROM t GROUP BY source ORDER BY source""",
    // X22: same md5 bucket arithmetic as X9/X11; counts and totals
    // are exact integers, the smoothed ratios divide exact integers
    // (IEEE-deterministic), ln is the X13 parity class, per-doc sum
    // DECIMAL-exact
    "q_dsir_select" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         bi AS (SELECT doc_id, unnest(list_transform(range(1, len(t)),
                 i -> t[CAST(i AS INT)] || ' ' || t[CAST(i + 1 AS INT)])) AS g
               FROM tk WHERE len(t) >= 2),
         fb AS (SELECT doc_id,
             CAST(('0x' || substr(md5(g), 1, 8))::UBIGINT % 256 AS BIGINT) AS b
           FROM bi),
         rawc AS (SELECT b, CAST(count(*) AS DOUBLE) AS cr FROM fb
           WHERE doc_id % 10 <> 0 GROUP BY b),
         tgtc AS (SELECT b, CAST(count(*) AS DOUBLE) AS ct FROM fb
           WHERE doc_id % 10 = 0 GROUP BY b),
         tot AS (SELECT
             (SELECT CAST(sum(CAST(cr AS DECIMAL(38,6))) AS DOUBLE) FROM rawc) AS tr,
             (SELECT CAST(coalesce(sum(CAST(ct AS DECIMAL(38,6))), 0) AS DOUBLE) FROM tgtc) AS tt),
         lr AS (SELECT rawc.b AS b,
             ln((coalesce(ct, 0) + 1) / (tt + 256)) - ln((cr + 1) / (tr + 256)) AS lr
           FROM rawc LEFT JOIN tgtc ON rawc.b = tgtc.b CROSS JOIN tot),
         sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feats,
             round(CAST(sum(CAST(lr AS DECIMAL(38,15))) AS DOUBLE), 6) AS logweight
           FROM fb JOIN lr USING (b) WHERE doc_id % 10 <> 0 GROUP BY doc_id)
         SELECT doc_id, n_feats, logweight,
           CAST(row_number() OVER (ORDER BY logweight DESC, doc_id) AS BIGINT) AS rk
         FROM sc ORDER BY rk LIMIT 400""",
    "q_stratified_sample" ->
      """SELECT doc_id, lang, source FROM (
           SELECT doc_id, lang, source,
             row_number() OVER (PARTITION BY lang, source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
           FROM documents)
         WHERE rk <= 10 ORDER BY doc_id""",
    // sqrt is correctly-rounded IEEE in both engines; the weight sum
    // is DECIMAL-exact (order-independent); every later op is the
    // same double expression on both sides — rates are bit-identical
    "q_temperature_mix" ->
      """WITH c AS (SELECT source, CAST(count(*) AS DOUBLE) AS n_d
           FROM documents GROUP BY source),
         w AS (SELECT source, n_d, sqrt(n_d) AS s_d FROM c),
         t AS (SELECT CAST(sum(CAST(s_d AS DECIMAL(38,15))) AS DOUBLE) AS S FROM w),
         r AS (SELECT source, least(1.0, 250.0 * (s_d / S) / n_d) AS rate
           FROM w CROSS JOIN t)
         SELECT doc_id, source, round(rate, 6) AS rate
         FROM documents JOIN r USING (source)
         WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 10000
           < CAST(round(rate * 10000.0) AS BIGINT)
         ORDER BY doc_id""",
    "q_pack_sequences" ->
      s"""WITH t AS (SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
         o AS (SELECT doc_id, source, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS start_offset
           FROM t)
         SELECT doc_id, source, n_tokens, start_offset,
           CAST(start_offset // $PackBudget AS BIGINT) AS pack_id,
           CAST(start_offset % $PackBudget AS BIGINT) AS pack_pos
         FROM o ORDER BY doc_id""",
    // X10b: sequential BFD replayed per shard — state = (remaining,
    // fill) lists + the assignment log; the eligible-bin argmin scans
    // j ascending replacing only on strictly-smaller remaining, the
    // operator's exact tie-break (lowest pack_id)
    "q_pack_bestfit" ->
      s"""WITH RECURSIVE
         dd AS (SELECT doc_id,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 4 AS BIGINT) AS shard,
             least(CAST(len(string_split(text, ' ')) AS BIGINT), $PackBudget) AS l
           FROM documents),
         o AS (SELECT shard, doc_id, l,
             row_number() OVER (PARTITION BY shard ORDER BY l DESC, doc_id ASC) AS rn
           FROM dd),
         mx AS (SELECT shard, max(rn) AS mr FROM o GROUP BY shard),
         bfd AS (
           SELECT shard, 0 AS step,
             CAST([] AS BIGINT[]) AS rem, CAST([] AS BIGINT[]) AS fill,
             CAST([] AS STRUCT(doc_id BIGINT, l BIGINT, pack BIGINT, slot BIGINT)[]) AS asg
           FROM (SELECT DISTINCT shard FROM o)
           UNION ALL
           SELECT shard, step,
             CASE WHEN pick.i = -1 THEN list_append(rem, $PackBudget - l)
               ELSE list_transform(range(1, len(rem) + 1),
                 j -> CASE WHEN j = pick.i THEN rem[CAST(j AS INT)] - l
                   ELSE rem[CAST(j AS INT)] END) END,
             CASE WHEN pick.i = -1 THEN list_append(fill, CAST(1 AS BIGINT))
               ELSE list_transform(range(1, len(fill) + 1),
                 j -> CASE WHEN j = pick.i THEN fill[CAST(j AS INT)] + 1
                   ELSE fill[CAST(j AS INT)] END) END,
             list_append(asg, struct_pack(
               doc_id := doc_id, l := l,
               pack := CASE WHEN pick.i = -1 THEN CAST(len(rem) AS BIGINT)
                 ELSE CAST(pick.i - 1 AS BIGINT) END,
               slot := CASE WHEN pick.i = -1 THEN CAST(0 AS BIGINT)
                 ELSE fill[pick.i] END))
           FROM (
             SELECT b.shard, oo.rn AS step, oo.doc_id, oo.l,
               b.rem, b.fill, b.asg,
               list_reduce(
                 list_prepend(struct_pack(i := -1, r := CAST(NULL AS BIGINT)),
                   list_transform(range(1, len(b.rem) + 1),
                     j -> struct_pack(i := CAST(j AS INT),
                       r := b.rem[CAST(j AS INT)]))),
                 (a, c) -> CASE WHEN c.r >= oo.l AND (a.i = -1 OR c.r < a.r)
                   THEN c ELSE a END) AS pick
             FROM bfd b JOIN o oo ON oo.shard = b.shard AND oo.rn = b.step + 1)),
         fin AS (SELECT b.shard, unnest(b.asg, recursive := true)
           FROM bfd b JOIN mx ON mx.shard = b.shard AND b.step = mx.mr)
         SELECT shard, doc_id, l AS n_tokens, pack AS pack_id, slot
         FROM fin ORDER BY doc_id""",

    // X20: the threshold multiplies in DOUBLE on both sides (DuckDB
    // decimal literals would be exact where Spark's lit(0.15) is not;
    // 3n/20's 0.05 granularity keeps ceil() boundary-safe either way)
    "q_boilerplate_lines" ->
      s"""WITH pg AS (SELECT doc_id, $pageSql AS page FROM documents),
         ls AS (SELECT doc_id, string_split(page, chr(10)) AS lines FROM pg),
         ex AS (SELECT doc_id, unnest(lines) AS line FROM ls),
         fq AS (SELECT line, count(DISTINCT doc_id) AS dc FROM ex GROUP BY line),
         th AS (SELECT ceil(CAST(count(*) AS DOUBLE) * CAST(0.15 AS DOUBLE)) AS min_dc FROM pg),
         fl AS (SELECT coalesce(list(line), CAST([] AS VARCHAR[])) AS bl
           FROM fq CROSS JOIN th WHERE dc >= min_dc),
         k AS (SELECT doc_id, CAST(len(lines) AS BIGINT) AS n_lines,
             list_filter(lines, l -> NOT list_contains(bl, l)) AS kept
           FROM ls CROSS JOIN fl)
         SELECT doc_id, n_lines, CAST(len(kept) AS BIGINT) AS n_kept,
           array_to_string(kept, chr(10)) AS clean_text
         FROM k ORDER BY doc_id""",
    // X24: first occurrence = (min doc, then min pos in that doc),
    // derived in two grouped steps (DuckDB min over a struct is not
    // the lexicographic order Spark's struct min uses — two stages
    // sidestep the difference); zipped unnests give (pos, line)
    "q_paragraph_dedup" ->
      s"""WITH pg AS (SELECT doc_id, $pageSql AS page FROM documents),
         ls AS (SELECT doc_id, string_split(page, chr(10)) AS lines FROM pg),
         ex AS (SELECT doc_id, unnest(range(1, len(lines) + 1)) AS pos,
             unnest(lines) AS line FROM ls),
         k1 AS (SELECT line, min(doc_id) AS kd FROM ex GROUP BY line),
         k2 AS (SELECT e.line AS line, e.doc_id AS kd, min(e.pos) AS kp
           FROM ex e JOIN k1 ON e.line = k1.line AND e.doc_id = k1.kd
           GROUP BY e.line, e.doc_id),
         kept AS (SELECT e.doc_id, e.pos, e.line FROM ex e
           JOIN k2 ON e.line = k2.line AND e.doc_id = k2.kd AND e.pos = k2.kp),
         rg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
             array_to_string(list(line ORDER BY pos), chr(10)) AS clean
           FROM kept GROUP BY doc_id)
         SELECT l.doc_id AS doc_id, CAST(len(l.lines) AS BIGINT) AS n_lines,
           coalesce(rg.n_kept, CAST(0 AS BIGINT)) AS n_kept,
           coalesce(rg.clean, '') AS clean_text
         FROM ls l LEFT JOIN rg ON l.doc_id = rg.doc_id
         ORDER BY l.doc_id""",
    // X21: same md5-hex arithmetic as X9's split oracle; binary
    // collation on ASCII hex makes the within-shard order portable
    "q_shuffle_shard" ->
      """WITH k AS (SELECT doc_id,
             md5('train-' || CAST(doc_id AS VARCHAR)) AS ky FROM documents),
         s AS (SELECT doc_id, ky,
             CAST(('0x' || substr(ky, 1, 8))::UBIGINT % 8 AS INT) AS shard
           FROM k)
         SELECT doc_id, shard,
           CAST(row_number() OVER (PARTITION BY shard ORDER BY ky, doc_id) AS BIGINT) AS pos
         FROM s ORDER BY shard, pos""")
}
