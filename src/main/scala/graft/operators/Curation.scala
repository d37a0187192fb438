package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation operators (SURVEY.md §2.10 X6-X13): the
  * corpus-hygiene pass a large-scale LLM pretraining pipeline runs
  * AFTER dedup (X1/X2) and BEFORE tokenization — benchmark
  * decontamination, repetition/quality filtering, PII redaction,
  * deterministic train/val/test splits, quality-weighted and
  * temperature-scaled domain mixing, concat-and-chunk sequence
  * packing, stratified eval sampling, and unigram-LM quality scoring.
  *
  * Everything is DataFrame transformations (Catalyst gets pushdown,
  * partial aggregation and AQE for free; nothing collects to the
  * driver) and every hash decision is md5-based — the same
  * engine-portable choice as [[Dedup]] — so each operator carries a
  * full value-level DuckDB oracle.
  *
  * Scale posture per operator is documented on the method; the common
  * theme: per-document work stays embarrassingly parallel (map-only or
  * doc_id-keyed partial agg), cross-document work (decontamination)
  * touches only the SMALL side (the benchmark) with a broadcast, and
  * the one inherently sequential construct (packing's running offset)
  * is scoped to a shard key so no global single-partition window ever
  * forms.
  */
object Curation {

  /** Deterministic uniform bucket in [0, buckets): first 8 hex chars
    * of md5 as an integer, mod buckets. md5, not xxhash64/murmur3, so
    * the assignment is reproducible in ANY engine (the property a
    * train/test split must have — re-running the split in a different
    * system must not move documents across the contamination
    * boundary). DuckDB equivalent:
    * `('0x' || substr(md5(x), 1, 8))::UBIGINT % buckets`.
    */
  def hashBucket(c: Column, buckets: Int): Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10)
      .cast("long") % buckets

  /** X6: benchmark decontamination — flag corpus documents sharing at
    * least one word n-gram with an evaluation benchmark (the
    * GPT-3/Llama "13-gram overlap" rule; n is a dial because this
    * corpus's documents are 25-90 tokens).
    *
    * Returns (id, n_hits) for contaminated corpus documents only,
    * where n_hits = number of DISTINCT n-grams shared with any
    * benchmark document.
    *
    * Scale: eval benchmarks are MBs while the corpus is TBs, so the
    * benchmark's distinct n-gram set is broadcast ([[broadcast]] hint;
    * a few hundred MB fits the 8 GB driver/executor broadcast budget
    * at real benchmark sizes) and the corpus side is a map-only
    * explode → broadcast-hash semi-ish join → doc_id-keyed partial
    * count. The corpus is never shuffled by n-gram; the only shuffle
    * is the final count per doc_id, pre-aggregated map-side.
    */
  def decontaminate(
      corpus: DataFrame, benchmark: DataFrame,
      id: String, text: Column, n: Int): DataFrame = {
    val corpusGrams =
      Dedup.explodedShingles(ScanWidth.ensure(corpus), id, text, n)
    val benchGrams = Dedup.explodedShingles(benchmark, id, text, n)
      .select(col("shingle")).distinct()
    corpusGrams
      .join(broadcast(benchGrams), "shingle")
      .groupBy(col(id))
      // explodedShingles is per-doc distinct already, so count(*) IS
      // the distinct-shared-gram count — no count_distinct shuffle
      .agg(count(lit(1)).as("n_hits"))
  }

  /** X6b: Bloom-prefiltered decontamination — EXACTLY the same result
    * as [[decontaminate]] (the verify join removes the Bloom's false
    * positives; a Bloom filter has no false negatives), but the
    * corpus's clean n-grams are dropped by a map-only bitmap probe
    * INSIDE the scan stage before any join.
    *
    * Why it matters at 100 TB: the broadcast-join form hands every
    * corpus gram to a hash-table probe whose build side costs ~50+
    * bytes per benchmark gram per executor; the Bloom bitmap is
    * ~1.25 bytes per gram (10 bits), two orders smaller, and the
    * surviving candidate stream entering the real join is FP-rate ×
    * clean-grams plus the true hits — so the join's probe volume
    * collapses from |corpus grams| to ~|hits|. Same
    * candidates-then-verify discipline as every sketch path here.
    * The bitmap build collects the BENCHMARK side's gram hashes
    * (bounded by the benchmark's size — the side that is MBs by
    * definition, same assumption the broadcast makes).
    */
  def decontaminateBloom(
      corpus: DataFrame, benchmark: DataFrame,
      id: String, text: Column, n: Int): DataFrame = {
    // cached: consumed twice — materialized by the bitmap build's
    // collect, reused as the verify join's build side (without the
    // cache the benchmark shingle pipeline would run two full jobs);
    // released by the action that consumes the result
    val benchGrams = Dedup.explodedShingles(benchmark, id, text, n)
      .select(col("shingle")).distinct().cache()
    val bloom = graft.functions.Bloom.build(benchGrams, col("shingle"))
    // narrow scans widened before the gram explode + bitmap probe
    // (r21, ScanWidth): the md5 double-hash probe per gram otherwise
    // runs serial on a one-file fixture corpus
    val candidates = Dedup.explodedShingles(ScanWidth.ensure(corpus), id, text, n)
      .where(graft.functions.Bloom.mightContain(bloom, col("shingle")))
    val out = candidates
      .join(broadcast(benchGrams), "shingle")
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_hits"))
    CacheLifecycle.releaseAfterAction(out, benchGrams)
  }

  /** X6c: contamination DEGREE — [[decontaminate]]'s hit count graded
    * into a per-document overlap fraction: of the doc's DISTINCT
    * n-grams, what share appears anywhere in the benchmark. The
    * binary form answers "is this doc tainted?"; this one supports
    * the threshold policies evaluation reports actually use ("drop
    * documents with >X% overlap", the n-gram overlap convention of
    * GPT-3's appendix and the lm-eval decontamination tooling) and
    * ranks the gray zone a 1-gram hit can't distinguish from a
    * wholesale copy.
    *
    * Returns (id, n_grams, n_hits, overlap_frac) for every corpus doc
    * long enough to have an n-gram; overlap_frac = n_hits/n_grams
    * rounded to 4 dp (exact-integer division in double — the X13
    * engine-portability convention).
    *
    * Scale: same shape as [[decontaminate]] — benchmark grams
    * broadcast (MBs by definition), corpus side map-only explode +
    * broadcast LEFT join (clean grams must still count in the
    * denominator, so no inner-join prune here) + one doc-keyed
    * partial agg; never shuffled by gram.
    */
  def contaminationFraction(
      corpus: DataFrame, benchmark: DataFrame,
      id: String, text: Column, n: Int): DataFrame = {
    val corpusGrams =
      Dedup.explodedShingles(ScanWidth.ensure(corpus), id, text, n)
    val benchGrams = Dedup.explodedShingles(benchmark, id, text, n)
      .select(col("shingle")).distinct()
      .withColumn("__hit", lit(1L))
    corpusGrams
      .join(broadcast(benchGrams), Seq("shingle"), "left")
      .groupBy(col(id))
      // explodedShingles is per-doc distinct already, so count(*) is
      // the distinct gram count and the hit sum the distinct-shared
      // count — no count_distinct shuffle
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hits"))
      .withColumn("overlap_frac",
        round(col("n_hits").cast("double") / col("n_grams"), 4))
  }

  /** X4b: out-of-vocabulary rate — per-document fraction of token
    * OCCURRENCES not covered by a fixed vocabulary table: the
    * pre-training sanity check run before committing to a tokenizer
    * or a vocabulary truncation (a corpus slice with high OOV against
    * the training vocab degrades to byte-fallback/<unk> mass).
    * Occurrence-level, not distinct-token-level — a doc repeating one
    * uncovered token is as damaged as one with many.
    *
    * Returns (id, n_tokens, n_oov, oov_frac); oov_frac rounds the
    * exact-integer division to 4 dp (the X13 portability convention).
    *
    * Scale: vocabulary tables are bounded by construction (vocab
    * size, not corpus size) → broadcast left join inside the exploded
    * scan, one doc-keyed partial agg; the corpus is never shuffled by
    * token.
    */
  def oovRate(
      docs: DataFrame, id: String, text: Column,
      vocab: DataFrame, token: String): DataFrame = {
    val toks = docs.select(col(id), explode(split(text, " ")).as("__tok"))
    val v = vocab.select(col(token).as("__tok")).distinct()
      .withColumn("__in", lit(1L))
    toks.join(broadcast(v), Seq("__tok"), "left")
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_frac",
        round(col("n_oov").cast("double") / col("n_tokens"), 4))
  }

  /** X7: repetition statistics — the Gopher-style (Rae et al. 2021,
    * §A1.1) repetition signals that survive a single-line corpus:
    * duplicate-word fraction (1 - distinct/total tokens) and the
    * fraction of all bigram slots covered by the single most frequent
    * bigram. `repetitive` applies the thresholds.
    *
    * Returns (id, n_tokens, dup_word_frac, top_bigram_frac,
    * repetitive). Default `maxTopBigramFrac` is Gopher's published
    * top-2-gram threshold (0.20); note a doc with B bigrams has
    * top_bigram_frac >= 1/B even when fully diverse, so short-doc
    * corpora should pass a calibrated threshold explicitly (the
    * registered query does).
    *
    * Scale: explode bigrams → count per (doc, bigram) → max per doc is
    * two doc_id-keyed aggregations with map-side partial combine — no
    * wide shuffle, parallelism = corpus partitioning. The token stats
    * are computed with array functions in the same scan (map-only).
    */
  def repetitionStats(
      df: DataFrame, id: String, text: Column,
      maxDupWordFrac: Double = 0.3, maxTopBigramFrac: Double = 0.2): DataFrame = {
    val toks = df.select(col(id), split(text, " ").as("t"))
    val tokenStats = toks.select(
      col(id),
      size(col("t")).cast("long").as("n_tokens"),
      round(lit(1.0) - size(array_distinct(col("t"))).cast("double") /
        size(col("t")).cast("double"), 6).as("dup_word_frac"))
    val topBigram = toks
      .where(size(col("t")) >= 2)
      // with multiplicity — NOT Dedup.explodedShingles, whose
      // array_distinct would erase exactly the repetition being measured
      .select(col(id), explode(graft.functions.TextFns.shingles(col("t"), 2)).as("bg"))
      .groupBy(col(id), col("bg")).agg(count(lit(1)).as("cnt"))
      .groupBy(col(id)).agg(
        max(col("cnt")).as("top_cnt"),
        sum(col("cnt")).as("n_bigrams"))
      .select(col(id),
        round(col("top_cnt").cast("double") / col("n_bigrams").cast("double"), 6)
          .as("top_bigram_frac"))
    tokenStats.join(topBigram, Seq(id), "left")
      .na.fill(0.0, Seq("top_bigram_frac"))
      .withColumn("repetitive",
        col("dup_word_frac") > maxDupWordFrac ||
          col("top_bigram_frac") > maxTopBigramFrac)
  }

  /** X16: text normalization — the CCNet/C4 cleanup pass that runs
    * before any hashing or tokenization: Unicode NFC (decomposed
    * accents, compatibility artifacts), control-character strip
    * (everything in C0/DEL except newline and tab), and space/tab-run
    * collapse + trim. Normalizing BEFORE dedup matters: the same
    * sentence scraped with composed vs decomposed accents must hash
    * identically or every dedup family silently misses it.
    *
    * Returns the input plus (clean_text, changed).
    *
    * Scale: map-only; NFC is the codegen'd [[graft.functions.NfcNormalize]]
    * expression (isNormalized fast path — ASCII rows allocate
    * nothing), the rest is built-in regexp_replace, all inside
    * whole-stage codegen. Cross-engine: DuckDB `nfc_normalize` + the
    * same RE2-safe character-class patterns.
    */
  def normalizeText(df: DataFrame, text: Column): DataFrame = {
    val nfc = graft.functions.NfcNormalize.nfc(text)
    val stripped = regexp_replace(nfc, "[\\x00-\\x08\\x0B-\\x1F\\x7F]", "")
    val collapsed = regexp_replace(stripped, "[ \\t]+", " ")
    df.withColumn("clean_text", trim(collapsed))
      .withColumn("changed", col("clean_text") =!= text)
  }

  /** X7b: line-level repetition statistics — the other half of the
    * Gopher repetition battery (Rae et al. 2021, §A1.1): the fraction
    * of duplicate LINES and the fraction of characters inside
    * duplicate lines (boilerplate headers/footers repeat whole lines,
    * which token-level stats dilute). Returns (id, n_lines,
    * dup_line_frac, dup_line_char_frac).
    *
    * Scale: same posture as [[repetitionStats]] — the distinct-line
    * fraction is map-only array math; the character fraction is two
    * doc-keyed partial aggregations (explode lines → count per
    * (doc, line) → weighted sum per doc). No wide shuffle.
    */
  def lineRepetitionStats(df: DataFrame, id: String, text: Column): DataFrame = {
    // null text counts as one empty line (stats 0.0), never a dropped
    // doc — the inner join below would otherwise silently lose the row
    val lines = df.select(col(id), split(coalesce(text, lit("")), "\n").as("ls"))
    val base = lines.select(col(id),
      size(col("ls")).cast("long").as("n_lines"),
      round(lit(1.0) - size(array_distinct(col("ls"))).cast("double") /
        size(col("ls")).cast("double"), 6).as("dup_line_frac"))
    val chars = lines.select(col(id), explode(col("ls")).as("l"))
      .groupBy(col(id), col("l")).agg(count(lit(1)).as("cnt"))
      .groupBy(col(id)).agg(
        sum(when(col("cnt") > 1, col("cnt") * length(col("l")))
          .otherwise(lit(0L))).as("dup_chars"),
        sum(col("cnt") * length(col("l"))).as("tot_chars"))
      .select(col(id),
        when(col("tot_chars") > 0,
          round(col("dup_chars").cast("double") /
            col("tot_chars").cast("double"), 6))
          .otherwise(lit(0.0)).as("dup_line_char_frac"))
    base.join(chars, Seq(id))
  }

  /** Email / phone / SSN-shaped patterns — deliberately lookaround-free
    * so the same pattern strings run under Java regex (Spark) and RE2
    * (DuckDB, Go) unchanged. The phone shape takes an optional country
    * code (1-3 digits) or a parenthesized US area code, then the usual
    * 3-and-3/4 digit groups — so `555-123-4567`, `(555) 123-4567` and
    * `+1-555-0123` all match in full, with no stray leading digit left
    * behind.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+?(\\([0-9]{3}\\) ?|[0-9]{1,3}[- ])[0-9]{3}[- ][0-9]{3,4}"
  val SsnRe = "[0-9]{3}-[0-9]{2}-[0-9]{4}"

  /** X8: PII redaction — replace email / phone / SSN shapes with typed
    * placeholder tags and count the redactions. Replacement order is
    * email → SSN → phone; it is semantically free here (an SSN's
    * 2-digit middle group cannot satisfy the phone shape's mandatory
    * 3-digit middle group, and neither matches inside a placeholder
    * tag), kept fixed only so output text is deterministic. Each
    * pattern's count is computed on the PROGRESSIVELY-scrubbed text —
    * the same string its replacement ran on — so `n_redactions` equals
    * the number of placeholder substitutions actually made, even when
    * one PII shape overlaps another (e.g. an SSN-shaped substring
    * inside an email local part is replaced once, counted once).
    *
    * Returns the input plus (scrubbed, n_redactions).
    *
    * Scale: pure map-only string work inside whole-stage codegen — no
    * shuffle, no UDF; regexp_replace/regexp gets codegen'd per row.
    */
  def scrubPii(df: DataFrame, text: Column): DataFrame = {
    def hits(on: Column, re: String): Column =
      size(regexp_extract_all(on, lit(re), lit(0))).cast("long")
    val afterEmail = regexp_replace(text, EmailRe, "<EMAIL>")
    val afterSsn = regexp_replace(afterEmail, SsnRe, "<SSN>")
    val scrubbed = regexp_replace(afterSsn, PhoneRe, "<PHONE>")
    df.withColumn("scrubbed", scrubbed)
      .withColumn("n_redactions",
        (hits(text, EmailRe) + hits(afterEmail, SsnRe) +
          hits(afterSsn, PhoneRe)).cast("long"))
  }

  /** X9: deterministic train/val/test assignment by hash bucket.
    * `cuts` are cumulative upper bounds over [[hashBucket]](id, 16):
    * default 12/2/2 sixteenths → 75% train, 12.5% val, 12.5% test.
    * Hash-based, not random: the split must be stable across runs,
    * engines and corpus re-shards, or later pipeline stages leak val
    * docs into train.
    *
    * Scale: map-only.
    */
  def assignSplit(
      df: DataFrame, id: String,
      trainUpper: Int = 12, valUpper: Int = 14): DataFrame = {
    val b = hashBucket(col(id), 16)
    df.withColumn("split",
      when(b < trainUpper, "train").when(b < valUpper, "val").otherwise("test"))
  }

  /** X11: quality-weighted domain mixing — keep each document with its
    * domain's sampling rate, deterministically: a doc survives iff its
    * hash percentile (bucket of 100) falls under rate*100. The rate
    * column is typically a broadcast-joined per-domain config table or
    * a CASE over the domain column. Deterministic sampling (not
    * `rand()`) so the mixture is reproducible and a re-run touches the
    * same rows — required for resumable 100 TB jobs.
    *
    * The cut is integer-vs-integer: rate is scaled to basis points and
    * ROUNDED before the comparison, so non-binary-representable rates
    * (0.07 * 10000 = 7.000000000000001 in doubles) keep exactly
    * round(rate * 10000) of the 10 000 buckets instead of one extra.
    *
    * Scale: map-only filter; the planner pushes it into the scan when
    * the rate expression only references scan columns.
    */
  def sampleByRate(df: DataFrame, id: String, rate: Column): DataFrame =
    df.where(hashBucket(col(id), 10000) < round(rate * 10000.0).cast("long"))

  /** X11b: temperature-scaled domain mixing (the XLM-R / mC4
    * "α-sampling" rule): instead of a hand-written per-domain rate
    * table, derive each domain's sampling rate from the corpus itself
    * so the OUTPUT mixture follows q_d ∝ n_d^α — α < 1 up-weights
    * small domains (α=1 is proportional take, α=0 is uniform across
    * domains). With an output budget of `budgetDocs` documents,
    * rate_d = min(1, budget·q_d / n_d), applied as the same
    * deterministic [[hashBucket]] basis-point cut as [[sampleByRate]]
    * — reproducible, resumable, engine-portable.
    *
    * Returns the input plus (rate,) for surviving rows only.
    *
    * Determinism note: the α=0.5 path uses `sqrt` (correctly-rounded
    * by IEEE 754 in every engine) and sums the per-domain weights in
    * DECIMAL(38,15) (exact, order-independent — Spark's partial-agg
    * order must not leak into the rates), so the derived rates are
    * bit-identical across engines and the registered query carries a
    * full value oracle. Other α go through `pow`, whose last-ulp
    * behavior is libm-specific — fine for production mixing, not for
    * cross-engine hashing.
    *
    * Scale: domain stats are one tiny partial-agg (|domains| rows);
    * rates broadcast back; the cut is the same pushdown-friendly
    * map-only filter as [[sampleByRate]]. The corpus shuffles zero
    * times.
    */
  def temperatureMix(
      df: DataFrame, id: String, domain: String,
      alpha: Double, budgetDocs: Long): DataFrame = {
    val counts = df.groupBy(col(domain))
      .agg(count(lit(1)).cast("double").as("n_d"))
    val weighted = counts.withColumn("s_d",
      if (alpha == 0.5) sqrt(col("n_d")) else pow(col("n_d"), lit(alpha)))
    val total = weighted
      .agg(sum(col("s_d").cast("decimal(38,15)")).cast("double").as("S"))
    val rates = weighted.crossJoin(broadcast(total))
      .select(col(domain),
        least(lit(1.0),
          lit(budgetDocs.toDouble) * (col("s_d") / col("S")) / col("n_d")).as("rate"))
    df.join(broadcast(rates), domain)
      .where(hashBucket(col(id), 10000) < round(col("rate") * 10000.0).cast("long"))
  }

  /** X13: unigram LM quality scoring — the corpus-internal stand-in
    * for CCNet-style LM-perplexity filtering: each token's log
    * probability comes from the corpus's own unigram distribution,
    * and a document's score is its mean token log-prob (natural log;
    * higher = more typical text, extreme negatives = junk/outlier
    * vocabulary). No external model, fully deterministic, so the
    * filter is reproducible anywhere. Returns (id, n_tokens,
    * avg_logprob).
    *
    * Scale: the unigram table is vocabulary-sized (small for any
    * real tokenizer vocab, but a raw-whitespace vocab over web text
    * can reach hundreds of millions of rows), so the score join is
    * deliberately left UNHINTED: AQE broadcasts it at runtime when
    * the built table is actually small and falls back to a shuffle
    * join when it isn't — a forced broadcast here would OOM the
    * driver exactly on the corpora this filter targets. The table is
    * built with one token-keyed partial agg; scoring is explode →
    * join → doc-keyed partial mean. The corpus never self-joins.
    */
  def unigramLogProb(df: DataFrame, id: String, text: Column): DataFrame = {
    // narrow scans widened before the token explode (r21, ScanWidth)
    val toks = ScanWidth.ensure(df)
      .select(col(id), explode(split(text, " ")).as("token"))
    val counts = toks.groupBy("token").agg(count(lit(1)).cast("double").as("cnt"))
    val total = counts.agg(sum(col("cnt").cast("decimal(38,6)")).cast("double").as("tot"))
    val lp = counts.crossJoin(broadcast(total))
      .select(col("token"), log(col("cnt") / col("tot")).as("lp"))
    toks.join(lp, "token")
      .groupBy(col(id))
      // mean via DECIMAL-exact sum, not avg(): double summation order
      // is partition-dependent and must not leak into the score
      .agg(count(lit(1)).as("n_tokens"),
        (sum(col("lp").cast("decimal(38,15)")).cast("double") /
          count(lit(1)).cast("double")).as("avg_logprob"))
  }

  /** X13c: bigram LM quality scoring — one rung up the n-gram ladder
    * from [[unigramLogProb]] toward CCNet's real 5-gram LM: a
    * document's score is its mean bigram conditional log-prob
    * (1/(n−1)) Σ ln p(w_i | w_{i−1}) under the corpus's own MLE bigram
    * model, p(w_i|w_{i−1}) = c(w_{i−1} w_i) / c(w_{i−1} ·). Scoring
    * the same corpus the model is built from means every scored bigram
    * has count ≥ 1 — MLE needs no smoothing and the score is exact and
    * reproducible anywhere. The bigram mean separates "typical words
    * in atypical ORDER" from the unigram score's "atypical words" —
    * the repetitive/templated-junk axis unigrams cannot see. Docs with
    * fewer than two tokens have no bigram and are not returned.
    * Returns (id, n_bigrams, avg_logprob2).
    *
    * Scale: the conditioning counts c(w_{i−1} ·) come from re-
    * aggregating the BIGRAM table by its first token — never a second
    * corpus scan. Like the unigram table, the bigram table can be
    * huge on raw web text (it grows with corpus diversity, not size
    * bound), so both score joins are deliberately AQE-unhinted:
    * broadcast when small at runtime, shuffle join when not. One
    * corpus scan, three token-keyed partial aggs, one doc-keyed
    * partial mean; the corpus never self-joins.
    */
  def bigramLogProb(df: DataFrame, id: String, text: Column): DataFrame = {
    // NOT width-widened (r21): measured 1.0 -> 1.3 s at sf0.1 with
    // ScanWidth here — the split-only explode is too cheap to
    // amortize the extra exchange (contrast unigramLogProb, whose
    // widened explode measured 1.07 -> 0.69 s; the md5/regex-heavy
    // maps are where ScanWidth pays)
    val toks = df.select(col(id), split(text, " ").as("t"))
    val bis = toks
      .where(size(col("t")) >= 2)
      .select(col(id), explode(arrays_zip(
        slice(col("t"), lit(1), size(col("t")) - 1).as("w1"),
        slice(col("t"), lit(2), size(col("t")) - 1).as("w2"))).as("b"))
      .select(col(id), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val c12 = bis.groupBy("w1", "w2").agg(count(lit(1)).cast("double").as("c12"))
    val c1 = c12.groupBy("w1").agg(sum(col("c12")).as("c1"))
    val lp = c12.join(c1, "w1")
      .select(col("w1"), col("w2"), log(col("c12") / col("c1")).as("lp"))
    bis.join(lp, Seq("w1", "w2"))
      .groupBy(col(id))
      // DECIMAL-exact sum, same law as unigramLogProb: double summation
      // order is partition-dependent and must not leak into the score
      .agg(count(lit(1)).as("n_bigrams"),
        (sum(col("lp").cast("decimal(38,15)")).cast("double") /
          count(lit(1)).cast("double")).as("avg_logprob2"))
  }

  /** X13d: interpolated Kneser–Ney trigram LM quality score — the
    * smoothed-n-gram rung of the CCNet ladder (Wenzek et al. 2020 use
    * a KenLM 5-gram; Kneser & Ney 1995; Chen & Goodman 1999's
    * interpolated form with one fixed discount D):
    *
    *   p(w|u,v) = max(c(uvw)−D, 0)/c(uv·) + D·N1+(uv·)/c(uv·)·p(w|v)
    *   p(w|v)   = max(N1+(·vw)−D, 0)/N1+(·v·)
    *                + D·N1+(v·)/N1+(·v·)·p_cont(w)
    *   p_cont(w) = N1+(·w) / N1+(··)
    *
    * This is the quality axis the MLE arms ([[unigramLogProb]],
    * [[bigramLogProb]]) miss: MLE rewards ANY seen n-gram at its raw
    * frequency — a document of once-seen (typo-like) trigrams scores
    * as if those continuations were reliable — while KN discounts
    * every observed count by D and redistributes that mass through
    * the continuation-count backoff, so rare-context text is scored
    * by how DIVERSELY its parts continue, not by single co-occurrence
    * accidents.
    *
    * Exactness: every model quantity is an exact integer count
    * (trigram counts, context totals, continuation-type counts — all
    * derived from ONE trigram-type table, so the model is
    * self-consistent at document boundaries); D = 0.75 is exactly
    * representable, the probability is one fixed double expression
    * tree over those integers (each op correctly rounded ⇒ identical
    * bits both engines), the per-doc sum of ln p is DECIMAL-exact
    * (order-free), and sum-to-1 over the vocabulary holds exactly in
    * the rationals (spec law). Same ln() last-ulp parity class as the
    * MLE arms, rounded at the query face.
    *
    * Scale: one corpus explode into trigram positions; every model
    * table is TYPE-sized (distinct trigrams and their group-bys —
    * vocabulary-scale, not position-scale); scoring is type-keyed
    * joins back to positions plus a doc-keyed partial agg — zero
    * corpus self-joins, no driver-side model. Joins stay AQE-unhinted
    * (the X13c convention): type tables can exceed broadcast size on
    * real corpora.
    */
  def kneserNeyLogProb(df: DataFrame, id: String, text: Column,
      discount: Double = 0.75): DataFrame = {
    val tris = knTrigrams(df, id, text)
    // the ONE position-scale aggregation; everything below is
    // type-sized
    val t3 = tris.groupBy("w1", "w2", "w3")
      .agg(count(lit(1)).cast("double").as("c3"))
    knScoreDocs(tris, knModelLogProbs(t3, discount), id)
  }

  /** The KN scoring pipeline's three shared stages — exposed so the
    * streaming counts store ([[graft.streaming.StreamingNgramLm]])
    * scores through the IDENTICAL code path as the batch operator
    * (parity is then structural, not coincidental).
    */
  private[graft] def knTrigrams(df: DataFrame, id: String,
      text: Column): DataFrame = {
    // NOT width-widened (r21): measured 1.2 -> 1.9 s at sf0.1 with
    // ScanWidth here — see bigramLogProb
    val toks = df.select(col(id), split(text, " ").as("t"))
    toks
      .where(size(col("t")) >= 3)
      .select(col(id), explode(arrays_zip(
        slice(col("t"), lit(1), size(col("t")) - 2).as("w1"),
        slice(col("t"), lit(2), size(col("t")) - 2).as("w2"),
        slice(col("t"), lit(3), size(col("t")) - 2).as("w3"))).as("g"))
      .select(col(id), col("g.w1").as("w1"), col("g.w2").as("w2"),
        col("g.w3").as("w3"))
  }

  /** Per-trigram-type interpolated-KN log-probs from a (w1, w2, w3,
    * c3) count table — every model quantity derives from `t3` alone,
    * so ANY exact producer of the counts (one batch aggregation, a
    * streaming summable store) yields bit-identical scores.
    */
  private[graft] def knModelLogProbs(t3: DataFrame,
      discount: Double): DataFrame = {
    val d = lit(discount)
    // highest order: context total c(uv·) and distinct-continuation
    // count N1+(uv·)
    val ctx = t3.groupBy("w1", "w2")
      .agg(sum(col("c3")).as("c2"),
        count(lit(1)).cast("double").as("n1p"))
    // middle order, continuation counts over trigram TYPES:
    // N1+(·vw) = distinct u preceding (v,w); N1+(·v·) = distinct
    // (u,w) around v
    val nvw = t3.groupBy(col("w2"), col("w3"))
      .agg(count(lit(1)).cast("double").as("nvw"))
    val nvdot = t3.groupBy(col("w2"))
      .agg(count(lit(1)).cast("double").as("nvdot"))
    // bigram TYPE set (v,w): N1+(v·), N1+(·w), N1+(··)
    val t2 = t3.select(col("w2"), col("w3")).distinct()
    val nfol = t2.groupBy(col("w2"))
      .agg(count(lit(1)).cast("double").as("nfol"))
    val nend = t2.groupBy(col("w3"))
      .agg(count(lit(1)).cast("double").as("nend"))
    val tot = t2.agg(count(lit(1)).cast("double").as("ntypes"))
    val scored = t3
      .join(ctx, Seq("w1", "w2"))
      .join(nvw, Seq("w2", "w3"))
      .join(nvdot, Seq("w2"))
      .join(nfol, Seq("w2"))
      .join(nend, Seq("w3"))
      .crossJoin(broadcast(tot))
      .withColumn("lp", log(
        greatest(col("c3") - d, lit(0.0)) / col("c2") +
          (d * col("n1p") / col("c2")) *
          (greatest(col("nvw") - d, lit(0.0)) / col("nvdot") +
            (d * col("nfol") / col("nvdot")) *
            (col("nend") / col("ntypes")))))
      .select(col("w1"), col("w2"), col("w3"), col("lp"))
    scored
  }

  /** Doc-keyed DECIMAL-exact mean of the per-trigram log-probs —
    * trigram positions not present in the model table are dropped
    * (impossible corpus-internally; for out-of-corpus docs scored
    * against a store, the mean covers the in-model positions and
    * `n_trigrams` says how many scored).
    */
  private[graft] def knScoreDocs(tris: DataFrame, lp: DataFrame,
      id: String): DataFrame =
    tris.join(lp, Seq("w1", "w2", "w3"))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_trigrams"),
        (sum(col("lp").cast("decimal(38,15)")).cast("double") /
          count(lit(1)).cast("double")).as("avg_logprob_kn"))

  /** X13b: CCNet-style head/middle/tail quality bucketing (Wenzek et
    * al. 2020, §4.3) — each domain's documents are split into equal
    * thirds by quality score ("head" = best third), the shape CCNet
    * uses to let downstream consumers choose a quality/volume
    * trade-off per language without re-scoring. Ties are broken by
    * `id`, so the assignment is deterministic; pass an
    * already-rounded score (e.g. `round(avg_logprob, 6)`) when the
    * score came from floating-point aggregation, so the ORDER — not
    * just the value — is engine-portable.
    *
    * Scale: one window per domain (domain count = parallelism floor,
    * same posture as [[stratifiedSample]]); ntile is a single-pass
    * rank function, no second shuffle.
    */
  def qualityBuckets(
      df: DataFrame, id: String, domain: String, score: Column): DataFrame = {
    val w = Window.partitionBy(col(domain)).orderBy(score.desc, col(id))
    val nt = ntile(3).over(w)
    df.withColumn("q_bucket",
      when(nt === 1, "head").when(nt === 2, "middle").otherwise("tail"))
  }

  /** X12: deterministic stratified sampling — exactly `k` documents
    * per stratum (domain/language/split cell), chosen by md5-hash
    * rank with id tiebreak. Unlike rate-based sampling
    * ([[sampleByRate]]) the output size per stratum is EXACT, which
    * is what evaluation-set construction needs ("500 eval docs per
    * language"), and unlike `rand()`-based `sampleBy` it is
    * reproducible across runs, engines and re-shards.
    *
    * Scale: one hash-partitioned window per stratum (the stratum count
    * is the parallelism floor — thousands of cells at real scale, so
    * no single-partition pinch); rank <= k prunes early. For k ≪
    * stratum size a pre-filter on [[hashBucket]] can bound the window
    * input (not needed at test SFs; noted for 100 TB).
    */
  def stratifiedSample(
      df: DataFrame, id: String, strata: Seq[String], k: Int): DataFrame = {
    val w = Window.partitionBy(strata.map(col): _*)
      .orderBy(md5(col(id).cast("string")), col(id))
    df.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= k)
      .drop("__rk")
  }

  /** X12c: [[stratifiedSample]]'s BOUNDED-STATE execution shape — the
    * same md5-rank winner set (equivalence law in CurationSpec)
    * computed as a partial+final `functions.BoundedSample` aggregate
    * instead of a per-stratum window sort. The window form's
    * parallelism floor is the stratum count: at 5 strata, 5 tasks each
    * sort 20% of the corpus. Here the map side combines every input
    * partition down to ≤ k candidates per stratum, the shuffle carries
    * only those, and no task ever sorts raw volume — the shape that
    * holds when strata are few and the corpus is 100 TB. Prefer the
    * window form when k is large or callers need the full sampled
    * rows in place; prefer this to feed an id-list broadcast
    * semi-join.
    *
    * Output: strata :+ (`rank`, id-as-string named after `id`), one
    * row per winner, ascending (rank, id) per stratum.
    */
  def stratifiedSampleBounded(
      df: DataFrame, id: String, strata: Seq[String], k: Int): DataFrame = {
    val agg = org.apache.spark.sql.functions.udaf(
      new graft.functions.BoundedSample(k),
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.STRING))
    df.groupBy(strata.map(col): _*)
      .agg(agg(md5(col(id).cast("string")), col(id).cast("string"))
        .as("__s"))
      .select((strata.map(col) :+ explode(col("__s.items")).as("__e")): _*)
      .select((strata.map(col) :+ col("__e.rank").as("rank")) :+
        col("__e.item").as(id): _*)
  }

  /** X12b: WEIGHTED sampling without replacement — the A-Res scheme
    * (Efraimidis & Spirakis 2006, "Weighted random sampling with a
    * reservoir"): each row gets key u^(1/w) for u uniform on (0,1] and
    * weight w > 0, and the top-k keys per stratum are an exact
    * probability-proportional-to-weight sample without replacement.
    * The uniform draw is the md5 hash of the id (not `rand()`), so
    * like [[stratifiedSample]] the sample is reproducible across runs,
    * engines, and re-shards — but inclusion probability now follows a
    * QUALITY/size weight, the "sample the best-ish, not uniformly"
    * primitive data mixing actually uses.
    *
    * Rows with null or non-positive weight are excluded (they have no
    * defined inclusion probability). The rank key is the LOG-domain
    * A-Res key ln(u)/w (max-k on it selects the same set as max-k on
    * u^(1/w) — ln is monotone — but never saturates: u^(1/w) collapses
    * toward 1.0 as w grows, so a fixed-precision rounding of it
    * degrades to a min-id sample once w ≳ 1e9, while ln(u)/w keeps its
    * order at any weight magnitude). Engine portability: libm `ln`'s
    * last ulp is not pinned across engines, so ln(u) is ROUNDED to 9
    * decimals BEFORE the (correctly-rounded IEEE) division by w, with
    * the id as tiebreak — the same order-portability rule as
    * [[qualityBuckets]]; a boundary tie resolves to the smaller id in
    * any engine.
    *
    * Scale: identical shape to [[stratifiedSample]] — map-only key
    * computation, one hash-partitioned window per stratum, rank <= k.
    */
  def weightedSample(
      df: DataFrame, id: String, strata: Seq[String], weight: Column,
      k: Int): DataFrame = {
    val u = (hashBucket(col(id), 1000000000) + 1).cast("double") /
      lit(1000000000.0)
    val key = round(log(u), 9) / weight.cast("double")
    val w = Window.partitionBy(strata.map(col): _*)
      .orderBy(col("__ky").desc, col(id))
    df.where(weight.isNotNull && weight.cast("double") > 0.0)
      .withColumn("__ky", key)
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= k)
      .drop("__ky", "__rk")
  }

  /** Line-level boilerplate markers (C4's blocklist spirit): a line
    * mentioning javascript, the lorem-ipsum filler, or a curly brace
    * (code/markup leakage) is dropped wholesale. Lowercased substring
    * match — the same semantics as DuckDB `contains(lower(l), m)`.
    */
  val BoilerplateMarkers: Seq[String] = Seq("lorem ipsum", "javascript", "{")

  /** X14: C4-style line-level quality filtering (Raffel et al. 2020,
    * §2.2) — the page-cleaning pass that runs BEFORE document-level
    * quality scoring: keep only lines that (a) end in a terminal
    * punctuation mark, (b) have at least `minWords` words, and (c)
    * contain no boilerplate marker. Returns the input plus
    * (n_lines, n_kept, clean_text) so callers can both reflow the
    * page and apply C4's page-level rule (drop pages with too few
    * surviving lines).
    *
    * Scale: pure map-only array work — split, a higher-order
    * `filter`, array_join; no shuffle, no UDF. The lambda predicate
    * is interpreted (Spark HOFs are not whole-stage-codegen'd) but
    * stays inside the scan's project, so the cost is per-row CPU with
    * full scan parallelism — the right trade for per-LINE logic,
    * which a flat regexp over the whole page cannot express.
    */
  def filterLines(
      df: DataFrame, text: Column,
      minWords: Int = 3,
      markers: Seq[String] = BoilerplateMarkers): DataFrame = {
    val lines = split(text, "\n")
    val keepLine = (l: Column) => {
      val t = trim(l)
      // foldLeft, not reduce: an empty marker list means "no
      // boilerplate rule", not an exception at plan-build time
      val boiler = markers.foldLeft(lit(false))((acc, m) => acc || lower(t).contains(m))
      t.rlike("[.!?\"]$") && size(split(t, " ")) >= minWords && !boiler
    }
    val kept = filter(lines, keepLine)
    df.withColumn("n_lines", size(lines).cast("long"))
      .withColumn("n_kept", size(kept).cast("long"))
      .withColumn("clean_text", array_join(kept, "\n"))
  }

  /** X15: token-budget corpus selection — keep the highest-quality
    * documents whose cumulative token count fits a training budget
    * (the "take the best B tokens" step of quality-ranked data
    * selection). Semantics: order documents by (score desc, `id`
    * asc) and keep the maximal prefix whose running token sum stays
    * <= `budgetTokens`. Returns the input plus (score, n_tokens,
    * cum_tokens) for surviving rows.
    *
    * `score` must be integral and non-null, and `nTokens` non-null
    * and >= 0 — integer scores make the bucket boundary exact in any
    * engine (a null score would silently drop the row at the bucket
    * join); for a double score, pre-bucket with
    * `floor(score * resolution)` (monotone, so the ordering and
    * therefore the selected set is preserved at bucket granularity).
    *
    * Scale — the whole point of this shape: the naive form is ONE
    * global orderBy window (single-partition pinch: 100 TB through
    * one task). Instead: (1) aggregate tokens per score value — a
    * tiny partial-agg table, |distinct scores| rows; (2) a window
    * over THAT table (driver-scale, single partition by design)
    * yields each score's global token offset `__prev`; (3) broadcast
    * the offsets back, DROP every score bucket whose offset already
    * exceeds the budget BEFORE any window — the filter prunes the
    * corpus to the candidate prefix; (4) a score-partitioned window
    * (parallelism = distinct candidate scores) adds the within-bucket
    * running sum to the bucket offset, giving the exact global
    * cumulative without a global sort. Bit-for-bit equal to the
    * naive form, verified by the registered query's oracle, which IS
    * the naive form.
    *
    * Measured (BASELINE.md round 7): below ~1M rows the naive global
    * window is FASTER (one window task sorts a small corpus for free;
    * this plan pays two extra shuffles + a broadcast) — use a plain
    * `Window.orderBy` there. At 30M rows the naive form is 19× slower
    * (54.7 s vs 2.8 s) and degrades super-linearly: one task
    * out-of-core-sorts the corpus, which is exactly the pinch this
    * shape removes.
    */
  def selectByBudget(
      df: DataFrame, id: String, score: Column, nTokens: Column,
      budgetTokens: Long): DataFrame = {
    val d = df.withColumn("score", score.cast("long"))
      .withColumn("n_tokens", nTokens.cast("long"))
    val perScore = d.groupBy(col("score").as("__s"))
      .agg(sum(col("n_tokens")).as("__bt"))
    val wb = Window.orderBy(col("__s").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = perScore
      .withColumn("__prev", sum(col("__bt")).over(wb) - col("__bt"))
      .select(col("__s"), col("__prev"))
    val wIn = Window.partitionBy(col("score")).orderBy(col(id))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.join(broadcast(offsets), col("score") === col("__s"))
      // whole buckets past the budget never reach the window; <= (not
      // <) because a bucket whose offset EQUALS the budget can still
      // hold zero-token docs the naive form keeps (cum == budget)
      .where(col("__prev") <= budgetTokens)
      .withColumn("cum_tokens", sum(col("n_tokens")).over(wIn) + col("__prev"))
      .where(col("cum_tokens") <= budgetTokens)
      .drop("__s", "__prev")
  }

  /** X17: overlapping token-window chunking — the embedding/RAG prep
    * step (the other consumer of a curated corpus, next to [[packSequences]]'
    * pretraining batcher): each document is cut into windows of
    * `chunkTokens` tokens advancing by `chunkTokens - overlap`, so
    * consecutive chunks share `overlap` tokens of context. A window
    * is emitted only while it contributes at least one NEW token
    * beyond the shared overlap (start + overlap < n), so short tails
    * already fully covered by the previous window are not duplicated;
    * every document yields at least one chunk. chunk_id is the
    * window ordinal — (id, chunk_id) is the stable key an embedding
    * store needs for idempotent re-runs.
    *
    * Returns (id, chunk_id, n_chunk_tokens, chunk_text).
    *
    * Scale: map-only — sequence + posexplode + slice inside the
    * scan's project; output size = Σ ceil((n_d - overlap)/stride),
    * the semantic chunk count. No shuffle, no UDF.
    */
  def chunkTokens(
      df: DataFrame, id: String, text: Column,
      chunkTokens: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap must be in [0, chunkTokens): $overlap vs $chunkTokens")
    val stride = chunkTokens - overlap
    // null text is one empty-string token, so the doc still yields its
    // one chunk (NULL starts would make posexplode drop the row and
    // break the every-doc-chunks guarantee above)
    val toks = split(coalesce(text, lit("")), " ")
    val n = size(toks).cast("long")
    val starts = sequence(lit(0L),
      greatest(n - lit(overlap.toLong + 1L), lit(0L)), lit(stride.toLong))
    df.select(col(id), toks.as("__toks"), n.as("__n"),
        posexplode(starts).as(Seq("chunk_id", "__start")))
      .select(col(id), col("chunk_id").cast("long").as("chunk_id"),
        least(lit(chunkTokens.toLong), col("__n") - col("__start")).as("n_chunk_tokens"),
        concat_ws(" ", slice(col("__toks"),
          (col("__start") + 1L).cast("int"), lit(chunkTokens))).as("chunk_text"))
  }

  /** X10: concat-and-chunk sequence packing — the GPT-style
    * pretraining batcher: documents are laid end-to-end in a
    * deterministic order within each shard and the token stream is
    * chunked every `budget` tokens; a document belongs to the pack
    * where its first token lands. Returns the input plus (n_tokens,
    * start_offset, pack_id, pack_pos).
    *
    * Scale: the running offset is a window over (shard, order) — the
    * ONLY safe shape for a prefix sum at 100 TB. Window.partitionBy
    * (shard) keeps every partition independent (shards are file groups
    * / sources, thousands of them), so parallelism is preserved; a
    * global orderBy-only window would serialize the corpus through one
    * partition. Chunking by arithmetic on the prefix sum (not a
    * stateful scan) keeps it all in whole-stage codegen.
    */
  def packSequences(
      df: DataFrame, shard: String, order: String,
      nTokens: Column, budget: Int): DataFrame = {
    val w = Window.partitionBy(col(shard)).orderBy(col(order))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tokens", nTokens.cast("long"))
      .withColumn("start_offset", sum(col("n_tokens")).over(w) - col("n_tokens"))
      // true integer division (`div`), not double `/` + cast: exact at
      // any offset, not just below 2^53 — matches the oracle's `//`
      .withColumn("pack_id", expr(s"start_offset div $budget"))
      .withColumn("pack_pos", col("start_offset") % budget)
  }

  /** X10b: BEST-FIT-DECREASING sequence packing — the public
    * alternative to [[packSequences]]' concat-and-chunk (Krell et al.
    * 2021, "Efficient Sequence Packing without Cross-contamination"):
    * documents are never split across pack boundaries, so packed
    * training batches carry no cross-document attention contamination,
    * at near-zero padding cost (BFD is a 11/9·OPT+1 bin-packing
    * approximation — classic Johnson bound).
    *
    * Algorithm (deterministic): within each shard, docs ordered
    * (n_tokens DESC, doc_id ASC); each doc goes to the open pack with
    * the SMALLEST remaining budget that still fits (tie → lowest
    * pack_id), else opens a new pack. Lengths clamp at `budget` (an
    * over-long doc occupies one full pack alone — the truncation
    * policy is upstream's concern).
    *
    * Scale: bin packing is sequential, so the sequential state is
    * SHARD-scoped — the [[packSequences]] posture exactly: shards are
    * independent (md5 [[hashBucket]], engine-portable), each one's BFD
    * replays inside a single `flatMapGroups` task whose state is two
    * int arrays bounded by the shard's pack count. Pick `shards` so a
    * shard's docs fit one task (at 100 TB: thousands of shards, each
    * tens of MB of (id, len) pairs — the packer never touches text,
    * only the length column). Cross-shard padding loss vs a global
    * solve is the standard trade and is measured by
    * [[bestFitPackStats]].
    *
    * Returns (shard, doc_id, n_tokens, pack_id, slot): pack_id is the
    * shard-local open order (0-based), slot the arrival order within
    * the pack. Ids must be long-castable (the engine's doc ids are).
    */
  def bestFitPack(df: DataFrame, id: String, nTokens: Column,
      budget: Int, shards: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
      hashBucket(col(id), shards).as("shard"),
      col(id).cast("long").as("doc_id"),
      least(nTokens.cast("long"), lit(budget.toLong)).as("n_tokens"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (shard, it) =>
        val docs = it.map(t => (t._2, t._3)).toVector
          .sortBy { case (d, l) => (-l, d) }
        val rem = scala.collection.mutable.ArrayBuffer.empty[Long]
        val fill = scala.collection.mutable.ArrayBuffer.empty[Long]
        docs.iterator.map { case (d, l) =>
          var best = -1
          var bestRem = Long.MaxValue
          var i = 0
          while (i < rem.length) {
            // strict < keeps the FIRST (lowest pack_id) among ties
            if (rem(i) >= l && rem(i) < bestRem) { bestRem = rem(i); best = i }
            i += 1
          }
          if (best < 0) {
            rem += (budget.toLong - l); fill += 1L
            (shard, d, l, (rem.length - 1).toLong, 0L)
          } else {
            val slot = fill(best)
            rem(best) -= l; fill(best) += 1
            (shard, d, l, best.toLong, slot)
          }
        }
      }
      .toDF("shard", "doc_id", "n_tokens", "pack_id", "slot")
  }

  /** Packing-efficiency readout over a [[bestFitPack]] (or any
    * (shard, pack_id, n_tokens)) assignment: packs, docs, token sum,
    * and the padding fraction 1 − Σtokens/(packs·budget) — the number
    * Krell et al. optimize. One aggregate over the assignment table.
    */
  def bestFitPackStats(asg: DataFrame, budget: Int): DataFrame =
    asg.agg(
      countDistinct(col("shard"), col("pack_id")).as("n_packs"),
      count(lit(1)).as("n_docs"),
      sum(col("n_tokens")).as("sum_tokens"))
      .withColumn("efficiency",
        round(col("sum_tokens").cast("double") /
          (col("n_packs").cast("double") * budget), 6))

  /** X20: corpus-level boilerplate line removal — the cross-document
    * half of line cleaning (CCNet, Wenzek et al. 2020 §3.1 dedups
    * paragraphs by hash ACROSS shards; C4's within-page rules are
    * [[filterLines]]): a line that occurs in at least
    * `minDocFrac` of all documents is boilerplate (nav bars, cookie
    * banners, footers) and is dropped from EVERY document. Returns
    * (id, n_lines, n_kept, clean_text) with line order preserved.
    *
    * Line identity is the exact string — duplicate lines WITHIN one
    * document count once toward the document frequency.
    *
    * Scale: the doc-frequency pass is a line-keyed partial aggregation
    * (distinct (line, doc) then count per line — both map-side
    * combinable); the frequent set is PROVABLY driver-sized — at most
    * avgLinesPerDoc / minDocFrac distinct lines can each appear in
    * ≥ minDocFrac·N docs (Σ dc ≤ total line occurrences), a few
    * hundred at web-corpus shapes — so the anti join back carries an
    * explicit broadcast hint, never a shuffle of the corpus by line.
    * The order-preserving reassembly is a doc-keyed agg over
    * (pos, line) structs. At 100 TB the shuffle rows of the frequency
    * pass can be narrowed by hashing lines to 128-bit keys first
    * (md5), trading a no-collision assumption for ~10× narrower
    * exchange — the string form here is the collision-free default.
    */
  def dropBoilerplateLines(
      df: DataFrame, id: String, text: Column,
      minDocFrac: Double = 0.15): DataFrame = {
    require(minDocFrac > 0 && minDocFrac <= 1,
      s"minDocFrac must be in (0, 1]: $minDocFrac")
    // null text = one empty line, same contract as lineRepetitionStats:
    // the doc keeps its output row, never silently drops
    val lines = df.select(col(id), split(coalesce(text, lit("")), "\n").as("__ls"))
    val exploded = lines.select(col(id),
      posexplode(col("__ls")).as(Seq("__pos", "__line")))
    // 1-row doc count kept in-plan (no driver round trip) and
    // broadcast into the threshold predicate
    val nDocs = lines.agg(count(lit(1)).as("__n_docs"))
    val boiler = exploded.groupBy(col("__line"))
      .agg(countDistinct(col(id)).as("__dc"))
      .crossJoin(broadcast(nDocs))
      .filter(col("__dc") >= ceil(col("__n_docs") * lit(minDocFrac)))
      .select(col("__line"))
    val kept = exploded.join(broadcast(boiler), Seq("__line"), "left_anti")
    val regrouped = kept.groupBy(col(id)).agg(
      count(lit(1)).as("__n_kept"),
      array_join(transform(
        array_sort(collect_list(struct(col("__pos"), col("__line")))),
        x => x.getField("__line")), "\n").as("__clean"))
    // left join from the full doc set: a doc whose every line is
    // boilerplate still appears, with an empty clean_text
    lines.select(col(id), size(col("__ls")).cast("long").as("n_lines"))
      .join(regrouped, Seq(id), "left")
      .select(col(id), col("n_lines"),
        coalesce(col("__n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("__clean"), lit("")).as("clean_text"))
  }

  /** X24: corpus-global paragraph/line dedup — CCNet's cross-shard
    * paragraph deduplication (Wenzek et al. 2020 §3.1): every
    * DISTINCT line is kept in exactly ONE place corpus-wide (its
    * first occurrence: minimum doc id, then minimum position within
    * that doc) and removed everywhere else. The frequency-threshold
    * form ([[dropBoilerplateLines]]) removes a frequent line from ALL
    * docs including the first; this is the keep-one complement —
    * repeated mass is removed but never lost, the form a pretraining
    * pipeline uses when the line is content (syndicated articles,
    * quoted passages), not chrome.
    *
    * Returns (id, n_lines, n_kept, clean_text) for every input doc
    * (all-duplicate docs survive with empty clean_text), clean_text
    * reassembled in original line order.
    *
    * Scale shape: one line-keyed partial-agg shuffle (`min` over a
    * (doc, pos) struct — map-side combine, so the hot keys a skewed
    * line distribution produces, e.g. the empty line, collapse before
    * the exchange) + one keeper semi-join keyed on the FULL
    * (line, doc, pos) triple — every key matches at most one row, so
    * the join inherits no line skew — + the doc-keyed reassembly agg.
    * Never a window over the line key, never a global sort.
    */
  def dedupParagraphs(
      df: DataFrame, id: String, text: Column): DataFrame = {
    // null text = one empty line, same contract as the X20 pass
    val lines = df.select(col(id), split(coalesce(text, lit("")), "\n").as("__ls"))
    val exploded = lines.select(col(id),
      posexplode(col("__ls")).as(Seq("__pos", "__line")))
    val keeper = exploded.groupBy(col("__line"))
      .agg(min(struct(col(id), col("__pos"))).as("__k"))
      .select(col("__line"), col("__k").getField(id).as(id),
        col("__k").getField("__pos").as("__pos"))
    val kept = exploded.join(keeper, Seq("__line", id, "__pos"), "left_semi")
    val regrouped = kept.groupBy(col(id)).agg(
      count(lit(1)).as("__n_kept"),
      array_join(transform(
        array_sort(collect_list(struct(col("__pos"), col("__line")))),
        x => x.getField("__line")), "\n").as("__clean"))
    lines.select(col(id), size(col("__ls")).cast("long").as("n_lines"))
      .join(regrouped, Seq(id), "left")
      .select(col(id), col("n_lines"),
        coalesce(col("__n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("__clean"), lit("")).as("clean_text"))
  }

  /** X21: deterministic global shuffle + sharding — the write-side
    * ordering pass of a pretraining data pipeline: every example gets
    * a pseudo-random but fully reproducible (shard, pos) address,
    * decorrelated from ingest order, so training readers stream shards
    * sequentially yet see a well-mixed example order (the "global
    * shuffle" of T5/GPT data pipelines, done once at write time
    * because shuffling 100 TB at read time is infeasible).
    *
    * key = md5(seed-id) gives the permutation; shard = the key's first
    * 8 hex chars mod nShards (the same engine-portable md5 arithmetic
    * as [[hashBucket]]/X9, DuckDB
    * `('0x' || substr(key, 1, 8))::UBIGINT % n`); pos = rank of the
    * key within the shard. Changing `seed` yields an independent
    * permutation — epochs can reshuffle by re-keying.
    *
    * Returns (id, shard, pos).
    *
    * Scale: one shuffle on `shard` + a per-shard sort — exactly
    * Spark's `repartition($"shard").sortWithinPartitions($"key")`
    * write path. The window is partitioned by shard, so parallelism =
    * nShards; choose nShards so a shard is one output file
    * (file-sized, thousands at 100 TB) and the per-shard sort stays
    * in-memory. No global order-by-only window ever forms.
    */
  def shuffleShard(
      df: DataFrame, id: String, seed: String, nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1: $nShards")
    val key = md5(concat_ws("-", lit(seed), col(id).cast("string")))
    val w = Window.partitionBy(col("shard")).orderBy(col("__key"), col(id))
    df.select(col(id), key.as("__key"))
      .withColumn("shard",
        (conv(substring(col("__key"), 1, 8), 16, 10).cast("long") % nShards)
          .cast("int"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col(id), col("shard"), col("pos"))
  }

  /** X22: DSIR — Data Selection via Importance Resampling (Xie et
    * al. 2023, arXiv:2302.03169): pick raw-corpus documents that look
    * like a small TARGET domain (a benchmark, a curated high-quality
    * set) by importance weight under hashed n-gram bag-of-words
    * models. Features are word bigrams hashed into `buckets` bins
    * (the paper's hashed n-gram trick — the model size is fixed at
    * `buckets` regardless of vocabulary); the target and raw unigram-
    * of-bigram distributions are estimated with add-one smoothing,
    * and each raw document's log importance weight is
    * Σ_features [ln p_target(b) − ln p_raw(b)] over its bigram
    * OCCURRENCES. Returns (id, n_feats, logweight) for every raw
    * (non-target) document with ≥ 1 bigram.
    *
    * All arithmetic is engine-portable by the X13 conventions: bucket
    * assignment is the md5-based [[hashBucket]]; counts are exact
    * integer-valued doubles; the smoothed ratios divide exact
    * integers (IEEE-deterministic); ln is the same parity class as
    * X13; the per-doc sum is DECIMAL-exact so partition order never
    * leaks into the score. Top-k selection on (logweight desc, id) is
    * the deterministic arm; the paper's sampled variant is exactly
    * [[weightedSample]] fed with Gumbel-perturbed log weights.
    *
    * Scale (100 TB posture): both distribution tables have at most
    * `buckets` rows — a CONSTANT — so they reduce through one
    * bucket-keyed partial agg each (map-side combine; the shuffle
    * carries ≤ buckets · partitions rows) and the log-ratio table is
    * force-broadcast (bounded by `buckets`, never by data size).
    * Scoring is explode → broadcast join → doc-keyed partial sum:
    * one corpus scan for the distributions, one for the scores, zero
    * corpus self-joins, no window anywhere.
    */
  def dsirLogWeights(
      df: DataFrame,
      id: String,
      text: Column,
      isTarget: Column,
      buckets: Int): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2: $buckets")
    // NOT width-widened (r21): measured neutral-to-worse at sf0.1
    // with ScanWidth here — see bigramLogProb
    val toks = df.select(col(id), isTarget.as("__tgt"), split(text, " ").as("t"))
    val feats = toks
      .where(size(col("t")) >= 2)
      .select(col(id), col("__tgt"), explode(arrays_zip(
        slice(col("t"), lit(1), size(col("t")) - 1).as("w1"),
        slice(col("t"), lit(2), size(col("t")) - 1).as("w2"))).as("b"))
      .select(col(id), col("__tgt"),
        hashBucket(concat_ws(" ", col("b.w1"), col("b.w2")), buckets).as("b"))
    val rawC = feats.where(!col("__tgt"))
      .groupBy("b").agg(count(lit(1)).cast("double").as("cr"))
    val tgtC = feats.where(col("__tgt"))
      .groupBy("b").agg(count(lit(1)).cast("double").as("ct"))
    // totals are exact sums of integer-valued doubles (DECIMAL path,
    // order-free); one row each, broadcast via the tiny cross join
    val totals = rawC
      .agg(sum(col("cr").cast("decimal(38,6)")).cast("double").as("Tr"))
      .crossJoin(tgtC
        .agg(coalesce(sum(col("ct").cast("decimal(38,6)")), lit(0))
          .cast("double").as("Tt")))
    // raw buckets left-join target counts: every scored feature comes
    // from a raw doc, so the raw side covers the scoring domain; a
    // bucket the target never hits contributes its smoothed floor
    val logRatio = rawC
      .join(tgtC, Seq("b"), "left")
      .na.fill(0.0, Seq("ct"))
      .crossJoin(broadcast(totals))
      .select(col("b"),
        (log((col("ct") + 1) / (col("Tt") + buckets)) -
          log((col("cr") + 1) / (col("Tr") + buckets))).as("lr"))
    feats.where(!col("__tgt"))
      .join(broadcast(logRatio), "b")
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_feats"),
        (sum(col("lr").cast("decimal(38,15)")).cast("double")).as("logweight"))
  }

  /** Merge every non-overlapping adjacent (a, b) symbol pair into the
    * concatenated symbol, LEFT TO RIGHT — the BPE merge-application
    * primitive, as one codegen-able fold over the symbol array
    * (state = (emitted prefix, one pending symbol); the finish lambda
    * flushes the pending symbol).
    */
  private def mergePair(sym: Column, a: String, b: String): Column = {
    val empty = array().cast("array<string>")
    aggregate(sym,
      struct(empty.as("out"), lit(null).cast("string").as("pend")),
      (acc, s) =>
        when(acc("pend") === lit(a) && s === lit(b),
          struct(concat(acc("out"), array(lit(a + b))).as("out"),
            lit(null).cast("string").as("pend")))
        .otherwise(struct(
          when(acc("pend").isNull, acc("out"))
            .otherwise(concat(acc("out"), array(acc("pend")))).as("out"),
          s.as("pend"))),
      acc => when(acc("pend").isNull, acc("out"))
        .otherwise(concat(acc("out"), array(acc("pend")))))
  }

  /** X25: byte-pair-encoding merge TRAINING (Sennrich, Haddow & Birch
    * 2016, "Neural Machine Translation of Rare Words with Subword
    * Units" — the algorithm behind every GPT/Llama-family tokenizer):
    * learn the `merges` highest-frequency adjacent-symbol merges over
    * the corpus. Returns the merge table
    * (rank, left, right, merged, pair_count) in learning order —
    * the artifact a tokenizer ships.
    *
    * The scale insight that makes BPE training distributable: after
    * ONE corpus pass collapses text to the DISTINCT-WORD frequency
    * table, every iteration runs on that vocabulary-sized table —
    * pair counting is an explode + (a, b)-keyed partial+final
    * aggregate weighted by word frequency, the argmax is a 1-row
    * TakeOrdered (ties broken (count desc, left, right) — fully
    * deterministic), and the merge application is the [[mergePair]]
    * fold. Corpus size only ever affects the first pass. Per
    * iteration the symbol table is localCheckpoint-truncated (the
    * GraphOps iterative-lineage discipline — k chained HOF folds
    * would otherwise nest the expression tree k deep).
    *
    * Words are character sequences with the classic `</w>`
    * end-of-word marker appended as its own symbol, so merges can
    * learn word-final units without crossing word boundaries.
    * Non-SQL-expressible (iterative argmax) ⇒ spec-verified against a
    * scalar reference; the registered query is rows-checked.
    */
  def bpeTrain(df: DataFrame, text: Column, merges: Int): DataFrame = {
    require(merges >= 1 && merges <= 10000, s"merges out of range: $merges")
    val spark = df.sparkSession
    val words = df
      .select(explode(split(text, " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(concat(
        transform(sequence(lit(1), length(col("w"))),
          i => substring(col("w"), i, lit(1))),
        array(lit("</w>"))).as("sym"), col("cnt"))
    var cur = words.localCheckpoint()
    val learned = scala.collection.mutable.ListBuffer
      .empty[(Int, String, String, Long)]
    var done = false
    for (r <- 1 to merges if !done) {
      val pairs = cur
        .select(col("cnt"), explode(arrays_zip(
          slice(col("sym"), lit(1), size(col("sym")) - 1),
          slice(col("sym"), lit(2), size(col("sym")) - 1))).as("p"))
        .select(col("p").getField("0").as("a"),
          col("p").getField("1").as("b"), col("cnt"))
        .groupBy(col("a"), col("b"))
        .agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1).collect()
      if (pairs.isEmpty || pairs.head.getLong(2) < 2) done = true
      else {
        val (a, b, n) = (pairs.head.getString(0), pairs.head.getString(1),
          pairs.head.getLong(2))
        learned += ((r, a, b, n))
        cur = cur.select(mergePair(col("sym"), a, b).as("sym"),
          col("cnt")).localCheckpoint()
      }
    }
    import spark.implicits._
    learned.toSeq.toDF("rank", "left", "right", "pair_count")
      .select(col("rank").cast("long"), col("left"), col("right"),
        concat(col("left"), col("right")).as("merged"),
        col("pair_count"))
  }

  /** X25b: apply a learned merge table to a corpus — the SEGMENT face
    * of [[bpeTrain]]: tokenize each document into BPE subword units
    * by replaying the merges in rank order. The fold is inherently
    * sequential per word, so it runs as a scalar function over the
    * DISTINCT-WORD table (vocabulary-sized — the documented read-face
    * posture, one invocation per distinct word, never per token).
    *
    * Assembly is MAP-SIDE (the X3f slim-pairs lesson, remeasured here
    * at 30×: shuffling each word's token array per OCCURRENCE through
    * a positional collect_list cost 25× the slim path's wall — the
    * payload rode the multiplying shuffle): token arrays join once
    * per (doc, DISTINCT word) into a per-doc lookup map, and the
    * token stream re-expands in a PROJECTION over split(text), so
    * the only per-occurrence array materialization is the output
    * itself. Returns (id, n_words, n_tokens, tokens) with tokens in
    * document order.
    */
  def bpeSegment(df: DataFrame, id: String, text: Column,
      merges: Seq[(String, String)]): DataFrame = {
    val seg = udf { (w: String) =>
      var sym = (w.map(_.toString) :+ "</w>").toVector
      for ((a, b) <- merges) {
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < sym.length) {
          if (i + 1 < sym.length && sym(i) == a && sym(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += sym(i); i += 1 }
        }
        sym = out.result()
      }
      sym
    }
    val words = df.select(col(id),
      filter(split(text, " "), w => length(w) > 0).as("__words"))
    val vocab = words
      .select(explode(col("__words")).as("w")).distinct()
      .withColumn("__toks", seg(col("w")))
    val docMaps = words
      .select(col(id), explode(array_distinct(col("__words"))).as("w"))
      .join(vocab, "w")
      .groupBy(col(id))
      .agg(map_from_entries(
        collect_list(struct(col("w"), col("__toks")))).as("__m"))
    words.join(docMaps, id)
      .select(col(id),
        size(col("__words")).cast("long").as("n_words"),
        flatten(transform(col("__words"),
          w => element_at(col("__m"), w))).as("tokens"))
      .select(col(id), col("n_words"),
        size(col("tokens")).cast("long").as("n_tokens"), col("tokens"))
  }

  /** X25c: token-COUNT stats face of [[bpeSegment]] — (id, n_words,
    * n_tokens) without ever materializing the token stream: the
    * per-distinct-word subword count (one INT) joins the exploded
    * word occurrences, so the multiplying shuffle carries integers
    * only. A budget/packing pipeline counts tokens far more often
    * than it reads them, and this face is measured FLAT at 30× corpus
    * scale (BpeScale) where [[bpeSegment]] honestly pays its
    * output-sized materialization cost. Identical n_words/n_tokens to
    * [[bpeSegment]] (spec-pinned).
    */
  /** Viterbi segmentation of one word under a unigram piece model:
    * best(i) = max_j best(j) + logP(w[j..i)), pieces bounded at
    * `maxLen` chars. Deterministic tie-break: j ascends, so the
    * LONGEST piece ending at i wins ties (strict > replaces).
    * Unknown SINGLE characters score `unk` (the SentencePiece UNK
    * posture — multi-char pieces must be in the model).
    */
  private[graft] def unigramViterbi(w: String, m: Map[String, Double],
      maxLen: Int, unk: Double): Vector[String] = {
    val n = w.length
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val from = Array.fill(n + 1)(-1)
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxLen)
      while (j < i) {
        val lp = m.get(w.substring(j, i)) match {
          case Some(v) => v
          case None if i - j == 1 => unk
          case None => Double.NegativeInfinity
        }
        val cand = best(j) + lp
        if (cand > best(i)) { best(i) = cand; from(i) = j }
        j += 1
      }
      i += 1
    }
    if (best(n) == Double.NegativeInfinity) Vector(w) // unsegmentable guard
    else {
      var k = n
      var acc = List.empty[String]
      while (k > 0) { val j = from(k); acc = w.substring(j, k) :: acc; k = j }
      acc.toVector
    }
  }

  /** The Viterbi SCORE of [[unigramViterbi]]'s best segmentation —
    * the pruning loss needs it for "how well does the rest of the
    * vocabulary cover this piece's string".
    */
  private def unigramViterbiScore(w: String, m: Map[String, Double],
      maxLen: Int): Double = {
    val n = w.length
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxLen)
      while (j < i) {
        m.get(w.substring(j, i)).foreach { lp =>
          val cand = best(j) + lp
          if (cand > best(i)) best(i) = cand
        }
        j += 1
      }
      i += 1
    }
    best(n)
  }

  /** Soft-EM E-step for one word: EXPECTED piece counts under the
    * current model via forward–backward over the segmentation lattice
    * (Kudo 2018 §3.2's EM, per word). Log-space α/β with a fixed
    * fold order, so the doubles are deterministic; expected count of
    * arc (j→i) = exp(α_j + logP + β_i − Z). Returns (piece, e) sorted
    * by piece, each e HALF_UP-quantized to 9 dp so the downstream
    * DECIMAL fold is exact and order-free.
    */
  private[graft] def unigramExpectedCounts(w: String,
      m: Map[String, Double], maxLen: Int): Seq[(String, Double)] = {
    val n = w.length
    def lse(a: Double, b: Double): Double =
      if (a == Double.NegativeInfinity) b
      else if (b == Double.NegativeInfinity) a
      else { val hi = math.max(a, b); hi + math.log1p(math.exp(math.min(a, b) - hi)) }
    val alpha = Array.fill(n + 1)(Double.NegativeInfinity)
    alpha(0) = 0.0
    var i = 1
    while (i <= n) {
      var acc = Double.NegativeInfinity
      var j = math.max(0, i - maxLen)
      while (j < i) {
        m.get(w.substring(j, i)).foreach(lp => acc = lse(acc, alpha(j) + lp))
        j += 1
      }
      alpha(i) = acc
      i += 1
    }
    val z = alpha(n)
    if (z == Double.NegativeInfinity) Seq.empty
    else {
      val beta = Array.fill(n + 1)(Double.NegativeInfinity)
      beta(n) = 0.0
      var j0 = n - 1
      while (j0 >= 0) {
        var acc = Double.NegativeInfinity
        var i0 = j0 + 1
        val lim = math.min(n, j0 + maxLen)
        while (i0 <= lim) {
          m.get(w.substring(j0, i0)).foreach(lp => acc = lse(acc, lp + beta(i0)))
          i0 += 1
        }
        beta(j0) = acc
        j0 -= 1
      }
      val buf = scala.collection.mutable.HashMap.empty[String, Double]
      var j = 0
      while (j < n) {
        var i2 = j + 1
        val lim = math.min(n, j + maxLen)
        while (i2 <= lim) {
          val piece = w.substring(j, i2)
          m.get(piece).foreach { lp =>
            val e = math.exp(alpha(j) + lp + beta(i2) - z)
            if (e > 0.0) buf.update(piece, buf.getOrElse(piece, 0.0) + e)
          }
          i2 += 1
        }
        j += 1
      }
      buf.toSeq.sortBy(_._1).map { case (p, e) =>
        (p, BigDecimal(e).setScale(9, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
      }.filter(_._2 > 0.0)
    }
  }

  /** X28: unigram-LM (SentencePiece) tokenizer TRAINING (Kudo 2018,
    * "Subword Regularization"; Kudo & Richardson 2018) — the other
    * half of the public tokenizer landscape next to X25's BPE: seed a
    * large candidate vocabulary, alternate soft-EM re-estimation with
    * likelihood-loss pruning until `vocabSize` pieces remain, and ship
    * (piece, logP) — segmentation is then Viterbi under the model.
    *
    * The X25 distribution insight transfers DIRECTLY: ONE corpus pass
    * collapses text to the DISTINCT-WORD frequency table, and every
    * E-step is a vocabulary-sized scan — the per-word forward–backward
    * (a ≤|w|·maxPieceLen lattice) runs as a scalar function once per
    * DISTINCT word (the documented read-face posture), contributions
    * enter as (9-dp-quantized e) × (exact word count) DECIMAL products
    * so the piece-count fold is exact and order-free, and the M-step
    * (normalize → log) runs on the driver over the piece table (the
    * k-means centroids-to-driver pattern; probabilities quantize to
    * 18-dp DECIMAL ratios so the model is INVARIANT under exact
    * corpus replication — c/Σc = fc/fΣc on the decimal grid, the
    * UnigramScale 30× identity). Corpus size only ever affects the
    * first pass.
    *
    * Pruning (Kudo §3.2 step 3): for each multi-char piece, loss =
    * c(p) · (logP(p) − altViterbi(p)) — the likelihood drop if p's
    * occurrences re-segment with the REST of the vocabulary; keep the
    * top pieces by (loss desc, piece asc) down to
    * max(vocabSize, ⌊|V|·shrink⌋). Single characters are NEVER pruned
    * (coverage guarantee; a char zeroed by quantization is re-floored
    * at one 1e-9 quantum), so the reachable vocabulary floor is the
    * corpus character set. Deterministic end to end: every ranking
    * tie breaks on the piece string.
    *
    * Not SQL-expressible (iterative EM) ⇒ spec-verified against a
    * scalar reference (CurationSpec); the registered query is
    * rows-checked. Output: (piece, log_prob, exp_count, is_char) —
    * the shipped model artifact.
    */
  def unigramLmTrain(df: DataFrame, text: Column, vocabSize: Int,
      maxPieceLen: Int = 4, seedSize: Int = 400, emIters: Int = 2,
      shrink: Double = 0.75): DataFrame = {
    require(vocabSize >= 1 && vocabSize <= 100000,
      s"vocabSize out of range: $vocabSize")
    require(maxPieceLen >= 2 && maxPieceLen <= 16,
      s"maxPieceLen out of range: $maxPieceLen")
    require(shrink > 0.0 && shrink < 1.0, s"shrink out of (0,1): $shrink")
    val spark = df.sparkSession
    import spark.implicits._
    val words = df
      .select(explode(split(text, " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    // candidate seed: every ≤ maxPieceLen substring of the distinct
    // words, weighted by word frequency per occurrence position
    val subs = words
      .select(col("cnt"), explode(flatten(
        transform(sequence(lit(1), length(col("w"))), i =>
          transform(
            sequence(lit(1),
              least(lit(maxPieceLen), length(col("w")) - i + 1)),
            l => col("w").substr(i, l))))).as("piece"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("weight"))
      .localCheckpoint()
    val charSeed = subs.where(length(col("piece")) === 1)
    val multiSeed = subs.where(length(col("piece")) > 1)
      .orderBy(col("weight").desc, col("piece"))
      .limit(seedSize)
    def toCounts(d: DataFrame): Seq[(String, BigDecimal)] =
      d.select(col("piece"), col("weight").cast("decimal(38,9)"))
        .as[(String, java.math.BigDecimal)].collect().toSeq
        .map { case (p, c) => (p, BigDecimal(c)) }
    val charPieces = toCounts(charSeed).map(_._1).toSet
    // the char coverage floor is RELATIVE (quantum × corpus word
    // count) so it scales exactly with corpus replication — an
    // absolute floor would break the UnigramScale model-identity
    // invariant ((fc)/(fΣc) needs EVERY count term factor-exact)
    val quantumFloor = BigDecimal("0.000000001") *
      BigDecimal(words.agg(sum(col("cnt"))).head.getLong(0))

    // M-step: counts → log-probs through an 18-dp DECIMAL ratio (the
    // replication-invariance grid); quantized-to-zero pieces drop,
    // chars re-floor at the relative quantum
    def mStep(counts: Seq[(String, BigDecimal)]): Map[String, Double] = {
      val floored = counts.map { case (p, c) =>
        (p, if (c <= 0 && charPieces(p)) quantumFloor else c)
      }.filter(_._2 > 0)
      val total = floored.map(_._2).sum
      floored.flatMap { case (p, c) =>
        val prob = (c / total).setScale(18, BigDecimal.RoundingMode.HALF_UP)
        if (prob > 0) Some(p -> math.log(prob.toDouble)) else None
      }.toMap
    }

    // E-step: one vocabulary-sized distributed pass; exact fold
    def eStep(model: Map[String, Double]): Seq[(String, BigDecimal)] = {
      val bc = spark.sparkContext.broadcast(model)
      val ml = maxPieceLen
      val expU = udf((w: String) => unigramExpectedCounts(w, bc.value, ml))
      // operand widths keep the product INSIDE precision 38 at scale
      // 9 — decimal(20,9) × bigint would hit (41,9) and Spark then
      // SILENTLY reduces the scale to 6, quantizing the fold.
      // decimal(14,9) bounds per-word expected counts at 1e5 (words
      // shorter than 100k chars); decimal(17,0) bounds a word's
      // corpus count at 1e17
      val agg = words
        .select(col("cnt"), explode(expU(col("w"))).as("pe"))
        .select(col("pe._1").as("piece"),
          (col("pe._2").cast("decimal(14,9)") *
            col("cnt").cast("decimal(17,0)")).as("c"))
        .groupBy(col("piece"))
        .agg(sum(col("c")).cast("decimal(38,9)").as("c"))
        .as[(String, java.math.BigDecimal)].collect().toSeq
        .map { case (p, c) => (p, BigDecimal(c)) }
      // a char fully shadowed by longer pieces can quantize to zero
      // mass — re-enter it at the relative quantum so coverage never
      // breaks (and the floor scales with the corpus)
      val present = agg.map(_._1).toSet
      agg ++ charPieces.diff(present).toSeq.sorted
        .map(p => (p, quantumFloor))
    }

    def prune(counts: Seq[(String, BigDecimal)],
        model: Map[String, Double], target: Int)
        : Seq[(String, BigDecimal)] = {
      val (chars, multis) = counts.partition(p => charPieces(p._1))
      val keepMulti = math.max(0, target - chars.size)
      val ranked = multis.map { case (p, c) =>
        val alt = unigramViterbiScore(p, model - p, maxPieceLen)
        val loss =
          if (alt == Double.NegativeInfinity) Double.MaxValue
          else c.toDouble * (model.getOrElse(p, alt) - alt)
        (p, c, loss)
      }.sortBy(t => (-t._3, t._1))
      chars ++ ranked.take(keepMulti).map(t => (t._1, t._2))
    }

    var counts = toCounts(charSeed) ++ toCounts(multiSeed)
    var model = mStep(counts)
    var rounds = 0
    while (model.size > vocabSize &&
      model.keysIterator.exists(p => !charPieces(p)) && rounds < 64) {
      for (_ <- 1 to emIters) { counts = eStep(model); model = mStep(counts) }
      val target = math.max(vocabSize,
        math.floor(model.size * shrink).toInt)
      counts = prune(counts, model, target)
      model = mStep(counts)
      rounds += 1
    }
    for (_ <- 1 to emIters) { counts = eStep(model); model = mStep(counts) }
    val fm = model
    counts.filter(c => fm.contains(c._1)).sortBy(_._1).map { case (p, c) =>
      (p, fm(p), c.toDouble, charPieces(p))
    }.toDF("piece", "log_prob", "exp_count", "is_char")
  }

  /** X28b: Viterbi SEGMENT face of [[unigramLmTrain]] — tokenize each
    * document into max-likelihood pieces under the model. The fold is
    * sequential per word, so it runs once per DISTINCT word and
    * assembles map-side (the X25b posture, same shuffle shape).
    * Returns (id, n_words, n_tokens, tokens) in document order.
    */
  def unigramLmSegment(df: DataFrame, id: String, text: Column,
      model: Seq[(String, Double)]): DataFrame = {
    val m = model.toMap
    val maxLen = if (m.isEmpty) 1 else m.keysIterator.map(_.length).max
    val unk = (if (m.isEmpty) 0.0 else m.valuesIterator.min) - 10.0
    val seg = udf((w: String) => unigramViterbi(w, m, maxLen, unk))
    val words = df.select(col(id),
      filter(split(text, " "), w => length(w) > 0).as("__words"))
    val vocab = words
      .select(explode(col("__words")).as("w")).distinct()
      .withColumn("__toks", seg(col("w")))
    val docMaps = words
      .select(col(id), explode(array_distinct(col("__words"))).as("w"))
      .join(vocab, "w")
      .groupBy(col(id))
      .agg(map_from_entries(
        collect_list(struct(col("w"), col("__toks")))).as("__m"))
    words.join(docMaps, id)
      .select(col(id),
        size(col("__words")).cast("long").as("n_words"),
        flatten(transform(col("__words"),
          w => element_at(col("__m"), w))).as("tokens"))
      .select(col(id), col("n_words"),
        size(col("tokens")).cast("long").as("n_tokens"), col("tokens"))
  }

  /** X28c: token-COUNT stats face of [[unigramLmSegment]] — the X25c
    * argument verbatim: the multiplying shuffle carries one INT per
    * distinct word, never token arrays; identical n_words/n_tokens to
    * the segment face (spec-pinned).
    */
  def unigramLmTokenCounts(df: DataFrame, id: String, text: Column,
      model: Seq[(String, Double)]): DataFrame = {
    val m = model.toMap
    val maxLen = if (m.isEmpty) 1 else m.keysIterator.map(_.length).max
    val unk = (if (m.isEmpty) 0.0 else m.valuesIterator.min) - 10.0
    val segN = udf((w: String) => unigramViterbi(w, m, maxLen, unk).size)
    val occ = df.select(col(id),
      explode(filter(split(text, " "), w => length(w) > 0)).as("w"))
    val vocab = occ.select(col("w")).distinct()
      .withColumn("__n", segN(col("w")).cast("long"))
    occ.join(vocab, "w")
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_words"),
        sum(col("__n")).as("n_tokens"))
  }

  def bpeTokenCounts(df: DataFrame, id: String, text: Column,
      merges: Seq[(String, String)]): DataFrame = {
    val seg = udf { (w: String) =>
      var sym = (w.map(_.toString) :+ "</w>").toVector
      for ((a, b) <- merges) {
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < sym.length) {
          if (i + 1 < sym.length && sym(i) == a && sym(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += sym(i); i += 1 }
        }
        sym = out.result()
      }
      sym
    }
    val occ = df.select(col(id),
      explode(filter(split(text, " "), w => length(w) > 0)).as("w"))
    val vocab = occ.select(col("w")).distinct()
      .withColumn("__n", size(seg(col("w"))).cast("long"))
    occ.join(vocab, "w")
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_words"),
        sum(col("__n")).as("n_tokens"))
  }

  /** X29 — learned quality classifier (the CCNet/fastText-style
    * curation step: a LINEAR model over cheap text statistics decides
    * keep/drop, trained on labeled examples instead of hand-tuned
    * thresholds). Full-batch logistic-regression gradient descent,
    * made ENGINE-DETERMINISTIC the unigram-LM way: the per-row
    * gradient residual σ(wᵀx) − y is quantized to the 9-dp grid
    * before summation, features ride the round-4 grid the X4 quality
    * metrics already emit, so every gradient component is an EXACT
    * DECIMAL sum (order-free — repartition-stable by construction)
    * and the weight trajectory is a pure function of the data.
    *
    * That determinism buys something no iterative trainer in the
    * registry has had: with a FIXED iteration count the whole
    * training run is a finite dataflow (no data-dependent argmax
    * branching like BPE's merge choice), so the DuckDB oracle can
    * replay it as `iters` UNROLLED aggregate stages and the driver
    * gate value-checks the learned weights themselves
    * (`q_classifier_train`).
    *
    * Scale shape: one aggregate pass per iteration producing p+1
    * DECIMAL sums (map-side combined), one driver-side O(p) weight
    * update — the k-means/PCA centroids-to-driver pattern. Raw rows
    * are scanned `iters` times and never shuffled.
    *
    * @return bias +: weights after `iters` full-batch steps
    */
  def logisticTrain(df: DataFrame, features: Seq[Column], label: Column,
      iters: Int, lr: Double): Seq[Double] =
    logisticTrainWithCount(df, features, label, iters, lr)._2

  /** [[logisticTrain]] that ALSO returns the training row count — the
    * gradient aggregate already computes n every iteration, so a
    * caller that reports n (the q_classifier_train* faces) gets it
    * for free instead of paying a separate corpus count pass (r21;
    * guide §1.2 "don't compute things you throw away" inverted:
    * don't recompute things you already have).
    */
  def logisticTrainWithCount(df: DataFrame, features: Seq[Column],
      label: Column, iters: Int, lr: Double): (Long, Seq[Double]) = {
    val p = features.size
    // features live on the exact DECIMAL(18,4) grid; the residual on
    // the (10,9) grid (|σ−y| < 1), so the gradient product is
    // DECIMAL(29,13) — inside precision 38, never silently demoted
    // (the X28 wider-operand trap)
    // Materialize the projected feature table ONCE: features are a
    // handful of DECIMALs per row, while extracting them (e.g. the X4
    // stopword scan) can dominate — without this every GD iteration
    // would re-run the extraction over the raw corpus. persist (not
    // localCheckpoint) so the blocks release at the end of the loop.
    // narrow scans widened before the feature-extraction projection
    // (r21, ScanWidth): the X4 metric expressions (regex counts,
    // splits) otherwise evaluate in ONE task on a one-file fixture
    // corpus, and the persisted feature table then holds a single
    // partition, serializing every GD iteration too
    val rows = ScanWidth.ensure(df).select(
      (features.zipWithIndex.map { case (c, i) =>
        c.cast("decimal(18,4)").as(s"x$i") } :+
        label.cast("double").as("y")): _*)
      .where(col("y").isNotNull &&
        (0 until p).map(i => col(s"x$i").isNotNull).reduce(_ && _))
      .persist()
    var w = Array.fill(p + 1)(0.0) // bias first
    var nRows = 0L
    for (_ <- 0 until iters) {
      val z = (0 until p).foldLeft(lit(w(0)): Column) { (acc, i) =>
        acc + lit(w(i + 1)) * col(s"x$i").cast("double") }
      val resid = round(lit(1.0) / (lit(1.0) + exp(-z)) - col("y"), 9)
        .cast("decimal(10,9)")
      val sums = rows.agg(
        count(lit(1)).as("n"),
        (sum(resid).as("g0") +:
          (0 until p).map(i =>
            sum(resid * col(s"x$i")).as(s"g${i + 1}"))): _*)
        .collect().head
      nRows = sums.getLong(0)
      val n = nRows.toDouble
      w = w.zipWithIndex.map { case (wi, i) =>
        wi - lr * (sums.getDecimal(i + 1).doubleValue() / n) }
    }
    rows.unpersist(blocking = false)
    (nRows, w.toSeq)
  }

  /** X30 — collocation mining: adjacent-bigram PMI/NPMI over the
    * corpus (Church & Hanks 1990 pointwise mutual information;
    * Bouma 2009 normalized PMI — the statistic behind word2vec-style
    * phrase detection, Mikolov et al. 2013). A curation pipeline uses
    * it to learn multi-word units ("new york") before tokenization
    * and to audit boilerplate (top collocations of a crawl snapshot
    * expose template text).
    *
    * PMI = ln( (n_ab/M) / ((n_a/N)(n_b/N)) ), NPMI = PMI / −ln(n_ab/M)
    * with N = token total, M = bigram total — exact integer counts
    * into one fixed double log tree (round-6), so the face is fully
    * DuckDB-oracle-able (`q_collocations`).
    *
    * Scale shape: one explode → two map-side-combined hash aggregates
    * (pair counts, unigram counts); `minCount` prunes the pair table
    * BEFORE it joins the vocabulary-sized unigram counts twice; N and
    * M ride 1-row broadcasts. Raw text is touched exactly once.
    */
  def collocations(df: DataFrame, text: Column, minCount: Int): DataFrame =
    collocationsFromCounts(collocationCounts(df, text), minCount)

  /** The X30 count state as a standalone, SUMMABLE table: one row per
    * (kind, a, b) where kind 'u' carries unigram counts (b = "") and
    * kind 'b' adjacent-bigram counts. Integer counts add, so two
    * state tables merge by summation into the state of the
    * concatenated corpus - what makes the phrase table streamable
    * ([[graft.streaming.StreamingCollocations]]). Totals N and M are
    * derived sums, never separate state.
    */
  def collocationCounts(df: DataFrame, text: Column): DataFrame = {
    val t = df.select(
      filter(split(text, " "), w => length(w) > 0).as("toks"))
    val uni = t.select(explode(col("toks")).as("a"))
      .groupBy("a").agg(count(lit(1)).as("n"))
      .select(lit("u").as("kind"), col("a"), lit("").as("b"), col("n"))
    val big = t.where(size(col("toks")) >= 2)
      .select(explode(expr(
        """transform(sequence(1, size(toks) - 1),
             i -> struct(element_at(toks, CAST(i AS INT)) AS a,
                         element_at(toks, CAST(i + 1 AS INT)) AS b))"""))
        .as("p"))
      .groupBy(col("p.a"), col("p.b")).agg(count(lit(1)).as("n"))
      .select(lit("b").as("kind"), col("a"), col("b"), col("n"))
    uni.unionByName(big)
  }

  /** Merge [[collocationCounts]] state tables - integer addition per
    * (kind, a, b); exact, order-free.
    */
  def mergeCollocationCounts(states: DataFrame): DataFrame =
    states.groupBy("kind", "a", "b").agg(sum(col("n")).as("n"))

  /** The PMI/NPMI read over a [[collocationCounts]] state - shared
    * verbatim by the batch operator and the streaming store, so batch
    * parity there is structural.
    */
  def collocationsFromCounts(counts: DataFrame, minCount: Int): DataFrame = {
    val uc = counts.where(col("kind") === "u")
      .select(col("a").as("tok"), col("n"))
    val nTotal = uc.agg(sum(col("n")).as("nn"))
    val bcAll = counts.where(col("kind") === "b")
      .select(col("a"), col("b"), col("n").as("n_ab"))
    val mTotal = bcAll.agg(sum(col("n_ab")).as("mm"))
    val bc = bcAll.where(col("n_ab") >= lit(minCount.toLong))
    val d = (c: Column) => c.cast("double")
    val joined = bc
      .join(uc.select(col("tok").as("a"), col("n").as("n_a")), "a")
      .join(uc.select(col("tok").as("b"), col("n").as("n_b")), "b")
      .crossJoin(broadcast(nTotal))
      .crossJoin(broadcast(mTotal))
    val pab = d(col("n_ab")) / d(col("mm"))
    val pmiRaw = log(pab /
      ((d(col("n_a")) / d(col("nn"))) * (d(col("n_b")) / d(col("nn")))))
    joined.select(
      col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
      round(pmiRaw, 6).as("pmi"),
      when(col("n_ab") < col("mm"),
        round(pmiRaw / -log(pab), 6)).as("npmi"))
  }

  /** X29 scoring face: logit + probability + decision from a fixed
    * weight vector over the same round-4 feature grid — the
    * production read (score a corpus with a shipped model). Pure
    * codegen column tree, value-oracle-able (`q_classifier_score`).
    */
  def logisticScore(df: DataFrame, features: Seq[Column],
      bias: Double, weights: Seq[Double], threshold: Double = 0.5): DataFrame = {
    require(weights.size == features.size, "one weight per feature")
    val quant = features.map(_.cast("decimal(18,4)").cast("double"))
    val z = quant.zip(weights).foldLeft(lit(bias): Column) {
      case (acc, (x, wi)) => acc + lit(wi) * x }
    val prob = lit(1.0) / (lit(1.0) + exp(-z))
    df.withColumn("logit", round(z, 6))
      .withColumn("prob", round(prob, 6))
      .withColumn("keep", prob >= lit(threshold))
  }
}
