package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** X4 text-analysis primitives for a training-data pipeline, built
  * entirely from codegen'd `org.apache.spark.sql.functions` (no UDFs —
  * every expression stays inside WholeStageCodegen; SURVEY.md §2.10).
  *
  * Determinism contract: everything here is a pure function of the
  * input string, so results are reproducible across engines — the
  * DuckDB oracles re-express the same arithmetic.
  */
object TextFns {

  /** Whitespace tokenization (the reference corpus is space-joined
    * words — /root/repo/FIXTURES.md documents table).
    */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish subword segmentation count: runs of letters, runs of
    * digits, or single non-alnum chars — a cheap, deterministic proxy
    * for tokenizer cost estimation at corpus scale.
    */
  val bpeIshPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeIshCount(text: Column): Column =
    regexp_count(text, lit(bpeIshPattern)).cast("long")

  /** Word-level n-gram shingles over the raw token sequence; docs
    * shorter than n yield an empty array. Native codegen expression —
    * the HOF formulation (see [[shinglesHof]]) is a CodegenFallback
    * that would de-codegen every stage it appears in.
    */
  def shingles(toks: Column, n: Int): Column = WordShingles.shingles(toks, n)

  /** Higher-order-function formulation, kept as the semantic
    * cross-check for [[shingles]] (equality asserted in
    * DedupSimilaritySpec).
    */
  def shinglesHof(toks: Column, n: Int): Column = {
    val idx = sequence(lit(1), size(toks) - (n - 1))
    when(size(toks) >= n,
      transform(idx, i =>
        concat_ws(" ", (0 until n).map(o => element_at(toks, i + o)): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** Canonical content fingerprint: md5 over the sorted distinct
    * lowercase token set. Two documents with the same bag-of-words
    * (any order / multiplicity) collide — the cheap first-pass exact
    * near-dup key (X1/X2). Pure string ops → identical in any engine.
    */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(split(lower(text), " ")))))

  /** Small multilingual stopword lists for the langid heuristic.
    * Public knowledge (most frequent function words per language).
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "zu", "ein", "ist", "nicht", "mit", "von"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "se", "no"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "pas", "que", "pour", "dans"),
    "zh" -> Seq("的", "了", "是", "我", "不", "在", "人", "有", "他", "这"))

  /** Per-language stopword hit count over the distinct token set. */
  def stopwordHits(toks: Column, lang: String): Column =
    size(array_intersect(array_distinct(toks),
      array(stopwords(lang).map(lit): _*))).cast("long")

  /** Language-ID heuristic: argmax of stopword hits with a total,
    * deterministic tiebreak on language code; "und" (undetermined)
    * when nothing matches. At 100 TB this is a narrow map-only pass —
    * no shuffle, fully codegen'd.
    */
  def langId(text: Column): Column = {
    val toks = array_distinct(split(lower(text), " "))
    val scored = stopwords.keys.toSeq.sorted.map { l =>
      struct(
        size(array_intersect(toks, array(stopwords(l).map(lit): _*))).as("hits"),
        // tiebreak: later alphabet loses => store negated rank via name desc
        lit(l).as("lang"))
    }
    // array_max over struct orders by (hits, lang); equal hits → the
    // lexicographically LAST lang wins. Make the tiebreak explicit and
    // stable: order by hits desc then lang asc => invert lang ordering
    // by choosing min over (-hits, lang).
    val best = array_min(array(scored.map(s =>
      struct((-s.getField("hits")).as("neg"), s.getField("lang").as("lang"))): _*))
    when(best.getField("neg") === 0, lit("und")).otherwise(best.getField("lang"))
  }

  /** Quality metrics (ratios are exact integer divisions in double —
    * deterministic): token count, mean token length, punctuation
    * ratio, stopword ratio, plus a composite [0,1] score.
    */
  def qualityMetrics(text: Column): Seq[(String, Column)] = {
    val toks = split(text, " ")
    val nTok = size(toks).cast("long")
    val nChars = length(text).cast("long")
    val punct = (nChars - length(regexp_replace(text, "[^A-Za-z0-9 ]", ""))).cast("long")
    val allStops = array(stopwords.values.flatten.toSeq.distinct.map(lit): _*)
    val stopHits = size(filter(toks, t => array_contains(allStops, t))).cast("long")
    val meanLen = (nChars - (nTok - 1)).cast("double") / nTok.cast("double")
    val punctRatio = punct.cast("double") / nChars.cast("double")
    val stopRatio = stopHits.cast("double") / nTok.cast("double")
    val score =
      when(nTok < 5, lit(0.0)).otherwise(
        greatest(lit(0.0), least(lit(1.0),
          lit(0.5) * stopRatio + lit(0.5) * (lit(1.0) - punctRatio))))
    Seq(
      "n_tokens" -> nTok,
      "mean_token_len" -> round(meanLen, 4),
      "punct_ratio" -> round(punctRatio, 4),
      "stopword_ratio" -> round(stopRatio, 4),
      "quality_score" -> round(score, 4))
  }
}
