package graft.operators

import graft.functions.TextFns
import java.util.concurrent.atomic.AtomicBoolean
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Deduplication suite for a training-data pipeline (task north star;
  * SURVEY.md §2.10 X1/X2). Every operator is expressed as DataFrame
  * transformations so Catalyst plans partial aggregation, pushdown and
  * AQE for free; nothing collects to the driver.
  *
  * Hash-function choice: the text dedup family uses md5 (a pure string
  * op available in every engine) rather than Spark's murmur3 `hash`,
  * so results are engine-reproducible and oracle-checkable. md5 on a
  * short shingle is ~100ns — not the bottleneck next to the shuffle.
  * Lexicographic MIN over md5 hex strings is a valid uniform MinHash
  * permutation (md5 is uniform on its 128-bit space; hex encoding is
  * order-preserving).
  */
object Dedup {

  /** See [[CacheLifecycle.releaseAfterAction]] — extracted to a
    * shared object once TimeSeries needed the same lifecycle; kept
    * here as a forwarder for the three dedup call sites' locality.
    */
  private def releaseAfterAction(result: DataFrame, cached: DataFrame*): DataFrame =
    CacheLifecycle.releaseAfterAction(result, cached: _*)

  /** X1 exact dedup, deterministic winner: keep the row with the
    * minimum `keep` value per key group. (`dropDuplicates` keeps an
    * ARBITRARY row — fine for pure dedup, wrong for reproducible
    * pipelines, so the library makes the winner explicit.)
    * One shuffle on `keys`; map-side partial row_number is not
    * possible, but the window carries only the key + keep columns.
    */
  def exact(df: DataFrame, keys: Seq[String], keep: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(keep.asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Distinct (id, unit) pairs where unit = distinct token (k=1) or
    * word k-gram shingle (k>1) of `text`.
    */
  def explodedShingles(df: DataFrame, id: String, text: Column, k: Int): DataFrame = {
    val units =
      if (k == 1) array_distinct(split(text, " "))
      else array_distinct(TextFns.shingles(split(text, " "), k))
    df.select(col(id), explode(units).as("shingle"))
  }

  /** X2 n-gram Jaccard near-dup via inverted-index join — the scale
    * path: never forms the |D|² cross product. Pairs are generated
    * only for docs SHARING a shingle (explode → self-equi-join on the
    * shingle → count per pair), so cost is Σ_shingle freq², bounded by
    * dropping shingles more frequent than `maxFreq` (stopword-like
    * shingles contribute candidates but no discrimination — standard
    * ANN-join trick; documented cap, applied identically in oracles).
    *
    * Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= minJ.
    */
  def ngramJaccard(
      df: DataFrame, id: String, text: Column,
      k: Int, minJ: Double, maxFreq: Long = 1000L): DataFrame = {
    val sh = explodedShingles(df, id, text, k).cache()
    val sizes = sh.groupBy(col(id)).agg(count("*").as("n_sh"))
    val rare = sh.join(
      sh.groupBy("shingle").agg(count("*").as("freq"))
        .filter(col("freq") <= maxFreq && col("freq") >= 2),
      "shingle")
    // Candidate generation note: AllPairs/PPJoin prefix filtering was
    // tried and measured 4× SLOWER here — this synthetic corpus has a
    // near-uniform ~1k-shingle vocabulary, so "rarest-first" prefixes
    // still collide across most docs while adding a window + distinct.
    // The plain inverted-index join (Σfreq² candidate work) is optimal
    // for uniform small vocabularies; Zipfian corpora at scale should
    // dial `maxFreq` down instead (the documented approximation knob —
    // dropped high-freq shingles cost intersection counts only).
    val a = rare.select(col(id).as("id_a"), col("shingle"))
    val b = rare.select(col(id).as("id_b"), col("shingle"))
    val inter = a.join(b, Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count("*").as("inter"))
    releaseAfterAction(inter
      .join(sizes.select(col(id).as("id_a"), col("n_sh").as("n_a")), "id_a")
      .join(sizes.select(col(id).as("id_b"), col("n_sh").as("n_b")), "id_b")
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter")).cast("double"))
      .filter(col("jaccard") >= minJ)
      .select(col("id_a"), col("id_b"), col("jaccard")),
      sh)
  }

  /** MinHash signatures: `bands * rows` permutations via
    * Kirsch-Mitzenmacher double hashing ("Less Hashing, Same
    * Performance", ESA'06): h_i(s) = (a(s) + i·b(s)) mod 2^32 where
    * a, b are the two 32-bit halves of md5's first 64 bits — TWO md5
    * calls per shingle instead of one per permutation (12× fewer at
    * the default banding). minhash_i = numeric MIN over the doc's
    * shingles. Output: one row per (id, band) with the band signature
    * string — group/join on (band, signature) buckets near-dup
    * candidates (banding theory: P[candidate] = 1-(1-j^r)^b).
    */
  def minhashBands(
      df: DataFrame, id: String, text: Column,
      k: Int, bands: Int, rowsPerBand: Int): DataFrame =
    minhashBandsFromShingles(explodedShingles(df, id, text, k), id, bands, rowsPerBand)

  /** [[minhashBands]] over an already-exploded (id, shingle) table —
    * lets [[minhashNearDup]] share ONE cached shingle explode between
    * the signature path and the verification inverted index instead of
    * re-shingling the corpus per path.
    */
  def minhashBandsFromShingles(
      shingles: DataFrame, id: String, bands: Int, rowsPerBand: Int): DataFrame = {
    val sh = shingles
      .withColumn("__h", md5(col("shingle")))
      .withColumn("__a", conv(substring(col("__h"), 1, 8), 16, 10).cast("long"))
      .withColumn("__b", conv(substring(col("__h"), 9, 8), 16, 10).cast("long"))
    val mins = (0 until bands * rowsPerBand).map(h =>
      min(pmod(col("__a") + lit(h.toLong) * col("__b"), lit(4294967296L))).as(s"h$h"))
    val sig = sh.groupBy(col(id)).agg(mins.head, mins.tail: _*)
    // posexplode of a per-row band array — NOT a bands-way union of
    // sig slices, which would re-run the signature aggregation once
    // per band (b× the shuffle)
    val bandSigs = array((0 until bands).map { b =>
      val cols = (0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}"))
      concat_ws(",", cols: _*)
    }: _*)
    sig.select(col(id), posexplode(bandSigs).as(Seq("band", "sig")))
      .withColumn("band", col("band").cast("long"))
  }

  /** X2 full MinHash-LSH pipeline: band-bucket candidates, then exact
    * Jaccard verification on the candidates only. Scale: the only
    * all-pairs work happens inside a NARROW bucket (docs agreeing on
    * r independent minhashes), and verification joins the inverted
    * index restricted to candidate pairs.
    */
  def minhashNearDup(
      df: DataFrame, id: String, text: Column,
      k: Int, bands: Int, rowsPerBand: Int, minJ: Double): DataFrame = {
    // cache the exploded shingles ONCE — both the signature path and
    // the verification inverted index read it, so the corpus is
    // shingled a single time. (The signature table itself is consumed
    // once since r21's bucket-collect candidate pass and needs no
    // cache; at production scale it is still the natural dataset to
    // persist between runs.)
    // r21: ScanWidth.ensure widens a narrow scan BEFORE the explode —
    // a one-file fixture corpus otherwise shingles, hashes
    // (2 md5/shingle) and partial-aggregates 16 minhash columns in
    // ONE task (JobProfile: a 0.45 s single-task stage at sf0.1),
    // and the `sh` CACHE itself is then stored as one partition, so
    // every later consumer inherits the serial width. The widening is
    // conditional on the scan's actual parallelism, so a many-file
    // production corpus pays NO extra exchange (ScanWidth scaladoc).
    val sh = explodedShingles(ScanWidth.ensure(df), id, text, k).cache()
    val bandsDf = minhashBandsFromShingles(sh, id, bands, rowsPerBand)
    // Candidate generation as ONE bucket-collect pass (r21): the old
    // (band, sig) SELF-join read the signature table from two plan
    // branches — on first materialization the two branches computed
    // the whole signature aggregation TWICE inside one stage (racing
    // cache inserts, visible as "Block already exists" warnings) and
    // needed bandsDf cached at all. groupBy (band, sig) +
    // collect_list + a pairwise-combinations explode reads the
    // signatures ONCE, shuffles them once, and emits exactly the same
    // id_a < id_b pair set (ids sorted inside each bucket; buckets
    // are narrow by banding design, so per-bucket state is bounded —
    // the same argument that bounds the join's output).
    // The dedup exchange stays an EXPLICIT pair-keyed repartition
    // (repartition + dropDuplicates plans ONE exchange, exactly like
    // .distinct(), but a user repartition is exempt from AQE
    // coalescing): the pair table is tiny in BYTES but each pair pays
    // an array_intersect over two gram-set arrays downstream, so
    // AQE's size-based coalescing folded the whole verify stage into
    // ONE task (measured: a 0.9–2.1 s single-task stage at sf0.1,
    // ~60% of q_ngram_jaccard's wall). Partition count follows
    // defaultParallelism — cluster-sized, not a local constant.
    val ids = col("__ids")
    val cand = bandsDf
      .groupBy(col("band"), col("sig"))
      .agg(array_sort(collect_list(col(id))).as("__ids"))
      .where(size(ids) >= 2)
      .select(explode(flatten(transform(ids, (x, i) =>
        transform(slice(ids, i + lit(2), size(ids) - i - 1), y =>
          struct(x.as("id_a"), y.as("id_b")))))).as("__p"))
      .select(col("__p.id_a"), col("__p.id_b"))
      .repartition(df.sparkSession.sparkContext.defaultParallelism,
        col("id_a"), col("id_b"))
      .dropDuplicates()
      .cache()
    // Verify-stage scale design. Banding over-generates by design
    // (measured: 10.2M candidates verify down to 25.6k pairs at the
    // 100× tier), so the verify stage — not candidate generation —
    // owns the wall at scale, and it must NEVER multiply candidates
    // by per-doc shingle counts. Two LOSSLESS moves (the emitted
    // pair set is bit-identical to the naive verify):
    //  1. per-doc HASHED gram-set arrays: each candidate pair joins
    //     two fixed-width xxhash64 arrays (one doc's set ≈ tens of
    //     longs); the length-ratio bound (|A∩B|/|A∪B| <=
    //     min(n_a,n_b)/max(n_a,n_b) — Catalyst evaluates the Filter
    //     on the array sizes before the intersect projection) kills
    //     hopeless pairs, then codegen'd array_intersect computes
    //     the exact intersection inline. The shuffle moves |pairs| +
    //     |cand docs| rows, not the |pairs| × |shingles| row
    //     explosion of an inverted-index verify join (measured 104s
    //     → ~10s at the 100× tier). A false intersection needs a
    //     64-bit collision INSIDE one pair's gram sets (~n²/2^65 —
    //     negligible next to the md5 stance above). A skinny-row
    //     prefilter via a separate sizes join was measured SLOWER at
    //     every tier: two extra |pairs|-sized joins cost more than
    //     hauling arrays for the ~20% of pairs the ratio bound drops.
    //  2. only docs that appear in a candidate pair enter the
    //     gram-set aggregation — the id set is bounded by 2·|pairs|,
    //     so it broadcasts and the restriction is a map-side
    //     semi-join over the cached explode, never a shuffle of the
    //     corpus.
    // ONE pass over cand, not a 2-branch union (r21): the union's two
    // branches each computed the not-yet-cached candidate table — the
    // band self-join ran TWICE inside one stage (the racing cache
    // inserts were visible as "Block already exists" warnings);
    // explode(array(a, b)) reads cand once for the same distinct set
    val candIds = cand
      .select(explode(array(col("id_a"), col("id_b"))).as(id))
      .distinct()
    // the doc-keyed repartition pins the gram-set aggregation (and
    // the verify join stage that streams over it when `cand` is the
    // broadcast side) at cluster width — same one exchange a plain
    // groupBy plans, exempt from AQE's byte-based coalescing (the
    // r21 finding above: the verify is CPU-bound, not byte-bound)
    val gsets = sh
      .join(broadcast(candIds), Seq(id), "left_semi")
      .select(col(id), xxhash64(col("shingle")).as("__gh"))
      .repartition(df.sparkSession.sparkContext.defaultParallelism, col(id))
      .groupBy(col(id)).agg(collect_list(col("__gh")).as("__gs"))
    releaseAfterAction(cand
      .join(gsets.select(col(id).as("id_a"), col("__gs").as("__ga")), "id_a")
      .join(gsets.select(col(id).as("id_b"), col("__gs").as("__gb")), "id_b")
      .withColumn("n_a", size(col("__ga")).cast("long"))
      .withColumn("n_b", size(col("__gb")).cast("long"))
      .filter(least(col("n_a"), col("n_b")).cast("double") >=
        lit(minJ) * greatest(col("n_a"), col("n_b")).cast("double"))
      .withColumn("inter",
        size(array_intersect(col("__ga"), col("__gb"))).cast("long"))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter")).cast("double"))
      .filter(col("jaccard") >= minJ)
      .select(col("id_a"), col("id_b"), col("jaccard")),
      cand, sh)
  }

  /** SimHash signature: 64-bit sign-of-weighted-sum over the doc's
    * distinct k-gram shingles; bit j comes from bit j of md5(shingle).
    * Emitted as a 64-char '0'/'1' string (engine-portable; callers
    * band-slice it with substring for Hamming LSH). Tie (vote sum ==
    * 0) → '0'. k >= 2 recommended: word ORDER must contribute to the
    * signature, or any bag-of-words-similar corpus collapses to
    * near-identical signatures (measured on the test corpus: token
    * sets give 49k pairs at Hamming<=12 from 500 docs; bigrams give
    * only the true near-dups).
    */
  def simhash(df: DataFrame, id: String, text: Column, k: Int = 2): DataFrame = {
    // Bit j of the signature is defined as bit (3 - j%4) of hex digit
    // j/4 of md5(shingle) — i.e. big-endian bit j of md5's first 64
    // bits. Extract those as two 32-bit longs (conv of 8 hex chars;
    // 64 would overflow signed long) and compute the per-bit vote
    // sums as 64 plain `sum(shiftright & 1)` aggregate columns:
    // everything stays inside codegen'd partial aggregation — no row
    // explosion, no higher-order lambdas, no collect_list (the
    // exploded/HOF formulations measured 13s/18s vs ~2s at sf0.1).
    // Signature bit = 1 iff 2*sum_j > n (vote sum 2*sum - n > 0;
    // tie → '0').
    // narrow scans widened before the explode (r21, ScanWidth): the
    // 64 per-bit vote sums + md5 per shingle otherwise run in as
    // few map tasks as the corpus has files — serial on a one-file
    // fixture (the minhashNearDup finding); no-op on many-file inputs
    val toks = explodedShingles(ScanWidth.ensure(df), id, text, k)
      .withColumn("h", md5(col("shingle")))
      .withColumn("v1", conv(substring(col("h"), 1, 8), 16, 10).cast("long"))
      .withColumn("v2", conv(substring(col("h"), 9, 8), 16, 10).cast("long"))
    val sums = (0 until 64).map { j =>
      val (v, off) = if (j < 32) (col("v1"), 31 - j) else (col("v2"), 63 - j)
      sum(shiftright(v, off).bitwiseAND(lit(1L))).as(s"s$j")
    }
    toks.groupBy(col(id))
      .agg(count(lit(1)).as("n"), sums: _*)
      .select(col(id),
        concat((0 until 64).map(j =>
          when(col(s"s$j") * 2 > col("n"), lit("1")).otherwise(lit("0"))): _*).as("simhash"))
  }

  /** SimHash near-dup pairs: Hamming-band LSH (8 bands × 8 bits) for
    * candidates, then exact Hamming distance <= maxHamming verified on
    * the 64-char signatures.
    */
  def simhashNearDup(df: DataFrame, id: String, text: Column,
      maxHamming: Int, k: Int = 2): DataFrame = {
    // Signatures are consumed ONCE since the r21 bucket-collect
    // candidate pass below replaced the band self-join — no cache
    // needed (the old cache existed to stop the self-join recomputing
    // the aggregation on both sides). posexplode (not union) for the
    // bands. The 64-bit signature travels as two 32-bit longs (conv
    // of each binary-string half) so the Hamming verify is
    // bit_count(xor)+bit_count(xor) — pure codegen'd integer ops, not
    // an interpreted per-pair lambda over a 64-element split array.
    val sig = simhash(df, id, text, k)
      .withColumn("s1", conv(substring(col("simhash"), 1, 32), 2, 10).cast("long"))
      .withColumn("s2", conv(substring(col("simhash"), 33, 32), 2, 10).cast("long"))
    val bandArr = array((0 until 8).map(b =>
      substring(col("simhash"), b * 8 + 1, 8)): _*)
    val bands = sig.select(col(id), col("s1"), col("s2"),
      posexplode(bandArr).as(Seq("band", "bsig")))
    // Candidate generation as ONE bucket-collect pass + pairwise
    // explode (r21, the minhashNearDup shape): the old (band, bsig)
    // self-join read the signature table from two plan branches and
    // computed it twice on first materialization. Pairs sort by id
    // inside each bucket, so the emitted id_a < id_b set is the
    // join's, exactly. The dedup exchange stays an explicit
    // pair-keyed repartition (AQE-coalesce exempt): the pair table is
    // byte-tiny but downstream consumers pay per-pair CPU
    // (editDistanceNearDup's levenshtein DP runs on exactly these
    // rows), so size-based coalescing would serialize the verify into
    // one task.
    val ids = col("__ids")
    val cand = bands
      .groupBy(col("band"), col("bsig"))
      .agg(array_sort(collect_list(
        struct(col(id), col("s1"), col("s2")))).as("__ids"))
      .where(size(ids) >= 2)
      .select(explode(flatten(transform(ids, (x, i) =>
        transform(slice(ids, i + lit(2), size(ids) - i - 1), y =>
          struct(x(id).as("id_a"), x("s1").as("a1"), x("s2").as("a2"),
            y(id).as("id_b"), y("s1").as("b1"), y("s2").as("b2")))))).as("__p"))
      .select(col("__p.*"))
      .repartition(df.sparkSession.sparkContext.defaultParallelism,
        col("id_a"), col("id_b"))
      .dropDuplicates()
    val ham = bit_count(col("a1").bitwiseXOR(col("b1"))) +
      bit_count(col("a2").bitwiseXOR(col("b2")))
    cand.withColumn("hamming", ham.cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** X2f: edit-distance-verified near-dup pairs — the fuzzy-dedup
    * arm whose verify metric is CHARACTER edit distance rather than
    * shingle overlap: catches single-character noise (OCR errors,
    * normalization drift, typo clusters) that k-shingle Jaccard
    * dilutes across every overlapping gram. Candidates come from the
    * X2 SimHash Hamming bands (never all-pairs); each candidate pair
    * is verified with Spark's builtin `levenshtein` under a RATIO
    * threshold evaluated in exact integers:
    * edits·100 ≤ maxEditsPerHundred · max(len_a, len_b) — no double
    * division, so the accept set is bit-identical in any engine.
    *
    * Scale: the verify is O(len_a·len_b) per CANDIDATE pair (the DP
    * table), which is exactly why candidates must be banded first —
    * the band join bounds pair mass, texts join back by id
    * candidate-bounded, and production callers cap document length
    * upstream (the standard fuzzy-dedup practice; whole-document
    * distance on multi-MB docs is the wrong tool — use X2's shingle
    * tiers there).
    */
  def editDistanceNearDup(df: DataFrame, id: String, text: Column,
      maxEditsPerHundred: Int, bandHamming: Int = 12,
      k: Int = 2): DataFrame = {
    val cand = simhashNearDup(df, id, text, maxHamming = bandHamming, k)
    val ta = df.select(col(id).as("id_a"), text.as("__ta"))
    val tb = df.select(col(id).as("id_b"), text.as("__tb"))
    cand.join(ta, "id_a").join(tb, "id_b")
      .withColumn("edits",
        levenshtein(col("__ta"), col("__tb")).cast("long"))
      .where(col("edits") * 100 <=
        lit(maxEditsPerHundred) *
          greatest(length(col("__ta")), length(col("__tb"))).cast("long"))
      .select(col("id_a"), col("id_b"), col("hamming"), col("edits"))
  }

  /** X2 exact substring-span dedup (the ExactSubstr pass of Lee et
    * al., "Deduplicating Training Data Makes Language Models Better",
    * ACL 2022): a token span duplicated VERBATIM across documents is
    * removed from every document except one keeper, leaving each
    * document's unique remainder in place — the complement of
    * whole-document near-dup dedup, which either keeps or drops a doc
    * wholesale. Span unit here is the word `w`-gram: any `w`-gram
    * occurring in >= 2 DISTINCT documents marks its `w` covering
    * token positions as duplicated in every doc but the minimum
    * doc id containing it (deterministic keeper; within-doc repeats
    * alone are repetition, not duplication — X7's job).
    *
    * Returns (id, n_tokens, n_dropped, clean_text).
    *
    * Scale: the corpus never self-joins — cost is one shuffle of the
    * (gram-hash, doc, pos) table to build the frequency/keeper stats
    * (map-side partial agg), one gram-hash-keyed join back, and one
    * doc-keyed aggregation of drop positions; reconstruction is a
    * map-only array filter. Grams travel as md5 hex hashes, never
    * strings — the shuffle key is 32 bytes regardless of `w` (a false
    * positive needs an md5 collision; at 2^64 grams the expected
    * collision count is ~2^-1 — acceptable for corpus hygiene).
    */
  def stripRepeatedSpans(
      df: DataFrame, id: String, text: Column, w: Int): DataFrame = {
    val toks = df.select(col(id), split(text, " ").as("t"))
    val grams = toks.where(size(col("t")) >= w)
      .select(col(id),
        posexplode(graft.functions.TextFns.shingles(col("t"), w)).as(Seq("spos", "gram")))
      .select(col(id), col("spos"), md5(col("gram")).as("gh"))
    val stats = grams.groupBy("gh")
      .agg(count_distinct(col(id)).as("nd"), min(col(id)).as("keeper"))
      .where(col("nd") >= 2)
    val drops = grams.join(stats, "gh")
      .where(col("keeper") =!= col(id))
      .select(col(id), explode(sequence(col("spos"), col("spos") + (w - 1))).as("pos"))
      .groupBy(col(id)).agg(array_sort(collect_set(col("pos"))).as("drops"))
    toks.join(drops, Seq(id), "left")
      .withColumn("drops", coalesce(col("drops"), array().cast("array<int>")))
      .select(col(id),
        size(col("t")).cast("long").as("n_tokens"),
        size(col("drops")).cast("long").as("n_dropped"),
        concat_ws(" ",
          filter(col("t"), (_, i) => !array_contains(col("drops"), i))).as("clean_text"))
  }
}
