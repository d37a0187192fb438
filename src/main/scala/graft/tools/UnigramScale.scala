package graft.tools

import graft.Tables
import graft.operators.Curation
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** X28 at scale (r17 verdict #5): unigram-LM training's scale claim —
  * "after the one corpus pass, every EM round runs on the
  * VOCABULARY-sized distinct-word table" — measured via the BpeScale
  * contract, adapted to EM:
  *
  *  1. MODEL IDENTITY: on a corpus replicated `factor`× with text
  *     UNCHANGED (ids namespaced only), every word count scales by
  *     exactly `factor`; seed ranks, EM expected counts (9-dp
  *     quantized per occurrence, DECIMAL-multiplied by the exact
  *     count), M-step probabilities ((fc)/(fΣc) = c/Σc on the 18-dp
  *     DECIMAL ratio grid), and prune rankings are all invariant — so
  *     the learned piece set and every log_prob are IDENTICAL (bit
  *     equality asserted) and every exp_count is factor× its base
  *     value (asserted at 1e-9 relative).
  *  2. TRAIN WALL is vocabulary-bound: the replica pays the one
  *     corpus pass (explode → distinct-word count) after which its
  *     word table is the SAME SIZE as the base corpus's. Asserted as
  *     train_scaled < factor/4 · train_base.
  *  3. The TOKEN-COUNT stats face shuffles one INT per distinct word
  *     (near-flat: count_scaled < 6 · count_base at factor 30); the
  *     full segment face pays its output-sized cost, bounded at
  *     1.5·factor· base; total n_tokens exactly factor× base.
  *
  * Output: one JSON line to SPARK_GRAFT_SCALE_OUT (default
  * SCALE_OUT_UNIGRAM.json).
  *
  * Usage: runMain graft.tools.UnigramScale [baseDir] [factor] [vocab]
  */
object UnigramScale {
  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(30)
    val vocab = args.lift(2).map(_.toInt).getOrElse(150)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outPath = sys.env.getOrElse(
      "SPARK_GRAFT_SCALE_OUT", "SCALE_OUT_UNIGRAM.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.table(spark, baseDir, "documents")
      .select(col("doc_id"), col("text"))
      .repartition(spark.sparkContext.defaultParallelism)
      .localCheckpoint()
    val maxId = docs.agg(max(col("doc_id"))).head.getLong(0) + 1L
    val scaled = (0 until factor).map(k =>
      docs.select((col("doc_id") + lit(k * maxId)).as("doc_id"),
        col("text")))
      .reduce(_ unionByName _)
      .repartition(spark.sparkContext.defaultParallelism)
      .localCheckpoint()
    val nBase = docs.count()
    val nBig = scaled.count()
    require(nBig == factor * nBase, s"replica rows: $nBig != $factor*$nBase")

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def model(df: DataFrame) =
      Curation.unigramLmTrain(df, col("text"), vocabSize = vocab,
        maxPieceLen = 4, seedSize = 300, emIters = 1)
        .select("piece", "log_prob", "exp_count")
        .collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
        .sortBy(_._1).toSeq

    // JIT warm-up on the base corpus so the timed arms compare
    // steady-state engine capability, not classloading
    model(docs)
    val (mBase, trainBase) = time(model(docs))
    val (mBig, trainBig) = time(model(scaled))
    println(f"[unigram] train base=$trainBase%.2fs scaled=$trainBig%.2fs " +
      s"pieces=${mBase.size}/${mBig.size}")

    // contract 1: identical piece set + bit-equal log_probs;
    // exp_count factor-exact (1e-9 relative — the doubles of an
    // exactly-factor-scaled DECIMAL)
    require(mBase.nonEmpty && mBase.size == mBig.size,
      s"piece counts differ: ${mBase.size} vs ${mBig.size}")
    mBase.zip(mBig).foreach { case (b, g) =>
      require(b._1 == g._1, s"piece set diverged: ${b._1} vs ${g._1}")
      require(b._2 == g._2,
        s"log_prob diverged on '${b._1}': ${b._2} vs ${g._2}")
      require(math.abs(g._3 - factor * b._3) <=
        1e-9 * math.max(1.0, math.abs(g._3)),
        s"exp_count not factor-exact on '${b._1}': ${g._3} != " +
          s"$factor*${b._3}")
    }
    // contract 2: EM rounds vocabulary-bound
    require(trainBig < trainBase * (factor / 4.0),
      f"train wall not vocabulary-bound: $trainBig%.2fs vs " +
        f"$trainBase%.2fs base at factor $factor")

    spark.catalog.clearCache()

    val pieceSeq = mBase.map(t => (t._1, t._2))
    def timed2(f: => Long): (Long, Double) = {
      val (r1, t1) = time(f)
      val (r2, t2) = time(f)
      require(r1 == r2, s"nondeterministic result: $r1 vs $r2")
      (r1, math.min(t1, t2))
    }
    def countTokens(df: DataFrame): Long =
      Curation.unigramLmTokenCounts(df, "doc_id", col("text"), pieceSeq)
        .agg(sum(col("n_tokens"))).head.getLong(0)
    def segTokens(df: DataFrame): Long =
      Curation.unigramLmSegment(df, "doc_id", col("text"), pieceSeq)
        .agg(sum(col("n_tokens"))).head.getLong(0)
    val (cntBase, tcBase) = timed2(countTokens(docs))
    val (cntBig, tcBig) = timed2(countTokens(scaled))
    val (tokBase, segBase) = timed2(segTokens(docs))
    val (tokBig, segBig) = timed2(segTokens(scaled))
    println(f"[unigram] tokenCounts base=$tcBase%.2fs scaled=$tcBig%.2fs; " +
      f"segment base=$segBase%.2fs scaled=$segBig%.2fs " +
      s"tokens=$tokBase/$tokBig")

    // contract 3: factor-exact output; stats face near-flat; segment
    // face bounded by its output-sized linear cost
    require(cntBig == factor * cntBase && tokBig == factor * tokBase &&
      cntBase == tokBase,
      s"n_tokens not factor-exact/consistent: counts $cntBase/$cntBig " +
        s"segment $tokBase/$tokBig factor $factor")
    require(tcBig < tcBase * 6.0,
      f"token-count stats face not flat: $tcBig%.2fs vs $tcBase%.2fs base")
    require(segBig < math.max(segBase, 1.0) * factor * 1.5,
      f"segment wall superlinear: $segBig%.2fs vs $segBase%.2fs base")

    val line =
      s"""{"metric":"unigram_scale","factor":$factor,""" +
      s""""pieces":${mBase.size},""" +
      s""""base":{"docs":$nBase,"train_s":$trainBase,""" +
      s""""token_counts_s":$tcBase,"segment_s":$segBase,""" +
      s""""n_tokens":$tokBase},""" +
      s""""scaled":{"docs":$nBig,"train_s":$trainBig,""" +
      s""""token_counts_s":$tcBig,"segment_s":$segBig,""" +
      s""""n_tokens":$tokBig},""" +
      s""""model_identity":true,"all_factor_exact":true}"""
    println(line)
    Files.writeString(Paths.get(outPath), line + "\n")
    spark.stop()
  }
}
