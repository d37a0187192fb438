package graft.tools

import graft.Tables
import graft.operators.Curation
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** X25 at scale (r16 verdict #5): BPE training's scale claim —
  * "every merge iteration runs on the VOCABULARY-sized distinct-word
  * table, never positions" — measured instead of argued, via the
  * contract that matters:
  *
  *  1. MERGE-TABLE IDENTITY: on a corpus replicated `factor`× with
  *     text UNCHANGED (ids namespaced only — deliberately NOT
  *     ScaleBench.deriveDocuments, whose per-replica `~k` token
  *     suffixes exist for the dedup paths and would change the
  *     symbol statistics), every word count scales by exactly
  *     `factor`, so pair ranks, tie-breaks, and the learned merge
  *     sequence are IDENTICAL and every pair_count is exactly
  *     factor· its base value. Hard-asserted merge-for-merge.
  *  2. TRAIN WALL is merge-count-bound: the replica pays the one
  *     corpus pass (explode → distinct-word count), after which its
  *     vocabulary table is the SAME SIZE as the base corpus's — the
  *     iteration cost does not grow with corpus rows. Asserted as
  *     train_scaled < factor/4 · train_base (the corpus pass is the
  *     only linear term; at factor 30 the bound leaves wide noise
  *     headroom while still rejecting any per-iteration corpus scan).
  *  3. The TOKEN-COUNT stats face (bpeTokenCounts — the read a
  *     budget/packing pipeline actually issues) shuffles integers
  *     only and is asserted NEAR-FLAT: count_scaled < 6 · count_base
  *     at factor 30 (measured ~1.1×). The full bpeSegment face pays
  *     its OUTPUT-sized cost (factor· more token arrays materialize —
  *     inherent, recorded honestly, bounded at 1.5·factor· the base
  *     wall with min-of-2 per arm), and total n_tokens is exactly
  *     factor· the base total (the factor-exact output contract).
  *
  * Output: one JSON line to SPARK_GRAFT_SCALE_OUT (default
  * SCALE_OUT_BPE.json).
  *
  * Usage: runMain graft.tools.BpeScale [baseDir] [factor] [merges]
  */
object BpeScale {
  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(30)
    val merges = args.lift(2).map(_.toInt).getOrElse(40)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outPath = sys.env.getOrElse(
      "SPARK_GRAFT_SCALE_OUT", "SCALE_OUT_BPE.json")
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

    def table(df: DataFrame) =
      Curation.bpeTrain(df, col("text"), merges)
        .select("rank", "left", "right", "pair_count")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(3)))
        .sortBy(_._1).toSeq

    val (mBase, trainBase) = time(table(docs))
    val (mBig, trainBig) = time(table(scaled))
    println(f"[bpe] train base=$trainBase%.2fs scaled=$trainBig%.2fs " +
      s"merges=${mBase.size}/${mBig.size}")

    // contract 1: identical merge sequence, pair counts exactly ×factor
    require(mBase.nonEmpty && mBase.size == mBig.size,
      s"merge counts differ: ${mBase.size} vs ${mBig.size}")
    mBase.zip(mBig).foreach { case (b, g) =>
      require((b._1, b._2, b._3) == (g._1, g._2, g._3),
        s"merge diverged at rank ${b._1}: $b vs $g")
      require(g._4 == factor * b._4,
        s"pair_count not factor-exact at rank ${b._1}: ${g._4} != " +
          s"$factor*${b._4}")
    }
    // contract 2: iterations are vocabulary-bound — only the single
    // corpus pass grows with rows
    require(trainBig < trainBase * (factor / 4.0),
      f"train wall not merge-count-bound: $trainBig%.2fs vs " +
        f"$trainBase%.2fs base at factor $factor")

    // the trains' ~2·merges localCheckpoint blocks otherwise bleed
    // memory pressure into the segment walls
    spark.catalog.clearCache()

    val mergeSeq = mBase.map(t => (t._2, t._3))
    def timed2(f: => Long): (Long, Double) = {
      val (r1, t1) = time(f)
      val (r2, t2) = time(f)
      require(r1 == r2, s"nondeterministic result: $r1 vs $r2")
      (r1, math.min(t1, t2))
    }
    def countTokens(df: DataFrame): Long =
      Curation.bpeTokenCounts(df, "doc_id", col("text"), mergeSeq)
        .agg(sum(col("n_tokens"))).head.getLong(0)
    def segTokens(df: DataFrame): Long =
      Curation.bpeSegment(df, "doc_id", col("text"), mergeSeq)
        .agg(sum(col("n_tokens"))).head.getLong(0)
    val (cntBase, tcBase) = timed2(countTokens(docs))
    val (cntBig, tcBig) = timed2(countTokens(scaled))
    val (tokBase, segBase) = timed2(segTokens(docs))
    val (tokBig, segBig) = timed2(segTokens(scaled))
    println(f"[bpe] tokenCounts base=$tcBase%.2fs scaled=$tcBig%.2fs; " +
      f"segment base=$segBase%.2fs scaled=$segBig%.2fs " +
      s"tokens=$tokBase/$tokBig")

    // contract 3: factor-exact output; the stats face near-flat; the
    // full face bounded by its output-sized linear cost
    require(cntBig == factor * cntBase && tokBig == factor * tokBase &&
      cntBase == tokBase,
      s"n_tokens not factor-exact/consistent: counts $cntBase/$cntBig " +
        s"segment $tokBase/$tokBig factor $factor")
    require(tcBig < tcBase * 6.0,
      f"token-count stats face not flat: $tcBig%.2fs vs $tcBase%.2fs base")
    require(segBig < math.max(segBase, 1.0) * factor * 1.5,
      f"segment wall superlinear: $segBig%.2fs vs $segBase%.2fs base")

    val line =
      s"""{"metric":"bpe_scale","factor":$factor,"merges":${mBase.size},""" +
      s""""base":{"docs":$nBase,"train_s":$trainBase,""" +
      s""""token_counts_s":$tcBase,"segment_s":$segBase,""" +
      s""""n_tokens":$tokBase},""" +
      s""""scaled":{"docs":$nBig,"train_s":$trainBig,""" +
      s""""token_counts_s":$tcBig,"segment_s":$segBig,""" +
      s""""n_tokens":$tokBig},""" +
      s""""merge_table_identical":true,"pair_counts_factor_exact":true,""" +
      s""""base_dir":"$baseDir"}"""
    println(line)
    Files.writeString(Paths.get(outPath), line + "\n")
    spark.stop()
  }
}
