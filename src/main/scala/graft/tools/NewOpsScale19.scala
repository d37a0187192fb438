package graft.tools

import graft.Tables
import graft.functions.BitmapAgg
import graft.operators.{Curation, Regression}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Round-19 operators at 30× (the per-round newops contract): A42
  * exact OLS, X29 logistic-classifier training, A41/ST21 bitmap
  * state building + algebra — each with the scale INVARIANT its
  * design promises asserted hard, and walls recorded.
  *
  *  1. A42 `linearFit2` is sufficient-statistics-bound: on a corpus
  *     replicated `factor`× with (ts, user_id, value) UNCHANGED
  *     (event ids namespaced only), every DECIMAL sum scales by
  *     exactly `factor`, and the Cramer ratios are homogeneous in
  *     that scaling — so the fit (betas, r², rmse) agrees with the
  *     base fit on the round-6 output grid (asserted; the sums are
  *     exact, only the final double casts can wiggle in last ulps).
  *     The wall is one scan + a 10-double-per-key aggregate; no
  *     shuffle grows with the data.
  *  2. X29 `logisticTrain` gradient means g/n are replication-
  *     invariant on the exact DECIMAL grid (g → factor·g exactly,
  *     n → factor·n), so the 3-iteration weight trajectory agrees
  *     with the base run at the round-6 grid (the double conversion
  *     of factor·g may differ in final ulps — round-6 asserted).
  *  3. A41 `bitmapAgg` states built over the replicated corpus carry
  *     the SAME member sets (user ids unchanged), so every exact
  *     cardinality and pairwise set-algebra face is IDENTICAL; the
  *     shuffle carries compressed bitmap bytes, never raw ids. The
  *     slice-build + OR re-merge (matview) path is measured
  *     alongside the direct build.
  *
  * Output: one JSON line to SPARK_GRAFT_SCALE_OUT (default
  * SCALE_OUT_NEWOPS19.json).
  *
  * Usage: runMain graft.tools.NewOpsScale19 [baseDir] [factor]
  */
object NewOpsScale19 {
  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(30)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outPath = sys.env.getOrElse(
      "SPARK_GRAFT_SCALE_OUT", "SCALE_OUT_NEWOPS19.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // ---- replicated corpora: payload columns verbatim, ids namespaced
    val ev = Tables.table(spark, baseDir, "events")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .repartition(spark.sparkContext.defaultParallelism)
      .localCheckpoint()
    val maxE = ev.agg(max(col("event_id"))).head.getLong(0) + 1L
    val evBig = (0 until factor).map(k =>
      ev.select((col("event_id") + lit(k * maxE)).as("event_id"),
        col("ts"), col("user_id"), col("event_type"), col("value")))
      .reduce(_ unionByName _)
      .repartition(spark.sparkContext.defaultParallelism)
      .localCheckpoint()
    val nBase = ev.count(); val nBig = evBig.count()
    require(nBig == factor * nBase, s"$nBig != $factor*$nBase")

    val docs = Tables.table(spark, baseDir, "documents")
      .where(length(col("text")) > 0)
      .select(col("doc_id"), col("text"))
      .repartition(spark.sparkContext.defaultParallelism)
      .localCheckpoint()
    val maxD = docs.agg(max(col("doc_id"))).head.getLong(0) + 1L
    val docsBig = (0 until factor).map(k =>
      docs.select((col("doc_id") + lit(k * maxD)).as("doc_id"), col("text")))
      .reduce(_ unionByName _)
      .repartition(spark.sparkContext.defaultParallelism)
      .localCheckpoint()

    // ---- 1. A42 exact OLS -------------------------------------------
    def fit(df: DataFrame): Seq[(String, Double, Double, Double, Double, Double)] =
      Regression.linearFit2(df, Seq("event_type"),
        x1 = (pmod(Tables.epochSeconds(col("ts")), lit(86400L)) /
          lit(3600L)).cast("long"),
        x2 = pmod(col("user_id"), lit(50L)),
        y = col("value"))
        .select(col("event_type"), col("beta0"), col("beta1"),
          col("beta2"), col("r2"), col("rmse"))
        .as[(String, Double, Double, Double, Double, Double)]
        .collect().sortBy(_._1).toSeq
    val (fitBase, tFitBase) = time(fit(ev))
    val (fitBig, tFitBig) = time(fit(evBig))
    require(fitBig == fitBase,
      s"A42 fit must be replication-invariant:\n$fitBase\n$fitBig")

    // ---- 2. X29 classifier training ---------------------------------
    def feats(df: DataFrame): DataFrame = {
      val m = graft.functions.TextFns.qualityMetrics(col("text")).toMap
      df.select(m("punct_ratio").as("x1"), m("stopword_ratio").as("x2"),
        (m("quality_score") >= 0.5).cast("double").as("y"))
    }
    def train(df: DataFrame): Seq[Double] =
      Curation.logisticTrain(feats(df), Seq(col("x1"), col("x2")),
        col("y"), iters = 3, lr = 1.0)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (wBase, tTrainBase) = time(train(docs))
    val (wBig, tTrainBig) = time(train(docsBig))
    require(wBase.map(r6) == wBig.map(r6),
      s"X29 weights must agree at round-6: $wBase vs $wBig")

    // ---- 3. A41 bitmap states + algebra -----------------------------
    def states(df: DataFrame): DataFrame =
      df.groupBy(col("event_type"))
        .agg(BitmapAgg.bitmapAgg(col("user_id")).as("st"))
    def algebra(df: DataFrame): Seq[(Long, Long, Long, Long)] = {
      val st = states(df)
      val a = st.orderBy(col("event_type")).limit(1)
        .select(col("st").as("sa"))
      val b = st.orderBy(col("event_type").desc).limit(1)
        .select(col("st").as("sb"))
      a.crossJoin(b).select(
        BitmapAgg.bitmapCardinality(col("sa")),
        BitmapAgg.bitmapCardinality(col("sb")),
        BitmapAgg.bitmapAndCardinality(col("sa"), col("sb")),
        BitmapAgg.bitmapAndnotCardinality(col("sa"), col("sb")))
        .as[(Long, Long, Long, Long)].collect().toSeq
    }
    val (algBase, tBmBase) = time(algebra(ev))
    val (algBig, tBmBig) = time(algebra(evBig))
    require(algBig == algBase,
      s"A41 exact algebra must be member-set-invariant: $algBase vs $algBig")
    // matview shape: slice states + OR re-merge equals the direct build
    val (mergedCard, tBmMerge) = time {
      val slices = evBig.withColumn("slice", pmod(col("event_id"), lit(8)))
        .groupBy(col("event_type"), col("slice"))
        .agg(BitmapAgg.bitmapAgg(col("user_id")).as("st"))
      slices.groupBy(col("event_type"))
        .agg(BitmapAgg.bitmapOrAgg(col("st")).as("st"))
        .select(BitmapAgg.bitmapCardinality(col("st")).as("c"))
        .agg(sum(col("c"))).as[Long].collect().head
    }
    val directCard = states(ev)
      .select(BitmapAgg.bitmapCardinality(col("st")).as("c"))
      .agg(sum(col("c"))).as[Long].collect().head
    require(mergedCard == directCard,
      s"slice-merge cardinality $mergedCard != direct $directCard")

    // ---- 4. A44/A45 survival family ----------------------------------
    // verbatim replication leaves user lifetimes UNCHANGED (same
    // users, same days), so the KM curve and the log-rank verdict are
    // IDENTICAL; the wall measures the subject-pass scan only
    def subjects(df: DataFrame): DataFrame = {
      val day = floor(graft.Tables.epochSeconds(col("ts")) / 86400L)
        .cast("long")
      val e = df.select(col("user_id"), col("event_type"), day.as("day"))
      val life = e.groupBy(col("event_type"), col("user_id")).agg(
        min(col("day")).as("t0"), max(col("day")).as("t1"))
      val md = e.agg(max(col("day")).as("md"))
      life.crossJoin(broadcast(md)).select(
        col("event_type"), (col("t1") - col("t0")).as("dur"),
        when(col("t1") < col("md") - lit(7L), 1).otherwise(0).as("ev"),
        pmod(col("user_id"), lit(2L)).cast("int").as("grp"))
    }
    def survival(df: DataFrame) = {
      val s = subjects(df)
      val km = graft.operators.StatsAgg.kaplanMeier(
        s, Seq("event_type"), col("dur"), col("ev"))
        .as[(String, Long, Long, Long, Long, Double)]
        .collect().sortBy(r => (r._1, r._2)).toSeq
      val lr = graft.operators.StatsAgg.logRankTest(
        s, Seq("event_type"), col("dur"), col("ev"), col("grp"))
        .select(col("event_type"), col("chi2"), col("p_approx"))
        .as[(String, Option[Double], Option[Double])]
        .collect().sortBy(_._1).toSeq
      (km, lr)
    }
    val (survBase, tSurvBase) = time(survival(ev))
    val (survBig, tSurvBig) = time(survival(evBig))
    require(survBig == survBase,
      "A44/A45 curves must be lifetime-invariant under replication")

    // honest linear ceilings — the invariants above are the real claim
    require(tFitBig < factor * math.max(tFitBase, 0.5) + 5,
      s"A42 wall super-linear: $tFitBase -> $tFitBig at $factor x")
    require(tBmBig < factor * math.max(tBmBase, 0.5) + 5,
      s"A41 wall super-linear: $tBmBase -> $tBmBig at $factor x")
    require(tTrainBig < factor * math.max(tTrainBase, 0.5) + 5,
      s"X29 wall super-linear: $tTrainBase -> $tTrainBig at $factor x")
    require(tSurvBig < factor * math.max(tSurvBase, 0.5) + 5,
      s"A44/A45 wall super-linear: $tSurvBase -> $tSurvBig at $factor x")

    val json =
      s"""{"metric":"newops19_30x","factor":$factor,"rows_base":$nBase,""" +
      s""""linfit_base_sec":${f"$tFitBase%.3f"},"linfit_${factor}x_sec":${f"$tFitBig%.3f"},""" +
      s""""fit_bit_identical":true,""" +
      s""""cls_train_base_sec":${f"$tTrainBase%.3f"},"cls_train_${factor}x_sec":${f"$tTrainBig%.3f"},""" +
      s""""cls_weights_round6_identical":true,""" +
      s""""bitmap_base_sec":${f"$tBmBase%.3f"},"bitmap_${factor}x_sec":${f"$tBmBig%.3f"},""" +
      s""""bitmap_slice_merge_sec":${f"$tBmMerge%.3f"},"bitmap_algebra_identical":true,""" +
      s""""survival_base_sec":${f"$tSurvBase%.3f"},"survival_${factor}x_sec":${f"$tSurvBig%.3f"},""" +
      s""""survival_curves_identical":true,""" +
      s""""unit":"sec","sf_dir":"$baseDir"}"""
    println(json)
    Files.writeString(Paths.get(outPath), json + "\n")
    spark.stop()
  }
}
