package graft.tools

import graft.Tables
import graft.operators.{GeoJoin, Regression, StatsAgg}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Round-20 operators at `factor`× (the per-round newops contract),
  * each with the scale invariant its design promises HARD-asserted:
  *
  *  1. A44b/A44c survival reads are RATIO-bound: replicating every
  *     subject `factor`× (fresh subject ids, identical lifetimes)
  *     scales d and n_risk by exactly `factor`, so the KM curve and
  *     the cumulative hazard are IDENTICAL on the round-6 grid,
  *     while the Greenwood variance scales by 1/factor — the se
  *     column must shrink by ~1/√factor (both asserted).
  *  2. A46b coxPhMulti is moment-ratio-bound: all (S0,S1,S2) sums
  *     and d scale by `factor`, the per-time ratios are invariant,
  *     so the learned β agrees with the base fit to the 9-dp
  *     quantization drift (asserted at 1e-5).
  *  3. A42c ridge is sufficient-statistics-bound like A42 — sums
  *     scale exactly, Cramer ratios are homogeneous (note λ is NOT
  *     scaled, so the fit legitimately shifts toward OLS as n grows:
  *     asserted directionally against the base OLS fit instead of
  *     for equality).
  *  4. J10 geoRadiusJoin is band-bound: replicated left points match
  *     the same POIs, so result rows scale EXACTLY `factor`× and the
  *     candidate pair mass scales linearly (factor×), never
  *     quadratically (asserted).
  *  5. F18 geohash is map-only: the distinct gh6 set over replicated
  *     points is IDENTICAL (asserted), wall scales with the scan.
  *
  * Output: one JSON line to SPARK_GRAFT_SCALE_OUT (default
  * SCALE_OUT_NEWOPS20.json).
  *
  * Usage: runMain graft.tools.NewOpsScale20 [baseDir] [factor]
  */
object NewOpsScale20 {
  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(30)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outPath = sys.env.getOrElse(
      "SPARK_GRAFT_SCALE_OUT", "SCALE_OUT_NEWOPS20.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

    // ---- subject table off events (the q_survival derivation)
    val day = floor(graft.Tables.epochSeconds(col("ts")) / 86400L)
      .cast("long")
    val ev = Tables.table(spark, baseDir, "events")
      .select(col("user_id"), day.as("day"))
    val life = ev.groupBy(col("user_id")).agg(
      min(col("day")).as("t0"), max(col("day")).as("t1"))
    val maxDay = ev.agg(max(col("day")).as("md"))
    val subjects = life.crossJoin(broadcast(maxDay)).select(
      col("user_id"),
      pmod(col("user_id"), lit(3L)).as("cohort"),
      (col("t1") - col("t0")).as("dur"),
      when(col("t1") < col("md") - lit(7L), 1).otherwise(0).as("ev"),
      pmod(col("user_id"), lit(2L)).cast("double").as("x0"),
      (expr("CAST((user_id div 2) % 4 AS DOUBLE)") * lit(0.25)).as("x1"))
      .localCheckpoint()
    val maxU = subjects.agg(max(col("user_id"))).head.getLong(0) + 1L
    val subjBig = (0 until factor).map(k =>
      subjects.withColumn("user_id", col("user_id") + lit(k * maxU)))
      .reduce(_ unionByName _)
      .repartition(spark.sparkContext.defaultParallelism)
      .localCheckpoint()
    val nBase = subjects.count(); val nBig = subjBig.count()
    require(nBig == factor * nBase)

    // ---- 1. survival CI + cumulative hazard
    def kmci(df: DataFrame) = StatsAgg.kaplanMeierCi(
      df, Seq("cohort"), col("dur"), col("ev"))
      .select(col("cohort"), col("t"), col("survival"), col("se"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))))
      .toMap
    val (ciBase, _) = time(kmci(subjects))
    val (ciBig, wCi) = time(kmci(subjBig))
    require(ciBase.keySet == ciBig.keySet, "CI grid drift")
    ciBase.foreach { case (k, (s, se)) =>
      require(ciBig(k)._1 == s, s"KM curve drifted at $k")
      (se, ciBig(k)._2) match {
        case (Some(a), Some(b)) if a > 1e-9 =>
          val ratio = b / a * math.sqrt(factor.toDouble)
          require(ratio > 0.9 && ratio < 1.1,
            s"Greenwood se did not shrink ~1/sqrt(factor) at $k: $ratio")
        case _ => ()
      }
    }
    def nah(df: DataFrame) = StatsAgg.nelsonAalen(
      df, Seq("cohort"), col("dur"), col("ev"))
      .select(col("cohort"), col("t"), col("cum_hazard"), col("survival_fh"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3)))).toMap
    val (naBase, _) = time(nah(subjects))
    val (naBig, wNa) = time(nah(subjBig))
    require(naBase == naBig, "Nelson-Aalen hazard not replication-invariant")

    // ---- 2. multi-covariate Cox
    def cox(df: DataFrame) = StatsAgg.coxPhMulti(
      df, Seq("cohort"), col("dur"), col("ev"),
      Seq(col("x0"), col("x1")))
      .select(col("cohort"), col("beta0"), col("beta1"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)).map(_.toString.toDouble),
          Option(r.get(2)).map(_.toString.toDouble)))).toMap
    val (cxBase, _) = time(cox(subjects))
    val (cxBig, wCox) = time(cox(subjBig))
    cxBase.foreach { case (k, (b0, b1)) =>
      (b0, cxBig(k)._1, b1, cxBig(k)._2) match {
        case (Some(a0), Some(c0), Some(a1), Some(c1)) =>
          require(math.abs(a0 - c0) < 1e-5 && math.abs(a1 - c1) < 1e-5,
            s"Cox beta drifted at $k: ($a0,$a1) vs ($c0,$c1)")
        case _ => ()
      }
    }

    // ---- 3. ridge on the replicated event table (sums homogeneous)
    val evFull = Tables.table(spark, baseDir, "events")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .localCheckpoint()
    val maxE = evFull.agg(max(col("event_id"))).head.getLong(0) + 1L
    val evBig = (0 until factor).map(k =>
      evFull.withColumn("event_id", col("event_id") + lit(k * maxE)))
      .reduce(_ unionByName _)
      .repartition(spark.sparkContext.defaultParallelism)
      .localCheckpoint()
    evBig.count()
    def ridge(df: DataFrame) = Regression.ridgeFit2(
      df, Seq("event_type"),
      x1 = (pmod(graft.Tables.epochSeconds(col("ts")), lit(86400L)) /
        lit(3600L)).cast("long"),
      x2 = pmod(col("user_id"), lit(50L)),
      y = col("value"), lambda = 25.0)
      .select(col("event_type"), col("beta1"), col("r2"))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2)))).toMap
    def ols(df: DataFrame) = Regression.linearFit2(
      df, Seq("event_type"),
      x1 = (pmod(graft.Tables.epochSeconds(col("ts")), lit(86400L)) /
        lit(3600L)).cast("long"),
      x2 = pmod(col("user_id"), lit(50L)),
      y = col("value"))
      .select(col("event_type"), col("beta1"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val (rgBase, _) = time(ridge(evFull))
    val (rgBig, wRidge) = time(ridge(evBig))
    val olsBase = ols(evFull)
    rgBase.foreach { case (k, (b1, _)) =>
      // fixed λ against factor× data: the big fit sits BETWEEN the
      // base ridge fit and the OLS fit (shrinkage decays with n)
      val lo = math.min(b1, olsBase(k)) - 1e-6
      val hi = math.max(b1, olsBase(k)) + 1e-6
      require(rgBig(k)._1 >= lo && rgBig(k)._1 <= hi,
        s"ridge at $k left the [ridge_base, ols] bracket: ${rgBig(k)._1} vs [$lo,$hi]")
    }

    // ---- 4. geo radius join: results scale exactly factor×
    val users = subjects.select(col("user_id"),
      ((pmod(col("user_id"), lit(1200L)).cast("double") / lit(10.0)) -
        lit(60.0)).as("lat"),
      ((pmod(col("user_id") * lit(7L), lit(3600L)).cast("double") /
        lit(10.0)) - lit(180.0)).as("lon"))
    // replicated points keep their COORDINATES (ids offset by a
    // multiple of the 3600-cell lcm so the grid maps identically)
    val lcm = 3600L * ((maxU + 3599L) / 3600L)
    val usersBig = (0 until factor).map(k =>
      users.withColumn("user_id", col("user_id") + lit(k * lcm)))
      .reduce(_ unionByName _)
      .repartition(spark.sparkContext.defaultParallelism)
      .localCheckpoint()
    val pois = Tables.table(spark, baseDir, "embeddings")
      .select(col("vec_id"),
        ((pmod(col("vec_id") * lit(37L), lit(1100L)).cast("double") /
          lit(10.0)) - lit(55.0)).as("plat"),
        ((pmod(col("vec_id") * lit(53L), lit(3500L)).cast("double") /
          lit(10.0)) - lit(175.0)).as("plon"))
    def gj(l: DataFrame) = GeoJoin.geoRadiusJoin(
      l, col("user_id"), col("lat"), col("lon"),
      pois, col("vec_id"), col("plat"), col("plon"),
      radiusM = 1000000.0).count()
    val (gjBase, _) = time(gj(users))
    val (gjBig, wGj) = time(gj(usersBig))
    require(gjBig == factor * gjBase,
      s"geo join pairs not linear: $gjBig != $factor*$gjBase")

    // ---- 5. geohash: distinct gh6 set invariant under replication
    import graft.functions.Geohash
    def gh(df: DataFrame) = {
      val withCells = df
        .withColumn("__qlat", Geohash.quantize15(col("lat"), -90.0, 180.0))
        .withColumn("__qlon", Geohash.quantize15(col("lon"), -180.0, 360.0))
        .withColumn("__code",
          graft.sources.Layout.mortonCode(col("__qlat"), col("__qlon")))
        .select(Geohash.base32(col("__code"), 6).as("gh6"))
      withCells.distinct().count()
    }
    val (ghBase, _) = time(gh(users))
    val (ghBig, wGh) = time(gh(usersBig))
    require(ghBase == ghBig, s"gh6 set drifted: $ghBase vs $ghBig")

    val json =
      s"""{"tool":"NewOpsScale20","factor":$factor,"n_subjects_base":$nBase,
         |"walls_sec":{"km_ci":${f"$wCi%.2f"},"nelson_aalen":${f"$wNa%.2f"},
         |"coxph_multi":${f"$wCox%.2f"},"ridge":${f"$wRidge%.2f"},
         |"geo_join":${f"$wGj%.2f"},"geohash":${f"$wGh%.2f"}},
         |"geo_pairs":{"base":$gjBase,"big":$gjBig},
         |"gh6_cells":$ghBase,
         |"asserts":["km_curve_identical","greenwood_se_1_over_sqrt_f",
         |"hazard_identical","cox_beta_1e-5","ridge_bracket",
         |"geo_pairs_linear","gh6_set_invariant"],"all_passed":true}"""
        .stripMargin.replace("\n", "")
    Files.writeString(Paths.get(outPath), json + "\n")
    println(json)
    spark.stop()
  }
}
