package graft

import graft.functions.GeoFns
import graft.operators.GeoJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J10 geo radius join: exact parity with the brute cross join on
  * adversarial fixtures (antimeridian pairs, high-latitude lon
  * shrink), and the banding actually prunes.
  */
class GeoJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(l: DataFrame, r: DataFrame, radiusM: Double) =
    l.crossJoin(r)
      .withColumn("dist_m", GeoFns.greatCircleDistance(
        col("lat"), col("lon"), col("plat"), col("plon")))
      .where(col("dist_m") <= lit(radiusM))
      .select(col("lid").as("l_id"), col("rid").as("r_id"),
        round(col("dist_m"), 3).as("dist_m"))

  private def run(l: DataFrame, r: DataFrame, radiusM: Double,
      cellDeg: Double = 5.0) =
    GeoJoin.geoRadiusJoin(l, col("lid"), col("lat"), col("lon"),
      r, col("rid"), col("plat"), col("plon"), radiusM, cellDeg)

  private def asSet(df: DataFrame) =
    df.as[(Long, Long, Double)].collect().toSet

  test("J10: banded join equals brute force on a global scatter, including antimeridian pairs") {
    val rnd = new scala.util.Random(83)
    val left = (0 until 400).map(i =>
      (i.toLong, rnd.nextDouble() * 170 - 85, rnd.nextDouble() * 360 - 180))
      .toDF("lid", "lat", "lon")
    val right = ((0 until 120).map(i =>
      (i.toLong, rnd.nextDouble() * 170 - 85, rnd.nextDouble() * 360 - 180)) ++
      // planted antimeridian pair partners: ±179.95 at matched lats
      Seq((900L, 10.0, 179.95), (901L, -40.0, -179.95)))
      .toDF("rid", "plat", "plon")
    val lWrap = left.union(Seq((800L, 10.1, -179.9), (801L, -40.1, 179.9))
      .toDF("lid", "lat", "lon"))
    val got = asSet(run(lWrap, right, 800000.0))
    val want = asSet(brute(lWrap, right, 800000.0))
    assert(got === want)
    // the planted straddling pairs actually matched (wrap works)
    assert(got.exists(p => p._1 == 800L && p._2 == 900L))
    assert(got.exists(p => p._1 == 801L && p._2 == 901L))
  }

  test("J10: high-latitude lon shrink is covered (the fixed-stencil failure mode)") {
    // at lat 78 a degree of longitude is ~23 km: two points 15° of
    // lon apart are only ~346 km apart — 3 cells away at cellDeg=5,
    // outside any fixed 3x3 stencil
    val l = Seq((1L, 78.0, 0.0), (2L, 78.0, 40.0)).toDF("lid", "lat", "lon")
    val r = Seq((10L, 78.2, 15.0), (11L, -78.0, -15.0))
      .toDF("rid", "plat", "plon")
    val got = asSet(run(l, r, 400000.0))
    assert(got === asSet(brute(l, r, 400000.0)))
    assert(got.exists(p => p._1 == 1L && p._2 == 10L))
  }

  test("J10: polar points fall back to full-ring scan — over-the-pole and antipodal-longitude pairs survive (r20 review findings)") {
    // near-pole points where cos(latEdge) would wildly underestimate
    // the longitude reach, incl. an antipodal-longitude pair ~22 km
    // apart over the pole and a same-ring quarter-turn pair
    val l = Seq((1L, 89.9, 0.0), (2L, 89.99, 10.0), (3L, 88.0, 0.0))
      .toDF("lid", "lat", "lon")
    val r = Seq((10L, 89.9, -178.0), (11L, 89.99, 100.0),
      (12L, 88.0, 90.0), (13L, -89.9, 0.0)).toDF("rid", "plat", "plon")
    for (radius <- Seq(50000.0, 400000.0)) {
      val got = asSet(run(l, r, radius))
      assert(got === asSet(brute(l, r, radius)), s"radius $radius")
    }
    // the specific over-the-pole pair is present at 400 km
    assert(asSet(run(l, r, 400000.0)).exists(p => p._1 == 1L && p._2 == 10L))
    // fine cell grids with representation error are accepted now
    val small = Seq((1L, 10.0, 10.0)).toDF("lid", "lat", "lon")
    val smallR = Seq((2L, 10.05, 10.05)).toDF("rid", "plat", "plon")
    assert(asSet(run(small, smallR, 20000.0, cellDeg = 0.1)) ===
      asSet(brute(small, smallR, 20000.0)))
  }

  test("J10: band pruning carries far fewer pairs than the cross join") {
    val rnd = new scala.util.Random(89)
    val l = (0 until 2000).map(i =>
      (i.toLong, rnd.nextDouble() * 120 - 60, rnd.nextDouble() * 360 - 180))
      .toDF("lid", "lat", "lon")
    val r = (0 until 500).map(i =>
      (i.toLong, rnd.nextDouble() * 120 - 60, rnd.nextDouble() * 360 - 180))
      .toDF("rid", "plat", "plon")
    // count candidate pairs reaching the haversine (pre-filter join size)
    val ncx = 72L
    val cellDeg = 5.0
    val l0 = l.withColumn("cy0", floor((col("lat") + lit(90.0)) / cellDeg).cast("long"))
      .withColumn("cx0", pmod(floor((col("lon") + lit(180.0)) / cellDeg).cast("long"), lit(ncx)))
    val latEdge = least(lit(89.0), abs(col("lat")) + lit(2 * cellDeg))
    val klon = least(lit((ncx - 1) / 2),
      ceil(lit(200000.0) / (lit(111320.0 * cellDeg) * cos(radians(latEdge)))).cast("long"))
    val cand = l0
      .withColumn("dy", explode(sequence(lit(-1L), lit(1L))))
      .withColumn("dx", explode(sequence(-klon, klon)))
      .select((col("cy0") + col("dy")).as("cy"),
        pmod(col("cx0") + col("dx"), lit(ncx)).as("cx"))
      .join(r.withColumn("cy", floor((col("plat") + lit(90.0)) / cellDeg).cast("long"))
        .withColumn("cx", pmod(floor((col("plon") + lit(180.0)) / cellDeg).cast("long"), lit(ncx))),
        Seq("cy", "cx"))
      .count()
    val bruteCount = 2000L * 500L
    assert(cand < bruteCount / 10,
      s"banding carried $cand of $bruteCount pairs")
    // and the result is still exact
    assert(asSet(run(l, r, 200000.0)) === asSet(brute(l, r, 200000.0)))
  }
}
