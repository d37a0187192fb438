package graft.operators

import graft.functions.GeoFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** J10 — geo radius join: all (left, right) pairs within `radiusM`
  * meters of great-circle distance, the spatial band join every
  * points-of-interest / store-visit / geofence query needs. The
  * all-pairs form is |L|·|R| haversines; this operator makes it a
  * BANDED equi-join (the MinHash-LSH argument applied to the globe):
  *
  *  1. the sphere is tiled into `cellDeg`-degree cells (lon cells
  *     wrap modulo 360/cellDeg — antimeridian pairs are NOT lost);
  *  2. each right point lands in its ONE home cell;
  *  3. each left point explodes to the neighborhood of cells within
  *     reach: ±⌈R / (m°·cellDeg)⌉ latitude rows, and per-row
  *     ±⌈R / (m°·cos(φ_edge)·cellDeg)⌉ longitude columns, where m° =
  *     ⌊π·EarthRadiusM/180⌋ (the engine's own sphere, floored so the
  *     bound is provably conservative) and where
  *     φ_edge is the most poleward latitude reachable from the row —
  *     cos shrinks a longitude degree toward the poles, so the lon
  *     reach WIDENS with |lat| (a fixed 3×3 stencil would silently
  *     drop high-latitude matches); the lon reach caps at the full
  *     ring, degrading to per-ring scan near the poles, never to
  *     wrong answers;
  *  4. the equi-join on (cellY, cellX) carries only neighborhood
  *     collisions to the exact haversine ≤ R filter.
  *
  * Pair mass: |L|·cells(φ)·density instead of |L|·|R| — at 100 TB the
  * shuffle is bounded by points-per-cell skew (pick `cellDeg` so a
  * cell holds thousands, not millions; salting composes if one city
  * cell is hot). Cell ids are exact integer floors of the SAME grid
  * arithmetic on both sides; since a right point has one home cell
  * and the left stencil's cells are distinct (the lon cap keeps
  * 2k+1 < ring size), no pair can be emitted twice — no distinct
  * needed. The correctness gate is brute force: the q_geo_join
  * oracle cross-joins and filters the identical haversine tree, so a
  * dropped band collision surfaces as a row-count mismatch.
  */
object GeoJoin {

  def geoRadiusJoin(
      left: DataFrame, leftId: Column, latL: Column, lonL: Column,
      right: DataFrame, rightId: Column, latR: Column, lonR: Column,
      radiusM: Double, cellDeg: Double = 5.0): DataFrame = {
    require(radiusM > 0, s"radius must be positive: $radiusM")
    val ncx = math.round(360.0 / cellDeg)
    require(math.abs(ncx * cellDeg - 360.0) < 1e-9,
      s"cellDeg must divide 360: $cellDeg")
    // meters per degree on the ENGINE'S OWN sphere (r20 ADVICE):
    // π·EarthRadiusM/180 = 111194.93, floored so the stencil divisor
    // is provably ≤ the true meters-per-degree of the exact haversine
    // tree it must cover — the old literals (111132 lat / 111320 lon)
    // were conservative for lat only by accident and fractionally
    // under-reached for lon
    val mPerDeg = math.floor(math.Pi * GeoFns.EarthRadiusM / 180.0)
    // latitude reach in cells: meters per degree of latitude is
    // constant on the sphere
    val klat = math.ceil(radiusM / (mPerDeg * cellDeg)).toLong
    val r = right.select(rightId.as("r_id"),
      latR.cast("double").as("r_lat"), lonR.cast("double").as("r_lon"))
      .withColumn("__cy",
        floor((col("r_lat") + lit(90.0)) / lit(cellDeg)).cast("long"))
      .withColumn("__cx", pmod(
        floor((col("r_lon") + lit(180.0)) / lit(cellDeg)).cast("long"),
        lit(ncx)))
    val l0 = left.select(leftId.as("l_id"),
      latL.cast("double").as("l_lat"), lonL.cast("double").as("l_lon"))
      .withColumn("__cy0",
        floor((col("l_lat") + lit(90.0)) / lit(cellDeg)).cast("long"))
      .withColumn("__cx0", pmod(
        floor((col("l_lon") + lit(180.0)) / lit(cellDeg)).cast("long"),
        lit(ncx)))
    // per-row longitude reach at the most poleward latitude within
    // the stencil. A stencil that touches the pole (latEdge ≥ 90)
    // scans the FULL ring — cos would otherwise underestimate the
    // reach arbitrarily badly near the pole (r20 review finding);
    // full-ring k = ncx/2 makes offsets ±k alias the same cell for
    // even ring sizes, so that one duplicated offset is excluded
    // below rather than double-emitting its pairs.
    val fullRing = lit(ncx / 2)
    val latEdge = abs(col("l_lat")) + lit((klat + 1) * cellDeg)
    val klon = when(latEdge >= lit(90.0), fullRing)
      .otherwise(least(fullRing,
        ceil(lit(radiusM) /
          (lit(mPerDeg * cellDeg) * cos(radians(latEdge)))).cast("long")))
    val exploded = l0
      .withColumn("__klon", klon)
      .withColumn("__dy", explode(sequence(lit(-klat), lit(klat))))
      .withColumn("__dx", explode(sequence(-col("__klon"), col("__klon"))))
      .where(!(col("__klon") * 2 === lit(ncx) &&
        col("__dx") === -col("__klon")))
      .select(col("l_id"), col("l_lat"), col("l_lon"),
        (col("__cy0") + col("__dy")).as("__cy"),
        pmod(col("__cx0") + col("__dx"), lit(ncx)).as("__cx"))
    exploded.join(r, Seq("__cy", "__cx"))
      .withColumn("dist_m", GeoFns.greatCircleDistance(
        col("l_lat"), col("l_lon"), col("r_lat"), col("r_lon")))
      .where(col("dist_m") <= lit(radiusM))
      .select(col("l_id"), col("r_id"), round(col("dist_m"), 3).as("dist_m"))
  }
}
