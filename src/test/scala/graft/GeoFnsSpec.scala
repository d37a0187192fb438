package graft

import graft.functions.GeoFns
import org.apache.spark.sql.functions._

/** F17 geo scalars: textbook distances, metric laws, and ray-casting
  * parity with a scalar reference over a point grid.
  */
class GeoFnsSpec extends SparkSpec {
  import spark.implicits._

  test("F17 greatCircleDistance: known city pair, zero self-distance, symmetry") {
    val rows = Seq(
      ("sf-la", 37.7749, -122.4194, 34.0522, -118.2437),
      ("self", 51.5, -0.12, 51.5, -0.12),
      ("poles", 90.0, 0.0, -90.0, 0.0))
      .toDF("k", "lat1", "lon1", "lat2", "lon2")
    val got = rows.select(col("k"),
      GeoFns.greatCircleDistance(col("lat1"), col("lon1"),
        col("lat2"), col("lon2")).as("d"),
      GeoFns.greatCircleDistance(col("lat2"), col("lon2"),
        col("lat1"), col("lon1")).as("dr"))
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // SF–LA great-circle ≈ 559 km on the mean-radius sphere
    assert(math.abs(got("sf-la")._1 - 559000.0) < 2000.0, got("sf-la"))
    assert(got("sf-la")._1 === got("sf-la")._2) // symmetric, bit-equal
    assert(got("self")._1 === 0.0)
    // antipodal poles: half the circumference, π·R
    assert(math.abs(got("poles")._1 - math.Pi * GeoFns.EarthRadiusM) < 1.0)
  }

  test("F17 pointInPolygon: parity with a scalar ray-cast over a grid; square laws") {
    val square = Seq((0.05, 0.05), (0.05, 9.95), (9.95, 9.95), (9.95, 0.05))
    def scalarPip(y: Double, x: Double): Boolean = {
      val edges = square.zip(square.tail :+ square.head)
      edges.count { case ((yi, xi), (yj, xj)) =>
        ((yi > y) != (yj > y)) &&
          x < (xj - xi) * (y - yi) / (yj - yi) + xi
      } % 2 == 1
    }
    val pts = for (y <- -2 to 12; x <- -2 to 12)
      yield (y.toDouble + 0.5, x.toDouble + 0.5)
    val got = pts.toDF("lat", "lon")
      .select(col("lat"), col("lon"),
        GeoFns.pointInPolygon(col("lat"), col("lon"), square).as("in"))
      .as[(Double, Double, Boolean)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    for ((y, x) <- pts)
      assert(got((y, x)) === scalarPip(y, x), s"($y,$x)")
    assert(got((5.5, 5.5)) && !got((-1.5, 5.5)) && !got((5.5, 11.5)))
  }

  test("F17 pointInPolygon: non-convex polygon classifies the notch correctly") {
    // a U shape: the notch between the arms is OUTSIDE
    val u = Seq((0.0, 0.0), (10.0, 0.0), (10.0, 3.0), (3.0, 3.0),
      (3.0, 7.0), (10.0, 7.0), (10.0, 10.0), (0.0, 10.0))
    val got = Seq((1.5, 1.5), (5.0, 5.0), (1.5, 8.0), (8.0, 5.0))
      .toDF("lat", "lon")
      .select(GeoFns.pointInPolygon(col("lat"), col("lon"), u))
      .as[Boolean].collect().toSeq
    // the notch (lat > 3, lon in (3,7)) is removed: base points
    // (1.5, *) are inside, both notch points are outside
    assert(got === Seq(true, false, true, false))
  }
}
