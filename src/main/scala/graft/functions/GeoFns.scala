package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** F17 — geo scalar family: the ClickHouse `greatCircleDistance` /
  * `pointInPolygon` surface as pure codegen column trees (no UDFs).
  *
  * Cross-engine posture: both functions are fixed double trees over
  * libm primitives (sin/cos/asin agree with DuckDB's to ~1 ulp —
  * far inside the round-3-meters output grid, the same argument that
  * carries the p-value family's exp/ln trees through the gate), and
  * the polygon test's edge terms are generated from ONE Scala
  * literal list by both the Column builder and the oracle-SQL
  * builder ([[pointInPolygonSql]]) — the two engines cannot drift
  * because they share the generator.
  */
object GeoFns {

  /** Mean Earth radius (meters), the ClickHouse constant. */
  val EarthRadiusM: Double = 6371000.0

  /** Haversine great-circle distance in meters between two
    * (degrees) coordinate pairs:
    * d = 2R·asin(√(sin²(Δφ/2) + cosφ₁·cosφ₂·sin²(Δλ/2))).
    */
  def greatCircleDistance(lat1: Column, lon1: Column, lat2: Column,
      lon2: Column): Column = {
    val phi1 = radians(lat1)
    val phi2 = radians(lat2)
    val dphi = radians(lat2 - lat1) / lit(2.0)
    val dlam = radians(lon2 - lon1) / lit(2.0)
    val a = sin(dphi) * sin(dphi) +
      cos(phi1) * cos(phi2) * sin(dlam) * sin(dlam)
    lit(2.0 * EarthRadiusM) * asin(sqrt(a))
  }

  /** Ray-casting point-in-polygon against a LITERAL vertex list
    * (lat, lon): odd crossing parity = inside. The standard
    * half-open edge rule ((yi > y) != (yj > y)) handles horizontal
    * edges and double-counted vertices; boundary points follow the
    * crossing rule (not guaranteed inside).
    *
    * Zero-height edges (yi == yj) are dropped at GENERATION time by
    * [[horizontalFreeEdges]] — shared with the SQL generator — rather
    * than relying on the straddles conjunct to mask the div-by-zero
    * in their intersect term (Spark yields NULL there, DuckDB IEEE
    * inf; both happened to be masked, but the crossing count should
    * never build the term at all: a horizontal edge can't be crossed
    * by a horizontal ray).
    */
  def pointInPolygon(lat: Column, lon: Column,
      poly: Seq[(Double, Double)]): Column = {
    val crossings = horizontalFreeEdges(poly).map { case ((yi, xi), (yj, xj)) =>
      val straddles = (lit(yi) > lat) =!= (lit(yj) > lat)
      val intersectX = lit(xj - xi) * (lat - lit(yi)) / lit(yj - yi) + lit(xi)
      when(straddles && lon < intersectX, 1).otherwise(0)
    }.reduce(_ + _)
    pmod(crossings, lit(2)) === 1
  }

  /** The closed edge ring minus zero-height edges — the ONE generator
    * both the Column and SQL builders consume, so the dropped-edge
    * set cannot drift between engines. Requires the polygon to keep
    * at least one non-horizontal edge (a fully horizontal "polygon"
    * has no interior).
    */
  private def horizontalFreeEdges(poly: Seq[(Double, Double)])
      : Seq[((Double, Double), (Double, Double))] = {
    require(poly.size >= 3, "polygon needs >= 3 vertices")
    val edges = poly.zip(poly.tail :+ poly.head)
      .filter { case ((yi, _), (yj, _)) => yi != yj }
    require(edges.nonEmpty, "polygon is fully horizontal — no interior")
    edges
  }

  /** The SAME ray-casting test as DuckDB SQL over column names —
    * generated from the identical literal list so the oracle tree is
    * term-for-term the Column tree above.
    */
  def pointInPolygonSql(latCol: String, lonCol: String,
      poly: Seq[(Double, Double)]): String = {
    val terms = horizontalFreeEdges(poly).map { case ((yi, xi), (yj, xj)) =>
      s"""CASE WHEN (($yi > $latCol) <> ($yj > $latCol))
         AND $lonCol < ${xj - xi} * ($latCol - $yi) / ${yj - yi} + $xi
         THEN 1 ELSE 0 END"""
    }
    s"((${terms.mkString(" + ")}) % 2) = 1"
  }

  /** The haversine tree as DuckDB SQL over column names — same
    * generator discipline.
    */
  def greatCircleDistanceSql(lat1: String, lon1: String, lat2: String,
      lon2: String): String =
    s"""2.0 * $EarthRadiusM * asin(sqrt(
        sin(radians($lat2 - $lat1) / 2.0) * sin(radians($lat2 - $lat1) / 2.0)
        + cos(radians($lat1)) * cos(radians($lat2))
          * sin(radians($lon2 - $lon1) / 2.0)
          * sin(radians($lon2 - $lon1) / 2.0)))"""
}
