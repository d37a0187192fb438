package graft

import graft.functions.Geohash
import org.apache.spark.sql.functions._

/** F18 geohash: parity with an independently-formulated scalar encoder
  * (interval halving, not quantize+interleave), the public known-value
  * example, the precision-ladder prefix law, alphabet round-trip, and
  * the decode-center laws.
  */
class GeohashSpec extends SparkSpec {
  import spark.implicits._

  /** Independent scalar reference: textbook bisection geohash — a
    * DIFFERENT formulation from the operator's quantize+Morton path,
    * so shared-bug parity is impossible.
    */
  private def scalarGeohash(lat: Double, lon: Double, p: Int): String = {
    var latLo = -90.0; var latHi = 90.0
    var lonLo = -180.0; var lonHi = 180.0
    var isLon = true
    val sb = new StringBuilder
    var bits = 0; var ch = 0
    while (sb.length < p) {
      if (isLon) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { ch = (ch << 1) | 1; lonLo = mid }
        else { ch = ch << 1; lonHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { ch = (ch << 1) | 1; latLo = mid }
        else { ch = ch << 1; latHi = mid }
      }
      isLon = !isLon
      bits += 1
      if (bits == 5) { sb.append(Geohash.Alphabet(ch)); bits = 0; ch = 0 }
    }
    sb.toString
  }

  private def encodeDf(pts: Seq[(Double, Double)]) =
    pts.toDF("lat", "lon")
      .withColumn("__qlat", Geohash.quantize15(col("lat"), -90.0, 180.0))
      .withColumn("__qlon", Geohash.quantize15(col("lon"), -180.0, 360.0))
      .withColumn("__code",
        graft.sources.Layout.mortonCode(col("__qlat"), col("__qlon")))

  test("F18 encode: parity with the bisection reference over a point sweep + the public example") {
    // points deliberately OFF cell boundaries (cell ≈ 0.0055°)
    val pts = (for (i <- 0 until 60; j <- 0 until 6) yield
      (-87.3 + i * 2.913 + j * 0.0713, -176.1 + i * 5.871 + j * 0.0377)) ++
      Seq((57.64911, 10.40744), (37.7749, -122.4194), (0.001, 0.001),
        (-33.8688, 151.2093))
    val got = encodeDf(pts)
      .select(col("lat"), col("lon"),
        Geohash.base32(col("__code"), 6).as("gh6"))
      .as[(Double, Double, String)].collect()
    for ((lat, lon, gh6) <- got)
      assert(gh6 === scalarGeohash(lat, lon, 6), s"($lat,$lon)")
    // the canonical public example: 57.64911, 10.40744 → u4pruy
    val jutland = got.find(r => r._1 == 57.64911).get._3
    assert(jutland === "u4pruy")
  }

  test("F18 precision ladder: gh2/gh4 are right-shifts AND true prefixes of gh6") {
    val pts = Seq((57.64911, 10.40744), (37.7749, -122.4194),
      (-11.71, 37.43), (59.9, -179.9), (-60.0, 0.05))
    val got = encodeDf(pts)
      .select(col("lat"), col("lon"),
        Geohash.base32(col("__code"), 6).as("gh6"),
        Geohash.base32(shiftright(col("__code"), 10), 4).as("gh4"),
        Geohash.base32(shiftright(col("__code"), 20), 2).as("gh2"))
      .as[(Double, Double, String, String, String)].collect()
    for ((lat, lon, gh6, gh4, gh2) <- got) {
      assert(gh4 === gh6.take(4))
      assert(gh2 === gh6.take(2))
      // each rung independently matches the bisection reference
      assert(gh4 === scalarGeohash(lat, lon, 4))
      assert(gh2 === scalarGeohash(lat, lon, 2))
    }
  }

  test("F18 alphabet: charIdx inverts every base-32 char; codeOf inverts base32") {
    val chars = Geohash.Alphabet.map(_.toString).zipWithIndex.toSeq
      .toDF("c", "want")
    val got = chars.select(Geohash.charIdx(col("c")).as("idx"), col("want"))
      .as[(Long, Int)].collect()
    for ((idx, want) <- got) assert(idx === want.toLong)
    // full 30-bit round trip: codeOf(base32(code)) == code on a sweep
    val codes = (0 until 64).map(i => i.toLong * 16909321L % (1L << 30))
    val rt = codes.toDF("code")
      .select(col("code"),
        Geohash.codeOf(Geohash.base32(col("code"), 6), 6).as("back"))
      .as[(Long, Long)].collect()
    for ((code, back) <- rt) assert(back === code)
  }

  test("F18c geohashesInBox: degenerate box is the point's own hash; dense-sample hashes are covered; cells distinct, sorted, near the box") {
    val pts = Seq((37.7749, -122.4194), (57.64911, 10.40744), (-33.9, 151.2))
    val df = pts.toDF("lat", "lon")
      .withColumn("own", {
        val q = Geohash.quantize15(col("lat"), -90.0, 180.0)
        val p = Geohash.quantize15(col("lon"), -180.0, 360.0)
        Geohash.base32(shiftright(
          graft.sources.Layout.mortonCode(q, p), 10), 4)
      })
      .withColumn("point_box", Geohash.geohashesInBox(
        col("lat"), col("lat"), col("lon"), col("lon"), 4))
      .withColumn("cover", Geohash.geohashesInBox(
        col("lat") - lit(0.4), col("lat") + lit(0.4),
        col("lon") - lit(0.4), col("lon") + lit(0.4), 4))
    val rows = df.select("lat", "lon", "own", "point_box", "cover")
      .as[(Double, Double, String, String, String)].collect()
    for ((lat, lon, own, pointBox, cover) <- rows) {
      assert(pointBox === own, s"degenerate box at ($lat,$lon)")
      val cells = cover.split(",").toSeq
      assert(cells.contains(own))
      assert(cells === cells.sorted && cells.distinct.size === cells.size)
      // every hash of a dense in-box sample appears in the cover
      val samples = for (dy <- -4 to 4; dx <- -4 to 4)
        yield scalarGeohash(lat + dy * 0.099, lon + dx * 0.099, 4)
      assert(samples.toSet.subsetOf(cells.toSet),
        s"missing ${samples.toSet -- cells.toSet} at ($lat,$lon)")
    }
  }

  test("F18 decode: cell center is within a half-cell of the input and re-encodes to the same hash") {
    val pts = Seq((57.64911, 10.40744), (37.7749, -122.4194),
      (-33.8688, 151.2093), (0.001, 0.001))
    val got = encodeDf(pts)
      .withColumn("gh6", Geohash.base32(col("__code"), 6))
      .withColumn("__dcode", Geohash.codeOf(col("gh6"), 6))
      .withColumn("__dlat", Geohash.compactEven(col("__dcode")))
      .withColumn("__dlon", Geohash.compactEven(shiftright(col("__dcode"), 1)))
      .select(col("lat"), col("lon"), col("gh6"),
        Geohash.cellCenter(col("__dlat"), 15, -90.0, 180.0).as("dlat"),
        Geohash.cellCenter(col("__dlon"), 15, -180.0, 360.0).as("dlon"))
      .as[(Double, Double, String, Double, Double)].collect()
    val halfLat = 180.0 / 32768.0 / 2
    val halfLon = 360.0 / 32768.0 / 2
    for ((lat, lon, gh6, dlat, dlon) <- got) {
      assert(math.abs(dlat - lat) <= halfLat + 1e-6, s"lat $lat -> $dlat")
      assert(math.abs(dlon - lon) <= halfLon + 1e-6, s"lon $lon -> $dlon")
      // the center lies strictly inside its own cell → same hash
      assert(scalarGeohash(dlat, dlon, 6) === gh6)
    }
  }
}
