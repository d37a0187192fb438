package graft.queries

import graft.Tables.table
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scan / projection / filter / scalar-function queries
  * (SURVEY.md §2.1 S3, §2.2 P7/P8, §2.8 F4-F15).
  *
  * Determinism contract shared by every query in the registry (O3):
  * total ORDER BY, integer outputs cast to BIGINT, doubles rounded,
  * timestamps emitted as formatted strings after second-truncation
  * (events.ts carries sub-microsecond parts that Spark truncates to
  * micros while DuckDB keeps nanos — truncating to seconds in both
  * engines removes the divergence).
  */
object CoreQueries {

  private def tsStr(c: org.apache.spark.sql.Column) =
    date_format(c, "yyyy-MM-dd HH:mm:ss")
  private def tsSec = graft.Tables.tsSeconds(col("ts"))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S3/P7: projection + filter pushed to the parquet scan
    // (verified in CoreQueriesSpec via explain: PushedFilters + pruned ReadSchema)
    "q_scan_project" -> ((s, d) => {
      table(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-03-01") && col("l_shipdate") < lit("1997-04-01"))
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          round(col("l_extendedprice"), 2).as("price"), col("l_returnflag"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // P8: predicate filter over events
    "q_filter_events" -> ((s, d) => {
      table(s, d, "events")
        .filter(col("event_type") === "purchase" && col("value") > 100.0)
        .select(col("event_id"), col("user_id"),
          round(col("value"), 2).as("val"),
          tsStr(tsSec).as("ts_s"))
        .orderBy(col("event_id"))
    }),

    // F17: geo scalar family — haversine distance to a literal
    // reference point + ray-cast point-in-polygon against GeoPoly.
    // Coordinates are synthesized on the exact 0.1-degree grid from
    // integer ids, so every comparison input is bit-identical across
    // engines; the oracle's trees are GENERATED from the same
    // literals (GeoFns.*Sql)
    "q_geo" -> ((s, d) => {
      import graft.functions.GeoFns
      val lat = (pmod(col("user_id"), lit(1200L)).cast("double") /
        lit(10.0)) - lit(60.0)
      val lon = (pmod(col("event_id"), lit(3600L)).cast("double") /
        lit(10.0)) - lit(180.0)
      table(s, d, "events")
        .select(col("event_id"), lat.as("lat"), lon.as("lon"))
        .withColumn("dist_m", round(GeoFns.greatCircleDistance(
          col("lat"), col("lon"), lit(GeoRefLat), lit(GeoRefLon)), 3))
        .withColumn("in_poly", GeoFns.pointInPolygon(
          col("lat"), col("lon"), GeoPoly))
        .orderBy(col("event_id"))
    }),

    // F18: geohash encode + decode on the same exact coordinate
    // grid — quantize ONCE at 15 bits/dim, Morton-interleave with
    // Layout's spread-bits, base-32 render at precisions 6/4/2 (the
    // coarser codes are right-shifts of the same interleave, hence
    // true prefixes), then decode the gh6 STRING back through the
    // ascii CASE + inverse-mask compact to the cell center. Staged
    // withColumns keep codegen linear (each bit stage references its
    // input twice — inlining would double the tree per stage)
    "q_geohash" -> ((s, d) => {
      import graft.functions.Geohash
      val lat = (pmod(col("user_id"), lit(1200L)).cast("double") /
        lit(10.0)) - lit(60.0)
      val lon = (pmod(col("event_id"), lit(3600L)).cast("double") /
        lit(10.0)) - lit(180.0)
      table(s, d, "events")
        .select(col("event_id"), lat.as("lat"), lon.as("lon"))
        .withColumn("__qlat", Geohash.quantize15(col("lat"), -90.0, 180.0))
        .withColumn("__qlon", Geohash.quantize15(col("lon"), -180.0, 360.0))
        // geohash's first (most significant) bit is a LONGITUDE bit:
        // lon rides the odd positions (mortonCode's y), lat the even
        .withColumn("__code",
          graft.sources.Layout.mortonCode(col("__qlat"), col("__qlon")))
        .withColumn("gh6", Geohash.base32(col("__code"), 6))
        .withColumn("gh4", Geohash.base32(shiftright(col("__code"), 10), 4))
        .withColumn("gh2", Geohash.base32(shiftright(col("__code"), 20), 2))
        .withColumn("__dcode", Geohash.codeOf(col("gh6"), 6))
        .withColumn("__dlat", Geohash.compactEven(col("__dcode")))
        .withColumn("__dlon",
          Geohash.compactEven(shiftright(col("__dcode"), 1)))
        .select(col("event_id"), col("lat"), col("lon"),
          col("gh2"), col("gh4"), col("gh6"),
          Geohash.cellCenter(col("__dlat"), 15, -90.0, 180.0).as("dec_lat"),
          Geohash.cellCenter(col("__dlon"), 15, -180.0, 360.0).as("dec_lon"))
        .orderBy(col("event_id"))
    }),

    // F18c: geohashesInBox — the covering gh4 set of a ±0.3° box
    // around each point, entirely map-side (nested sequence
    // transforms, no explode/shuffle), emitted as the sorted joined
    // string per the flat-scalar gate contract
    "q_geohash_box" -> ((s, d) => {
      import graft.functions.Geohash
      val lat = (pmod(col("user_id"), lit(1200L)).cast("double") /
        lit(10.0)) - lit(60.0)
      val lon = (pmod(col("event_id"), lit(3600L)).cast("double") /
        lit(10.0)) - lit(180.0)
      table(s, d, "events")
        .select(col("event_id"), lat.as("lat"), lon.as("lon"))
        .withColumn("cells", Geohash.geohashesInBox(
          col("lat") - lit(0.3), col("lat") + lit(0.3),
          col("lon") - lit(0.3), col("lon") + lit(0.3), precision = 4))
        .select(col("event_id"),
          size(split(col("cells"), ",")).cast("long").as("n_cells"),
          col("cells"))
        .orderBy(col("event_id"))
    }),

    // J10: banded geo radius join — every (user point, poi) pair
    // within 1000 km, via the wrap-safe cell stencil + exact haversine
    // verify; the oracle BRUTE-FORCES the cross join, so any dropped
    // band collision fails the row count
    "q_geo_join" -> ((s, d) => {
      val users = table(s, d, "events")
        .select(col("user_id")).distinct()
        .select(col("user_id"),
          ((pmod(col("user_id"), lit(1200L)).cast("double") / lit(10.0)) -
            lit(60.0)).as("lat"),
          ((pmod(col("user_id") * lit(7L), lit(3600L)).cast("double") /
            lit(10.0)) - lit(180.0)).as("lon"))
      val pois = table(s, d, "embeddings")
        .select(col("vec_id"),
          ((pmod(col("vec_id") * lit(37L), lit(1100L)).cast("double") /
            lit(10.0)) - lit(55.0)).as("plat"),
          ((pmod(col("vec_id") * lit(53L), lit(3500L)).cast("double") /
            lit(10.0)) - lit(175.0)).as("plon"))
      graft.operators.GeoJoin.geoRadiusJoin(
        users, col("user_id"), col("lat"), col("lon"),
        pois, col("vec_id"), col("plat"), col("plon"),
        radiusM = 1000000.0)
        .orderBy(col("l_id"), col("r_id"))
    }),

    // F21: IPv4 scalar family — string↔num round trip (nulls on
    // malformed addresses) + literal-CIDR membership, all integer
    // shift/mask trees; one row in 13 carries an out-of-range octet
    // to exercise the guard
    "q_ipv4" -> ((s, d) => {
      import graft.functions.IpFns
      val ip = when(pmod(col("event_id"), lit(13L)) === 0,
        concat(lit("999."), pmod(col("user_id"), lit(256L)).cast("string"),
          lit(".1.2")))
        // concat with explicit '.' literals, NOT concat_ws (r20
        // ADVICE): concat_ws SKIPS null parts while the oracle's '||'
        // propagates NULL — same values on these fixtures (no null
        // ids), but the faces must share NULL semantics
        .otherwise(concat(
          lit(10L).cast("string"), lit("."),
          pmod(col("user_id"), lit(256L)).cast("string"), lit("."),
          pmod(expr("event_id div 256"), lit(256L)).cast("string"), lit("."),
          pmod(col("event_id"), lit(256L)).cast("string")))
      table(s, d, "events")
        .select(col("event_id"), ip.as("ip"))
        .withColumn("ip_num", IpFns.ipv4ToNum(col("ip")))
        .select(col("event_id"), col("ip"), col("ip_num"),
          IpFns.numToIpv4(col("ip_num")).as("round_trip"),
          IpFns.inCidr(col("ip_num"), "10.0.0.0/8").as("in_private"),
          IpFns.inCidr(col("ip_num"), "10.128.0.0/9").as("in_upper_half"))
        .orderBy(col("event_id"))
    }),

    // F1/F4/F6: string scalar suite
    "q_scalar_string" -> ((s, d) => {
      table(s, d, "customer")
        .select(col("c_custkey"),
          lower(col("c_name")).as("lname"),
          concat(lit("cust-"), col("c_name")).as("tagged"),
          (instr(col("c_name"), "1") > 0).as("has1"),
          substring(col("c_mktsegment"), 1, 3).as("seg3"),
          length(col("c_name")).cast("long").as("name_len"))
        .orderBy(col("c_custkey"))
    }),

    // F7/F8/F15: datetime scalar suite
    "q_scalar_datetime" -> ((s, d) => {
      table(s, d, "events")
        .select(col("event_id"),
          date_format(tsSec, "yyyy-MM-dd").as("day"),
          hour(tsSec).cast("long").as("hr"),
          graft.Tables.epochSeconds(col("ts")).as("epoch_s"),
          month(tsSec).cast("long").as("mon"))
        .orderBy(col("event_id"))
    }),

    // F13: JSON field extraction from the opaque props payload
    "q_json_extract" -> ((s, d) => {
      table(s, d, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy(col("event_id"))
    }),

    // F5: CSV split + trim + drop-empties (reference splitCSV,
    // /root/reference/cmd/root.go:174-182)
    "q_split_csv" -> ((s, d) => {
      val raw = concat(col("c_mktsegment"), lit(" , "), col("c_name"), lit(" ,, spare"))
      val parts = filter(transform(split(raw, ","), x => trim(x)), x => x =!= "")
      table(s, d, "customer")
        .select(col("c_custkey"),
          concat_ws("|", parts).as("joined"),
          size(parts).cast("long").as("n_parts"))
        .orderBy(col("c_custkey"))
    }),

    // F14: int parse with fallback (try_cast + coalesce)
    "q_try_cast" -> ((s, d) => {
      table(s, d, "events")
        .select(col("event_id"),
          expr("try_cast(event_type AS BIGINT)").as("bad_parse"),
          coalesce(expr("try_cast(get_json_object(props, '$.k') AS BIGINT)"), lit(-1L)).as("k_or_default"))
        .orderBy(col("event_id"))
    }),

    // L3: Z-order clustering key over (user_id, epoch-hour) — the
    // Morton interleave a z-ordered write sorts by so file min/max
    // stats prune on BOTH dimensions (Layout.zorder is the write
    // path; this registers the code itself value-level — pure
    // codegen'd integer shift/and/or, same expressions in the oracle)
    "q_zorder" -> ((s, d) => {
      val ev = table(s, d, "events")
        .select(col("event_id"), col("user_id"),
          expr("(ts div 1000000000) div 3600").as("hr"))
      val zsorted = graft.sources.Layout.zorder(
        ev, x = col("user_id"), y = col("hr"), tiebreak = col("event_id"))
      zsorted.select(col("event_id"), col("user_id"), col("hr"), col("zval"))
        .orderBy(col("zval"), col("event_id"))
    }),

    // L4: MergeTree TTL GROUP BY lifecycle — raw events for the last
    // 7 days, daily per-type rollup beyond, the cutoff pinned at the
    // table's max timestamp (one consistent asOf, how a TTL merge
    // materializes). Totals are policy-invariant: Σ n_rows and
    // Σ sum_v equal the raw table's (the TtlSpec law); the oracle
    // checks the full output value-level
    "q_ttl_rollup" -> ((s, d) => {
      val ev = table(s, d, "events")
        .withColumn("ep", graft.Tables.epochSeconds(col("ts")))
      val mx = ev.agg(max(col("ep")).as("__asof"))
      graft.operators.Ttl.rollup(
        ev.crossJoin(broadcast(mx)), Seq("event_type"), col("event_id"),
        col("ep"), col("value"),
        ttlSeconds = 7L * 86400, bucketSeconds = 86400L,
        asOf = col("__asof"))
        .select(col("event_type"), col("row_id"), col("ts"),
          col("n_rows"), col("sum_v").cast("string").as("sum_v"),
          col("min_v"), col("max_v"), col("is_rolled"))
        .orderBy(col("event_type"), col("ts"),
          coalesce(col("row_id"), lit(-1L)))
    }))

  /** F17 fixture constants: a reference point and an irregular
    * pentagon whose vertices sit OFF the synthesized 0.1-degree
    * coordinate grid (no boundary-equality hazard). Both the Spark
    * tree and the oracle SQL derive from these literals.
    */
  val GeoRefLat: Double = 37.7749
  val GeoRefLon: Double = -122.4194
  val GeoPoly: Seq[(Double, Double)] = Seq(
    (10.05, 10.05), (10.05, 49.95), (35.55, 75.05),
    (49.95, 49.95), (49.95, 10.05))

  val oracles: Map[String, String] = Map(
    // F17 oracle: trees generated from the SAME literals as the
    // Column builder — see GeoFns.greatCircleDistanceSql /
    // pointInPolygonSql
    "q_geo" -> {
      import graft.functions.GeoFns
      s"""WITH p AS (SELECT event_id,
           CAST(user_id % 1200 AS DOUBLE) / 10.0 - 60.0 AS lat,
           CAST(event_id % 3600 AS DOUBLE) / 10.0 - 180.0 AS lon
         FROM events)
         SELECT event_id, lat, lon,
           round(${GeoFns.greatCircleDistanceSql("lat", "lon",
             GeoRefLat.toString, GeoRefLon.toString)}, 3) AS dist_m,
           ${GeoFns.pointInPolygonSql("lat", "lon", GeoPoly)} AS in_poly
         FROM p ORDER BY event_id"""
    },
    // F18 oracle: the identical quantize → spread → interleave →
    // base32 → ascii-decode → compact pipeline as staged CTEs, every
    // fragment generated from the same mask/shift/alphabet literals
    // (Geohash.*Sql — the F17 generator discipline)
    "q_geohash" -> {
      import graft.functions.Geohash
      val spreadCtes = Geohash.spreadSqlStages("qlat", "ax")
        .zip(Geohash.spreadSqlStages("qlon", "ox")).zipWithIndex.map {
          case ((a, o), i) =>
            val src = if (i == 0) "q" else s"s${i - 1}"
            s"s$i AS (SELECT *, $a, $o FROM $src)"
        }.mkString(",\n         ")
      val compactCtes = Geohash.compactEvenSqlStages("dcode", "la")
        .zip(Geohash.compactEvenSqlStages("(dcode >> 1)", "lo")).zipWithIndex
        .map { case ((a, o), i) =>
          val src = if (i == 0) "dc" else s"c${i - 1}"
          s"c$i AS (SELECT *, $a, $o FROM $src)"
        }.mkString(",\n         ")
      s"""WITH p AS (SELECT event_id,
           CAST(user_id % 1200 AS DOUBLE) / 10.0 - 60.0 AS lat,
           CAST(event_id % 3600 AS DOUBLE) / 10.0 - 180.0 AS lon
         FROM events),
         q AS (SELECT *,
           ${Geohash.quantize15Sql("lat", -90.0, 180.0)} AS qlat,
           ${Geohash.quantize15Sql("lon", -180.0, 360.0)} AS qlon FROM p),
         $spreadCtes,
         z AS (SELECT *, (ax4 | (ox4 << 1)) AS code FROM s4),
         g AS (SELECT event_id, lat, lon,
           ${Geohash.base32Sql("code", 6)} AS gh6,
           ${Geohash.base32Sql("(code >> 10)", 4)} AS gh4,
           ${Geohash.base32Sql("(code >> 20)", 2)} AS gh2 FROM z),
         dc AS (SELECT *, ${Geohash.codeOfSql("gh6", 6)} AS dcode FROM g),
         $compactCtes
         SELECT event_id, lat, lon, gh2, gh4, gh6,
           ${Geohash.cellCenterSql("la4", 15, -90.0, 180.0)} AS dec_lat,
           ${Geohash.cellCenterSql("lo4", 15, -180.0, 360.0)} AS dec_lon
         FROM c4 ORDER BY event_id"""
    },
    // F21 oracle: identical synthesized addresses, identical octet
    // regex guard and shift/mask trees (IpFns.*Sql)
    "q_ipv4" -> {
      import graft.functions.IpFns
      s"""WITH u AS (SELECT event_id,
           CASE WHEN event_id % 13 = 0
             THEN '999.' || CAST(user_id % 256 AS VARCHAR) || '.1.2'
             ELSE '10.' || CAST(user_id % 256 AS VARCHAR) || '.'
               || CAST((event_id // 256) % 256 AS VARCHAR) || '.'
               || CAST(event_id % 256 AS VARCHAR)
           END AS ip
         FROM events),
         n AS (SELECT event_id, ip,
           ${IpFns.ipv4ToNumSql("ip")} AS ip_num
         FROM u)
         SELECT event_id, ip, ip_num,
           ${IpFns.numToIpv4Sql("ip_num")} AS round_trip,
           ${IpFns.inCidrSql("ip_num", "10.0.0.0/8")} AS in_private,
           ${IpFns.inCidrSql("ip_num", "10.128.0.0/9")} AS in_upper_half
         FROM n ORDER BY event_id"""
    },

    // F18c oracle: identical quantized corner ranges, the inline
    // spread/interleave over list lambdas, identical base-32 render
    "q_geohash_box" -> {
      import graft.functions.Geohash
      s"""WITH p AS (SELECT event_id,
           CAST(user_id % 1200 AS DOUBLE) / 10.0 - 60.0 AS lat,
           CAST(event_id % 3600 AS DOUBLE) / 10.0 - 180.0 AS lon
         FROM events),
         c AS (SELECT event_id,
           ${Geohash.geohashesInBoxSql("(lat - 0.3)", "(lat + 0.3)",
             "(lon - 0.3)", "(lon + 0.3)", 4)} AS cells
         FROM p)
         SELECT event_id,
           CAST(len(string_split(cells, ',')) AS BIGINT) AS n_cells,
           cells
         FROM c ORDER BY event_id"""
    },

    // J10 oracle: the BRUTE cross join over the identical point
    // derivations + the identical haversine tree — the banded join
    // must reproduce it exactly
    "q_geo_join" -> {
      import graft.functions.GeoFns
      s"""WITH l AS (SELECT DISTINCT user_id FROM events),
         lp AS (SELECT user_id AS l_id,
           CAST(user_id % 1200 AS DOUBLE) / 10.0 - 60.0 AS l_lat,
           CAST((user_id * 7) % 3600 AS DOUBLE) / 10.0 - 180.0 AS l_lon
         FROM l),
         rp AS (SELECT vec_id AS r_id,
           CAST((vec_id * 37) % 1100 AS DOUBLE) / 10.0 - 55.0 AS r_lat,
           CAST((vec_id * 53) % 3500 AS DOUBLE) / 10.0 - 175.0 AS r_lon
         FROM embeddings),
         d AS (SELECT l_id, r_id,
           ${GeoFns.greatCircleDistanceSql("l_lat", "l_lon", "r_lat", "r_lon")} AS dm
         FROM lp CROSS JOIN rp)
         SELECT l_id, r_id, round(dm, 3) AS dist_m
         FROM d WHERE dm <= 1000000.0
         ORDER BY l_id, r_id"""
    },

    // L4: both regimes written out — fresh rows as degenerate
    // aggregates of themselves, old rows as per-(type, day) groups;
    // sum_v rides the DECIMAL(28,6)->(38,6) exact-sum convention
    "q_ttl_rollup" ->
      """WITH t AS (SELECT event_type, event_id,
           CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ep, value
           FROM events),
         m AS (SELECT max(ep) AS mx FROM t),
         fresh AS (SELECT event_type, event_id AS row_id, ep AS ts,
             CAST(1 AS BIGINT) AS n_rows,
             CAST(CAST(CAST(value AS DECIMAL(28,6)) AS DECIMAL(38,6)) AS VARCHAR) AS sum_v,
             CAST(value AS DOUBLE) AS min_v, CAST(value AS DOUBLE) AS max_v,
             false AS is_rolled
           FROM t CROSS JOIN m WHERE ep + 604800 >= mx),
         old AS (SELECT event_type, CAST(NULL AS BIGINT) AS row_id,
             ep - ep % 86400 AS ts, count(*) AS n_rows,
             CAST(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DECIMAL(38,6)) AS VARCHAR) AS sum_v,
             min(CAST(value AS DOUBLE)) AS min_v,
             max(CAST(value AS DOUBLE)) AS max_v,
             true AS is_rolled
           FROM t CROSS JOIN m WHERE ep + 604800 < mx
           GROUP BY event_type, ep - ep % 86400)
         SELECT * FROM (SELECT * FROM fresh UNION ALL SELECT * FROM old)
         ORDER BY event_type, ts, coalesce(row_id, -1)""",
    // L3: identical integer arithmetic — `//` floor-div on nonneg
    // longs, the spread-bits mask chain, interleave via << and |
    "q_zorder" ->
      """WITH e AS (SELECT event_id, user_id,
           CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 3600 AS hr
           FROM events),
         b AS (SELECT min(user_id) AS xlo, max(user_id) AS xhi,
                      min(hr) AS ylo, max(hr) AS yhi FROM e),
         q AS (SELECT event_id, user_id, hr,
             ((user_id - xlo) * 65535) // greatest(xhi - xlo, 1) AS qx,
             ((hr - ylo) * 65535) // greatest(yhi - ylo, 1) AS qy
           FROM e CROSS JOIN b),
         s1 AS (SELECT *, (qx & 65535) AS ux1, (qy & 65535) AS uy1 FROM q),
         s2 AS (SELECT *, ((ux1 | (ux1 << 8)) & 16711935) AS ux2,
                          ((uy1 | (uy1 << 8)) & 16711935) AS uy2 FROM s1),
         s3 AS (SELECT *, ((ux2 | (ux2 << 4)) & 252645135) AS ux3,
                          ((uy2 | (uy2 << 4)) & 252645135) AS uy3 FROM s2),
         s4 AS (SELECT *, ((ux3 | (ux3 << 2)) & 858993459) AS ux4,
                          ((uy3 | (uy3 << 2)) & 858993459) AS uy4 FROM s3),
         s5 AS (SELECT *, ((ux4 | (ux4 << 1)) & 1431655765) AS sx,
                          ((uy4 | (uy4 << 1)) & 1431655765) AS sy FROM s4)
         SELECT event_id, user_id, hr, (sx | (sy << 1)) AS zval
         FROM s5 ORDER BY zval, event_id""",
    "q_scan_project" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
         round(l_extendedprice, 2) AS price, l_returnflag
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-03-01' AND l_shipdate < TIMESTAMP '1997-04-01'
         ORDER BY l_orderkey, l_linenumber""",
    "q_filter_events" ->
      """SELECT event_id, user_id, round(value, 2) AS val,
         strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S') AS ts_s
         FROM events WHERE event_type = 'purchase' AND value > 100.0
         ORDER BY event_id""",
    "q_scalar_string" ->
      """SELECT c_custkey, lower(c_name) AS lname, 'cust-' || c_name AS tagged,
         strpos(c_name, '1') > 0 AS has1, substr(c_mktsegment, 1, 3) AS seg3,
         CAST(length(c_name) AS BIGINT) AS name_len
         FROM customer ORDER BY c_custkey""",
    "q_scalar_datetime" ->
      """SELECT event_id, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         CAST(hour(ts) AS BIGINT) AS hr,
         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS epoch_s,
         CAST(month(ts) AS BIGINT) AS mon
         FROM events ORDER BY event_id""",
    "q_json_extract" ->
      """SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k
         FROM events ORDER BY event_id""",
    "q_split_csv" ->
      """WITH t AS (SELECT c_custkey,
           list_filter(list_transform(string_split(c_mktsegment || ' , ' || c_name || ' ,, spare', ','),
             x -> trim(x)), x -> x <> '') AS parts
         FROM customer)
         SELECT c_custkey, array_to_string(parts, '|') AS joined,
           CAST(len(parts) AS BIGINT) AS n_parts
         FROM t ORDER BY c_custkey""",
    "q_try_cast" ->
      """SELECT event_id, TRY_CAST(event_type AS BIGINT) AS bad_parse,
         COALESCE(TRY_CAST(props->>'$.k' AS BIGINT), -1) AS k_or_default
         FROM events ORDER BY event_id""")
}
