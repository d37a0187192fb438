package graft.queries

import graft.Tables.table
import graft.operators.AsOfJoin
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join queries (SURVEY.md §2.3 J1-J7).
  *
  * Strategy notes (verified via explain in JoinQueriesSpec):
  *  - J1 broadcasts the dimension side explicitly — at 100 TB the fact
  *    side never shuffles for a small-dim join.
  *  - J2 is the shuffle-join shape: both sides hash-partition on the
  *    key; AQE coalesces post-shuffle partitions at runtime.
  *  - J5 range join deliberately broadcasts the band table (nested-loop
  *    with a broadcast side, NOT a cross product of two big inputs).
  *  - J6 as-of uses the union+running-window formulation (one shuffle,
  *    no L×R blowup) — see AsOfJoin scaladoc.
  */
object JoinQueries {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // J1: fact × broadcast dims (orders ⋈ customer ⋈ nation)
    "q_join_broadcast" -> ((s, d) => {
      table(s, d, "orders")
        .join(broadcast(table(s, d, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(table(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))
        .orderBy(col("n_name"), col("c_mktsegment"))
    }),

    // J2: fact × fact shuffle join (lineitem ⋈ orders)
    "q_join_smj" -> ((s, d) => {
      val disc = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(5,4)") - col("l_discount").cast("decimal(5,4)"))
      table(s, d, "lineitem")
        .join(table(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          // re-quantize to scale 4 before the double cast (exact,
          // engine-agnostic conversion — see AggQueries q1_agg)
          round(sum(disc), 4).cast("double").as("revenue"))
        .orderBy(col("o_orderpriority"))
    }),

    // J3: left outer — customers with their (possibly zero) orders
    "q_join_left" -> ((s, d) => {
      table(s, d, "customer")
        .join(table(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          coalesce(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), lit(0.0)).as("spent"))
        .orderBy(col("c_custkey"))
    }),

    // J3b: FULL OUTER — the reconciliation join (rows on either side
    // without a partner surface as nulls); customers×a filtered order
    // slice so both null arms are populated
    "q_join_full" -> ((s, d) => {
      val c = table(s, d, "customer")
        .filter(col("c_custkey") % 3 === 0)
        .select(col("c_custkey"), col("c_mktsegment"))
      val o = table(s, d, "orders")
        .filter(col("o_totalprice") > 400000.0)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      c.join(o, c("c_custkey") === o("o_custkey"), "full")
        .select(col("c_custkey"), col("c_mktsegment"),
          col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
        .orderBy(col("c_custkey").asc_nulls_last, col("o_orderkey").asc_nulls_last)
    }),

    // J4a: left semi — customers having a very big order (EXISTS)
    "q_join_semi" -> ((s, d) => {
      table(s, d, "customer")
        .join(table(s, d, "orders").filter(col("o_totalprice") > 480000.0),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // J4b: left anti — customers with no order above the threshold
    // (NOT EXISTS; every customer has SOME order in this data)
    "q_join_anti" -> ((s, d) => {
      table(s, d, "customer")
        .join(table(s, d, "orders").filter(col("o_totalprice") > 450000.0),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // J5: theta/range join — price-band classification of parts
    "q_join_range" -> ((s, d) => {
      val bands = s.createDataFrame(Seq(
        (0.0, 925.0, "low"), (925.0, 960.0, "mid"), (960.0, 1e9, "high")))
        .toDF("lo", "hi", "band")
      table(s, d, "part")
        .join(broadcast(bands),
          col("p_retailprice") >= col("lo") && col("p_retailprice") < col("hi"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n"),
          sum(col("p_retailprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
        .orderBy(col("band"))
    }),

    // J5b: interval OVERLAP join — 2 h view windows × 3 h purchase
    // windows over a 1/10 user subset (bounded but non-degenerate at
    // every SF); bucketized equi-join, never a nested loop
    "q_join_interval" -> ((s, d) => {
      val ev = table(s, d, "events")
        .withColumn("ep", graft.Tables.epochSeconds(col("ts")))
        .filter(col("user_id") % 10 === 0)
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id").as("lid"), col("ep").as("ls"),
          (col("ep") + 7200L).as("le"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("rid"), col("ep").as("rs"),
          (col("ep") + 10800L).as("re"))
      graft.operators.IntervalJoin.overlapJoin(
        views, purchases, col("ls"), col("le"), col("rs"), col("re"),
        bucketWidth = 7200L)
        .select(col("lid"), col("rid"),
          (least(col("le"), col("re")) - greatest(col("ls"), col("rs")))
            .as("overlap_s"))
        .orderBy(col("lid"), col("rid"))
    }),

    // J5c: point-in-range join — order totals classified into 100
    // OVERLAPPING price tiers ([k·2000, k·2000 + 2500): adjacent
    // tiers share a 500-wide band, so boundary orders land in two);
    // bucketized equi-join, each point in exactly one bucket
    "q_join_point_range" -> ((s, d) => {
      val pts = table(s, d, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
      val tiers = s.range(0, 100).select(col("id").as("tier"),
        (col("id") * 2000).cast("double").as("lo"),
        (col("id") * 2000 + 2500).cast("double").as("hi"))
      graft.operators.IntervalJoin.pointInRangeJoin(
        pts, col("o_totalprice"), tiers, col("lo"), col("hi"),
        bucketWidth = 2500.0)
        .select(col("o_orderkey"), col("tier"))
        .orderBy(col("o_orderkey"), col("tier"))
    }),

    // J5c keyed: per-TENANT range classification — each order is
    // classified only against the tier table of ITS priority class
    // (50 overlapping tiers per class, bounds shifted 500 per class,
    // so cross-class bounds disagree and a key leak would change the
    // answer). The join hash-partitions on (key, bucket): per-key
    // parallelism multiplies the bucket count and foreign-key ranges
    // never collide in a bucket
    "q_join_point_range_keyed" -> ((s, d) => {
      val pts = table(s, d, "orders").select(col("o_orderkey"),
        substring(col("o_orderpriority"), 1, 1).cast("int").as("pnum"),
        col("o_totalprice"))
      val tiers = s.range(0, 250).select(
        (col("id") % 5 + 1).cast("int").as("rnum"),
        floor(col("id") / 5).as("tier"))
        .select(col("rnum"), col("tier"),
          (col("tier") * 4000 + (col("rnum") - 1) * 500)
            .cast("double").as("lo"),
          (col("tier") * 4000 + (col("rnum") - 1) * 500 + 5000)
            .cast("double").as("hi"))
      graft.operators.IntervalJoin.pointInRangeJoin(
        pts, col("o_totalprice"), tiers, col("lo"), col("hi"),
        bucketWidth = 5000.0, keys = Seq("pnum" -> "rnum"))
        .select(col("o_orderkey"), col("tier"))
        .orderBy(col("o_orderkey"), col("tier"))
    }),

    // J6: as-of join — for each purchase, the latest click of the same
    // user at or before the purchase time (union + running-window form)
    // J6e: as-of with TOLERANCE (pandas merge_asof tolerance=1h) —
    // the nearest-preceding match counts only within the horizon;
    // stale matches fall to null but the LEFT ROW survives (outer
    // semantics). Same one-shuffle union+window plan; the tolerance
    // is a post-projection on the carried match time
    "q_join_asof_tol" -> ((s, d) => {
      val ev = table(s, d, "events")
        .withColumn("ep", graft.Tables.epochSeconds(col("ts")))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("pid"), col("user_id"), col("ep").as("pep"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("cid"), col("user_id"), col("ep").as("cep"))
      AsOfJoin.asofJoin(
        left = purchases, right = clicks, key = "user_id",
        leftTime = col("pep"), rightTime = col("cep"),
        rightTiebreak = col("cid"), rightPayload = Seq("cid", "cep"))
        .withColumn("gap", col("pep") - col("asof.cep").cast("long"))
        .select(col("pid"), col("user_id"),
          when(col("gap") <= 3600L, col("asof.cid").cast("long")).as("cid"),
          when(col("gap") <= 3600L, col("gap")).as("gap_s"))
        .orderBy(col("pid"))
    }),

    "q_join_asof" -> ((s, d) => {
      val ev = table(s, d, "events")
        .withColumn("ep", graft.Tables.epochSeconds(col("ts")))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("pid"), col("user_id"), col("ep").as("pep"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("cid"), col("user_id"), col("ep").as("cep"))
      AsOfJoin.asofJoin(
        left = purchases, right = clicks, key = "user_id",
        leftTime = col("pep"), rightTime = col("cep"),
        rightTiebreak = col("cid"), rightPayload = Seq("cid", "cep"))
        .filter(col("asof").isNotNull)
        .select(col("pid"), col("user_id"),
          col("asof.cid").cast("long").as("cid"),
          (col("pep") - col("asof.cep").cast("long")).as("gap_s"))
        .orderBy(col("pid"))
    }),

    // J6b: forward as-of — for each purchase, the EARLIEST click of
    // the same user at or after the purchase time (ClickHouse ASOF's
    // >= arm; same union + running-window plan walking time descending)
    "q_join_asof_fwd" -> ((s, d) => {
      val ev = table(s, d, "events")
        .withColumn("ep", graft.Tables.epochSeconds(col("ts")))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("pid"), col("user_id"), col("ep").as("pep"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("cid"), col("user_id"), col("ep").as("cep"))
      AsOfJoin.asofJoin(
        left = purchases, right = clicks, key = "user_id",
        leftTime = col("pep"), rightTime = col("cep"),
        rightTiebreak = col("cid"), rightPayload = Seq("cid", "cep"),
        direction = "forward")
        .filter(col("asof").isNotNull)
        .select(col("pid"), col("user_id"),
          col("asof.cid").cast("long").as("cid"),
          (col("asof.cep").cast("long") - col("pep")).as("gap_s"))
        .orderBy(col("pid"))
    }),

    // J6c: strict backward as-of — the < arm: an equal-time click no
    // longer matches its purchase (side-ordering flip, same plan)
    "q_join_asof_strict" -> ((s, d) => {
      val ev = table(s, d, "events")
        .withColumn("ep", graft.Tables.epochSeconds(col("ts")))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("pid"), col("user_id"), col("ep").as("pep"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("cid"), col("user_id"), col("ep").as("cep"))
      AsOfJoin.asofJoin(
        left = purchases, right = clicks, key = "user_id",
        leftTime = col("pep"), rightTime = col("cep"),
        rightTiebreak = col("cid"), rightPayload = Seq("cid", "cep"),
        direction = "backward", strict = true)
        .filter(col("asof").isNotNull)
        .select(col("pid"), col("user_id"),
          col("asof.cid").cast("long").as("cid"),
          (col("pep") - col("asof.cep").cast("long")).as("gap_s"))
        .orderBy(col("pid"))
    }),

    // J6d: nearest as-of — for each purchase, the click of the same
    // user closest in absolute time, either direction; equidistant
    // tie → the backward (at-or-before) click. Single union + one
    // sort + two window frames; from_past marks the chosen side
    "q_join_asof_near" -> ((s, d) => {
      val ev = table(s, d, "events")
        .withColumn("ep", graft.Tables.epochSeconds(col("ts")))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("pid"), col("user_id"), col("ep").as("pep"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("cid"), col("user_id"), col("ep").as("cep"))
      AsOfJoin.asofJoinNearest(
        left = purchases, right = clicks, key = "user_id",
        leftTime = col("pep"), rightTime = col("cep"),
        rightTiebreak = col("cid"), rightPayload = Seq("cid", "cep"),
        rightTimeField = "cep")
        .filter(col("asof").isNotNull)
        .select(col("pid"), col("user_id"),
          col("asof.cid").cast("long").as("cid"),
          abs(col("pep") - col("asof.cep").cast("long")).as("gap_s"),
          (col("asof.cep").cast("long") <= col("pep")).as("from_past"))
        .orderBy(col("pid"))
    }),

    // J2b: TPC-H Q3 shape — filter both fact sides, join, aggregate,
    // global top-k (TakeOrderedAndProject over the aggregate)
    // J9: Bloom-pruned equi-join — one selective month of orders
    // (~1% of the table) joined to lineitem; the bitmap probe drops
    // non-matching lineitem rows inside the scan, before the join's
    // exchange. Bit-identical to the plain join (no false negatives);
    // the oracle IS the plain join
    "q_join_bloom" -> ((s, d) => {
      val disc = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(5,4)") - col("l_discount").cast("decimal(5,4)"))
      val orders = table(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1997-03-01") &&
          col("o_orderdate") < lit("1997-04-01"))
        .select(col("o_orderkey"), col("o_orderpriority"))
      val li = table(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      graft.operators.BloomJoin.prunedEquiJoin(
        li, orders, "l_orderkey", "o_orderkey")
        .groupBy(col("o_orderkey"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"),
          round(sum(disc), 4).cast("double").as("revenue"))
        .orderBy(col("o_orderkey"))
    }),

    "q_join_q3" -> ((s, d) => {
      val disc = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(5,4)") - col("l_discount").cast("decimal(5,4)"))
      table(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
        .join(table(s, d, "orders").filter(col("o_orderdate") < lit("1995-03-15")),
          col("c_custkey") === col("o_custkey"))
        .join(table(s, d, "lineitem").filter(col("l_shipdate") > lit("1995-03-15")),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("o_date"), col("o_orderpriority"))
        .agg(round(sum(disc), 4).cast("double").as("revenue"))
        .select(col("l_orderkey"), col("revenue"),
          date_format(col("o_date"), "yyyy-MM-dd").as("o_orderdate"), col("o_orderpriority"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // J1b/J2c: TPC-H Q5 shape — 6-table star+snowflake join (two
    // broadcast dims, three shuffle joins) with a correlated
    // supplier-nation = customer-nation predicate
    "q_join_q5" -> ((s, d) => {
      val disc = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(5,4)") - col("l_discount").cast("decimal(5,4)"))
      table(s, d, "customer")
        .join(table(s, d, "orders"), col("c_custkey") === col("o_custkey"))
        .join(table(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .join(table(s, d, "supplier"),
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(table(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(table(s, d, "region")).filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(disc), 4).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // J7: cross join — small dim × small dim
    "q_join_cross" -> ((s, d) => {
      table(s, d, "region").select(col("r_name"))
        .crossJoin(table(s, d, "customer").select(col("c_mktsegment")).distinct())
        .orderBy(col("r_name"), col("c_mktsegment"))
    }),

    // J2d: salted skew join (operators.SkewJoin) — the hot-key
    // mitigation, oracle-gated end-to-end. A deterministic event_id
    // rule collapses ~80% of events onto one hot user (the skew a
    // plain shuffle join straggles on: one reducer owns the hot key's
    // entire mass); the per-user dim derives from the same events
    // table; saltedJoin spreads the hot key over 8 (key, salt)
    // reducers by replicating the SMALL side 8×. Salting is
    // semantics-preserving, so the oracle below is the PLAIN join —
    // a green row proves the salted plan computes exactly the
    // un-salted result. Plan shape (Generate-replicated small side,
    // __salt in the join keys) asserted in PlanSpec.
    "q_join_skew" -> ((s, d) => {
      val ev = table(s, d, "events")
      val hot = when(col("event_id") % 10 < 8, lit(0L)).otherwise(col("user_id"))
      val large = ev.select(hot.as("u"), col("value"))
      val dim = ev.groupBy(col("user_id").as("u"))
        .agg(count(lit(1)).as("user_events"))
      graft.operators.SkewJoin.saltedJoin(large, dim, "u", salts = 8)
        .groupBy(col("u"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value").cast("decimal(18,6)")), 4).cast("double").as("sum_value"),
          max(col("user_events")).as("user_events"))
        .orderBy(col("u"))
    }))

  val oracles: Map[String, String] = Map(
    "q_join_broadcast" ->
      """SELECT n_name, c_mktsegment, COUNT(*) AS n,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         FROM orders JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name, c_mktsegment ORDER BY n_name, c_mktsegment""",
    "q_join_smj" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
         CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4)))), 4) AS DOUBLE) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q_join_left" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
         COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS spent
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey ORDER BY c_custkey""",
    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
           WHERE o_custkey = c_custkey AND o_totalprice > 480000.0)
         ORDER BY c_custkey""",
    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
           WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)
         ORDER BY c_custkey""",
    "q_join_range" ->
      """SELECT band, COUNT(*) AS n,
         CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
         FROM part JOIN (VALUES (0.0, 925.0, 'low'), (925.0, 960.0, 'mid'),
           (960.0, 1000000000.0, 'high')) b(lo, hi, band)
         ON p_retailprice >= lo AND p_retailprice < hi
         GROUP BY band ORDER BY band""",
    // J5b: the oracle is the raw theta join the bucketized plan must
    // reproduce exactly (fine at oracle scale, quadratic at 100 TB)
    "q_join_interval" ->
      """WITH e AS (SELECT event_id, event_type,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ep
           FROM events WHERE user_id % 10 = 0),
         v AS (SELECT event_id AS lid, ep AS ls, ep + 7200 AS le
           FROM e WHERE event_type = 'view'),
         p AS (SELECT event_id AS rid, ep AS rs, ep + 10800 AS re
           FROM e WHERE event_type = 'purchase')
         SELECT lid, rid, least(le, re) - greatest(ls, rs) AS overlap_s
         FROM v JOIN p ON ls <= re AND rs <= le
         ORDER BY lid, rid""",
    // J5c: the oracle is again the raw theta join; tier bounds are
    // exact small integers, the comparison is double-vs-double
    "q_join_point_range" ->
      """SELECT o_orderkey, tier
         FROM orders JOIN (
           SELECT CAST(i AS BIGINT) AS tier,
             CAST(i * 2000 AS DOUBLE) AS lo,
             CAST(i * 2000 + 2500 AS DOUBLE) AS hi
           FROM range(0, 100) t(i)) b
         ON o_totalprice >= lo AND o_totalprice < hi
         ORDER BY o_orderkey, tier""",
    // J5c keyed: the raw theta+key join the keyed bucketized plan
    // must reproduce; the class key is the priority's numeric prefix
    "q_join_point_range_keyed" ->
      """SELECT o_orderkey, tier
         FROM orders JOIN (
           SELECT CAST(i % 5 + 1 AS INT) AS rnum,
             CAST(i // 5 AS BIGINT) AS tier,
             CAST((i // 5) * 4000 + (i % 5) * 500 AS DOUBLE) AS lo,
             CAST((i // 5) * 4000 + (i % 5) * 500 + 5000 AS DOUBLE) AS hi
           FROM range(0, 250) t(i)) b
         ON CAST(substring(o_orderpriority, 1, 1) AS INT) = rnum
           AND o_totalprice >= lo AND o_totalprice < hi
         ORDER BY o_orderkey, tier""",
    // J6e: LEFT join keeps every purchase; the tolerance CASE mirrors
    // the Spark projection exactly
    "q_join_asof_tol" ->
      """WITH p AS (SELECT event_id AS pid, user_id,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS pep
           FROM events WHERE event_type = 'purchase'),
         c AS (SELECT event_id AS cid, user_id,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS cep
           FROM events WHERE event_type = 'click'),
         m AS (SELECT pid, user_id, cid, pep, cep FROM (
           SELECT p.pid, p.user_id, c.cid, p.pep, c.cep,
             row_number() OVER (PARTITION BY p.pid ORDER BY c.cep DESC, c.cid DESC) AS rn
           FROM p LEFT JOIN c ON p.user_id = c.user_id AND c.cep <= p.pep)
           WHERE rn = 1)
         SELECT pid, user_id,
           CASE WHEN pep - cep <= 3600 THEN cid END AS cid,
           CASE WHEN pep - cep <= 3600 THEN pep - cep END AS gap_s
         FROM m ORDER BY pid""",
    "q_join_asof" ->
      """WITH p AS (SELECT event_id AS pid, user_id,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS pep
           FROM events WHERE event_type = 'purchase'),
         c AS (SELECT event_id AS cid, user_id,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS cep
           FROM events WHERE event_type = 'click')
         SELECT pid, user_id, cid, pep - cep AS gap_s FROM (
           SELECT p.pid, p.user_id, c.cid, p.pep, c.cep,
             row_number() OVER (PARTITION BY p.pid ORDER BY c.cep DESC, c.cid DESC) AS rn
           FROM p JOIN c ON p.user_id = c.user_id AND c.cep <= p.pep)
         WHERE rn = 1 ORDER BY pid""",
    "q_join_asof_fwd" ->
      """WITH p AS (SELECT event_id AS pid, user_id,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS pep
           FROM events WHERE event_type = 'purchase'),
         c AS (SELECT event_id AS cid, user_id,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS cep
           FROM events WHERE event_type = 'click')
         SELECT pid, user_id, cid, cep - pep AS gap_s FROM (
           SELECT p.pid, p.user_id, c.cid, p.pep, c.cep,
             row_number() OVER (PARTITION BY p.pid ORDER BY c.cep ASC, c.cid ASC) AS rn
           FROM p JOIN c ON p.user_id = c.user_id AND c.cep >= p.pep)
         WHERE rn = 1 ORDER BY pid""",
    "q_join_asof_strict" ->
      """WITH p AS (SELECT event_id AS pid, user_id,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS pep
           FROM events WHERE event_type = 'purchase'),
         c AS (SELECT event_id AS cid, user_id,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS cep
           FROM events WHERE event_type = 'click')
         SELECT pid, user_id, cid, pep - cep AS gap_s FROM (
           SELECT p.pid, p.user_id, c.cid, p.pep, c.cep,
             row_number() OVER (PARTITION BY p.pid ORDER BY c.cep DESC, c.cid DESC) AS rn
           FROM p JOIN c ON p.user_id = c.user_id AND c.cep < p.pep)
         WHERE rn = 1 ORDER BY pid""",
    // J6d: the candidate set is unconstrained (both directions); rank
    // by absolute gap, then side (backward first), then the side's
    // mirror tiebreak — backward max cid, forward min cid
    "q_join_asof_near" ->
      """WITH p AS (SELECT event_id AS pid, user_id,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS pep
           FROM events WHERE event_type = 'purchase'),
         c AS (SELECT event_id AS cid, user_id,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS cep
           FROM events WHERE event_type = 'click')
         SELECT pid, user_id, cid, abs(cep - pep) AS gap_s,
           cep <= pep AS from_past
         FROM (
           SELECT p.pid, p.user_id, c.cid, p.pep, c.cep,
             row_number() OVER (PARTITION BY p.pid ORDER BY
               abs(c.cep - p.pep) ASC,
               CASE WHEN c.cep <= p.pep THEN 0 ELSE 1 END ASC,
               CASE WHEN c.cep <= p.pep THEN c.cid END DESC NULLS LAST,
               c.cid ASC) AS rn
           FROM p JOIN c ON p.user_id = c.user_id)
         WHERE rn = 1 ORDER BY pid""",
    // J3b: DuckDB default nulls-last on ASC matches the Spark side's
    // explicit asc_nulls_last
    "q_join_full" ->
      """SELECT c_custkey, c_mktsegment, o_orderkey,
         round(o_totalprice, 2) AS price
         FROM (SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 3 = 0) c
         FULL OUTER JOIN (SELECT o_custkey, o_orderkey, o_totalprice FROM orders
           WHERE o_totalprice > 400000.0) o
         ON c.c_custkey = o.o_custkey
         ORDER BY c_custkey ASC NULLS LAST, o_orderkey ASC NULLS LAST""",
    // J9: the oracle is the PLAIN join — the Bloom prune must be
    // invisible in the result
    "q_join_bloom" ->
      """SELECT o_orderkey, o_orderpriority, COUNT(*) AS n_lines,
         CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4)))), 4) AS DOUBLE) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE o_orderdate >= TIMESTAMP '1997-03-01'
           AND o_orderdate < TIMESTAMP '1997-04-01'
         GROUP BY o_orderkey, o_orderpriority
         ORDER BY o_orderkey""",
    "q_join_q3" ->
      """SELECT l_orderkey,
         CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4)))), 4) AS DOUBLE) AS revenue,
         strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS o_orderdate, o_orderpriority
         FROM customer JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1995-03-15'
           AND l_shipdate > TIMESTAMP '1995-03-15'
         GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
         ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "q_join_q5" ->
      """SELECT n_name,
         CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4)))), 4) AS DOUBLE) AS revenue
         FROM customer JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
         GROUP BY n_name ORDER BY revenue DESC, n_name""",
    "q_join_cross" ->
      """SELECT r_name, c_mktsegment FROM region
         CROSS JOIN (SELECT DISTINCT c_mktsegment FROM customer) segs
         ORDER BY r_name, c_mktsegment""",
    "q_join_skew" ->
      """WITH l AS (SELECT CASE WHEN event_id % 10 < 8 THEN 0 ELSE user_id END AS u, value
           FROM events),
         dm AS (SELECT user_id AS u, COUNT(*) AS user_events FROM events GROUP BY user_id)
         SELECT l.u, COUNT(*) AS n,
           CAST(round(SUM(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value,
           MAX(user_events) AS user_events
         FROM l JOIN dm ON l.u = dm.u
         GROUP BY l.u ORDER BY l.u""")
}
