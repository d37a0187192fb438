package graft

import graft.operators.EventFunnels
import org.apache.spark.sql.functions._

/** W6/W7/W8 — ClickHouse-family windowFunnel + retention +
  * sequenceMatch/sequenceCount semantics on hand-built event sequences
  * (the registered q_funnel / q_retention / q_sequence_* carry the
  * value-level DuckDB oracles; these pin the corner cases).
  */
class EventFunnelsSpec extends SparkSpec {
  import spark.implicits._

  private def funnel(rows: Seq[(String, Long, String)], window: Long = 100L) =
    EventFunnels.windowFunnel(
      rows.toDF("u", "t", "a"), "u", col("t"), window,
      steps = Seq(col("a") === "s1", col("a") === "s2", col("a") === "s3"))
      .as[(String, Int)].collect().toMap

  test("windowFunnel: completed chain, out-of-order, window-expired, late entry") {
    val out = funnel(Seq(
      // A: full chain inside the window
      ("A", 10L, "s1"), ("A", 20L, "s2"), ("A", 30L, "s3"),
      // B: s2 BEFORE the first s1 — never counts toward a chain
      ("B", 10L, "s2"), ("B", 20L, "s1"),
      // C: s2 past t1 + window
      ("C", 10L, "s1"), ("C", 200L, "s2"),
      // D: enters at step 2 only — level 0 (first-touch anchors on s1)
      ("D", 10L, "s2"), ("D", 20L, "s3"),
      // E: s3 arrives before s2 — only 2 levels complete in order
      ("E", 10L, "s1"), ("E", 15L, "s3"), ("E", 20L, "s2")))
    assert(out === Map("A" -> 3, "B" -> 1, "C" -> 1, "D" -> 0, "E" -> 2))
  }

  test("windowFunnel: window anchors at the FIRST step-1 event; same-ts ties count") {
    // first-touch: the window runs from t=10 even though a second s1
    // at t=150 would have admitted the s2 at t=200
    val strict = funnel(Seq(
      ("A", 10L, "s1"), ("A", 150L, "s1"), ("A", 200L, "s2")))
    assert(strict === Map("A" -> 1))
    // non-strict comparisons: s2 at exactly t1 + window and s3 at the
    // same timestamp as s2 both count
    val ties = funnel(Seq(
      ("A", 10L, "s1"), ("A", 110L, "s2"), ("A", 110L, "s3")))
    assert(ties === Map("A" -> 3))
  }

  test("windowFunnel: an event matches its FIRST satisfied step condition") {
    val df = Seq(("A", 10L, 5.0), ("A", 20L, 5.0)).toDF("u", "t", "v")
    // both conditions true for every event: each event tags as step 1,
    // so step 2 never fires
    val out = EventFunnels.windowFunnel(df, "u", col("t"), 100L,
      steps = Seq(col("v") > 0, col("v") > 0))
      .as[(String, Int)].collect().toMap
    assert(out === Map("A" -> 1))
  }

  test("multiTag: overlapping step conditions serve EVERY satisfied step (ClickHouse parity)") {
    // both conditions true for every event: first-match stops at 1
    // (previous test); multiTag reaches 2 — and a SINGLE event
    // satisfying both steps chains through itself at its own
    // timestamp under the non-strict compare, exactly ClickHouse's
    // default (its strict_dedup mode exists to forbid this)
    val df = Seq(("A", 10L, 5.0), ("A", 20L, 5.0)).toDF("u", "t", "v")
    val out = EventFunnels.windowFunnel(df, "u", col("t"), 100L,
      steps = Seq(col("v") > 0, col("v") > 0),
      strictIncrease = false, strictOrder = false, multiTag = true)
      .as[(String, Int)].collect().toMap
    assert(out === Map("A" -> 2))
    val one = EventFunnels.windowFunnel(
      Seq(("B", 10L, 5.0)).toDF("u", "t", "v"), "u", col("t"), 100L,
      steps = Seq(col("v") > 0, col("v") > 0),
      strictIncrease = false, strictOrder = false, multiTag = true)
      .as[(String, Int)].collect().toMap
    assert(one === Map("B" -> 2))
    // strictIncrease composes: the same event can no longer chain
    // into itself (t > t fails), so a lone dual-tagged event stays 1
    val strict = EventFunnels.windowFunnel(
      Seq(("B", 10L, 5.0)).toDF("u", "t", "v"), "u", col("t"), 100L,
      steps = Seq(col("v") > 0, col("v") > 0),
      strictIncrease = true, strictOrder = false, multiTag = true)
      .as[(String, Int)].collect().toMap
    assert(strict === Map("B" -> 1))
  }

  test("multiTag sequences: one digit per satisfied condition, ordered by (t, tie, step)") {
    // a single 'click' satisfies cond1 (view-or-click) AND cond2
    // (click): multiTag emits digits "12" (a match); the first-match
    // default emits only "1" (no match)
    val df = Seq(("A", 10L, 0L, "click")).toDF("u", "t", "id", "a")
    val conds = Seq(col("a").isin("view", "click"), col("a") === "click")
    val multi = EventFunnels.sequenceMatch(df, "u", col("t"), col("id"),
      conds, pattern = "12", multiTag = true)
      .as[(String, Long)].collect().toMap
    val first = EventFunnels.sequenceMatch(df, "u", col("t"), col("id"),
      conds, pattern = "12")
      .as[(String, Long)].collect().toMap
    assert(multi === Map("A" -> 1L))
    assert(first === Map("A" -> 0L))
  }

  test("maxEventsPerUser: funnel over the user's EARLIEST cap step-events; one shuffle; bounded pre-agg state") {
    // pathological hot user: thousands of step-1 events, the chain
    // completing s2/s3 only at the tail — the cap's documented answer
    // is the DP over the first `cap` events in (t, step) order, so
    // the hot user reports 1 while an unaffected user keeps its 3
    val hot = (0 until 5000).map { i =>
      ("H", i.toLong,
        if (i < 4998) "s1" else if (i == 4998) "s2" else "s3")
    }
    val cold = Seq(("C", 0L, "s1"), ("C", 1L, "s2"), ("C", 2L, "s3"))
    def gapCap(cap: Int) = EventFunnels.gapFunnel(
      (hot ++ cold).toDF("u", "t", "a"), "u", col("t"),
      steps = Seq(col("a") === "s1", col("a") === "s2", col("a") === "s3"),
      maxGaps = Seq(10000L, 10000L), maxEventsPerUser = cap)
    assert(gapCap(0).as[(String, Int)].collect().toMap ===
      Map("H" -> 3, "C" -> 3))
    val capped = gapCap(100)
    assert(capped.as[(String, Int)].collect().toMap ===
      Map("H" -> 1, "C" -> 3))
    // the capped answer IS the closed form over the earliest 100
    val prefix = hot.map(e => (e._2, e._3.drop(1).toInt))
      .sorted.take(100)
    assert(EventFunnels.gapLevelOf(prefix, nSteps = 3,
      Seq(10000L, 10000L)) === 1)
    // scale shape: the guard's row_number window rides the SAME
    // user-keyed exchange the aggregation uses — one shuffle total,
    // and the truncating filter runs BEFORE the collect_list, so
    // per-user aggregation state is bounded at cap rows
    val plan = capped.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1, plan)
    assert(plan.contains("row_number"), plan)
    // windowFunnel's minima form takes the same guard
    val wf = EventFunnels.windowFunnel(
      (hot ++ cold).toDF("u", "t", "a"), "u", col("t"), 10000L,
      steps = Seq(col("a") === "s1", col("a") === "s2", col("a") === "s3"),
      strictIncrease = false, strictOrder = false,
      maxEventsPerUser = 100)
      .as[(String, Int)].collect().toMap
    assert(wf === Map("H" -> 1, "C" -> 3))
  }

  private def strictFunnel(rows: Seq[(String, Long, String)],
      inc: Boolean, ord: Boolean) =
    EventFunnels.windowFunnel(
      rows.toDF("u", "t", "a"), "u", col("t"), 100L,
      steps = Seq(col("a") === "s1", col("a") === "s2", col("a") === "s3"),
      strictIncrease = inc, strictOrder = ord)
      .as[(String, Int)].collect().toMap

  test("strict_increase: same-timestamp ties no longer chain") {
    val rows = Seq(("A", 10L, "s1"), ("A", 10L, "s2"), ("A", 20L, "s3"))
    assert(funnel(rows) === Map("A" -> 3)) // non-strict: tie chains
    assert(strictFunnel(rows, inc = true, ord = false) === Map("A" -> 1))
  }

  test("strict_order: an intervening tracked event kills the chain at its level") {
    // s1 ... s3(interloper) ... s2: the s3 between l1 and l2 breaks
    // the s1->s2 transition, so strict order stops at level 1 (the
    // default mode reaches 2 — and would reach 3 were s3 after s2)
    val rows = Seq(("A", 10L, "s1"), ("A", 15L, "s3"), ("A", 20L, "s2"))
    assert(funnel(rows) === Map("A" -> 2))
    assert(strictFunnel(rows, inc = false, ord = true) === Map("A" -> 1))
    // a second s1 between l1 and l2 is also an interloper
    val rpt = Seq(("B", 10L, "s1"), ("B", 12L, "s1"), ("B", 20L, "s2"))
    assert(strictFunnel(rpt, inc = false, ord = true) === Map("B" -> 1))
    // clean chains are untouched by either mode
    val ok = Seq(("C", 10L, "s1"), ("C", 20L, "s2"), ("C", 30L, "s3"))
    assert(strictFunnel(ok, inc = true, ord = true) === Map("C" -> 3))
  }

  private def gapF(rows: Seq[(String, Long, String)], gaps: Seq[Long]) =
    EventFunnels.gapFunnel(
      rows.toDF("u", "t", "a"), "u", col("t"),
      steps = Seq(col("a") === "s1", col("a") === "s2", col("a") === "s3"),
      maxGaps = gaps)
      .as[(String, Int)].collect().toMap

  test("gapFunnel: per-step gap bounds vs windowFunnel's single anchor window") {
    val rows = Seq(
      // A: each step within gap of the previous — full chain even
      // though s3 is far past t1 (windowFunnel with window=15 stops at 2)
      ("A", 10L, "s1"), ("A", 20L, "s2"), ("A", 30L, "s3"),
      // B: s2 arrives past the s1->s2 gap — chain dies at 1
      ("B", 10L, "s1"), ("B", 40L, "s2"))
    assert(gapF(rows, Seq(15L, 15L)) === Map("A" -> 3, "B" -> 1))
    assert(funnel(rows.take(3), window = 15L) === Map("A" -> 2))
  }

  test("gapFunnel: EXISTENCE semantics — a later step event enables the chain greedy minima would kill") {
    // the chain 0 -> 9 -> 18 satisfies both 10-gaps; greedy chained
    // minima would lock t2 = 5 and report level 2
    val rows = Seq(
      ("A", 0L, "s1"), ("A", 5L, "s2"), ("A", 9L, "s2"), ("A", 18L, "s3"))
    assert(gapF(rows, Seq(10L, 10L)) === Map("A" -> 3))
    // existence anchors anywhere, not first-touch: a later s1 restarts
    val restart = Seq(
      ("B", 0L, "s1"), ("B", 100L, "s1"), ("B", 105L, "s2"), ("B", 110L, "s3"))
    assert(gapF(restart, Seq(10L, 10L)) === Map("B" -> 3))
  }

  private def anyF(rows: Seq[(String, Long, String)], window: Long) =
    EventFunnels.windowFunnelAny(
      rows.toDF("u", "t", "a"), "u", col("t"), window,
      steps = Seq(col("a") === "s1", col("a") === "s2", col("a") === "s3"))
      .as[(String, Int)].collect().toMap

  test("windowFunnelAny: every step-1 event anchors — late fast chains count") {
    // first-touch anchors at t=0 whose window [0,10] admits nothing;
    // the any-anchor form finds the 1000->1001->1002 chain
    val rows = Seq(
      ("A", 0L, "s1"), ("A", 1000L, "s1"),
      ("A", 1001L, "s2"), ("A", 1002L, "s3"))
    assert(funnel(rows, window = 10L) === Map("A" -> 1))
    assert(anyF(rows, 10L) === Map("A" -> 3))
    // a mixed case: the later anchor helps level 2 but its own window
    // still bounds level 3
    val mixed = Seq(
      ("B", 0L, "s1"), ("B", 100L, "s1"), ("B", 105L, "s2"),
      ("B", 300L, "s3"))
    assert(anyF(mixed, 10L) === Map("B" -> 2))
  }

  test("property: windowFunnelAny == anyLevelOf DP == brute-force chain enumeration") {
    // brute force enumerates every (e1, e2, e3) chain — validates the
    // DP's max-anchor argument itself, not just Catalyst-vs-Scala
    def brute(evs: Seq[(Long, Int)], w: Long): Int = {
      val byStep = (1 to 3).map(k => evs.collect { case (t, `k`) => t })
      val l3 = byStep(0).exists(a => byStep(1).exists(b => b >= a &&
        byStep(2).exists(c => c >= b && c <= a + w)))
      val l2 = byStep(0).exists(a => byStep(1).exists(b =>
        b >= a && b <= a + w))
      if (l3) 3 else if (l2) 2 else if (byStep(0).nonEmpty) 1 else 0
    }
    val rnd = new scala.util.Random(23)
    for (trial <- 0 until 15) {
      val window = 2L + rnd.nextInt(12)
      val rows = (0 until 50).map { _ =>
        (s"u${rnd.nextInt(4)}", rnd.nextInt(30).toLong,
          s"s${1 + rnd.nextInt(3)}")
      }
      val perUser = rows.groupBy(_._1)
        .map { case (u, evs) => u -> evs.map(e => (e._2, e._3.drop(1).toInt)) }
      val viaBrute = perUser.map { case (u, evs) => u -> brute(evs, window) }
      val viaDp = perUser.map { case (u, evs) =>
        u -> EventFunnels.anyLevelOf(evs, nSteps = 3, window) }
      assert(viaDp === viaBrute, s"trial $trial window=$window (DP vs brute)")
      assert(anyF(rows, window) === viaBrute, s"trial $trial window=$window")
    }
  }

  test("property: gapFunnel == gapLevelOf DP == brute-force chain enumeration") {
    // brute force validates the DP itself (twin-vs-twin checks are
    // how the original greedy form's bug survived its own test)
    def brute(evs: Seq[(Long, Int)], gaps: Seq[Long]): Int = {
      val byStep = (1 to 3).map(k => evs.collect { case (t, `k`) => t })
      val l3 = byStep(0).exists(a => byStep(1).exists(b =>
        b >= a && b <= a + gaps(0) && byStep(2).exists(c =>
          c >= b && c <= b + gaps(1))))
      val l2 = byStep(0).exists(a => byStep(1).exists(b =>
        b >= a && b <= a + gaps(0)))
      if (l3) 3 else if (l2) 2 else if (byStep(0).nonEmpty) 1 else 0
    }
    val rnd = new scala.util.Random(19)
    for (trial <- 0 until 15) {
      val gaps = Seq(1L + rnd.nextInt(8), 1L + rnd.nextInt(8))
      val rows = (0 until 50).map { _ =>
        (s"u${rnd.nextInt(4)}", rnd.nextInt(30).toLong,
          s"s${1 + rnd.nextInt(3)}")
      }
      val perUser = rows.groupBy(_._1)
        .map { case (u, evs) => u -> evs.map(e => (e._2, e._3.drop(1).toInt)) }
      val viaBrute = perUser.map { case (u, evs) => u -> brute(evs, gaps) }
      val viaDp = perUser.map { case (u, evs) =>
        u -> EventFunnels.gapLevelOf(evs, nSteps = 3, gaps) }
      assert(viaDp === viaBrute, s"trial $trial gaps=$gaps (DP vs brute)")
      assert(gapF(rows, gaps) === viaBrute, s"trial $trial gaps=$gaps")
    }
  }

  test("property: Catalyst windowFunnel agrees with levelOf across random streams and modes") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 10; inc <- Seq(false, true); ord <- Seq(false, true)) {
      val rows = (0 until 40).map { _ =>
        (s"u${rnd.nextInt(4)}", rnd.nextInt(25).toLong,
          s"s${1 + rnd.nextInt(3)}")
      }
      val expected = rows.groupBy(_._1).map { case (u, evs) =>
        u -> EventFunnels.levelOf(
          evs.map(e => (e._2, e._3.drop(1).toInt)), nSteps = 3,
          window = 10L, strictIncrease = inc, strictOrder = ord)
      }
      val got = EventFunnels.windowFunnel(
        rows.toDF("u", "t", "a"), "u", col("t"), 10L,
        steps = Seq(col("a") === "s1", col("a") === "s2", col("a") === "s3"),
        strictIncrease = inc, strictOrder = ord)
        .as[(String, Int)].collect().toMap
      assert(got === expected, s"trial $trial inc=$inc ord=$ord")
    }
  }

  private def seqDf(rows: Seq[(String, Long, String)]) =
    rows.zipWithIndex.map { case ((u, t, a), i) => (u, t, i.toLong, a) }
      .toDF("u", "t", "id", "a")

  test("sequenceMatch: ordered occurrence with events in between; unmatched dropped") {
    val df = seqDf(Seq(
      ("A", 10L, "view"), ("A", 20L, "error"), ("A", 30L, "purchase"),
      ("B", 10L, "purchase"), ("B", 20L, "view"), // wrong order
      ("C", 10L, "view"))) // never purchases
    val out = EventFunnels.sequenceMatch(df, "u", col("t"), col("id"),
      conds = Seq(col("a") === "view", col("a") === "purchase"),
      pattern = "1.*2")
      .as[(String, Long)].collect().toMap
    assert(out === Map("A" -> 1L, "B" -> 0L, "C" -> 0L))
  }

  test("sequenceMatch: adjacency pattern vs keepUnmatched interleaver") {
    val rows = Seq(
      ("A", 10L, "view"), ("A", 20L, "error"), ("A", 30L, "purchase"))
    val adjacent = (keep: Boolean) =>
      EventFunnels.sequenceMatch(seqDf(rows), "u", col("t"), col("id"),
        conds = Seq(col("a") === "view", col("a") === "purchase"),
        pattern = "12", keepUnmatched = keep)
        .as[(String, Long)].collect().toMap
    // default (ClickHouse) semantics: the error event vanishes, so
    // view/purchase ARE adjacent; keepUnmatched interposes a '0'
    assert(adjacent(false) === Map("A" -> 1L))
    assert(adjacent(true) === Map("A" -> 0L))
  }

  test("sequenceCount: non-overlapping left-to-right matches; ties order by tieBreak") {
    val df = seqDf(Seq(
      // A: v p v p → 2 matches; the stray purchase between pairs
      ("A", 10L, "view"), ("A", 20L, "purchase"),
      ("A", 30L, "view"), ("A", 40L, "purchase"),
      // B: v v p → lazy scan closes ONE match at the first purchase
      ("B", 10L, "view"), ("B", 20L, "view"), ("B", 30L, "purchase")))
    val out = EventFunnels.sequenceCount(df, "u", col("t"), col("id"),
      conds = Seq(col("a") === "view", col("a") === "purchase"),
      pattern = "1.*?2")
      .as[(String, Long)].collect().toMap
    assert(out === Map("A" -> 2L, "B" -> 1L))
  }

  test("sequence string is ordered by (ts, tieBreak) — same-ts ties are deterministic") {
    // two events at the same timestamp: tieBreak (id) decides, so the
    // sequence is view(id=0) then purchase(id=1) → a match; with the
    // ids swapped it is not
    val match1 = EventFunnels.sequenceMatch(
      Seq(("A", 10L, 0L, "view"), ("A", 10L, 1L, "purchase"))
        .toDF("u", "t", "id", "a"),
      "u", col("t"), col("id"),
      conds = Seq(col("a") === "view", col("a") === "purchase"),
      pattern = "1.*2").as[(String, Long)].collect().toMap
    val match2 = EventFunnels.sequenceMatch(
      Seq(("A", 10L, 1L, "view"), ("A", 10L, 0L, "purchase"))
        .toDF("u", "t", "id", "a"),
      "u", col("t"), col("id"),
      conds = Seq(col("a") === "view", col("a") === "purchase"),
      pattern = "1.*2").as[(String, Long)].collect().toMap
    assert(match1 === Map("A" -> 1L))
    assert(match2 === Map("A" -> 0L))
  }

  test("property: sequenceCount agrees with an in-memory regex over sorted events") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 20) {
      val nUsers = 1 + rnd.nextInt(5)
      val rows = (0 until 60).map { i =>
        (s"u${rnd.nextInt(nUsers)}", rnd.nextInt(30).toLong, i.toLong,
          Seq("view", "click", "purchase", "error")(rnd.nextInt(4)))
      }
      val expected = rows
        .map { case (u, t, id, a) =>
          (u, t, id, a match {
            case "view" => 1; case "purchase" => 2; case _ => 0 }) }
        .filter(_._4 >= 1)
        .groupBy(_._1)
        .map { case (u, evs) =>
          // the same shared fold the streaming arm executes per group
          u -> EventFunnels.sequenceCountOf(
            evs.map(e => (e._2, e._3, e._4)), "1.*?2")
        }
      val got = EventFunnels.sequenceCount(
        rows.toDF("u", "t", "id", "a"), "u", col("t"), col("id"),
        conds = Seq(col("a") === "view", col("a") === "purchase"),
        pattern = "1.*?2")
        .as[(String, Long)].collect().toMap
      assert(got === expected, s"trial $trial")
    }
  }

  test("retention: r_k = f_1 AND f_k, anchored on the first condition") {
    val df = Seq(
      ("A", 1), ("A", 3),          // active day 1 and 3
      ("B", 2), ("B", 3),          // NOT active day 1 → all zeros
      ("C", 1), ("C", 2), ("C", 3) // active all three days
    ).toDF("u", "d")
    val out = EventFunnels.retention(df, "u",
      conds = (1 to 3).map(k => col("d") === k))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out === Map(
      "A" -> ((1L, 0L, 1L)),
      "B" -> ((0L, 0L, 0L)),
      "C" -> ((1L, 1L, 1L))))
  }

  test("W10 attribution: lookback bounds, same-second touch counts, unattributed survives, first/last distinct") {
    val rows = Seq(
      // user A: touch outside lookback (t=5), touches inside (t=100
      // click, t=150 view), same-second touch at the conversion
      // (t=200 signup) → first=click@100, last=signup@200
      ("A", 5L, 1L, "click"), ("A", 100L, 2L, "click"),
      ("A", 150L, 3L, "view"), ("A", 200L, 4L, "signup"),
      ("A", 200L, 5L, "purchase"),
      // a later touch must NOT attribute backwards
      ("A", 300L, 6L, "click"),
      // user B: conversion with no touch in window → unattributed
      ("B", 1000L, 7L, "purchase"), ("B", 2000L, 8L, "view"),
      // user C's touches must not leak into A/B
      ("C", 190L, 9L, "view"))
    val df = rows.toDF("u", "ep", "id", "t").repartition(3)
    val out = EventFunnels.attribution(df, "u", col("ep"), col("id"),
      col("t"), "purchase", Seq("click", "signup", "view"),
      lookbackSecs = 150L, bucketWidth = 60.0)
      .select("u", "conv_ep", "first_type", "first_ep", "last_type",
        "last_ep")
      .as[(String, Long, Option[String], Option[Long], Option[String],
        Option[Long])].collect().map(r => r._1 -> r).toMap
    assert(out("A") === (("A", 200L, Some("click"), Some(100L),
      Some("signup"), Some(200L))))
    assert(out("B") === (("B", 1000L, None, None, None, None)))
    assert(out.size === 2)
  }

  test("W10b attributionWeighted: credit conserves per conversion, hand-computed linear and U-shaped weights") {
    val rows = Seq(
      // conv A@100 with 4 touches: click@10, view@20, click@30, signup@40
      ("A", 10L, 1L, "click"), ("A", 20L, 2L, "view"),
      ("A", 30L, 3L, "click"), ("A", 40L, 4L, "signup"),
      ("A", 100L, 5L, "purchase"),
      // conv B@50 with 1 touch; conv C with none (no credit at all)
      ("B", 45L, 6L, "view"), ("B", 50L, 7L, "purchase"),
      ("C", 900L, 8L, "purchase"))
    val df = rows.toDF("u", "ep", "id", "t").repartition(3)
    def run(model: String) = EventFunnels.attributionWeighted(
      df, "u", col("ep"), col("id"), col("t"), "purchase",
      Seq("click", "signup", "view"), lookbackSecs = 200L, model = model)
      .select("source_type", "credit")
      .as[(String, Double)].collect().toMap
    val lin = run("linear")
    // A distributes 1.0 over 4 touches, B 1.0 over 1 → click 0.5,
    // view 0.25 + 1.0, signup 0.25; total = 2 attributed conversions
    assert(lin("click") === 0.5 && lin("signup") === 0.25 &&
      lin("view") === 1.25)
    assert(math.abs(lin.values.sum - 2.0) < 1e-9)
    val u = run("u_shaped")
    // A: first click@10 0.4, last signup@40 0.4, middles view/click 0.1
    // each; B: view 1.0
    assert(u("click") === 0.5 && u("signup") === 0.4 && u("view") === 1.1)
    assert(math.abs(u.values.sum - 2.0) < 1e-9)
  }

  test("W10b attributionWeighted: conservation is EXACT under non-terminating weights (remainder carrier)") {
    // n = 3 linear: round9(1/3) × 3 = 0.999999999 — without the
    // remainder carrier the residue accumulates across conversions.
    // All touches share one type so the law reads directly off credit.
    val lin3 = Seq(
      ("A", 10L, 1L, "click"), ("A", 20L, 2L, "click"),
      ("A", 30L, 3L, "click"), ("A", 100L, 4L, "purchase"))
    val lin = EventFunnels.attributionWeighted(
      lin3.toDF("u", "ep", "id", "t"), "u", col("ep"), col("id"),
      col("t"), "purchase", Seq("click"), lookbackSecs = 200L,
      model = "linear")
      .select("credit").as[Double].head()
    assert(lin == 1.0, s"linear n=3 credit not exact: $lin")
    // n = 5 u_shaped: middles round9(0.2/3) = 0.066666667 ×3 =
    // 0.200000001; the last touch carries 0.399999999 so the
    // conversion still distributes exactly 1.0
    val u5 = Seq(
      ("B", 10L, 1L, "view"), ("B", 20L, 2L, "view"),
      ("B", 30L, 3L, "view"), ("B", 40L, 4L, "view"),
      ("B", 50L, 5L, "view"), ("B", 100L, 6L, "purchase"))
    val u = EventFunnels.attributionWeighted(
      u5.toDF("u", "ep", "id", "t"), "u", col("ep"), col("id"),
      col("t"), "purchase", Seq("view"), lookbackSecs = 200L,
      model = "u_shaped")
      .select("credit").as[Double].head()
    assert(u == 1.0, s"u_shaped n=5 credit not exact: $u")
  }

  test("W8b sequenceMatchEvents: the whole earliest chain's times; nulls beyond the level; agrees with windowFunnelTimes") {
    val rows = Seq(
      ("A", 10L, "s1"), ("A", 20L, "s2"), ("A", 30L, "s3"), // full chain
      ("A", 5L, "s2"),                                      // pre-anchor noise
      ("B", 10L, "s1"), ("B", 40L, "s2"),                   // level 2
      ("C", 10L, "s2"))                                     // level 0
    val df = rows.toDF("u", "t", "a")
    val steps = Seq(col("a") === "s1", col("a") === "s2", col("a") === "s3")
    val out = EventFunnels.sequenceMatchEvents(df, "u", col("t"), 100L, steps)
      .as[(String, Int, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    assert(out("A") === (("A", 3, Some(10L), Some(20L), Some(30L))))
    assert(out("B") === (("B", 2, Some(10L), Some(40L), None)))
    assert(out("C") === (("C", 0, None, None, None)))
    // anchor/deepest agree with the W6g read by construction
    val times = EventFunnels.windowFunnelTimes(df, "u", col("t"), 100L, steps)
      .as[(String, Int, Option[Long], Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    for ((u, (_, lvl, t1, t2, t3)) <- out) {
      assert(times(u)._2 == lvl && times(u)._3 == t1)
      assert(times(u)._4 == Seq(t1, t2, t3).take(lvl).lastOption.flatten)
    }
  }

  test("W6g windowFunnelTimes: levels agree with windowFunnel; times are the chain minima") {
    val rows = Seq(
      ("A", 10L, "s1"), ("A", 20L, "s2"), ("A", 30L, "s3"), // full, lag 20
      ("A", 5L, "s2"),                                      // pre-anchor noise
      ("B", 10L, "s1"), ("B", 40L, "s2"),                   // level 2, lag 30
      ("C", 10L, "s2"),                                     // level 0
      ("D", 10L, "s1"))                                     // level 1, conv = anchor
    val df = rows.toDF("u", "t", "a")
    val steps = Seq(col("a") === "s1", col("a") === "s2", col("a") === "s3")
    val times = EventFunnels.windowFunnelTimes(df, "u", col("t"), 100L, steps)
      .collect().map(r => (r.getString(0), (r.getInt(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    assert(times === Map(
      "A" -> ((3, Some(10L), Some(30L))),
      "B" -> ((2, Some(10L), Some(40L))),
      "C" -> ((0, None, None)),
      "D" -> ((1, Some(10L), Some(10L)))))
    // the level column is definitionally the windowFunnel level
    val levels = EventFunnels.windowFunnel(df, "u", col("t"), 100L, steps)
      .as[(String, Int)].collect().toMap
    assert(times.view.mapValues(_._1).toMap === levels)
  }
}
