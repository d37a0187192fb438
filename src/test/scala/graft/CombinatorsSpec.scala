package graft

import graft.operators.AggCombinators
import org.apache.spark.sql.functions._

/** A11–A13 — ClickHouse aggregate combinators (groupArray /
  * groupUniqArray / sumMap) and the TopK Misra–Gries sketch. The
  * registered q_group_array / q_sum_map / q_topk_freq carry the
  * value-level oracles; these pin determinism, merge behavior, and
  * the sketch's approximation bounds (which have no SQL oracle).
  */
class CombinatorsSpec extends SparkSpec {
  import spark.implicits._

  test("groupArray: imposed order + limit, stable under repartition") {
    val df = Seq(
      ("A", 3L, "c"), ("A", 1L, "a"), ("A", 2L, "b"), ("A", 4L, "d"),
      ("B", 1L, "x")).toDF("k", "o", "v").repartition(7)
    val out = df.groupBy(col("k"))
      .agg(array_join(AggCombinators.groupArray(
        col("v"), Seq(col("o")), Some(3)), ",").as("a"))
      .as[(String, String)].collect().toMap
    assert(out === Map("A" -> "a,b,c", "B" -> "x"))
  }

  test("groupArray: ties on the order key fall back to the value itself — total order") {
    val df = Seq(("A", 1L, "z"), ("A", 1L, "a")).toDF("k", "o", "v")
    val out = df.groupBy(col("k"))
      .agg(array_join(AggCombinators.groupArray(col("v"), Seq(col("o")), None), ",")
        .as("a"))
      .as[(String, String)].collect().toMap
    assert(out === Map("A" -> "a,z"))
  }

  test("groupArrayLast: the tail k under rank order, ascending emission, bounded-state merge stable under repartition") {
    val df = Seq(
      ("A", 1L, "a"), ("A", 2L, "b"), ("A", 3L, "c"), ("A", 4L, "d"),
      ("A", 5L, "e"),
      ("B", 9L, "x"),
      ("C", 7L, null.asInstanceOf[String]), ("C", 6L, "y"))
      .toDF("k", "r", "v").repartition(7)
    val out = AggCombinators.groupArrayLast(
      df, Seq("k"), rank = col("r"), item = col("v"), k = 3)
      .as[(String, Long, String)].collect().sorted.toSeq
    assert(out === Seq(
      ("A", 3L, "c"), ("A", 4L, "d"), ("A", 5L, "e"),
      ("B", 9L, "x"),
      ("C", 6L, "y")))  // null item skips, leaving the lone survivor
    // boundary ties keep the ascending-smallest item (the
    // groupArraySorted rule, mirrored)
    val tied = Seq(("T", 1L, "m"), ("T", 2L, "z"), ("T", 2L, "a"))
      .toDF("k", "r", "v")
    val got = AggCombinators.groupArrayLast(
      tied, Seq("k"), col("r"), col("v"), k = 2)
      .as[(String, Long, String)].collect().sorted.toSeq
    assert(got === Seq(("T", 2L, "a"), ("T", 2L, "z")))
  }

  test("sparkbar: exact integer levels, empty buckets blank, full bar at the max bucket") {
    // key A: 4 x-points over [0, 19] with 20 buckets → bucket == x;
    // counts 1/2/4 land at exact levels ceil(8s/4): 2, 4, 8
    val rows = Seq.fill(1)(("A", 0L)) ++ Seq.fill(2)(("A", 7L)) ++
      Seq.fill(4)(("A", 19L)) ++ Seq(("B", 5L))
    val df = rows.toDF("k", "x").repartition(5)
    val out = AggCombinators.sparkbar(
      df, Seq("k"), x = col("x"), y = lit(1L), buckets = 20)
      .as[(String, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    val (_, lo, hi, bar) = out("A")
    assert(lo == 0L && hi == 19L && bar.length == 20)
    assert(bar.charAt(0) == '▂' && bar.charAt(7) == '▄' &&
      bar.charAt(19) == '█', s"bar=[$bar]")
    assert(bar.count(_ == ' ') == 17)
    // single-point key: its one bucket is the max → full block
    val (_, blo, bhi, bbar) = out("B")
    assert(blo == 5L && bhi == 5L && bbar.charAt(0) == '█' &&
      bbar.drop(1).forall(_ == ' '))
  }

  test("sparkbar: bucket/level arithmetic stays exact past 2^53 — no double-division drift") {
    // x spans [0, 2^60): double division by (hi−lo+1) would round
    // near-boundary points into the wrong bucket. 2^60 / 4 buckets =
    // 2^58 per bucket; x = 2^58 − 1 is the last point of bucket 0 and
    // x = 2^58 the first of bucket 1 — exact integral div must split
    // them. y = 2^61-ish sums exercise the 8s product past long range
    // via the DECIMAL widening (level stays ceil(8s/mx) exactly).
    val q = 1L << 58
    val rows = Seq(
      ("K", 0L, 1L << 61),          // bucket 0, the max sum
      ("K", q - 1L, 1L),            // still bucket 0
      ("K", q, (1L << 59) + 1L),    // bucket 1: level ceil(8s/mx) = 3
      ("K", 4L * q - 1L, 1L))       // last bucket pins hi
    val out = AggCombinators.sparkbar(
      rows.toDF("k", "x", "y"), Seq("k"),
      x = col("x"), y = col("y"), buckets = 4)
      .as[(String, Long, Long, String)].collect().head
    val (_, lo, hi, bar) = out
    assert(lo == 0L && hi == 4L * q - 1L && bar.length == 4)
    // bucket 0 holds the max (level 8 = full block) — the q−1 point
    // merged into it, NOT bucket 1
    assert(bar.charAt(0) == '█', s"bar=[$bar]")
    // bucket 1: s = 2^59+1, mx = 2^61+1 → 8s/mx just over 2 → level 3
    assert(bar.charAt(1) == '▃', s"bar=[$bar]")
    assert(bar.charAt(2) == ' ' && bar.charAt(3) == '▁', s"bar=[$bar]")
  }

  test("holtLinear: a perfect line is tracked exactly; noisy series matches a scalar fold; single point null") {
    import graft.operators.AggCombinators
    // law: on v_i = a + c·i with α = β = 0.5, induction from the
    // (l₁ = v₁, b₁ = c) init keeps l_t = v_t and b_t = c EXACTLY at
    // every step, so forecast(h) = v_n + h·c
    val line = (0 until 20).map(i => ("lin", i.toLong, 3.25 + 0.5 * i))
    val noisy = Seq(("n", 0L, 1.0), ("n", 1L, 4.0), ("n", 2L, 2.0),
      ("n", 3L, 8.0), ("n", 4L, 5.0))
    val single = Seq(("one", 0L, 9.0))
    val out = (line ++ noisy ++ single).toDF("k", "t", "v")
      .groupBy(col("k"))
      .agg(AggCombinators.holtLinear(col("v"), Seq(col("t")),
        alpha = 0.5, beta = 0.5, horizon = 4).as("h"))
      .select(col("k"), col("h.n_samples"), col("h.level"),
        col("h.trend"), col("h.forecast"))
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(out("lin") === (("lin", 20L, Some(3.25 + 0.5 * 19),
      Some(0.5), Some(3.25 + 0.5 * 19 + 4 * 0.5))))
    assert(out("one") === (("one", 1L, None, None, None)))
    // scalar reference fold on the noisy series (same op order)
    var (l, b) = (1.0, 4.0 - 1.0)
    for (x <- Seq(4.0, 2.0, 8.0, 5.0)) {
      val l2 = 0.5 * x + 0.5 * (l + b)
      b = 0.5 * (l2 - l) + 0.5 * b
      l = l2
    }
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    assert(out("n")._3 === Some(r6(l)) && out("n")._4 === Some(r6(b)))
    assert(out("n")._5 === Some(r6(l + 4 * b)))
  }

  test("holtWinters: a constant-plus-seasonal series is forecast exactly; arbitrary series matches a scalar fold; short series null") {
    import graft.operators.AggCombinators
    // exactness law: v_t = c + seas_{t mod m} with integer values and
    // Σ seas = 0 — the init recovers l = c, b = 0, s = seas exactly,
    // every step is a fixed point of the recurrence, and forecast(1)
    // reproduces the next value bit-for-bit
    val seas = Seq(-3.0, -1.0, 0.0, 1.0, 3.0, 2.0, -2.0)
    val c = 100.0
    val season = (0 until 21).map(i => ("s", i.toLong, c + seas(i % 7)))
    val noisy = (0 until 16).map(i =>
      ("n", i.toLong, Seq(1.0, 4.0, 2.0, 8.0, 5.0, 3.0, 9.0, 6.0)(i % 8)
        + 0.25 * i))
    val short = (0 until 13).map(i => ("sh", i.toLong, i.toDouble))
    val out = (season ++ noisy ++ short).toDF("k", "t", "v")
      .groupBy(col("k"))
      .agg(AggCombinators.holtWinters(col("v"), Seq(col("t")),
        alpha = 0.5, beta = 0.5, gamma = 0.5, period = 7).as("h"))
      .select(col("k"), col("h.n_samples"), col("h.level"),
        col("h.trend"), col("h.season_next"), col("h.forecast"))
      .as[(String, Long, Option[Double], Option[Double], Option[Double],
        Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    // after 21 points the next value is v_21 = c + seas(0)
    assert(out("s") === (("s", 21L, Some(c), Some(0.0),
      Some(seas(21 % 7)), Some(c + seas(21 % 7)))))
    // fewer than 2m points: null states
    assert(out("sh") === (("sh", 13L, None, None, None, None)))
    // scalar reference fold (same op order, same init convention)
    val vs = noisy.map(_._3)
    val m = 7
    var l = vs.take(m).reduce(_ + _) / m
    var b = (vs.slice(m, 2 * m).reduce(_ + _) / m - l) / m
    var s = vs.take(m).map(_ - l).toVector
    for (x <- vs.drop(m)) {
      val sOld = s.head
      val l2 = 0.5 * (x - sOld) + 0.5 * (l + b)
      val b2 = 0.5 * (l2 - l) + 0.5 * b
      val s2 = 0.5 * (x - l - b) + 0.5 * sOld
      l = l2; b = b2; s = s.tail :+ s2
    }
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    assert(out("n")._3 === Some(r6(l)) && out("n")._4 === Some(r6(b)))
    assert(out("n")._5 === Some(r6(s.head)))
    assert(out("n")._6 === Some(r6(l + b + s.head)))
  }

  test("groupUniqArray: sorted distinct") {
    val df = Seq(("A", "b"), ("A", "a"), ("A", "b")).toDF("k", "v")
    val out = df.groupBy(col("k"))
      .agg(array_join(AggCombinators.groupUniqArray(col("v")), ",").as("a"))
      .as[(String, String)].collect().toMap
    assert(out === Map("A" -> "a,b"))
  }

  test("sumMap: point-wise merge over disjoint and overlapping keys") {
    val df = Seq(
      ("A", Map("x" -> 1L, "y" -> 2L)),
      ("A", Map("y" -> 3L, "z" -> 4L)),
      ("B", Map("x" -> 5L))).toDF("k", "m").repartition(5)
    val out = AggCombinators.sumMap(df, Seq("k"), col("m"))
      .select(col("k"), col("sum_map"))
      .as[(String, Map[String, Long])].collect().toMap
    assert(out === Map(
      "A" -> Map("x" -> 1L, "y" -> 5L, "z" -> 4L),
      "B" -> Map("x" -> 5L)))
    // entry order inside the map is sorted by key (structural equality
    // across engines depends on it)
    val keys = AggCombinators.sumMap(df, Seq("k"), col("m"))
      .where(col("k") === "A")
      .select(map_keys(col("sum_map"))).as[Seq[String]].head()
    assert(keys === Seq("x", "y", "z"))
  }

  test("sumMap: groups with only empty maps survive with an empty map") {
    val df = Seq(
      ("A", Map("x" -> 1L)),
      ("B", Map.empty[String, Long])).toDF("k", "m")
    val out = AggCombinators.sumMap(df, Seq("k"), col("m"))
      .as[(String, Map[String, Long])].collect().toMap
    assert(out === Map("A" -> Map("x" -> 1L), "B" -> Map.empty[String, Long]))
  }

  test("minMap/maxMap: point-wise extrema over overlapping keys; empty-map groups survive") {
    val df = Seq(
      ("a", Map("x" -> 3.0, "y" -> 1.0)),
      ("a", Map("x" -> 1.0, "z" -> 5.0)),
      ("b", Map.empty[String, Double]))
      .toDF("k", "m").repartition(3)
    val mn = AggCombinators.minMap(df, Seq("k"), col("m"))
      .select(col("k"), map_entries(col("min_map")).cast("string"))
      .as[(String, String)].collect().toMap
    val mx = AggCombinators.maxMap(df, Seq("k"), col("m"))
      .select(col("k"), map_entries(col("max_map")).cast("string"))
      .as[(String, String)].collect().toMap
    assert(mn("a") === "[{x, 1.0}, {y, 1.0}, {z, 5.0}]")
    assert(mx("a") === "[{x, 3.0}, {y, 1.0}, {z, 5.0}]")
    assert(mn("b") === "[]" && mx("b") === "[]")
  }

  test("avgWeighted: exact decimal sums, null/non-positive weights and null values drop; empty group -> null") {
    val df = Seq(
      ("a", Some(10.0), Some(1L)), ("a", Some(20.0), Some(3L)),
      ("a", Some(99.0), Some(0L)),          // non-positive weight drops
      ("a", Some(99.0), None),              // null weight drops
      ("a", None, Some(5L)),                // null value drops
      ("z", None, Some(1L)))                // all dropped -> null avg
      .toDF("k", "v", "w")
    val out = AggCombinators.avgWeighted(df, Seq("k"), col("v"), col("w"))
      .select("k", "w_total", "avg_weighted")
      .as[(String, Long, Option[Double])].collect().map(r => r._1 -> r).toMap
    assert(out("a") === (("a", 4L, Some((10.0 + 60.0) / 4.0))))
    assert(out("z") === (("z", 0L, None)))
  }

  test("sumForEach: element-wise sums; ragged arrays pad to the longest; empty groups keep an empty array") {
    val df = Seq(
      ("A", Seq(1L, 2L, 3L)),
      ("A", Seq(10L, 20L)),        // ragged: contributes nothing at pos 3
      ("B", Seq.empty[Long]),
      ("B", Seq(7L))).toDF("k", "a").repartition(5)
    val out = AggCombinators.sumForEach(df, Seq("k"), col("a"))
      .as[(String, Seq[Long])].collect().toMap
    assert(out === Map("A" -> Seq(11L, 22L, 3L), "B" -> Seq(7L)))
    val empties = AggCombinators.sumForEach(
      Seq(("C", Seq.empty[Long]), ("C", Seq.empty[Long])).toDF("k", "a"),
      Seq("k"), col("a")).as[(String, Seq[Long])].collect().toMap
    assert(empties === Map("C" -> Seq.empty[Long]))
  }

  test("deltaSum: positive deltas only, resets counted, rate over span; single sample -> zero sum, null rate") {
    // counter 10 -> 13 -> 2 (reset) -> 5 over t = 0, 10, 20, 30:
    // delta_sum = 3 + 3 = 6, one reset, span 30, rate 0.2
    val df = Seq(
      ("c1", 0L, 10.0), ("c1", 10L, 13.0), ("c1", 20L, 2.0), ("c1", 30L, 5.0),
      ("c2", 5L, 42.0)).toDF("k", "t", "v").repartition(3)
    val out = graft.operators.TimeSeries.deltaSum(
      df, Seq("k"), ord = Seq(col("t")), ts = col("t"), value = col("v"))
      .select(col("k"), col("n_samples"), col("n_resets"),
        col("delta_sum").cast("double"), col("span_s"), col("rate_per_s"))
      .as[(String, Long, Long, Double, Long, Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(out("c1") === (("c1", 4L, 1L, 6.0, 30L, Some(0.2))))
    assert(out("c2") === (("c2", 1L, 0L, 0.0, 0L, None)))
  }

  test("deltaSumState: merge of ord-disjoint slices == whole-stream deltaSum, incl. a boundary-straddling reset") {
    import graft.operators.TimeSeries
    // c1: 10 -> 13 | 2 (reset straddles the slice boundary) -> 5 | 9
    // c2: 100 | (absent) | 90 (reset seen only via the boundary delta)
    val rows = Seq(
      ("c1", 0L, 10.0), ("c1", 10L, 13.0),   // slice A: t < 15
      ("c1", 20L, 2.0), ("c1", 30L, 5.0),    // slice B: 15 <= t < 35
      ("c1", 40L, 9.0),                      // slice C: t >= 35
      ("c2", 5L, 100.0), ("c2", 50L, 90.0))
    val df = rows.toDF("k", "t", "v").repartition(3)
    val direct = TimeSeries.deltaSum(
      df, Seq("k"), ord = Seq(col("t")), ts = col("t"), value = col("v"))
      .select(col("k"), col("n_samples"), col("n_resets"),
        col("delta_sum").cast("double"), col("span_s"), col("rate_per_s"))
      .as[(String, Long, Long, Double, Long, Option[Double])]
      .collect().toSet
    val slices = Seq(
      df.where(col("t") < 15), df.where(col("t") >= 15 && col("t") < 35),
      df.where(col("t") >= 35))
    val states = slices.map(s => TimeSeries.deltaSumState(
      s, Seq("k"), ord = Seq(col("t")), ts = col("t"), value = col("v")))
    val merged = TimeSeries.mergeDeltaSumStates(
      states.reduce(_ unionByName _), Seq("k"))
    val viaStates = TimeSeries.finalizeDeltaSum(merged, Seq("k"))
      .select(col("k"), col("n_samples"), col("n_resets"),
        col("delta_sum").cast("double"), col("span_s"), col("rate_per_s"))
      .as[(String, Long, Long, Double, Long, Option[Double])]
      .collect().toSet
    assert(viaStates === direct)
    // hierarchical composition: merge of (merge of A,B) with C == flat merge
    val ab = TimeSeries.mergeDeltaSumStates(
      states(0).unionByName(states(1)), Seq("k"))
    val nested = TimeSeries.finalizeDeltaSum(
      TimeSeries.mergeDeltaSumStates(ab.unionByName(states(2)), Seq("k")),
      Seq("k"))
      .select(col("k"), col("n_samples"), col("n_resets"),
        col("delta_sum").cast("double"), col("span_s"), col("rate_per_s"))
      .as[(String, Long, Long, Double, Long, Option[Double])]
      .collect().toSet
    assert(nested === direct)
  }

  test("weightedQuantiles: cumulative-weight rule, exact thresholds, repeat-count equivalence") {
    // values 1..4 with weights 1,1,6,2 (total 10): cum = 1,2,8,10
    // wq(0.5) -> first cum >= 5  -> value 3
    // wq(0.2) -> first cum >= 2  -> value 2 (exact threshold hit)
    // wq(1.0) -> the max value   -> 4
    val df = Seq(("g", 1.0, 1L), ("g", 2.0, 1L), ("g", 3.0, 6L), ("g", 4.0, 2L))
      .toDF("k", "v", "w").repartition(3)
    val out = graft.operators.Histograms.weightedQuantiles(
      df, Seq("k"), col("v"), col("w"), tiebreak = Seq(col("v")),
      qs = Seq(BigDecimal("0.2"), BigDecimal("0.5"), BigDecimal("1.0")))
      .select(col("wq_20"), col("wq_50"), col("wq_100"))
      .as[(Double, Double, Double)].head()
    assert(out === ((2.0, 3.0, 4.0)))
    // the defining equivalence: integral weights == physical repeats
    val repeated = Seq.fill(1)(1.0) ++ Seq.fill(1)(2.0) ++
      Seq.fill(6)(3.0) ++ Seq.fill(2)(4.0)
    val viaRepeats = graft.operators.Histograms.weightedQuantiles(
      repeated.map(("g", _, 1L)).toDF("k", "v", "w"),
      Seq("k"), col("v"), col("w"), tiebreak = Seq(col("v")),
      qs = Seq(BigDecimal("0.2"), BigDecimal("0.5"), BigDecimal("1.0")))
      .select(col("wq_20"), col("wq_50"), col("wq_100"))
      .as[(Double, Double, Double)].head()
    assert(viaRepeats === out)
    // non-positive / null weights are dropped, not summed
    val guarded = graft.operators.Histograms.weightedQuantiles(
      Seq(("g", 0.5, 0L), ("g", 1.0, 1L)).toDF("k", "v", "w"),
      Seq("k"), col("v"), col("w"), tiebreak = Seq(col("v")),
      qs = Seq(BigDecimal("0.5")))
      .select(col("wq_50")).as[Double].head()
    assert(guarded === 1.0)
  }

  test("equiDepth histogram: equal populations, covering edges, interior ties go low") {
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("k", "v")
    val out = graft.operators.Histograms.equiDepth(df, Seq("k"), col("v"), 4)
      .orderBy(col("bin"))
      .select(col("bin"), col("lo"), col("hi"), col("n_rows"))
      .as[(Long, Double, Double, Long)].collect().toSeq
    // 100 uniform values into 4 quantile bins: 25 each; edges are the
    // exact continuous quantiles of 1..100
    assert(out.map(_._4) === Seq(25L, 25L, 25L, 25L))
    assert(out.head._2 === 1.0 && out.last._3 === 100.0)
    // adjacent bins share an edge
    assert(out.sliding(2).forall { case Seq(a, b) => a._3 === b._2 })
    // a value exactly ON an interior edge lands in the LOWER bin
    val tied = graft.operators.Histograms.equiDepth(
      Seq(("g", 1.0), ("g", 2.0), ("g", 2.0), ("g", 3.0)).toDF("k", "v"),
      Seq("k"), col("v"), 2)
      .orderBy(col("bin"))
      .select(col("bin"), col("n_rows")).as[(Long, Long)].collect().toSeq
    assert(tied === Seq((1L, 3L), (2L, 1L))) // both 2.0s (= median) go low
    // a NULL group key is a group like any other — null-safe join
    val nullKeyed = graft.operators.Histograms.equiDepth(
      Seq((Option.empty[String], 1.0), (None, 2.0), (Some("g"), 5.0))
        .toDF("k", "v"),
      Seq("k"), col("v"), 2)
      .groupBy(col("k")).agg(sum(col("n_rows")).as("n"))
      .as[(Option[String], Long)].collect().toMap
    assert(nullKeyed === Map(None -> 2L, Some("g") -> 1L))
  }

  test("TopK: exact regime (capacity >= cardinality) reproduces exact counts") {
    val items = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++
      Seq.fill(10)("c") ++ Seq.fill(5)("d")
    val df = items.toDF("v").repartition(8)
    val tk = udaf(new graft.functions.TopK(3, 16))
    val out = df.agg(tk(col("v")).as("t"))
      .select(explode(col("t.items")).as("e"))
      .select(col("e.item"), col("e.cnt"))
      .as[(String, Long)].collect().toSeq
    assert(out === Seq(("a", 40L), ("b", 25L), ("c", 10L)))
  }

  test("TopK: approximate regime keeps the heavy hitter within the MG bound") {
    // skewed stream: one item at 50%, a long tail of singletons;
    // capacity 8 << 101 distinct values
    val n = 2000
    val items = Seq.fill(n / 2)("hot") ++
      (0 until n / 2).map(i => s"tail-${i % 100}")
    val df = items.toDF("v").repartition(8)
    val tk = udaf(new graft.functions.TopK(1, 8))
    val Seq((item, cnt)) = df.agg(tk(col("v")).as("t"))
      .select(explode(col("t.items")).as("e"))
      .select(col("e.item"), col("e.cnt"))
      .as[(String, Long)].collect().toSeq
    // any item with true frequency > n/(capacity+1) must be retained,
    // and its reported count is an undercount by at most n/(cap+1)
    assert(item === "hot")
    assert(cnt <= n / 2)
    assert(cnt >= n / 2 - n / 9)
  }

  test("TopKWeighted: exact regime sums weights; null/non-positive weights ignored") {
    val df = Seq(
      ("a", 10L), ("a", 5L), ("b", 40L), ("c", 1L), ("b", -7L), ("c", 0L))
      .toDF("v", "w").repartition(4)
    val tk = udaf(new graft.functions.TopKWeighted(2, 8))
    val out = df.agg(tk(col("v"), col("w")).as("t"))
      .select(explode(col("t.items")).as("e"))
      .select(col("e.item"), col("e.cnt"))
      .as[(String, Long)].collect().toSeq
    assert(out === Seq(("b", 40L), ("a", 15L)))
  }

  test("TopKWeighted: approximate regime keeps the weight-heavy item") {
    // one item carries half the total weight; tail of 100 light items
    val rows = Seq.fill(200)(("hot", 50L)) ++
      (0 until 1000).map(i => (s"tail-${i % 100}", 10L))
    val total = rows.map(_._2).sum
    val df = rows.toDF("v", "w").repartition(8)
    val tk = udaf(new graft.functions.TopKWeighted(1, 8))
    val Seq((item, cnt)) = df.agg(tk(col("v"), col("w")).as("t"))
      .select(explode(col("t.items")).as("e"))
      .select(col("e.item"), col("e.cnt"))
      .as[(String, Long)].collect().toSeq
    assert(item === "hot")
    assert(cnt <= 10000L && cnt >= 10000L - total / 9)
  }

  test("property: MG guarantees survive arbitrary partition splits and merge trees") {
    // the partial-aggregation correctness claim: however Spark splits
    // the stream into partitions and merges the partial summaries,
    // (a) every reported count is an undercount by at most
    // n/(capacity+1), and (b) any item with true frequency above that
    // threshold is retained. 30 seeded trials, random zipf-ish data,
    // random split points, left-leaning AND right-leaning merge trees.
    import graft.functions.TopK
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 30) {
      val cap = 4 + rnd.nextInt(12)
      val agg = new TopK(cap, cap)
      val n = 500 + rnd.nextInt(1500)
      val stream = (0 until n).map { _ =>
        val r = rnd.nextDouble()
        if (r < 0.4) "heavy-0"
        else if (r < 0.6) "heavy-1"
        else s"tail-${rnd.nextInt(200)}"
      }
      val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val nSplits = 1 + rnd.nextInt(8)
      val cuts = (Seq(0, n) ++ (0 until nSplits).map(_ => rnd.nextInt(n)))
        .distinct.sorted
      val parts = cuts.zip(cuts.tail).map { case (a, b) =>
        stream.slice(a, b).foldLeft(agg.zero)(agg.reduce)
      }
      val merged =
        if (trial % 2 == 0) parts.reduceLeft(agg.merge)
        else parts.reduceRight(agg.merge)
      val bound = n / (cap + 1)
      merged.counts.foreach { case (item, c) =>
        val t = truth.getOrElse(item, 0L)
        assert(c <= t, s"trial $trial: $item overcounted $c > $t")
        assert(c >= t - bound, s"trial $trial: $item undercount $c < $t - $bound")
      }
      truth.filter(_._2 > bound).keys.foreach { item =>
        assert(merged.counts.contains(item),
          s"trial $trial: heavy item $item (freq ${truth(item)} > $bound) lost")
      }
    }
  }

  test("TopK: merge trims to capacity with the (cap+1)-th-largest subtraction") {
    import graft.functions.TopK
    val agg = new TopK(2, 2)
    val a = TopK.Buf(Map("x" -> 10L, "y" -> 6L))
    val b = TopK.Buf(Map("z" -> 5L, "y" -> 1L))
    // summed: x=10 y=7 z=5 → cut = 3rd largest = 5 → x=5 y=2
    val m = agg.merge(a, b)
    assert(m.counts === Map("x" -> 5L, "y" -> 2L))
    // result order: count desc then item asc
    val out = agg.finish(TopK.Buf(Map("b" -> 3L, "a" -> 3L, "c" -> 9L)))
    assert(out.items === Seq(TopK.Item("c", 9L), TopK.Item("a", 3L)))
  }

  test("groupArrayIntersect: set semantics, empty array annihilates, null array abstains, duplicates don't double-vote") {
    import graft.operators.AggCombinators
    val df = Seq(
      ("a", Seq("x", "y", "x")), ("a", Seq("y", "x")), ("a", Seq("y", "z")),
      ("e", Seq("p")), ("e", Seq.empty[String]),
      ("n", Seq("q"))).toDF("k", "arr")
      .unionByName(Seq(("n", null.asInstanceOf[Seq[String]]))
        .toDF("k", "arr"))
      .repartition(3)
    val out = AggCombinators.groupArrayIntersect(df, Seq("k"), col("arr"))
      .as[(String, String)].collect().toSet
    // a: y in all three rows; x misses row 3 (its in-row duplicate
    // must not compensate); e: the empty array kills everything;
    // n: the null row abstains, leaving {q}
    assert(out === Set(("a", "y"), ("n", "q")))
  }

  test("nonNegativeDerivative: rate per second, resets clamp to 0, first sample and repeated ts null") {
    import graft.operators.TimeSeries
    val df = Seq(("k", 0L, 1L, 10.0), ("k", 10L, 2L, 30.0),
      ("k", 10L, 3L, 31.0), ("k", 20L, 4L, 5.0), ("k", 25L, 5L, 6.0))
      .toDF("k", "ep", "id", "v").repartition(2)
    val out = TimeSeries.nonNegativeDerivative(df, Seq("k"),
      Seq(col("ep"), col("id")), col("ep"), col("v"))
      .select("id", "deriv_per_s")
      .as[(Long, Option[Double])].collect().toMap
    assert(out(1L).isEmpty)                  // first sample
    assert(out(2L).get === 2.0)              // (30-10)/10
    assert(out(3L).isEmpty)                  // repeated ts
    assert(out(4L).get === 0.0)              // reset clamps
    assert(out(5L).get === 0.2)              // (6-5)/5
  }

  test("groupArraySorted: equals the window row_number form, repartition-stable, small groups whole, nulls skip") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(17)
    val rows = (0 until 400).map(i =>
      (s"g${i % 3}", rnd.nextInt(50).toLong, i.toLong))
    val df = rows.toDF("g", "r", "id").repartition(7)
    val got = graft.operators.AggCombinators.groupArraySorted(
      df, Seq("g"), col("r"), col("id"), k = 6)
      .as[(String, Long, String)].collect().toSet
    val w = Window.partitionBy(col("g"))
      .orderBy(col("r"), col("id").cast("string"))
    val expect = df.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 6)
      .select(col("g"), col("r"), col("id").cast("string"))
      .as[(String, Long, String)].collect().toSet
    assert(got === expect && got.size === 18)
    // a group smaller than k yields the whole group; null ranks skip
    val tiny = Seq(("t", Some(2L), 1L), ("t", Some(1L), 2L),
      ("t", None, 3L))
      .toDF("g", "r", "id")
    val t = graft.operators.AggCombinators.groupArraySorted(
      tiny, Seq("g"), col("r"), col("id"), k = 6)
      .as[(String, Long, String)].collect().toSeq
    assert(t === Seq(("t", 1L, "2"), ("t", 2L, "1")))
  }
}
