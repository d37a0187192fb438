package graft

import graft.operators.{IntervalAgg, StatsAgg}
import org.apache.spark.sql.functions._

/** A19/A20/A21 — interval aggregates and statistical aggregates on
  * hand-built fixtures: the engine-defined conventions (half-open
  * sweep, touching-interval merge, degenerate-group nulls) the
  * events-derived oracle queries cannot isolate.
  */
class IntervalStatsSpec extends SparkSpec {
  import spark.implicits._

  test("intervalLengthSum: overlap merges, touching merges, gaps split islands; zero-length adds nothing") {
    val df = Seq(
      // key a: [0,10) ∪ [5,20) ∪ [20,25) = [0,25), gap, [30,40)
      ("a", 0L, 10L), ("a", 5L, 20L), ("a", 20L, 25L), ("a", 30L, 40L),
      // key b: one interval + a zero-length one inside it
      ("b", 0L, 5L), ("b", 3L, 3L),
      // key c: null bounds dropped entirely
      ("c", 1L, 2L)).toDF("k", "s", "e")
      .unionByName(Seq(("c", null.asInstanceOf[java.lang.Long],
        java.lang.Long.valueOf(9L))).toDF("k", "s", "e"))
    val out = IntervalAgg.intervalLengthSum(df, Seq("k"), col("s"), col("e"))
      .select("k", "n_intervals", "n_islands", "union_len")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out("a") === (("a", 4L, 2L, 35L)))
    assert(out("b") === (("b", 2L, 1L, 5L)))
    assert(out("c") === (("c", 1L, 1L, 1L)))
  }

  test("intervalLengthSum: stable under repartition (window + agg merge correctness)") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 300).map(_ =>
      ("k", rnd.nextInt(1000).toLong, 0L)).map { case (k, s, _) =>
      (k, s, s + rnd.nextInt(50) + 1L) }
    val a = IntervalAgg.intervalLengthSum(rows.toDF("k", "s", "e"),
      Seq("k"), col("s"), col("e")).select("union_len").as[Long].head()
    val b = IntervalAgg.intervalLengthSum(rows.toDF("k", "s", "e")
      .repartition(13), Seq("k"), col("s"), col("e"))
      .select("union_len").as[Long].head()
    assert(a === b)
  }

  test("maxIntersections: half-open sweep — touching intervals never count as 2; nested stack counts fully") {
    val df = Seq(
      // a: [0,10),[10,20) touch → peak 1, first reached at 0
      ("a", 0L, 10L), ("a", 10L, 20L),
      // b: nested [0,100) ⊃ [10,50) ⊃ [20,30) → peak 3 at 20
      ("b", 0L, 100L), ("b", 10L, 50L), ("b", 20L, 30L),
      // c: zero-length [5,5) contributes nothing → peak from [0,9) = 1
      ("c", 0L, 9L), ("c", 5L, 5L)).toDF("k", "s", "e")
    val out = IntervalAgg.maxIntersections(df, Seq("k"), col("s"), col("e"))
      .select("k", "max_intersections", "position")
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out("a") === (("a", 1L, 0L)))
    assert(out("b") === (("b", 3L, 20L)))
    assert(out("c") === (("c", 1L, 0L)))
  }

  test("entropy: uniform = log2(k), constant = 0; nulls form their own category") {
    val uniform = (0 until 64).map(i => ("u", (i % 8).toString))
    val const = (0 until 10).map(_ => ("c", "x"))
    val out = StatsAgg.entropy(
      (uniform ++ const).toDF("k", "v"), Seq("k"), col("v"))
      .select("k", "n_rows", "n_categories", "entropy")
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out("u") === (("u", 64L, 8L, 3.0)))
    assert(out("c") === (("c", 10L, 1L, 0.0)))
    val withNull = Seq(("n", "a"), ("n", "a")).toDF("k", "v")
      .unionByName(Seq(("n", null.asInstanceOf[String]),
        ("n", null.asInstanceOf[String])).toDF("k", "v"))
    val h = StatsAgg.entropy(withNull, Seq("k"), col("v"))
      .select("n_categories", "entropy").as[(Long, Double)].head()
    assert(h === ((2L, 1.0)))
  }

  test("cramersV: perfect association = 1, independence = 0, degenerate table = null") {
    // perfect: b determined by a (2×2 diagonal)
    val perfect = (0 until 40).map(i => ("p", i % 2, i % 2))
    // independent: all four cells equal
    val indep = (0 until 40).map(i => ("i", i % 2, (i / 2) % 2))
    // degenerate: one column constant
    val degen = (0 until 10).map(i => ("d", i % 3, 7))
    val out = StatsAgg.cramersV(
      (perfect ++ indep ++ degen).toDF("k", "a", "b"),
      Seq("k"), col("a"), col("b"))
      .select("k", "chi2", "cramers_v")
      .as[(String, Double, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(out("p") === (("p", 40.0, Some(1.0))))
    assert(out("i") === (("i", 0.0, Some(0.0))))
    assert(out("d")._3 === None)
  }

  test("boundingRatio: endpoint slope with deterministic tiebreak; degenerate span = null") {
    val df = Seq(
      // slope (40-10)/(30-0) = 1.0; the tied x=30 rows resolve by tie
      // id — id 2 (y=40) outranks id 1 (y=99)... max struct picks the
      // larger tie, so tie=5 (y=40) wins over tie=2 (y=99)
      ("a", 0L, 1L, 10.0), ("a", 30L, 2L, 99.0), ("a", 30L, 5L, 40.0),
      // degenerate: all x equal
      ("d", 7L, 1L, 1.0), ("d", 7L, 2L, 2.0)).toDF("k", "x", "t", "y")
    val out = StatsAgg.boundingRatio(df, Seq("k"), col("x"), col("y"),
      col("t"))
      .select("k", "x_lo", "x_hi", "bounding_ratio")
      .as[(String, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(out("a") === (("a", 0L, 30L, Some(1.0))))
    assert(out("d") === (("d", 7L, 7L, None)))
  }
}
