package graft

import graft.operators.IntervalJoin
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** J5b: the bucketized equi-join formulation must agree with the
  * naive theta join on random intervals (including negative times and
  * bucket widths far from the interval lengths), emit every pair
  * exactly once without a dedup, and never plan a nested loop.
  */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private val gen = Gen.listOfN(40, for {
    s <- Gen.choose(-100L, 100L); len <- Gen.choose(0L, 50L)
  } yield (s, s + len))

  test("J5b overlap join equals the naive theta join on random intervals") {
    for (seed <- 1 to 6; w <- Seq(7L, 30L, 1000L)) {
      val ls = gen.apply(Gen.Parameters.default, Seed(seed.toLong)).get
      val rs = gen.apply(Gen.Parameters.default, Seed(seed.toLong + 500)).get
      val left = ls.zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
        .toDF("lid", "ls", "le")
      val right = rs.zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
        .toDF("rid", "rs", "re")
      val got = IntervalJoin.overlapJoin(left, right,
        col("ls"), col("le"), col("rs"), col("re"), w)
        .select("lid", "rid").as[(Long, Long)].collect().toSeq
      // exactly-once emission — the first-shared-bucket rule, not a dedup
      assert(got.size == got.toSet.size, s"seed=$seed w=$w duplicate pairs")
      val want = left.join(right,
        col("ls") <= col("re") && col("rs") <= col("le"))
        .select("lid", "rid").as[(Long, Long)].collect().toSet
      assert(got.toSet == want, s"seed=$seed w=$w")
    }
  }

  test("J5b touching endpoints count, disjoint do not, negatives bucket correctly") {
    val left = Seq((1L, -10L, 0L), (2L, 5L, 6L)).toDF("lid", "ls", "le")
    val right = Seq((1L, 0L, 3L), (2L, 7L, 9L)).toDF("rid", "rs", "re")
    val got = IntervalJoin.overlapJoin(left, right,
      col("ls"), col("le"), col("rs"), col("re"), 4L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 1L)))
  }

  test("J5b keyed overlap join restricts pairs to equal keys, matches the reference") {
    val left = Seq((1L, 10L, 0L, 5L), (2L, 20L, 0L, 5L)).toDF("lid", "luser", "ls", "le")
    val right = Seq((1L, 10L, 3L, 8L), (2L, 30L, 3L, 8L)).toDF("rid", "ruser", "rs", "re")
    val got = IntervalJoin.overlapJoin(left, right,
      col("ls"), col("le"), col("rs"), col("re"), 4L,
      keys = Seq("luser" -> "ruser"))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    // rid 2 overlaps in time but belongs to another key
    assert(got == Set((1L, 1L)))
    // randomized keyed equivalence vs the naive theta+key join
    for (seed <- 1 to 4) {
      val ls = gen.apply(org.scalacheck.Gen.Parameters.default,
        Seed(seed.toLong)).get
      val rs = gen.apply(org.scalacheck.Gen.Parameters.default,
        Seed(seed.toLong + 900)).get
      val l = ls.zipWithIndex.map { case ((a, b), i) =>
        (i.toLong, i.toLong % 3, a, b) }.toDF("lid", "luser", "ls", "le")
      val r = rs.zipWithIndex.map { case ((a, b), i) =>
        (i.toLong, i.toLong % 3, a, b) }.toDF("rid", "ruser", "rs", "re")
      val fast = IntervalJoin.overlapJoin(l, r,
        col("ls"), col("le"), col("rs"), col("re"), 15L,
        keys = Seq("luser" -> "ruser"))
        .select("lid", "rid").as[(Long, Long)].collect().toSet
      val want = l.join(r, col("luser") === col("ruser") &&
          col("ls") <= col("re") && col("rs") <= col("le"))
        .select("lid", "rid").as[(Long, Long)].collect().toSet
      assert(fast == want, s"keyed seed=$seed")
    }
  }

  test("J5c point-in-range equals the theta join; lo inclusive, hi exclusive; no dupes") {
    for (seed <- 1 to 4; w <- Seq(3.0, 17.0, 500.0)) {
      val rs = gen.apply(Gen.Parameters.default, Seed(seed.toLong + 900)).get
      val ranges = rs.zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
        .toDF("rid", "lo", "hi")
      val pts = Gen.listOfN(60, Gen.choose(-120L, 120L))
        .apply(Gen.Parameters.default, Seed(seed.toLong)).get
        .zipWithIndex.map { case (v, i) => (i.toLong, v.toDouble + 0.5) }
        .toDF("pid", "p")
      val got = IntervalJoin.pointInRangeJoin(pts, col("p"),
        ranges, col("lo"), col("hi"), w)
        .select("pid", "rid").as[(Long, Long)].collect().toSeq
      assert(got.size == got.toSet.size, s"seed=$seed w=$w duplicate pairs")
      val want = pts.join(ranges, col("p") >= col("lo") && col("p") < col("hi"))
        .select("pid", "rid").as[(Long, Long)].collect().toSet
      assert(got.toSet == want, s"seed=$seed w=$w")
    }
    // boundary semantics, exactly: p == lo matches, p == hi does not
    val b = IntervalJoin.pointInRangeJoin(
      Seq((1L, 10.0), (2L, 20.0)).toDF("pid", "p"), col("p"),
      Seq((7L, 10.0, 20.0)).toDF("rid", "lo", "hi"),
      col("lo"), col("hi"), 4.0)
      .select("pid").as[Long].collect().toSeq
    assert(b == Seq(1L))
  }

  test("J5c plan is an equi join, never a nested loop or cartesian") {
    val pts = (1L to 300L).map(i => (i, i * 3.0)).toDF("pid", "p")
    val ranges = (1L to 300L).map(i => (i, i * 5.0, i * 5.0 + 12.0))
      .toDF("rid", "lo", "hi")
    val plan = IntervalJoin.pointInRangeJoin(pts, col("p"),
      ranges, col("lo"), col("hi"), 8.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"point-in-range join must stay equi-keyed:\n$plan")
  }

  test("J5c keyed point-in-range equals the keyed theta join; plan keys on (key, bucket)") {
    // per-tenant range classification: a point only matches ranges of
    // ITS tenant, even when a foreign tenant's range covers the value
    val pts = Seq((1L, 10L, 5.0), (2L, 20L, 5.0)).toDF("pid", "puser", "p")
    val ranges = Seq((7L, 10L, 0.0, 10.0)).toDF("rid", "ruser", "lo", "hi")
    val got0 = IntervalJoin.pointInRangeJoin(pts, col("p"),
      ranges, col("lo"), col("hi"), 4.0, keys = Seq("puser" -> "ruser"))
      .select("pid", "rid").as[(Long, Long)].collect().toSet
    assert(got0 == Set((1L, 7L)))
    // randomized keyed equivalence vs the naive theta+key join
    for (seed <- 1 to 4; w <- Seq(3.0, 17.0)) {
      val rs = gen.apply(Gen.Parameters.default, Seed(seed.toLong + 300)).get
      val r = rs.zipWithIndex.map { case ((a, b), i) =>
        (i.toLong, i.toLong % 3, a, b) }.toDF("rid", "ruser", "lo", "hi")
      val p = Gen.listOfN(60, Gen.choose(-120L, 120L))
        .apply(Gen.Parameters.default, Seed(seed.toLong)).get
        .zipWithIndex.map { case (v, i) =>
          (i.toLong, i.toLong % 3, v.toDouble + 0.5) }.toDF("pid", "puser", "p")
      val fast = IntervalJoin.pointInRangeJoin(p, col("p"),
        r, col("lo"), col("hi"), w, keys = Seq("puser" -> "ruser"))
        .select("pid", "rid").as[(Long, Long)].collect().toSeq
      assert(fast.size == fast.toSet.size, s"keyed seed=$seed w=$w dup pairs")
      val want = p.join(r, col("puser") === col("ruser") &&
          col("p") >= col("lo") && col("p") < col("hi"))
        .select("pid", "rid").as[(Long, Long)].collect().toSet
      assert(fast.toSet == want, s"keyed seed=$seed w=$w")
    }
    // the exchange must hash on the COMPOSITE (key, bucket) — both
    // columns appear in the equi-join key list, and no nested loop
    val plan = IntervalJoin.pointInRangeJoin(
      (1L to 300L).map(i => (i, i % 5, i * 3.0)).toDF("pid", "puser", "p"),
      col("p"),
      (1L to 300L).map(i => (i, i % 5, i * 5.0, i * 5.0 + 12.0))
        .toDF("rid", "ruser", "lo", "hi"),
      col("lo"), col("hi"), 8.0, keys = Seq("puser" -> "ruser"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"keyed point-in-range join must stay equi-keyed:\n$plan")
    assert(plan.contains("puser") && plan.contains("__pbk"),
      s"join key must carry both the tenant key and the bucket:\n$plan")
  }

  test("J5c inverted ranges match nothing; over-long ranges fail with a clear message") {
    val pts = Seq((1L, 5.0)).toDF("pid", "p")
    // hi < lo: dropped before the explode — no junk buckets, no rows
    val inv = Seq((7L, 10.0, 0.0)).toDF("rid", "lo", "hi")
    assert(IntervalJoin.pointInRangeJoin(pts, col("p"),
      inv, col("lo"), col("hi"), 4.0).count() == 0L)
    // span/bucketWidth over the cap: a clear misconfiguration error,
    // not an opaque array-size failure deep inside sequence()
    val long = Seq((7L, 0.0, 1e9)).toDF("rid", "lo", "hi")
    val ex = intercept[Exception] {
      IntervalJoin.pointInRangeJoin(pts, col("p"),
        long, col("lo"), col("hi"), 1.0,
        maxBucketsPerRange = 1000L).count()
    }
    assert(ex.getMessage.contains("maxBucketsPerRange"),
      s"expected the guard message, got: ${ex.getMessage}")
  }

  test("J5b plan is an equi join, never a nested loop or cartesian") {
    val left = (1L to 200L).map(i => (i, i * 10, i * 10 + 5)).toDF("lid", "ls", "le")
    val right = (1L to 200L).map(i => (i, i * 10 + 3, i * 10 + 8)).toDF("rid", "rs", "re")
    val plan = IntervalJoin.overlapJoin(left, right,
      col("ls"), col("le"), col("rs"), col("re"), 16L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"overlap join must stay equi-keyed:\n$plan")
  }
}
