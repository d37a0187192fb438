package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** J6: the scale formulation (union + running window) must agree with
  * the naive join+top-1 formulation on random inputs (SURVEY.md §7
  * hard-parts watch list). Seeded generators — see VersionedDedupSpec.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private val sideGen = Gen.listOfN(25, for {
    k <- Gen.choose(0L, 4L); t <- Gen.choose(0L, 30L)
  } yield (k, t))

  test("tiebreak keeps its native type: string tiebreaks order correctly") {
    // two right rows at the SAME (key, time); the lexicographically
    // larger string tiebreak must win deterministically — under the
    // old cast("long") both became null and the winner was arbitrary
    val left = Seq((1L, 0L, 10L)).toDF("pid", "k", "lt")
    val right = Seq((0L, 5L, "alpha"), (0L, 5L, "zeta")).toDF("k", "rt", "tag")
    val out = AsOfJoin.asofJoin(left, right, "k",
      leftTime = col("lt"), rightTime = col("rt"),
      rightTiebreak = col("tag"), rightPayload = Seq("tag"))
      .select(col("asof.tag")).as[String].collect()
    assert(out.toSeq === Seq("zeta"))
  }

  test("non-orderable tiebreak fails fast") {
    val left = Seq((1L, 0L, 10L)).toDF("pid", "k", "lt")
    val right = Seq((0L, 5L, "x")).toDF("k", "rt", "tag")
      .withColumn("m", map(col("tag"), col("rt")))
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asofJoin(left, right, "k",
        leftTime = col("lt"), rightTime = col("rt"),
        rightTiebreak = col("m"), rightPayload = Seq("tag"))
    }
    assert(e.getMessage.contains("orderable"))
  }

  test("union-window formulation == join-window formulation") {
    (1 to 8).foreach { seed =>
      val ls = sideGen.apply(Gen.Parameters.default, Seed(seed.toLong)).get
      val rs = sideGen.apply(Gen.Parameters.default, Seed(seed.toLong + 100)).get
      val left = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("pid", "k", "lt")
      val right = rs.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("cid", "k", "rt")

      val fast = AsOfJoin.asofJoin(left, right, "k",
        leftTime = col("lt"), rightTime = col("rt"),
        rightTiebreak = col("cid"), rightPayload = Seq("cid"))
        .select(col("pid"), col("asof.cid").cast("long").as("cid"))
        .collect().map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long])))
        .toMap

      val slow = AsOfJoin.asofJoinViaJoin(
        left, col("pid"), right,
        left("k") === right("k") && col("rt") <= col("lt"),
        col("rt"), col("cid"))
        .select(col("pid"), col("cid"))
        .collect().map(r => (r.getLong(0), Some(r.getLong(1)))).toMap

      // fast emits every left row (null asof when unmatched); slow
      // inner-join drops unmatched rows entirely
      ls.indices.foreach { i =>
        val pid = i.toLong
        slow.get(pid) match {
          case Some(c) => assert(fast(pid) === c, s"seed=$seed pid=$pid")
          case None => assert(fast(pid).isEmpty, s"seed=$seed pid=$pid should be unmatched")
        }
      }
    }
  }

  test("forward and strict arms agree with a join+window reference") {
    import org.apache.spark.sql.expressions.Window
    val arms = Seq(
      // (direction, strict, join predicate, reference rank ordering)
      ("forward", false, (lt: org.apache.spark.sql.Column, rt: org.apache.spark.sql.Column) => rt >= lt,
        Seq(col("rt").asc, col("cid").asc)),
      ("forward", true, (lt: org.apache.spark.sql.Column, rt: org.apache.spark.sql.Column) => rt > lt,
        Seq(col("rt").asc, col("cid").asc)),
      ("backward", true, (lt: org.apache.spark.sql.Column, rt: org.apache.spark.sql.Column) => rt < lt,
        Seq(col("rt").desc, col("cid").desc)))
    for (seed <- 1 to 5; (dir, strict, cond, ord) <- arms) {
      val ls = sideGen.apply(Gen.Parameters.default, Seed(seed.toLong)).get
      val rs = sideGen.apply(Gen.Parameters.default, Seed(seed.toLong + 100)).get
      val left = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("pid", "k", "lt")
      val right = rs.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("cid", "k", "rt")

      val fast = AsOfJoin.asofJoin(left, right, "k",
        leftTime = col("lt"), rightTime = col("rt"),
        rightTiebreak = col("cid"), rightPayload = Seq("cid"),
        direction = dir, strict = strict)
        .select(col("pid"), col("asof.cid").cast("long").as("cid"))
        .collect().map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long])))
        .toMap

      val w = Window.partitionBy(col("pid")).orderBy(ord: _*)
      val slow = left.join(right, left("k") === right("k") && cond(col("lt"), col("rt")))
        .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
        .select(col("pid"), col("cid"))
        .collect().map(r => (r.getLong(0), Some(r.getLong(1)))).toMap

      ls.indices.foreach { i =>
        val pid = i.toLong
        slow.get(pid) match {
          case Some(c) => assert(fast(pid) === c, s"$dir strict=$strict seed=$seed pid=$pid")
          case None => assert(fast(pid).isEmpty,
            s"$dir strict=$strict seed=$seed pid=$pid should be unmatched")
        }
      }
    }
  }

  test("equal-time right row: inclusive matches it, strict skips it") {
    val left = Seq((1L, 0L, 10L)).toDF("pid", "k", "lt")
    val right = Seq((7L, 0L, 10L), (3L, 0L, 4L)).toDF("cid", "k", "rt")
    def run(dir: String, strict: Boolean) =
      AsOfJoin.asofJoin(left, right, "k",
        leftTime = col("lt"), rightTime = col("rt"),
        rightTiebreak = col("cid"), rightPayload = Seq("cid"),
        direction = dir, strict = strict)
        .select(col("asof.cid").cast("long")).as[Option[Long]].collect().head
    assert(run("backward", strict = false) === Some(7L)) // equal-t click
    assert(run("backward", strict = true) === Some(3L))  // earlier click
    assert(run("forward", strict = false) === Some(7L))  // equal-t click
    assert(run("forward", strict = true) === None)       // nothing after
  }

  test("J6d nearest agrees with a join+window reference on random inputs") {
    import org.apache.spark.sql.expressions.Window
    for (seed <- 1 to 8) {
      val ls = sideGen.apply(Gen.Parameters.default, Seed(seed.toLong)).get
      val rs = sideGen.apply(Gen.Parameters.default, Seed(seed.toLong + 100)).get
      val left = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("pid", "k", "lt")
      val right = rs.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("cid", "k", "rt")

      val fast = AsOfJoin.asofJoinNearest(left, right, "k",
        leftTime = col("lt"), rightTime = col("rt"),
        rightTiebreak = col("cid"), rightPayload = Seq("cid", "rt"),
        rightTimeField = "rt")
        .select(col("pid"), col("asof.cid").cast("long").as("cid"))
        .collect().map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long])))
        .toMap

      // reference: rank ALL same-key rights by (|gap|, backward-first,
      // side-mirrored cid tiebreak)
      val w = Window.partitionBy(col("pid")).orderBy(
        abs(col("rt") - col("lt")).asc,
        when(col("rt") <= col("lt"), 0).otherwise(1).asc,
        when(col("rt") <= col("lt"), col("cid")).desc_nulls_last,
        col("cid").asc)
      val slow = left.join(right, left("k") === right("k"))
        .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
        .select(col("pid"), col("cid"))
        .collect().map(r => (r.getLong(0), Some(r.getLong(1)))).toMap

      ls.indices.foreach { i =>
        val pid = i.toLong
        slow.get(pid) match {
          case Some(c) => assert(fast(pid) === c, s"nearest seed=$seed pid=$pid")
          case None => assert(fast(pid).isEmpty, s"nearest seed=$seed pid=$pid unmatched")
        }
      }
    }
  }

  test("J6d nearest: equidistant tie prefers backward; equal time wins at gap 0") {
    def run(rights: Seq[(Long, Long, Long)], lt: Long) = {
      val left = Seq((1L, 0L, lt)).toDF("pid", "k", "lt")
      val right = rights.toDF("cid", "k", "rt")
      AsOfJoin.asofJoinNearest(left, right, "k",
        leftTime = col("lt"), rightTime = col("rt"),
        rightTiebreak = col("cid"), rightPayload = Seq("cid", "rt"),
        rightTimeField = "rt")
        .select(col("asof.cid").cast("long")).as[Option[Long]].collect().head
    }
    // gap 3 behind (cid 3) vs gap 3 ahead (cid 7): backward wins
    assert(run(Seq((3L, 0L, 7L), (7L, 0L, 13L)), lt = 10L) === Some(3L))
    // a strictly closer forward row beats a farther backward row
    assert(run(Seq((3L, 0L, 2L), (7L, 0L, 12L)), lt = 10L) === Some(7L))
    // an equal-time row is gap 0 and beats both neighbors; at tied
    // time the backward rule keeps max cid
    assert(run(Seq((3L, 0L, 9L), (5L, 0L, 10L), (8L, 0L, 10L), (7L, 0L, 11L)),
      lt = 10L) === Some(8L))
    // no rights of the key at all → null
    assert(run(Seq((3L, 9L, 9L)), lt = 10L) === None)
  }

  test("J6d nearest plan: one exchange, never an L×R join") {
    val left = (1L to 50L).map(i => (i, i % 5, i)).toDF("pid", "k", "lt")
    val right = (1L to 50L).map(i => (i, i % 5, i + 1)).toDF("cid", "k", "rt")
    val plan = AsOfJoin.asofJoinNearest(left, right, "k",
      leftTime = col("lt"), rightTime = col("rt"),
      rightTiebreak = col("cid"), rightPayload = Seq("cid", "rt"),
      rightTimeField = "rt")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"nearest must stay join-free:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected exactly one shuffle, got $exchanges:\n$plan")
  }
}
