package graft

import graft.operators.VersionedDedup
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** W1 invariants (SURVEY.md §5.2#3): unique keys, max version kept,
  * replay idempotence, window ≡ max_by formulations. Property-style
  * over seeded ScalaCheck generators (scalatestplus bridge not
  * available offline — fixed seeds keep runs reproducible).
  */
class VersionedDedupSpec extends SparkSpec {
  import spark.implicits._

  private val rowsGen = Gen.listOfN(60,
    for {
      id <- Gen.choose(0L, 9L)
      lsn <- Gen.choose(0L, 20L)
      op <- Gen.choose(1, 3)
      del <- Gen.oneOf(0, 0, 0, 1)
    } yield (id, lsn, op, del))

  private def samples(n: Int): Seq[List[(Long, Long, Int, Int)]] =
    (1 to n).flatMap(i => rowsGen.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("latestByVersion: one row per key, and it carries the max version") {
    samples(10).foreach { rows =>
      val df = rows.toDF("id", "_lsn", "_op", "is_deleted")
      val out = VersionedDedup.latestByVersion(df, Seq("id"), col("_lsn"), Seq(col("_op")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val expect = rows.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      assert(out.map(_._1).distinct.size === out.size)
      assert(out.toMap === expect)
    }
  }

  test("replay idempotence: dedup(df union df) == dedup(df)") {
    samples(6).foreach { rows =>
      val df = rows.toDF("id", "_lsn", "_op", "is_deleted")
      def norm(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(_.toSeq).sortBy(_.toString).toSeq
      assert(
        norm(VersionedDedup.latestByVersion(df.union(df), Seq("id"), col("_lsn"), Seq(col("_op")))) ===
        norm(VersionedDedup.latestByVersion(df, Seq("id"), col("_lsn"), Seq(col("_op")))))
    }
  }

  test("window and max_by formulations agree") {
    samples(6).foreach { rows =>
      val df = rows.toDF("id", "_lsn", "_op", "is_deleted")
      // collapse duplicate version vectors first: beyond (_lsn, _op)
      // both formulations tiebreak arbitrarily
      val uniq = df.dropDuplicates("id", "_lsn", "_op")
      val win = VersionedDedup.latestByVersion(uniq, Seq("id"), col("_lsn"), Seq(col("_op")))
        .select("id", "_lsn", "_op").collect().map(_.toSeq).sortBy(_.toString).toSeq
      val agg = VersionedDedup.latestByVersionAgg(uniq, Seq("id"), Seq("_lsn", "_op"))
        .select("id", "_lsn", "_op").collect().map(_.toSeq).sortBy(_.toString).toSeq
      assert(win === agg)
    }
  }

  test("currentState drops rows whose surviving version is a delete") {
    val df = Seq(
      (1L, 1L, 0), (1L, 2L, 1),           // id 1: latest is delete → gone
      (2L, 5L, 1), (2L, 9L, 0)            // id 2: latest is live → kept
    ).toDF("id", "_lsn", "is_deleted")
    val out = VersionedDedup.currentState(df, Seq("id"), col("_lsn"),
      col("is_deleted") === 1).select("id").as[Long].collect().toSeq
    assert(out === Seq(2L))
  }
}
