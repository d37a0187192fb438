package graft

import graft.operators.Collapsing
import org.apache.spark.sql.functions._

/** W1f/W1g — ClickHouse Collapsing / VersionedCollapsing MergeTree
  * FINAL semantics on hand-crafted sign streams (the engine-defined
  * edge cases the events-derived oracle query cannot isolate).
  */
class CollapsingSpec extends SparkSpec {
  import spark.implicits._

  private def feed(rows: (Long, Long, String, Int)*) =
    rows.toDF("k", "ver", "payload", "sign")

  test("collapseFinal: latest uncancelled +1 wins; fully-cancelled keys vanish") {
    val df = feed(
      // key 1: v1 written, cancelled, v2 written -> v2 survives
      (1L, 1L, "a", 1), (1L, 1L, "a", -1), (1L, 2L, "b", 1),
      // key 2: single state then delete-cancel -> net 0, vanishes
      (2L, 1L, "x", 1), (2L, 1L, "x", -1),
      // key 3: never cancelled
      (3L, 7L, "z", 1))
    val out = Collapsing.collapseFinal(df, Seq("k"), col("sign"), Seq("ver"))
      .select("k", "ver", "payload").as[(Long, Long, String)].collect().toSet
    assert(out === Set((1L, 2L, "b"), (3L, 7L, "z")))
  }

  test("collapseFinal: duplicate cancels over-subtract (negative net drops the key, as in ClickHouse)") {
    val df = feed((1L, 1L, "a", 1), (1L, 1L, "a", -1), (1L, 1L, "a", -1))
    assert(Collapsing.collapseFinal(df, Seq("k"), col("sign"), Seq("ver")).isEmpty)
  }

  test("collapseFinal: delete then re-insert resurrects the key with the new state") {
    val df = feed(
      (1L, 1L, "a", 1), (1L, 1L, "a", -1), // delete closes v1
      (1L, 3L, "c", 1))                    // later re-insert
    val out = Collapsing.collapseFinal(df, Seq("k"), col("sign"), Seq("ver"))
      .select("k", "ver", "payload").as[(Long, Long, String)].collect().toSet
    assert(out === Set((1L, 3L, "c")))
  }

  test("collapseFinal: stable under repartition (partial-agg merge correctness)") {
    val df = feed(
      (1L, 1L, "a", 1), (1L, 1L, "a", -1), (1L, 2L, "b", 1),
      (2L, 1L, "x", 1), (2L, 1L, "x", -1), (3L, 7L, "z", 1))
    val a = Collapsing.collapseFinal(df, Seq("k"), col("sign"), Seq("ver"))
      .select("k", "ver", "payload").as[(Long, Long, String)].collect().toSet
    val b = Collapsing.collapseFinal(df.repartition(13), Seq("k"), col("sign"), Seq("ver"))
      .select("k", "ver", "payload").as[(Long, Long, String)].collect().toSet
    assert(a === b)
  }

  test("collapseVersionedFinal: cancels annihilate only their (key, version) pair") {
    val df = feed(
      // key 1: v1 and v2 written; a LATE cancel for v1 arrives after
      // v2 (out-of-order) — plain sign arithmetic would kill v2's
      // candidacy under adjacency assumptions; version matching kills
      // exactly v1
      (1L, 2L, "new", 1), (1L, 1L, "old", -1), (1L, 1L, "old", 1),
      // key 2: both versions cancelled -> vanishes
      (2L, 1L, "x", 1), (2L, 1L, "x", -1), (2L, 2L, "y", 1), (2L, 2L, "y", -1))
    val out = Collapsing.collapseVersionedFinal(
      df, Seq("k"), col("sign"), Seq("ver"))
      .select("k", "ver", "payload").as[(Long, Long, String)].collect().toSet
    assert(out === Set((1L, 2L, "new")))
  }

  test("collapseVersionedFinal: latest SURVIVING version wins, not latest written") {
    val df = feed(
      (1L, 1L, "a", 1), (1L, 2L, "b", 1), (1L, 2L, "b", -1))
    val out = Collapsing.collapseVersionedFinal(
      df, Seq("k"), col("sign"), Seq("ver"))
      .select("k", "ver", "payload").as[(Long, Long, String)].collect().toSet
    assert(out === Set((1L, 1L, "a")))
  }

  test("collapseVersionedFinal: stable under repartition") {
    val df = feed(
      (1L, 2L, "new", 1), (1L, 1L, "old", -1), (1L, 1L, "old", 1),
      (2L, 1L, "x", 1), (2L, 1L, "x", -1))
    val a = Collapsing.collapseVersionedFinal(df, Seq("k"), col("sign"), Seq("ver"))
      .select("k", "ver", "payload").as[(Long, Long, String)].collect().toSet
    val b = Collapsing.collapseVersionedFinal(
      df.repartition(11), Seq("k"), col("sign"), Seq("ver"))
      .select("k", "ver", "payload").as[(Long, Long, String)].collect().toSet
    assert(a === b && a === Set((1L, 2L, "new")))
  }
}
