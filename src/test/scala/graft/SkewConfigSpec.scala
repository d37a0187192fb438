package graft

import graft.operators.SkewJoin
import graft.pipeline.IngestConfig
import org.apache.spark.sql.functions._

/** Salted skew join correctness + the reference's config defaulting
  * rules (S6/S7/F5).
  */
class SkewConfigSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin == plain join on skewed data") {
    // 1000 rows of hot key 1, tail keys 2..50
    val large = ((1 to 1000).map(i => (1L, i)) ++ (2 to 50).map(k => (k.toLong, k)))
      .toDF("k", "v")
    val small = (1 to 50).map(k => (k.toLong, s"dim-$k")).toDF("k", "name")
    val plain = large.join(small, "k").select("k", "v", "name")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val salted = SkewJoin.saltedJoin(large, small, "k", salts = 8)
      .select("k", "v", "name")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(salted === plain)
  }

  test("saltedJoinHotKeys == plain join, salting only the hot set") {
    val large = ((1 to 500).map(_ => (1L, "x")) ++ Seq((2L, "y"), (3L, "z")))
      .toDF("k", "v")
    val small = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "name")
    val plain = large.join(small, "k").collect().map(_.toSeq).sortBy(_.toString).toSeq
    val out = SkewJoin.saltedJoinHotKeys(large, small, "k", hotKeys = Seq(1L), salts = 4)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(out === plain)
  }

  test("saltedJoin left-outer keeps unmatched large rows") {
    val large = Seq((1L, "a"), (9L, "no-dim")).toDF("k", "v")
    val small = Seq((1L, "d1")).toDF("k", "name")
    val out = SkewJoin.saltedJoin(large, small, "k", salts = 4, joinType = "left")
      .select("k", "name").as[(Long, Option[String])].collect().toMap
    assert(out === Map(1L -> Some("d1"), 9L -> None))
  }

  test("saltedJoin with empty small side yields empty (inner) / all-null (left)") {
    val large = Seq((1L, "a")).toDF("k", "v")
    val small = Seq.empty[(Long, String)].toDF("k", "name")
    assert(SkewJoin.saltedJoin(large, small, "k", salts = 4).count() === 0)
    val left = SkewJoin.saltedJoin(large, small, "k", salts = 4, joinType = "left")
      .select("k", "name").as[(Long, Option[String])].collect().toSeq
    assert(left === Seq((1L, None)))
  }

  test("S6/S7: host-port and db/table defaulting mirror the reference") {
    val c = IngestConfig(host = "ch.example")
    assert(c.hostPort === "ch.example:8123")
    assert(IngestConfig(host = "h:9000").hostPort === "h:9000")
    assert(c.databaseOrDefault === "appdb")
    assert(c.tableOrDefault === "app.users_cur")
    assert(IngestConfig(host = "h", database = "db1", table = "t1").jdbcUrl
      === "jdbc:clickhouse://h:8123/db1")
  }

  test("F5: splitCSV trims and drops empties") {
    assert(IngestConfig.splitCsv(" a ,, b,c , ") === Seq("a", "b", "c"))
    assert(IngestConfig.splitCsv("") === Nil)
  }
}
