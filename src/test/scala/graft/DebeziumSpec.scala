package graft

import graft.pipeline.Debezium
import org.apache.spark.sql.functions._

/** Reference pipeline edge cases as a table (SURVEY.md §5.2#2):
  * every branch of /root/reference/internal/ingestion/cdc.go:62-156.
  */
class DebeziumSpec extends SparkSpec {
  import spark.implicits._

  private def rows(pairs: (String, String)*) = {
    val df = pairs.toSeq.toDF("value", "key")
    Debezium.translateRows(df, col("value"), col("key"))
      .select("id", "name", "email", "is_deleted", "_op", "_lsn")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getInt(3), r.getInt(4), r.getLong(5))).toSeq
  }

  private val create =
    """{"before":null,"after":{"id":7,"name":"n7","email":"e7"},"source":{"lsn":100,"ts_us":1},"op":"c","ts_us":1}"""

  test("create row flattens after-image") {
    assert(rows(create -> """{"id":7}""") === Seq((7L, "n7", "e7", 0, 1, 100L)))
  }

  test("bad JSON payload is skipped, not failed (P2, cdc.go:62-67)") {
    assert(rows("not json at all" -> null, create -> null).size === 1)
  }

  test("double-encoded envelope falls back to unquote-then-parse (F11, cdc.go:87-98)") {
    val doubled = "\"" + create.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    assert(rows(doubled -> null) === Seq((7L, "n7", "e7", 0, 1, 100L)))
  }

  test("string literal that is not an envelope is skipped") {
    assert(rows("\"just a string\"" -> null).isEmpty)
  }

  test("c/u with missing after is dropped (P3, cdc.go:114-118)") {
    val noAfter = """{"before":null,"after":null,"source":{"lsn":5},"op":"u"}"""
    assert(rows(noAfter -> null).isEmpty)
  }

  test("unknown op is dropped (P4, cdc.go:139-142)") {
    val x = """{"after":{"id":1,"name":"a","email":"b"},"source":{"lsn":5},"op":"r"}"""
    assert(rows(x -> null).isEmpty)
  }

  test("op matching is case-SENSITIVE: 'C' drops (cdc.go:114-143 raw switch)") {
    val up = create.replace("\"op\":\"c\"", "\"op\":\"C\"")
    assert(rows(up -> null).isEmpty)
  }

  test("delete takes before.id, null name/email, is_deleted=1 (cdc.go:125-137)") {
    val del = """{"before":{"id":9,"name":"gone","email":"g"},"after":null,"source":{"lsn":200,"ts_us":2},"op":"d","ts_us":2}"""
    assert(rows(del -> null) === Seq((9L, null, null, 1, 3, 200L)))
  }

  test("delete with zero before.id falls back to the Kafka key id (cdc.go:126-134)") {
    val del = """{"before":{"id":0,"name":null,"email":null},"after":null,"source":{"lsn":201},"op":"d"}"""
    assert(rows(del -> """{"id":33}""") === Seq((33L, null, null, 1, 3, 201L)))
  }

  test("delete with neither before.id nor key still emits an id=0 tombstone (cdc.go:125-137)") {
    val del = """{"before":null,"after":null,"source":{"lsn":201},"op":"d"}"""
    assert(rows(del -> null) === Seq((0L, null, null, 1, 3, 201L)))
  }

  test("_ts comes only from top-level ts_us; source.ts_us is ignored (cdc.go:106-109)") {
    val noTop = """{"after":{"id":1,"name":"a","email":"b"},"source":{"lsn":5,"ts_us":123456789},"op":"c"}"""
    val ts = Debezium.translateRows(Seq(noTop -> "").toDF("value", "key"),
      col("value"), col("key")).select(date_format(col("_ts"), "yyyy-MM-dd HH:mm:ss"))
      .collect().head.getString(0)
    assert(ts === "1970-01-01 00:00:00")
  }

  test("nil lsn defaults to 0 (P6, cdc.go:101-105)") {
    val noLsn = """{"after":{"id":1,"name":"a","email":"b"},"source":{},"op":"c","ts_us":5}"""
    assert(rows(noLsn -> null).head._6 === 0L)
  }

  test("nil ts_us defaults to epoch (P6, cdc.go:106-109)") {
    val noTs = """{"after":{"id":1,"name":"a","email":"b"},"source":{"lsn":5},"op":"c"}"""
    val ts = Debezium.translateRows(Seq(noTs -> "").toDF("value", "key"),
      col("value"), col("key")).select(date_format(col("_ts"), "yyyy-MM-dd HH:mm:ss"))
      .collect().head.getString(0)
    assert(ts === "1970-01-01 00:00:00")
  }

  test("null source struct: lsn defaults to 0 through the null-struct field access") {
    val noSource = """{"after":{"id":1,"name":"a","email":"b"},"op":"c","ts_us":5}"""
    assert(rows(noSource -> null).head._6 === 0L)
  }

  test("empty-string value and empty-object envelope are skipped") {
    // empty object parses but has unknown (null) op -> dropped; empty
    // string fails both parse paths -> dropped
    assert(rows("{}" -> null, "" -> null).isEmpty)
  }

  test("JSONEachRow serialization keeps exactly the reference field set (P7/F12)") {
    val out = Debezium.toJsonEachRow(
      Debezium.translateRows(Seq(create -> "").toDF("value", "key"),
        col("value"), col("key"))).collect().head.getString(0)
    assert(out === """{"id":7,"name":"n7","email":"e7","is_deleted":0,"_op":1,"_lsn":100,"_ts":"1970-01-01 00:00:00"}""")
  }

  test("delete rows serialize Go zero values name/email as empty strings (clickhouse.go:113-124)") {
    val del = """{"before":{"id":9,"name":"gone","email":"g"},"after":null,"source":{"lsn":200,"ts_us":2},"op":"d","ts_us":2}"""
    val out = Debezium.toJsonEachRow(
      Debezium.translateRows(Seq(del -> "").toDF("value", "key"),
        col("value"), col("key"))).collect().head.getString(0)
    // byte-identical to Go's marshal of the zero-valued struct fields —
    // to_json must NOT drop the null name/email
    assert(out === """{"id":9,"name":"","email":"","is_deleted":1,"_op":3,"_lsn":200,"_ts":"1970-01-01 00:00:00"}""")
  }

  test("property: random envelopes match a plain-Scala model of cdc.go:100-143") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed

    case class User(id: Long, name: String, email: String)
    case class Env(op: Option[String], before: Option[User], after: Option[User],
        lsn: Option[Long], tsUs: Option[Long], keyId: Option[Long], doubled: Boolean)

    val userGen = for {
      id <- Gen.choose(0L, 5L); n <- Gen.alphaStr.map(_.take(4))
    } yield User(id, s"n$n", s"e$n")
    val envGen = for {
      op <- Gen.oneOf(Some("c"), Some("u"), Some("d"), Some("x"), Some("C"), None)
      before <- Gen.option(userGen)
      after <- Gen.option(userGen)
      lsn <- Gen.option(Gen.choose(0L, 999L))
      tsUs <- Gen.option(Gen.choose(0L, 2000000L))
      keyId <- Gen.option(Gen.choose(1L, 9L))
      doubled <- Gen.oneOf(true, false)
    } yield Env(op, before, after, lsn, tsUs, keyId, doubled)

    def userJson(u: User) = s"""{"id":${u.id},"name":"${u.name}","email":"${u.email}"}"""
    def render(e: Env): (String, String) = {
      val json = '{' +
        s""""before":${e.before.map(userJson).getOrElse("null")},""" +
        s""""after":${e.after.map(userJson).getOrElse("null")},""" +
        s""""source":{"lsn":${e.lsn.map(_.toString).getOrElse("null")},"ts_us":1},""" +
        s""""op":${e.op.map("\"" + _ + "\"").getOrElse("null")}""" +
        e.tsUs.map(t => s""","ts_us":$t""").getOrElse("") + "}"
      val value = if (e.doubled)
        "\"" + json.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      else json
      (value, e.keyId.map(k => s"""{"id":$k}""").orNull)
    }

    // plain-Scala mirror of the reference translate switch
    def model(e: Env): Option[(Long, String, String, Int, Int, Long, Long)] = e.op match {
      case Some(op @ ("c" | "u")) if e.after.isDefined =>
        val a = e.after.get
        Some((a.id, a.name, a.email, 0, if (op == "c") 1 else 2,
          e.lsn.getOrElse(0L), e.tsUs.getOrElse(0L)))
      case Some("d") =>
        val id = e.before.map(_.id).filter(_ != 0).orElse(e.keyId).getOrElse(0L)
        Some((id, null, null, 1, 3, e.lsn.getOrElse(0L), e.tsUs.getOrElse(0L)))
      case _ => None
    }

    (1 to 4).foreach { seed =>
      val envs = Gen.listOfN(120, envGen)
        .apply(Gen.Parameters.default, Seed(seed.toLong)).get
      val df = envs.map(render).toDF("value", "key")
      val got = Debezium.translateRows(df, col("value"), col("key"))
        .select(col("id"), col("name"), col("email"), col("is_deleted"),
          col("_op"), col("_lsn"), unix_micros(col("_ts")))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getInt(3),
          r.getInt(4), r.getLong(5), r.getLong(6)))
      // row order is partition-dependent and name/email may be null —
      // compare as sorted string multisets
      assert(got.map(_.toString).sorted.toSeq ===
        envs.flatMap(model).map(_.toString).sorted, s"seed=$seed")
    }
  }

  test("nil ts_us fallback is the UTC epoch INSTANT even in a non-UTC session") {
    val noTs = """{"after":{"id":1,"name":"a","email":"b"},"source":{"lsn":5},"op":"c"}"""
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.session.timeZone", "America/New_York")
    import s2.implicits._
    val micros = Debezium.translateRows(
      Seq(noTs -> "").toDF("value", "key"), col("value"), col("key"))
      .select(unix_micros(col("_ts"))).as[Long].collect().head
    // to_timestamp(lit("1970-01-01 00:00:00")) would parse in session
    // tz and land at +05:00 UTC here; timestamp_seconds(0) is tz-free
    assert(micros === 0L)
  }
}
