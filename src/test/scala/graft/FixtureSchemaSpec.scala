package graft

import org.apache.spark.sql.types._

/** Fixture-schema canary (round-10 VERDICT item #3).
  *
  * The driver regenerates /root/testdata between rounds and has already
  * changed column types once (round 9: events.ts went from parquet
  * TIMESTAMP(NANOS) to timestamp[us], silently erroring 24 registered
  * queries at driver time). Nothing else in the suite pins the raw
  * fixture schemas — unit specs use in-memory frames — so this spec
  * asserts, per table, the exact column names and the post-`Tables.table`
  * normalized types the rest of the library is written against. A future
  * regeneration that drifts a column fails HERE with the column named,
  * not as two dozen opaque DATATYPE_MISMATCH errors in the driver's
  * artifacts.
  *
  * Two layers:
  *   - RAW: what's physically in the parquet (timestamp columns may be
  *     TimestampNTZType or, under the legacy nanos conf, LongType — both
  *     accepted, since `Tables.table` normalizes).
  *   - NORMALIZED: what `Tables.table` hands to every query — this is
  *     the library's contract and is exact.
  */
class FixtureSchemaSpec extends NeedsTestdata {
  private val dir = "/root/testdata/sf0.001"

  /** Types acceptable for a fixture timestamp column at the RAW layer. */
  private def isRawTs(dt: DataType): Boolean = dt match {
    case TimestampNTZType | TimestampType | LongType => true
    case _ => false
  }

  private def normalized(name: String) = Tables.table(spark, dir, name)

  private def assertCols(table: String, expect: Seq[(String, DataType)]): Unit = {
    val schema = normalized(table).schema
    assert(schema.fieldNames.toSeq == expect.map(_._1),
      s"$table: column names drifted — expected ${expect.map(_._1).mkString(",")}, " +
        s"got ${schema.fieldNames.mkString(",")}")
    for ((colName, dt) <- expect) {
      val actual = schema(colName).dataType
      assert(actual == dt,
        s"$table.$colName: type drifted — expected $dt, got $actual " +
          "(driver regenerated /root/testdata with a new schema? " +
          "Tables.table normalization may need a new branch)")
    }
  }

  test("events: normalized contract — ts is nanos-since-epoch LongType") {
    assertCols("events", Seq(
      "event_id" -> LongType,
      "ts" -> LongType, // Tables.table normalizes timestamp[us]/nanos → nanos long
      "user_id" -> LongType,
      "event_type" -> StringType,
      "value" -> DoubleType,
      "props" -> StringType))
  }

  test("events: the normalized contract holds at EVERY fixture SF " +
      "(driver verifies at sf0.01 and benches at sf0.1 — a drift in " +
      "one dir alone must still fail here)") {
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      if (new java.io.File(dir).isDirectory) {
        val schema = Tables.table(spark, dir, "events").schema
        assert(schema("ts").dataType == LongType,
          s"$sf/events.ts: normalized type is ${schema("ts").dataType}, " +
            "expected LongType — Tables.table normalization missed this encoding")
      }
    }
  }

  test("events: raw ts column is a known encoding (ntz / tz / nanos-long)") {
    // read WITHOUT normalization to pin what the driver actually wrote
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    val dt = raw.schema("ts").dataType
    assert(isRawTs(dt),
      s"events.ts: raw parquet type $dt is not a known fixture encoding — " +
        "extend Tables.table normalization before anything else this round")
  }

  test("orders: schema contract") {
    val schema = normalized("orders").schema
    assert(schema.fieldNames.toSeq == Seq("o_orderkey", "o_custkey",
      "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"))
    assert(schema("o_orderkey").dataType == LongType)
    assert(schema("o_totalprice").dataType == DoubleType)
    assert(isRawTs(schema("o_orderdate").dataType) ||
      schema("o_orderdate").dataType == DateType,
      s"orders.o_orderdate: unexpected type ${schema("o_orderdate").dataType}")
  }

  test("lineitem: schema contract") {
    val schema = normalized("lineitem").schema
    assert(schema.fieldNames.toSeq == Seq("l_orderkey", "l_partkey",
      "l_suppkey", "l_linenumber", "l_quantity", "l_extendedprice",
      "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"))
    assert(schema("l_quantity").dataType == DoubleType)
    assert(isRawTs(schema("l_shipdate").dataType) ||
      schema("l_shipdate").dataType == DateType,
      s"lineitem.l_shipdate: unexpected type ${schema("l_shipdate").dataType}")
  }

  test("customer/supplier/part/nation/region: key columns present and typed") {
    val expect = Map(
      "customer" -> ("c_custkey", LongType: DataType),
      "supplier" -> ("s_suppkey", LongType: DataType),
      "part" -> ("p_partkey", LongType: DataType),
      "nation" -> ("n_nationkey", IntegerType: DataType),
      "region" -> ("r_regionkey", IntegerType: DataType))
    for ((t, (keyCol, dt)) <- expect) {
      val schema = normalized(t).schema
      assert(schema.fieldNames.contains(keyCol), s"$t: missing key column $keyCol")
      assert(schema(keyCol).dataType == dt,
        s"$t.$keyCol: expected $dt, got ${schema(keyCol).dataType}")
    }
  }

  test("documents: schema contract for the text/dedup family") {
    val schema = normalized("documents").schema
    for (c <- Seq("doc_id", "source", "lang", "text", "n_chars"))
      assert(schema.fieldNames.contains(c), s"documents: missing column $c")
    assert(schema("doc_id").dataType == LongType)
    assert(schema("text").dataType == StringType)
  }

  test("embeddings: schema contract for the similarity family") {
    val schema = normalized("embeddings").schema
    for (c <- Seq("vec_id", "embedding"))
      assert(schema.fieldNames.contains(c), s"embeddings: missing column $c")
    assert(schema("vec_id").dataType == LongType)
    assert(schema("embedding").dataType.isInstanceOf[ArrayType],
      s"embeddings.embedding: expected array, got ${schema("embedding").dataType}")
  }

  test("ts normalization: round-trips a known instant exactly") {
    requireTestdata()
    // contract check with VALUES, not just types: the normalized nanos
    // long divided back to seconds must equal Spark's own to-timestamp
    // reading of the raw column (pinned-UTC session)
    import org.apache.spark.sql.functions._
    val ev = normalized("events")
    val bad = ev.select(
      Tables.epochSeconds(col("ts")).as("viaNanos"),
      col("ts").as("nanos"))
      .where(col("viaNanos") =!= (col("nanos") - pmod(col("nanos"), lit(1000000000L))) / lit(1000000000L))
      .count()
    assert(bad == 0L, s"epochSeconds disagrees with direct nanos arithmetic on $bad rows")
  }
}
