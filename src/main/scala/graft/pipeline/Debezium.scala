package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference pipeline's core transform, re-expressed as one
  * declarative Catalyst plan: Debezium envelope JSON → versioned
  * upsert rows → JSONEachRow sink payload.
  *
  * Reference semantics reproduced (file:line into /root/reference):
  *  - envelope shape `DBZEnvelope{before,after,source,op,ts_us}`
  *    (internal/model/cdc.go:7-30)
  *  - direct-then-stringified double-decode fallback
  *    (internal/ingestion/cdc.go:87-98) → P2/F11
  *  - bad payload → skip row, never fail (cdc.go:62-67) → P2
  *  - op c/u take after.{id,name,email}; missing after → drop
  *    (cdc.go:113-123) → P1/P3
  *  - op d takes before.id, falls back to the Kafka key id, sets
  *    is_deleted=1 (cdc.go:125-137)
  *  - unknown op → drop (cdc.go:139-142) → P4
  *  - op enum c→1 u→2 d→3, case-insensitive (cdc.go:145-156) → P5/F4
  *  - nil lsn → 0, nil ts_us → epoch (cdc.go:101-109) → P6
  *  - sink serialization keeps exactly {id,name,email,is_deleted,_op,
  *    _lsn,_ts}, `_ts` formatted "yyyy-MM-dd HH:mm:ss" UTC
  *    (internal/ingestion/clickhouse.go:113-124) → P7/F7/F12
  *
  * Everything is built-in expressions — the whole translate is one
  * narrow map stage (no shuffle), fully inside WholeStageCodegen.
  */
object Debezium {

  val userStruct: StructType = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("email", StringType)))

  /** Pruned to the fields the pipeline CONSULTS, not the envelope's
    * full wire shape: the reference defines source.{schema,table,
    * ts_us} (internal/model/cdc.go:7-12) but never reads them in
    * translate (cdc.go:100-143 touches only source.lsn and top-level
    * ts_us/op/before/after). `from_json` skips unlisted JSON fields
    * without materializing them, so the narrower schema makes the
    * per-row JsonToStructs parse — the translate pipeline's dominant
    * cost — do strictly less work.
    */
  val envelopeSchema: StructType = StructType(Seq(
    StructField("before", userStruct), StructField("after", userStruct),
    StructField("source", StructType(Seq(
      StructField("lsn", LongType)))),
    StructField("op", StringType), StructField("ts_us", LongType)))

  val keySchema: StructType = StructType(Seq(StructField("id", LongType)))

  /** F10+F11: parse a JSON envelope with the reference's
    * direct-then-double-encoded fallback. `from_json` nulls out on
    * mismatch (PERMISSIVE), matching the reference's skip-bad-payload.
    *
    * The dispatch can't be `coalesce(direct, fallback)`: `from_json`
    * on a JSON *string literal* yields a struct of all-null fields,
    * not a null struct, so the failed direct parse would win. Go's
    * `json.Unmarshal` into a struct errors on a string literal
    * (internal/ingestion/cdc.go:87-98); the equivalent declarative
    * test is "does the value open an object?".
    *
    * Spark 4 forbids `from_json(v, STRING)`, so the JSON-string
    * unquoting for the double-encoded case wraps the value in an
    * object and extracts the (parser-unescaped) string field.
    */
  def parseEnvelope(value: Column): Column = {
    val unquoted = from_json(
      concat(lit("{\"v\":"), value, lit("}")),
      StructType(Seq(StructField("v", StringType)))).getField("v")
    when(ltrim(value).startsWith("{"), from_json(value, envelopeSchema))
      .otherwise(from_json(unquoted, envelopeSchema))
  }

  /** P1-P6: envelope struct (+ optional key JSON) → flat CDC row.
    * Emits null for dropped rows; compose with `.filter(col(out).isNotNull)`.
    */
  def translate(env: Column, keyJson: Column): Column = {
    // branch on the RAW op: the reference's translate switch is
    // case-sensitive (cdc.go:114-143 matches exact "c"/"u"/"d"; the
    // case-insensitive opToEnum at :145-156 is only reachable for
    // already-lowercase ops), so op="C" DROPS, same as here
    val op = env.getField("op")
    val opNum = when(op === "c", 1).when(op === "u", 2)
      .when(op === "d", 3).otherwise(0)
    val after = env.getField("after")
    val before = env.getField("before")
    val keyId = from_json(keyJson, keySchema).getField("id")
    val lsn = coalesce(env.getField("source").getField("lsn"), lit(0L))
    // ONLY the top-level ts_us counts (cdc.go:106-109); nil → epoch.
    // source.ts_us is never consulted by the reference.
    val tsUs = env.getField("ts_us")
    // timestamp_seconds(0) is the UTC epoch REGARDLESS of session tz —
    // to_timestamp(lit("1970-01-01 ...")) parses in session time zone
    // and is only accidentally correct under a UTC session
    val ts = coalesce(timestamp_micros(tsUs), timestamp_seconds(lit(0)))
    val cu = op.isin("c", "u") && after.isNotNull
    val d = op === "d"
    // delete id: before.id if nonzero, else the Kafka key id, else 0 —
    // the reference emits the tombstone UNCONDITIONALLY for op d
    // (cdc.go:125-137 returns &row even when both lookups fail)
    val delId = coalesce(
      when(before.getField("id") =!= 0, before.getField("id")), keyId, lit(0L))
    when(cu || d,
      struct(
        when(d, delId).otherwise(after.getField("id")).as("id"),
        when(d, lit(null).cast(StringType)).otherwise(after.getField("name")).as("name"),
        when(d, lit(null).cast(StringType)).otherwise(after.getField("email")).as("email"),
        when(d, 1).otherwise(0).cast("int").as("is_deleted"),
        opNum.cast("int").as("_op"),
        lsn.as("_lsn"),
        ts.as("_ts")))
      .otherwise(lit(null).cast(
        "struct<id:bigint,name:string,email:string,is_deleted:int,_op:int,_lsn:bigint,_ts:timestamp>"))
  }

  /** Full P2→P6 pipeline over a (value, key) JSON DataFrame: parse,
    * drop bad payloads / missing-after / unknown-op rows, flatten.
    *
    * The parse is wrapped in a Generate barrier —
    * `explode(array(parseEnvelope(...)))` — so `from_json` runs ONCE
    * per row. Without it, star-expanding the translated struct lets
    * CollapseProject/SimplifyExtractValueOps inline the (CodegenFallback,
    * so never subexpression-eliminated) parse into every output column:
    * 16 `from_json` copies in the optimized plan, measured 40% slower
    * at sf0.1. A generator output attribute cannot be inlined past the
    * Generate node, which is exactly the barrier needed. `explode` of a
    * 1-element array preserves row semantics exactly (a null payload
    * yields one null-struct row, dropped by the P2 filter) and works
    * unchanged under Structured Streaming.
    */
  def translateRows(df: DataFrame, value: Column, keyJson: Column): DataFrame =
    df.select(keyJson.as("__key"),
        explode(array(parseEnvelope(value))).as("__env"))
      .filter(col("__env").isNotNull) // P2 bad payload
      .withColumn("__row", translate(col("__env"), col("__key")))
      .filter(col("__row").isNotNull) // P3 missing after / P4 unknown op
      .select(col("__row.*"))

  /** P7+F12+F7: JSONEachRow sink serialization — exactly the
    * reference's field set, byte order and `_ts` second-truncated UTC
    * format (internal/ingestion/clickhouse.go:113-124). Go marshals
    * Name/Email as plain strings, so delete rows carry the ZERO values
    * `"name":"","email":""` — to_json drops null fields, so nulls are
    * coalesced to "" to keep the wire bytes identical, not just the
    * ClickHouse end state (which String-default columns would equate).
    */
  def toJsonEachRow(df: DataFrame): DataFrame =
    df.select(to_json(struct(
      col("id"),
      coalesce(col("name"), lit("")).as("name"),
      coalesce(col("email"), lit("")).as("email"),
      col("is_deleted"),
      col("_op"), col("_lsn"),
      date_format(col("_ts"), "yyyy-MM-dd HH:mm:ss").as("_ts"))).as("json"))
}
