package graft.queries

import graft.Tables.table
import graft.operators.VersionedDedup
import graft.pipeline.Debezium
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Set operations (§2.7 U1-U2) and the reference's CDC pipeline in
  * batch form (§2.2 P1-P7, §2.8 F10-F12, SURVEY.md §7 step 6).
  *
  * The CDC queries synthesize a deterministic Debezium envelope stream
  * FROM the orders table (op / null-branches / double-encoding all
  * keyed off o_orderkey), push it through the real JSON parse +
  * translate pipeline (graft.pipeline.Debezium), and emit flat rows.
  * The DuckDB oracle computes the same end state directly — the JSON
  * round-trip is semantically the identity, which is exactly what it
  * must be for the pipeline to be correct.
  */
object PipelineQueries {

  /** Deterministic envelope-stream builder shared by the CDC queries.
    * Derivation (all mod o_orderkey):
    *   %10 in 0-4 → op "c"; 5-7 → "u"; 8 → "d"; 9 → op "x" (dropped)
    *   %37 == 0 and op c/u → after = null (dropped, P3)
    *   %16 == 0 and op d   → before.id = 0 → id falls back to key (P6 path)
    *   %5  == 0            → value double-JSON-encoded (F11 fallback)
    *   id = o_orderkey % 100, lsn = o_orderkey, ts_us from o_orderdate
    */
  def envelopeStream(s: SparkSession, d: String): DataFrame = {
    val k = col("o_orderkey")
    val id = (k % 100).as("uid")
    // narrow scans widened before the envelope encode (r21,
    // ScanWidth): to_json + the double-encode escape otherwise run in
    // ONE task on the one-file fixture orders table, and every CDC
    // query's from_json parse downstream inherits that width
    val df = graft.operators.ScanWidth.ensure(table(s, d, "orders"))
      .select(k, id,
        (unix_millis(col("o_orderdate").cast("timestamp")) * 1000L).as("ts_us"))
    val op = when(k % 10 <= 4, "c").when(k % 10 <= 7, "u")
      .when(k % 10 === 8, "d").otherwise("x")
    val user = struct(col("uid").as("id"),
      concat(lit("name-"), col("uid")).as("name"),
      concat(lit("u"), col("uid"), lit("@example.com")).as("email"))
    val before = when(op === "d",
      when(k % 16 === 0, struct(lit(0L).as("id"), lit(null).cast("string").as("name"),
        lit(null).cast("string").as("email"))).otherwise(user))
    val after = when(op.isin("c", "u") && !(k % 37 === 0), user)
    val env = struct(
      before.as("before"), after.as("after"),
      struct(k.as("lsn"), col("ts_us").as("ts_us"),
        lit("public").as("schema"), lit("users").as("table")).as("source"),
      op.as("op"), col("ts_us").as("ts_us"))
    // F11: double-encode a deterministic subset — value becomes a JSON
    // string whose content is the envelope JSON. Escape via literal
    // (non-regex) replace — regexp_replace on 150k full JSON strings
    // costs ~2s at sf0.1 for what is a fixed-string substitution.
    val base = df.withColumn("__json", to_json(env))
    val esc = expr("""replace(replace(__json, '\\', '\\\\'), '"', '\\"')""")
    val doubled = when(k % 5 === 0, concat(lit("\""), esc, lit("\"")))
      .otherwise(col("__json"))
    base.select(k.as("o_orderkey"),
      doubled.as("value"),
      to_json(struct(col("uid").as("id"))).as("key"))
  }

  /** Shared oracle CTE: the translated flat rows computed directly. */
  private val cdcRowsSql =
    """WITH raw AS (
         SELECT o_orderkey AS k, o_orderkey % 100 AS uid,
           CAST(epoch_ms(o_orderdate) AS BIGINT) * 1000 AS ts_us,
           CASE WHEN o_orderkey % 10 <= 4 THEN 'c'
                WHEN o_orderkey % 10 <= 7 THEN 'u'
                WHEN o_orderkey % 10 = 8 THEN 'd' ELSE 'x' END AS op
         FROM orders),
       rows_ AS (
         SELECT
           uid AS id,
           CASE WHEN op = 'd' THEN NULL ELSE 'name-' || uid END AS name,
           CASE WHEN op = 'd' THEN NULL ELSE 'u' || uid || '@example.com' END AS email,
           CASE WHEN op = 'd' THEN 1 ELSE 0 END AS is_deleted,
           CASE WHEN op = 'c' THEN 1 WHEN op = 'u' THEN 2 ELSE 3 END AS _op,
           k AS _lsn,
           strftime(make_timestamp(ts_us), '%Y-%m-%d %H:%M:%S') AS _ts
         FROM raw
         WHERE op IN ('c', 'u', 'd') AND NOT (op IN ('c', 'u') AND k % 37 = 0))
    """

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // U1: union of two event slices, distinct
    "q_union" -> ((s, d) => {
      val ev = table(s, d, "events")
      val a = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), lit("purchase").as("src"))
      val b = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), lit("signup").as("src"))
      a.unionByName(b).distinct().orderBy(col("user_id"), col("src"))
    }),

    // U2a: (user, day) pairs with both a click and a purchase
    "q_intersect" -> ((s, d) => {
      val ev = table(s, d, "events")
        .withColumn("day", date_format(graft.Tables.tsSeconds(col("ts")), "yyyy-MM-dd"))
      ev.filter(col("event_type") === "click").select(col("user_id"), col("day"))
        .intersect(ev.filter(col("event_type") === "purchase").select(col("user_id"), col("day")))
        .orderBy(col("user_id"), col("day"))
    }),

    // U2c: bag-semantics set ops — INTERSECT ALL keeps min(m, n)
    // copies, EXCEPT ALL keeps m − n copies; the multiplicity
    // semantics dedup-based U2 can't express (e.g. "click events
    // beyond the matched purchase count")
    "q_set_ops_all" -> ((s, d) => {
      val ev = table(s, d, "events")
      def side(t: String) = ev.filter(col("event_type") === t)
        .select(col("user_id"),
          (graft.Tables.epochSeconds(col("ts")) / lit(86400.0)).cast("long").as("day"))
      val ia = side("click").intersectAll(side("purchase"))
        .groupBy(col("user_id"), col("day")).agg(count(lit(1)).as("n"))
        .withColumn("op", lit("intersect_all"))
      val ea = side("click").exceptAll(side("purchase"))
        .groupBy(col("user_id"), col("day")).agg(count(lit(1)).as("n"))
        .withColumn("op", lit("except_all"))
      ia.unionByName(ea)
        .select(col("op"), col("user_id"), col("day"), col("n"))
        .orderBy(col("op"), col("user_id"), col("day"))
    }),

    // U2b: (user, day) pairs with a click but no purchase
    "q_except" -> ((s, d) => {
      val ev = table(s, d, "events")
        .withColumn("day", date_format(graft.Tables.tsSeconds(col("ts")), "yyyy-MM-dd"))
      ev.filter(col("event_type") === "click").select(col("user_id"), col("day"))
        .except(ev.filter(col("event_type") === "purchase").select(col("user_id"), col("day")))
        .orderBy(col("user_id"), col("day"))
    }),

    // P1-P6/F10/F11: full envelope parse + translate, flat rows out
    "q_cdc_translate" -> ((s, d) => {
      Debezium.translateRows(envelopeStream(s, d), col("value"), col("key"))
        .select(col("id"), col("name"), col("email"),
          col("is_deleted").cast("int"), col("_op").cast("int"), col("_lsn"),
          date_format(col("_ts"), "yyyy-MM-dd HH:mm:ss").as("_ts"))
        .orderBy(col("_lsn"), col("id"), col("_op"), col("_ts"))
    }),

    // W1 over the CDC stream: current-state (FINAL) view via the
    // partial-agg-friendly max_by formulation
    "q_cdc_current" -> ((s, d) => {
      val rows = Debezium.translateRows(envelopeStream(s, d), col("value"), col("key"))
      VersionedDedup.latestByVersionAgg(rows, Seq("id"), Seq("_lsn", "_op"))
        .filter(col("is_deleted") === 0)
        .select(col("id"), col("name"), col("email"),
          col("_op").cast("int"), col("_lsn"),
          date_format(col("_ts"), "yyyy-MM-dd HH:mm:ss").as("_ts"))
        .orderBy(col("id"))
    }),

    // P7/F12/F7: JSONEachRow sink serialization
    "q_jsoneachrow" -> ((s, d) => {
      val rows = Debezium.translateRows(envelopeStream(s, d), col("value"), col("key"))
      Debezium.toJsonEachRow(rows).orderBy(col("json"))
    }))

  val oracles: Map[String, String] = Map(
    "q_union" ->
      """SELECT DISTINCT user_id, 'purchase' AS src FROM events WHERE event_type = 'purchase'
         UNION
         SELECT DISTINCT user_id, 'signup' AS src FROM events WHERE event_type = 'signup'
         ORDER BY user_id, src""",
    "q_intersect" ->
      """SELECT user_id, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day
         FROM events WHERE event_type = 'click'
         INTERSECT
         SELECT user_id, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day
         FROM events WHERE event_type = 'purchase'
         ORDER BY user_id, day""",
    "q_except" ->
      """SELECT user_id, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day
         FROM events WHERE event_type = 'click'
         EXCEPT
         SELECT user_id, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day
         FROM events WHERE event_type = 'purchase'
         ORDER BY user_id, day""",
    // U2c: both engines implement SQL bag semantics for the ALL forms
    "q_set_ops_all" ->
      """WITH c AS (SELECT user_id,
           CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 86400 AS day
           FROM events WHERE event_type = 'click'),
         p AS (SELECT user_id,
           CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 86400 AS day
           FROM events WHERE event_type = 'purchase'),
         ia AS (SELECT user_id, day FROM c INTERSECT ALL SELECT user_id, day FROM p),
         ea AS (SELECT user_id, day FROM c EXCEPT ALL SELECT user_id, day FROM p)
         SELECT * FROM (
           SELECT 'intersect_all' AS op, user_id, day, count(*) AS n
           FROM ia GROUP BY user_id, day
           UNION ALL
           SELECT 'except_all' AS op, user_id, day, count(*) AS n
           FROM ea GROUP BY user_id, day)
         ORDER BY op, user_id, day""",
    "q_cdc_translate" -> (cdcRowsSql +
      """SELECT id, name, email, CAST(is_deleted AS INT) AS is_deleted,
         CAST(_op AS INT) AS _op, _lsn, _ts
         FROM rows_ ORDER BY _lsn, id, _op, _ts"""),
    "q_cdc_current" -> (cdcRowsSql +
      """SELECT id, name, email, CAST(_op AS INT) AS _op, _lsn, _ts FROM (
           SELECT *, row_number() OVER (PARTITION BY id ORDER BY _lsn DESC, _op DESC) AS rn
           FROM rows_)
         WHERE rn = 1 AND is_deleted = 0 ORDER BY id"""),
    "q_jsoneachrow" -> (cdcRowsSql +
      """SELECT '{"id":' || id || ',"name":"' || COALESCE(name, '') ||
           '","email":"' || COALESCE(email, '') ||
           '","is_deleted":' || is_deleted || ',"_op":' || _op ||
           ',"_lsn":' || _lsn || ',"_ts":"' || _ts || '"}' AS json
         FROM rows_ ORDER BY json"""))
}
