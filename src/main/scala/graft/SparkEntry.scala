package graft

import graft.operators.{Multimodal, VersionedDedup}
import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator registry (SURVEY.md §2 inventory);
  * every entry with a key in `oracleSql` is value-checked against
  * DuckDB on the same parquet (driver t2 gate); entries without an
  * oracle (engine-defined hashing / binary payloads) get the weaker
  * rows-only check and are covered by ScalaTest specs instead.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * W1 current-state/FINAL semantics — the core query the reference's
    * CDC pipeline exists to serve (SURVEY.md §7 minimum slice).
    */
  def entry(spark: SparkSession): DataFrame =
    VersionedDedup.currentState(
      Tables.table(spark, "/root/testdata/sf0.001", "events"),
      keys = Seq("user_id"),
      version = col("event_id"),
      isDeleted = col("event_type") === "error")
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
      .orderBy(col("user_id"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.defs ++ AggQueries.defs ++ WindowQueries.defs ++
      JoinQueries.defs ++ PipelineQueries.defs ++ NorthStarQueries.defs ++
      CurationQueries.defs ++
      Map(
        // X5 multimodal: binary payload + typed meta + batch feature
        // extraction (the deterministic stub decode is byte arithmetic,
        // so even this has a value-level oracle — NorthStarQueries)
        "q_multimodal" -> ((s: SparkSession, d: String) => {
          val media = Multimodal.asMediaTable(Tables.table(s, d, "documents"))
          Multimodal.extractFeatures(s, media).toDF()
            .orderBy(col("doc_id"))
        }))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ AggQueries.oracles ++ WindowQueries.oracles ++
      JoinQueries.oracles ++ PipelineQueries.oracles ++ NorthStarQueries.oracles ++
      CurationQueries.oracles
}
