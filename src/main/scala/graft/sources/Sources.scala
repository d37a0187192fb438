package graft.sources

import graft.pipeline.IngestConfig
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch sources (SURVEY.md §2.1 S3/S4).
  *
  * S3 Parquet is the test/bench path; S4 JDBC mirrors the reference
  * deployment where ClickHouse serves the ingested tables
  * (/root/reference/README.md:117-121). The JDBC path needs a driver
  * jar on the executor classpath at runtime — not present in this
  * container, so it is compile-checked + config-tested only.
  */
object Sources {

  /** S3: columnar vectorized Parquet scan; filters/projections push
    * down through Catalyst (asserted in PlanSpec).
    */
  def parquetTable(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.Tables.table(spark, dir, name)

  /** S4: JDBC table scan against the ClickHouse HTTP-wire JDBC URL.
    * `pushDownPredicate`/`pushDownAggregate` let Catalyst ship filters
    * and partial aggs to the database; `partitionColumn` splits the
    * scan for parallel read (mandatory at scale — a single JDBC
    * connection is a 1-task scan).
    */
  def jdbcTable(
      spark: SparkSession, cfg: IngestConfig, table: String,
      partitionColumn: Option[String] = None,
      numPartitions: Int = 8,
      lowerBound: Long = 0L, upperBound: Long = 1L << 40): DataFrame =
    jdbcTableUrl(spark, cfg.jdbcUrl, table, partitionColumn,
      numPartitions, lowerBound, upperBound)

  /** URL-direct variant (any JDBC database; integration-tested against
    * embedded Derby in SourcesSinksJdbcSpec).
    */
  def jdbcTableUrl(
      spark: SparkSession, url: String, table: String,
      partitionColumn: Option[String] = None,
      numPartitions: Int = 8,
      lowerBound: Long = 0L, upperBound: Long = 1L << 40): DataFrame = {
    val base = spark.read
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("pushDownPredicate", "true")
      .option("pushDownAggregate", "true")
    val parted = partitionColumn match {
      case Some(c) => base
        .option("partitionColumn", c)
        .option("numPartitions", numPartitions)
        .option("lowerBound", lowerBound)
        .option("upperBound", upperBound)
      case None => base
    }
    parted.load()
  }
}
