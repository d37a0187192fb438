package graft.pipeline

/** Engine configuration mirroring the reference's defaulting rules
  * (SURVEY.md §2.1 S6/S7):
  *  - host without a port gets the ClickHouse HTTP port 8123 appended
  *    (/root/reference/internal/ingestion/clickhouse.go:19-24)
  *  - empty database → "appdb", empty table → "app.users_cur"
  *    (clickhouse.go:100-110)
  *  - broker lists are comma-separated with trimmed entries and
  *    empties dropped (cmd/root.go:174-182)
  */
final case class IngestConfig(
    host: String = "localhost",
    database: String = "",
    table: String = "",
    brokers: Seq[String] = Nil,
    topic: String = "pg.public.users",
    groupId: String = "go-ingestor",
    user: String = "",            // CLICKHOUSE_USER, optional basic auth
    password: String = "",        // CLICKHOUSE_PASSWORD
    metricsPort: Int = 8080) {    // METRICS_PORT (metrics.go:40-57)

  /** S6: reference's EnsureHostPort. */
  def hostPort: String =
    if (host.contains(":")) host else s"$host:8123"

  /** S7: database/table defaulting. */
  def databaseOrDefault: String =
    if (database.isEmpty) "appdb" else database
  def tableOrDefault: String =
    if (table.isEmpty) "app.users_cur" else table

  /** ClickHouse-over-JDBC URL for the S4/S5 paths. */
  def jdbcUrl: String =
    s"jdbc:clickhouse://$hostPort/$databaseOrDefault"

  /** Optional basic-auth JDBC options (reference: clickhouse.go:43-49
    * sets basic auth only when a user is configured).
    */
  def jdbcAuthOptions: Map[String, String] =
    if (user.isEmpty) Map.empty
    else Map("user" -> user, "password" -> password)

  def brokerList: String = brokers.mkString(",")

  /** S2 parity: the reference's `KAFKA_FORCE_LOCAL=1` local-dev shim
    * (/root/reference/internal/ingestion/cdc.go:19-34 — a static DNS
    * resolver answering 127.0.0.1 for every broker host). Spark's
    * Kafka source takes bootstrap addresses, not a dialer, so the
    * declarative equivalent rewrites each broker's HOST to 127.0.0.1
    * and keeps its port. `env` is injectable for tests.
    */
  def effectiveBrokers(env: Map[String, String] = sys.env): Seq[String] =
    if (env.get("KAFKA_FORCE_LOCAL").contains("1"))
      brokers.map { b =>
        val i = b.lastIndexOf(':')
        if (i >= 0) "127.0.0.1" + b.substring(i) else "127.0.0.1"
      }
    else brokers
}

object IngestConfig {
  /** F5: splitCSV — split, trim, drop empties
    * (/root/reference/cmd/root.go:174-182).
    */
  def splitCsv(s: String): Seq[String] =
    s.split(",").iterator.map(_.trim).filter(_.nonEmpty).toSeq

  def fromBrokersCsv(host: String, brokersCsv: String): IngestConfig =
    IngestConfig(host = host, brokers = splitCsv(brokersCsv))
}
