package graft

import org.scalatest.funsuite.AnyFunSuite

/** CLI flag/env parsing mirrors the reference's cobra surface
  * (/root/reference/cmd/root.go:62-97). The end-to-end synthetic run
  * is exercised via `runMain graft.IngestorCli` (see scaladoc).
  */
class IngestorCliSpec extends AnyFunSuite {

  test("defaults match the reference (rate 5, duration 60, synthetic, reference topic/group)") {
    val a = IngestorCli.parse(Array.empty)
    assert(a.mode === "synthetic")
    assert(a.rate === 5L)
    assert(a.durationS === 60L)
    assert(a.cfg.hostPort === "localhost:8123")
    assert(a.cfg.tableOrDefault === "app.users_cur")
    assert(a.cfg.databaseOrDefault === "appdb")
    // cmd/root.go:69-71 defaults
    assert(a.cfg.topic === "dbserver1.app.users")
    assert(a.cfg.groupId === "wal-cdc-ingestor")
    assert(a.cfg.brokers === Seq("redpanda.redpanda.svc.cluster.local:9093"))
  }

  test("flags override: mode, rate, brokers CSV, sink (reference flag names + short aliases)") {
    val a = IngestorCli.parse(Array(
      "--mode", "CDC", "--rate", "100", "--duration", "5",
      "--brokers", " b1:9092 ,, b2:9092 ", "--topic", "t",
      "--clickhouse-host", "ch.prod", "--clickhouse-db", "db",
      "--clickhouse-table", "t2", "--sink", "parquet:/tmp/x"))
    assert(a.mode === "cdc")
    assert(a.rate === 100L)
    assert(a.cfg.brokers === Seq("b1:9092", "b2:9092"))
    assert(a.cfg.jdbcUrl === "jdbc:clickhouse://ch.prod:8123/db")
    assert(a.sink === "parquet:/tmp/x")
  }

  test("S2: KAFKA_FORCE_LOCAL=1 rewrites broker hosts to 127.0.0.1, keeping ports (cdc.go:19-34)") {
    val cfg = graft.pipeline.IngestConfig(
      host = "ch", brokers = Seq("redpanda.redpanda.svc.cluster.local:9093", "b2:9092", "noport"))
    assert(cfg.effectiveBrokers(Map("KAFKA_FORCE_LOCAL" -> "1")) ===
      Seq("127.0.0.1:9093", "127.0.0.1:9092", "127.0.0.1"))
    // unset or any other value → brokers untouched
    assert(cfg.effectiveBrokers(Map.empty) === cfg.brokers)
    assert(cfg.effectiveBrokers(Map("KAFKA_FORCE_LOCAL" -> "0")) === cfg.brokers)
  }
}
