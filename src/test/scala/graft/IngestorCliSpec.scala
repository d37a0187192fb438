package graft

import org.scalatest.funsuite.AnyFunSuite

/** CLI flag/env parsing mirrors the reference's cobra surface
  * (/root/reference/cmd/root.go:62-97). The end-to-end synthetic run
  * is exercised via `runMain graft.IngestorCli` (see scaladoc).
  */
class IngestorCliSpec extends AnyFunSuite {

  test("defaults match the reference (rate 5, duration 60, synthetic)") {
    val a = IngestorCli.parse(Array.empty)
    assert(a.mode === "synthetic")
    assert(a.rate === 5L)
    assert(a.durationS === 60L)
    assert(a.cfg.hostPort === "localhost:8123")
    assert(a.cfg.tableOrDefault === "app.users_cur")
  }

  test("flags override: mode, rate, brokers CSV, sink") {
    val a = IngestorCli.parse(Array(
      "--mode", "CDC", "--rate", "100", "--duration", "5",
      "--brokers", " b1:9092 ,, b2:9092 ", "--topic", "t",
      "--ch-host", "ch.prod", "--database", "db", "--table", "t2",
      "--sink", "parquet:/tmp/x"))
    assert(a.mode === "cdc")
    assert(a.rate === 100L)
    assert(a.cfg.brokers === Seq("b1:9092", "b2:9092"))
    assert(a.cfg.jdbcUrl === "jdbc:clickhouse://ch.prod:8123/db")
    assert(a.sink === "parquet:/tmp/x")
  }
}
