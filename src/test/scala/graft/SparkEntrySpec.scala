package graft

/** Driver-contract lock: entry() returns rows on sf0.001 (t1 smoke),
  * every oracle key has a query, and results are deterministic across
  * two runs (O3 total-ordering rule).
  */
class SparkEntrySpec extends SparkSpec {

  test("entry() flagship query returns rows on sf0.001") {
    requireTestdata()
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("registry is stable: every query runs and is deterministic on sf0.001") {
    requireTestdata()
    val sf = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (name, fn) =>
      val a = fn(spark, sf).collect().map(_.toString).toSeq
      val b = fn(spark, sf).collect().map(_.toString).toSeq
      assert(a === b, s"$name not deterministic")
      assert(a.nonEmpty, s"$name returned no rows")
    }
  }
}
