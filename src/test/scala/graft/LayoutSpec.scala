package graft

import graft.sources.Layout
import org.apache.spark.sql.functions._

/** Bucketed co-located joins and the SparkSessionExtensions SQL
  * registration of the native expression.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed fact-fact join runs with zero shuffle exchanges") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val fact1 = (1L to 1000L).map(i => (i % 50, i)).toDF("k", "a")
      val fact2 = (1L to 1000L).map(i => (i % 50, i * 2)).toDF("k", "b")
      Layout.writeBucketed(fact1, "bt1", "k", buckets = 8)
      Layout.writeBucketed(fact2, "bt2", "k", buckets = 8)
      val joined = spark.table("bt1").join(spark.table("bt2"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected no shuffle:\n$plan")
      assert(joined.count() === (1000L / 50) * (1000L / 50) * 50)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS bt1")
      spark.sql("DROP TABLE IF EXISTS bt2")
    }
  }

  test("colocate lets several aggs/joins on one key reuse a single exchange") {
    val df = Layout.colocate((1L to 100L).map(i => (i % 10, i)).toDF("k", "v"), "k", 4)
    val agg = df.groupBy("k").agg(sum("v"))
    // the groupBy should reuse the repartition's hash partitioning:
    // exactly the one user exchange in the plan, none added for the agg
    val plan = agg.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1, plan)
  }

  test("SparkSessionExtensions registers float_dot for SQL callers") {
    // the shared test session is built with
    // spark.sql.extensions=graft.functions.GraftExtensions (SparkSpec)
    val v = spark.sql(
      "SELECT float_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)))")
      .as[Double].collect().head
    assert(v === 11.0)
  }
}
