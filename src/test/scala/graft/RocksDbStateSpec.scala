package graft

import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import graft.streaming.{CdcStreaming, StreamingFunnel}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** The stateful streaming family under the RocksDB state store
  * (SURVEY.md §2.9 / round-10 verdict #5): the ST7/ST10 specs audit
  * eviction, but their state lives on the default HDFS-backed in-heap
  * provider — at 100 TB keyed state must SPILL, which is exactly what
  * `RocksDBStateStoreProvider` (bundled with stock Spark, rocksdbjni
  * on the classpath) provides: per-partition off-heap keyed state with
  * changelog checkpointing. These arms re-run the batch-parity and
  * watermark-eviction assertions with the provider swapped in, and
  * assert from the query's own state-operator metrics that RocksDB
  * was actually engaged — a config typo that silently fell back to
  * the in-heap store would fail the metric assertion, not just prove
  * nothing.
  *
  * The provider is read per-query at stream start, so the spec sets
  * it on the shared session and restores the default in a finally —
  * no session teardown, same pattern as the spec-wide shuffle
  * partition pin.
  */
class RocksDbStateSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withRocksDb[A](body: => A): A = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }

  /** Total state rows + proof RocksDB served them: the provider
    * publishes rocksdb* custom metrics per state operator.
    */
  private def stateAudit(
      q: org.apache.spark.sql.streaming.StreamingQuery): (Long, Boolean) = {
    val ops = q.recentProgress.reverse.collectFirst {
      case p if p.stateOperators.nonEmpty => p.stateOperators
    }.getOrElse(Array.empty)
    val rows = ops.map(_.numRowsTotal).sum
    val rocks = ops.exists(_.customMetrics.keySet.asScala
      .exists(_.toLowerCase.contains("rocksdb")))
    (rows, rocks)
  }

  test("ST10 under RocksDB: funnel parity with batch + state drain, provider engaged") {
    withRocksDb {
      implicit val sq = spark.sqlContext
      val fixture = Seq(
        ("A", 1030L, "purchase"), ("A", 1010L, "view"), ("A", 1020L, "click"),
        ("B", 1020L, "view"), ("B", 1010L, "click"),
        ("C", 1010L, "view"), ("C", 99999L, "click"),
        ("D", 1010L, "view"))
      val steps = Seq(col("event_type") === "view",
        col("event_type") === "click", col("event_type") === "purchase")
      val in = MemoryStream[(String, Timestamp, String)]
      val out = StreamingFunnel.funnelLevels(
        in.toDF().toDF("user_id", "ts", "event_type"), "user_id", "ts",
        window = 86400L, steps = steps,
        watermark = "600 seconds", hold = 10L)
      val q = out.toDF().toDF("user_id", "level")
        .writeStream.format("memory").queryName("rocks_st10")
        .outputMode(OutputMode.Append()).start()
      try {
        val (b1, b2) = fixture.splitAt(4)
        in.addData(b1.map { case (u, t, a) => (u, ts(t), a) }: _*)
        q.processAllAvailable()
        in.addData(b2.map { case (u, t, a) => (u, ts(t), a) }: _*)
        q.processAllAvailable()
        in.addData(("zz", ts(500000L), "view"))
        q.processAllAvailable()
        in.addData(("zz2", ts(900000L), "view"))
        q.processAllAvailable()
        val streamed = spark.table("rocks_st10")
          .where(!col("user_id").startsWith("zz"))
          .as[(String, Int)].collect().toMap
        assert(streamed === Map("A" -> 3, "B" -> 1, "C" -> 1, "D" -> 1),
          s"RocksDB-backed funnel drifted from batch parity: $streamed")
        val (rows, rocks) = stateAudit(q)
        assert(rocks, "state operator reports no rocksdb metrics — " +
          "the provider config silently fell back to the in-heap store")
        assert(rows <= 2L, s"funnel state not drained under RocksDB: $rows rows")
      } finally q.stop()
    }
  }

  test("ST7 under RocksDB: replay dedup + watermark-bounded state, provider engaged") {
    withRocksDb {
      implicit val sq = spark.sqlContext
      val in = MemoryStream[(Long, Long, Timestamp)]
      val rows = in.toDF().toDF("id", "_lsn", "_ts")
      val q = CdcStreaming.dedupReplays(rows, "10 seconds")
        .writeStream.format("memory").queryName("rocks_st7")
        .outputMode(OutputMode.Append()).start()
      try {
        in.addData((1L, 100L, ts(1)), (1L, 100L, ts(2)), (1L, 101L, ts(3)))
        q.processAllAvailable()
        in.addData((1L, 100L, ts(4))) // replay within watermark → dropped
        q.processAllAvailable()
        assert(spark.table("rocks_st7").count() === 2)
        // state growth audit: 4 batches of 20 fresh keys, event time
        // jumping 1000 s per batch against the 10 s watermark —
        // append-only state would end at ~80 rows; bounded state holds
        // the working set only
        (1 to 4).foreach { b =>
          in.addData((1 to 20).map(i =>
            ((b * 100 + i).toLong, 1L, ts(b * 1000L))): _*)
          q.processAllAvailable()
        }
        val (state, rocks) = stateAudit(q)
        assert(rocks, "state operator reports no rocksdb metrics — " +
          "the provider config silently fell back to the in-heap store")
        assert(state <= 45L,
          s"dedup state not watermark-bounded under RocksDB: $state rows")
      } finally q.stop()
    }
  }

  test("ST12 under RocksDB: z-score alerts parity with batch, provider engaged") {
    withRocksDb {
      implicit val sq = spark.sqlContext
      def cntOf(b: Long): Int = if (b == 18L) 30 else 3 + (b % 3).toInt
      val fixture = for {
        b <- 10L to 22L
        i <- 0 until cntOf(b)
      } yield ("click", b * 100L + i)
      val in = MemoryStream[(String, Timestamp)]
      val alerts = graft.streaming.StreamingAnomaly.zScoreAlerts(
        in.toDF().toDF("event_type", "ts"), "event_type", "ts",
        bucketSeconds = 100L, lookback = 7, watermark = "300 seconds")
      val q = alerts.toDF()
        .writeStream.format("memory").queryName("rocksz")
        .outputMode(OutputMode.Append()).start()
      try {
        in.addData(fixture.map { case (k, t) => (k, ts(t)) }: _*)
        q.processAllAvailable()
        in.addData(("zz", ts(1000000L)))
        q.processAllAvailable()
        in.addData(("zz", ts(2000000L)))
        q.processAllAvailable()
        val streamed = spark.table("rocksz")
          .where(col("key") === "click")
          .collect().map(r => (r.getLong(1), (r.getLong(2),
            if (r.isNullAt(3)) None else Some(r.getDouble(3)),
            if (r.isNullAt(4)) None else Some(r.getBoolean(4))))).toMap
        val daily = fixture.toDF("k", "ep")
          .select(col("k"), floor(col("ep") / lit(100.0)).cast("long").as("b"))
          .groupBy("k", "b").agg(count(lit(1)).as("cnt"))
        val batch = graft.operators.TimeSeries.rollingZScore(
          daily, Seq("k"), col("b"), col("cnt"), lookback = 7)
          .select("k", "b", "cnt", "z", "is_anomaly")
          .collect().map(r => (r.getLong(1), (r.getLong(2),
            if (r.isNullAt(3)) None else Some(r.getDouble(3)),
            if (r.isNullAt(4)) None else Some(r.getBoolean(4))))).toMap
        assert(streamed === batch)
        assert(streamed(18L)._3 === Some(true))
        val (state, rocks) = stateAudit(q)
        assert(rocks, "RocksDB provider not engaged")
        // per key: ring (<= lookback entries) + open buckets only —
        // 2 keys live, state must be O(keys), never O(events)
        assert(state <= 4L, s"z-score state not ring-bounded: $state rows")
      } finally q.stop()
    }
  }
}
