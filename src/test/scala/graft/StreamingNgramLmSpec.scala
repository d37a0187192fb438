package graft

import java.nio.file.Files
import graft.operators.Curation
import graft.streaming.StreamingNgramLm
import org.apache.spark.sql.functions._

/** ST16: streaming maintenance of the KN trigram model — parity with
  * the batch operator after every commit, replay no-ops, crash
  * healing, out-of-corpus scoring semantics, and the MemoryStream
  * end-to-end path.
  */
class StreamingNgramLmSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "a b c a b d a b c"),
    (2L, "b a c d a b e f g"),
    (3L, "c c a b c a b d a"),
    (4L, "a b d a b c e f g"),
    (5L, "e f g a b c a b d"))

  private def docsUpTo(k: Int) = corpus.take(k).toDF("doc_id", "text")

  private def fromStore(store: String, docs: org.apache.spark.sql.DataFrame) =
    StreamingNgramLm.knScoreFromStore(spark, store, docs, "doc_id",
      col("text"))
      .select(col("doc_id"), col("n_trigrams"), col("avg_logprob_kn"))
      .as[(Long, Long, Double)].collect().toSet

  private def batchRef(k: Int) =
    Curation.kneserNeyLogProb(docsUpTo(k), "doc_id", col("text"))
      .select(col("doc_id"), col("n_trigrams"), col("avg_logprob_kn"))
      .as[(Long, Long, Double)].collect().toSet

  test("ST16: per-batch folds score bit-equal to the batch KN operator; replay no-op; crash heal") {
    val store = Files.createTempDirectory("graft-snglm").toString
    // virgin store: well-formed empty result
    assert(fromStore(store, docsUpTo(5)).isEmpty)
    StreamingNgramLm.applyBatch(docsUpTo(3), "doc_id", col("text"),
      store, batchId = 0L)
    assert(fromStore(store, docsUpTo(3)) == batchRef(3))
    StreamingNgramLm.applyBatch(
      corpus.slice(3, 5).toDF("doc_id", "text"), "doc_id", col("text"),
      store, batchId = 1L)
    val full = fromStore(store, docsUpTo(5))
    assert(full.nonEmpty && full == batchRef(5))
    // replay of a committed batch changes nothing
    StreamingNgramLm.applyBatch(docsUpTo(3), "doc_id", col("text"),
      store, batchId = 1L)
    assert(fromStore(store, docsUpTo(5)) == full)
    // crash window: a state dir written but never committed is
    // invisible; the re-applied batch heals it
    new java.io.File(s"$store/state-3").mkdirs()
    assert(fromStore(store, docsUpTo(5)) == full)
    StreamingNgramLm.applyBatch(
      Seq((6L, "a b c a b d x y z")).toDF("doc_id", "text"),
      "doc_id", col("text"), store, batchId = 2L)
    val extended = corpus :+ ((6L, "a b c a b d x y z"))
    val ref = Curation.kneserNeyLogProb(
      extended.toDF("doc_id", "text"), "doc_id", col("text"))
      .select(col("doc_id"), col("n_trigrams"), col("avg_logprob_kn"))
      .as[(Long, Long, Double)].collect().toSet
    assert(fromStore(store, extended.toDF("doc_id", "text")) == ref)
    val (_, lastBatch, nDocs) = StreamingNgramLm.readPointer(store)
    assert(lastBatch == 2L && nDocs == 6L)
  }

  test("ST16: out-of-corpus documents score over their in-model trigram positions only") {
    val store = Files.createTempDirectory("graft-snglm-oov").toString
    StreamingNgramLm.applyBatch(docsUpTo(5), "doc_id", col("text"),
      store, batchId = 0L)
    // "a b c" is in-model; "q q q" is not — n_trigrams counts only
    // the scored positions (the CCNet deployment shape: reference LM,
    // incoming stream)
    val incoming = Seq(
      (100L, "a b c a b d"),   // 4 trigram positions, all in-model
      (101L, "q q q a b c"),   // only "a b c" scores
      (102L, "q q q q q q"))   // fully unseen: absent from output
      .toDF("doc_id", "text")
    val out = fromStore(store, incoming).toMap2
    assert(out(100L)._1 == 4L)
    assert(out(101L)._1 == 1L)
    assert(!out.contains(102L))
    // the in-model positions carry the SAME per-trigram log-probs as
    // the batch model: doc 100's mean over {abc,bca,cab,abd} must
    // equal the corpus-internal score of an identical corpus doc if
    // one existed — verified via a direct model lookup
    val t3 = spark.read.parquet(
      s"$store/state-${StreamingNgramLm.readPointer(store)._1}")
    val lp = Curation.knModelLogProbs(t3, 0.75)
      .select(concat_ws(" ", col("w1"), col("w2"), col("w3")), col("lp"))
      .as[(String, Double)].collect().toMap
    val expect = Seq("a b c", "b c a", "c a b", "a b d").map(lp).sum / 4.0
    assert(math.abs(out(100L)._2 - expect) < 1e-9)
  }

  private implicit class M(s: Set[(Long, Long, Double)]) {
    def toMap2: Map[Long, (Long, Double)] =
      s.map(t => t._1 -> (t._2, t._3)).toMap
  }

  test("ST16: end-to-end through foreachBatch on a MemoryStream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val store = Files.createTempDirectory("graft-snglm-ms").toString
    val ckpt = Files.createTempDirectory("graft-snglm-ck").toString
    val in = MemoryStream[(Long, String)]
    val q = StreamingNgramLm.maintain(
      in.toDF().toDF("doc_id", "text"), "doc_id", col("text"),
      store, ckpt).start()
    try {
      in.addData(corpus.take(3): _*)
      q.processAllAvailable()
      in.addData(corpus.drop(3): _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(fromStore(store, docsUpTo(5)) == batchRef(5))
  }
}
