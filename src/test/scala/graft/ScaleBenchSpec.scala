package graft

import org.apache.spark.sql.functions._

/** The crossover measurement (BASELINE.md) is only meaningful if the
  * derived N× corpus really preserves within-replica similarity
  * structure and decorrelates replicas — these specs pin both
  * invariants the construction claims.
  */
class ScaleBenchSpec extends SparkSpec {
  import spark.implicits._

  test("deriveDocuments: within-replica Jaccard structure is exactly the base corpus's") {
    val docs = Seq(
      (0L, "the quick brown fox jumps high", "en", "web", 30L),
      (1L, "the quick brown fox jumps low", "en", "web", 29L),
      (2L, "completely different text entirely here", "en", "web", 39L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val derived = ScaleBench.deriveDocuments(docs, factor = 3)
    assert(derived.count() === 9)
    val base = graft.operators.Dedup.ngramJaccard(
      docs, "doc_id", col("text"), k = 2, minJ = 0.5)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    val scaled = graft.operators.Dedup.ngramJaccard(
      derived, "doc_id", col("text"), k = 2, minJ = 0.5)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    // every replica contributes EXACTLY the base pair set (ids offset
    // by k*maxId), and token remapping creates no cross-replica pairs
    val expected = (0 until 3).flatMap(k =>
      base.map { case (a, b, j) => (a + k * 3L, b + k * 3L, j) }).toSet
    assert(scaled === expected)
  }

  test("deriveEmbeddings: sign-masks preserve within-replica cosines exactly, decorrelate replicas") {
    val vecs = Seq(
      (0L, Array.tabulate(64)(i => math.sin(i + 1).toFloat), 0),
      (1L, Array.tabulate(64)(i => math.sin(i + 1.1).toFloat), 0), // near-dup of 0
      (2L, Array.tabulate(64)(i => math.cos(3 * i + 2).toFloat), 1))
      .toDF("vec_id", "embedding", "label")
    val derived = ScaleBench.deriveEmbeddings(vecs, factor = 4, dim = 64)
    assert(derived.count() === 12)
    val pairs = graft.operators.Similarity.nearDupPairs(
      derived, "vec_id", "embedding", minCos = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // the (0,1) near-dup appears once per replica, ids offset by 3k —
    // and NO cross-replica pair reaches the near-dup threshold
    assert(pairs === (0 until 4).map(k => (k * 3L, k * 3L + 1L)).toSet)
  }
}
