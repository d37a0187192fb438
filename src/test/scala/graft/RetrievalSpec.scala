package graft

import graft.operators.Retrieval
import org.apache.spark.sql.functions._

/** X19 BM25 — scores checked against an independent scalar
  * reimplementation of the Okapi formula (Robertson & Zaragoza 2009),
  * plus contract edges: unmatched docs absent, k cut, tie-break.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b a"),
    (2L, "a c"),
    (3L, "b b b c"),
    (4L, "c c")).toDF("doc_id", "text")

  /** Straight-line reference scorer (no Spark, no shared code). */
  private def ref(tf: Double, df: Double, n: Double, dl: Double,
      avgdl: Double, k1: Double = 1.2, b: Double = 0.75): Double = {
    val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
  }

  test("bm25TopK matches the scalar reference on a hand-built corpus") {
    val out = Retrieval.bm25TopK(docs, "doc_id", col("text"),
      terms = Seq("a", "b"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    // N=4, avgdl=(3+2+4+2)/4=2.75; df(a)=2, df(b)=2
    val expected = Seq(
      1L -> (ref(2, 2, 4, 3, 2.75) + ref(1, 2, 4, 3, 2.75)), // a×2, b×1
      3L -> ref(3, 2, 4, 4, 2.75),                           // b×3
      2L -> ref(1, 2, 4, 2, 2.75))                           // a×1
    val ranked = expected.sortBy { case (id, s) => (-s, id) }
    assert(out.map(_._1).toSeq == ranked.map(_._1),
      s"rank order drifted: ${out.toSeq}")
    for (((id, s), (oid, os, _)) <- ranked.zip(out)) {
      assert(id == oid)
      assert(math.abs(os - s) < 5e-7, s"doc $id: $os vs reference $s")
    }
    // doc 4 matches no query term — absent, not zero-scored
    assert(!out.exists(_._1 == 4L))
    // n_terms = distinct matched terms
    assert(out.find(_._1 == 1L).get._3 == 2L)
    assert(out.find(_._1 == 3L).get._3 == 1L)
  }

  test("k cuts after the deterministic (score desc, id) order") {
    val top1 = Retrieval.bm25TopK(docs, "doc_id", col("text"),
      terms = Seq("a", "b"), k = 1).collect()
    assert(top1.map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("tied scores break on doc id") {
    val twins = Seq((7L, "x y"), (3L, "x y"), (5L, "z")).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(twins, "doc_id", col("text"),
      terms = Seq("x"), k = 5).collect().map(_.getLong(0))
    assert(out.toSeq == Seq(3L, 7L))
  }

  test("registered query q_bm25 returns k rows with the rare term on top") {
    requireTestdata()
    val out = SparkEntry.queries("q_bm25")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.length == 25)
    // "dup" is the rare high-idf term — every top doc must contain it
    val docsTbl = Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val dupDocs = docsTbl.where(array_contains(split(col("text"), " "), "dup"))
      .select("doc_id").as[Long].collect().toSet
    val topIds = out.map(_.getLong(0)).toSet
    assert(topIds.subsetOf(dupDocs),
      s"top-25 contains docs without the rare term: ${topIds -- dupDocs}")
  }
}
