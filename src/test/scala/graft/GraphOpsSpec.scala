package graft

import graft.operators.GraphOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Connected components / cluster-dedup (the X2 cluster step). The
  * registered q_dedup_clusters / q_dedup_survivors are value-checked
  * against a DuckDB recursive-CTE oracle by the driver; these cover
  * the operator's graph semantics and the pointer-jumping convergence
  * bound on constructed graphs.
  */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private def edges(rows: (Long, Long)*): DataFrame =
    rows.toDF("src", "dst")

  private def cc(pairs: DataFrame, maxIters: Int = 20): Map[Long, Long] =
    GraphOps.connectedComponents(pairs, "src", "dst", maxIters)
      .as[(Long, Long)].collect().toMap

  test("two disjoint components resolve to their minimum ids") {
    val out = cc(edges(10L -> 20L, 20L -> 30L, 7L -> 8L))
    assert(out == Map(10L -> 10L, 20L -> 10L, 30L -> 10L, 7L -> 7L, 8L -> 7L))
  }

  test("non-transitive pairs collapse through a shared member") {
    // a~b and b~c but no a~c edge: one cluster regardless
    val out = cc(edges(2L -> 1L, 2L -> 3L))
    assert(out.values.toSet == Set(1L))
  }

  test("a 33-node path converges within 10 rounds (pointer jumping)") {
    // naive min-propagation needs 32 rounds to carry label 0 to the
    // far end; path halving must finish in O(log n)
    val path = edges((0L until 32L).map(i => i -> (i + 1)): _*)
    val out = cc(path, maxIters = 10)
    assert(out.size == 33 && out.values.toSet == Set(0L))
  }

  test("duplicate and reversed edges are harmless") {
    val out = cc(edges(1L -> 2L, 2L -> 1L, 1L -> 2L, 2L -> 3L))
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("connectedComponents matches a union-find reference on random graphs") {
    // seeded ScalaCheck generators (scalatestplus bridge not available
    // offline — fixed seeds keep runs reproducible)
    val edgeGen = Gen.listOfN(40, for {
      a <- Gen.choose(0L, 24L)
      b <- Gen.choose(0L, 24L) if a != b
    } yield (a, b))
    def unionFind(es: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // normalize to min-of-component (find roots are mins because
      // union always points the larger root at the smaller)
      parent.keys.map(k => k -> find(k)).toMap
    }
    (1 to 8).foreach { i =>
      val es = edgeGen.apply(Gen.Parameters.default, Seed(i.toLong)).get
      val expected = unionFind(es)
      val got = cc(edges(es: _*))
      assert(got == expected, s"seed $i: got $got\nexpected $expected")
    }
    // denser instance: the semi-naive frontier shrinks fast here, so
    // this also exercises late rounds where most labels are final and
    // propagation must come from the frontier alone
    val dense = Gen.listOfN(400, for {
      a <- Gen.choose(0L, 199L)
      b <- Gen.choose(0L, 199L) if a != b
    } yield (a, b)).apply(Gen.Parameters.default, Seed(99L)).get
    assert(cc(edges(dense: _*)) == unionFind(dense))
  }

  test("dedupByCluster keeps one survivor per cluster plus isolated docs") {
    val docs = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    val pairs = edges(1L -> 2L, 2L -> 3L, 5L -> 6L)
    val kept = GraphOps.dedupByCluster(docs, "doc_id", pairs, "src", "dst")
      .as[Long].collect().sorted
    // 4 is in no pair: survives as its own singleton
    assert(kept.toSeq == Seq(1L, 4L, 5L))
  }

  test("clusterSizeStats: histogram over paired nodes only") {
    // clusters: {1,2,3} size 3, {5,6} size 2, {8,9} size 2; 4 unpaired
    val pairs = edges(1L -> 2L, 2L -> 3L, 5L -> 6L, 8L -> 9L)
    val out = GraphOps.clusterSizeStats(pairs, "src", "dst")
      .orderBy("size")
      .as[(Long, Long, Long)].collect()
    assert(out.toSeq == Seq((2L, 2L, 4L), (3L, 1L, 3L)))
  }

  test("dedupByClusterBest: null scores cannot win; all-null cluster kept whole") {
    // cluster {1,2}: 2 has null score — 1 must win (a null would sort
    // first in the min_by struct and steal survivorship unguarded);
    // cluster {5,6}: both null → no winner elected, both kept
    val docs = Seq((1L, Some(10L)), (2L, None), (5L, None), (6L, None))
      .toDF("doc_id", "quality")
    val pairs = edges(1L -> 2L, 5L -> 6L)
    val kept = GraphOps.dedupByClusterBest(
      docs, "doc_id", col("quality"), pairs, "src", "dst")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 5L, 6L))
  }

  test("dedupByClusterBest keeps the max-score member, tie → min id") {
    // cluster {1,2,3}: scores 10/30/20 → 2 wins on score;
    // cluster {5,6}: scores 7/7 → 5 wins the tie on id;
    // 4 isolated → survives regardless of its low score
    val docs = Seq((1L, 10L), (2L, 30L), (3L, 20L), (4L, 1L),
      (5L, 7L), (6L, 7L)).toDF("doc_id", "quality")
    val pairs = edges(1L -> 2L, 2L -> 3L, 5L -> 6L)
    val kept = GraphOps.dedupByClusterBest(
      docs, "doc_id", col("quality"), pairs, "src", "dst")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(2L, 4L, 5L))
  }

  test("triangles: K4 has 4, star has 0, each triangle emitted once, matches brute force on a random graph") {
    // K4 on {1,2,3,4}: all 6 edges (deliberately duplicated and
    // reversed — canonicalization must absorb both)
    val k4 = edges(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L,
      3L -> 4L, 2L -> 1L, 3L -> 1L)
    val t4 = GraphOps.triangles(k4, "src", "dst")
      .as[(Long, Long, Long)].collect().toSet
    assert(t4 === Set((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L),
      (2L, 3L, 4L)))
    // a hub star has many wedges but zero triangles
    val star = edges((1L to 8L).map(i => 0L -> i): _*)
    assert(GraphOps.triangles(star, "src", "dst").count() === 0L)
    // brute-force parity on a random graph (incl. a hub)
    val rnd = new scala.util.Random(29)
    val es = (0 until 120).map(_ =>
      (rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
      .filter(e => e._1 != e._2)
    val got = GraphOps.triangles(es.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long, Long)].collect().toSet
    val und = es.map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
      .toSet
    val vs = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val brute = (for {
      a <- vs; b <- vs if a < b && und((a, b))
      c <- vs if b < c && und((b, c)) && und((a, c))
    } yield (a, b, c)).toSet
    assert(got === brute && brute.nonEmpty)
  }

  test("clusteringCoefficient: clique members 1, hub 0, degree-1 null") {
    // triangle {1,2,3} plus a pendant 4-1 and a hub 0 joined to both
    // sides of nothing (star 0-{5,6,7})
    val g = edges(1L -> 2L, 2L -> 3L, 1L -> 3L, 4L -> 1L,
      0L -> 5L, 0L -> 6L, 0L -> 7L)
    val out = GraphOps.clusteringCoefficient(g, "src", "dst")
      .select("node", "degree", "n_triangles", "coeff")
      .as[(Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(out(2L) === ((2L, 2L, 1L, Some(1.0))))
    assert(out(1L) === ((1L, 3L, 1L, Some(math.round(2.0 / 6 * 1e6) / 1e6))))
    assert(out(0L) === ((0L, 3L, 0L, Some(0.0))))
    assert(out(4L)._4.isEmpty && out(4L)._2 === 1L)
  }
}
