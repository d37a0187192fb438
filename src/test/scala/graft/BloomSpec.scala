package graft

import graft.functions.Bloom
import graft.operators.Curation
import org.apache.spark.sql.functions._

/** X6b — the pure-Catalyst Bloom filter and its decontamination arm.
  * The registered q_decontam_bloom carries the value oracle (identical
  * to q_decontaminate's by construction); these pin the sketch
  * properties the oracle can't see.
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives: every built value tests positive") {
    val members = (0 until 500).map(i => s"member-$i")
    val f = Bloom.build(members.toDF("v"), col("v"))
    val hits = members.toDF("v")
      .where(Bloom.mightContain(f, col("v"))).count()
    assert(hits === 500L)
  }

  test("member cap fails fast with a clear error, under the cap builds normally") {
    val members = (0 until 200).map(i => s"m-$i").toDF("v")
    val e = intercept[IllegalArgumentException](
      Bloom.build(members, col("v"), maxMembers = 100L))
    assert(e.getMessage.contains("cap"))
    // at exactly the cap the build succeeds (the +1 probe row is the
    // overflow detector, not part of the budget)
    assert(Bloom.build(members, col("v"), maxMembers = 200L).bits > 0)
  }

  test("false-positive rate on disjoint probes stays near the design point") {
    val f = Bloom.build((0 until 500).map(i => s"member-$i").toDF("v"), col("v"))
    val probes = (0 until 2000).map(i => s"other-$i")
    val fp = probes.toDF("v").where(Bloom.mightContain(f, col("v"))).count()
    // design ~<2% at 10 bits/item, k=3; allow slack for hash variance
    assert(fp < 100L, s"FP count $fp out of 2000 — bitmap mis-sized?")
  }

  test("probe is codegen built-ins — no UDF in the plan") {
    val f = Bloom.build(Seq("a").toDF("v"), col("v"))
    // range is not constant-foldable, so the probe survives into the
    // physical plan (a local Seq gets evaluated away by the optimizer)
    val plan = spark.range(2)
      .select(concat(lit("x"), col("id")).as("v"))
      .where(Bloom.mightContain(f, col("v")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("xxhash64") && plan.contains("getbit"))
    assert(!plan.toLowerCase.contains("pythonudf") && !plan.contains("UDF("))
  }

  test("decontaminateBloom returns exactly decontaminate's result") {
    requireTestdata()
    val docs = graft.Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val corpus = docs.where(col("doc_id") % 10 =!= 0)
    val bench = docs.where(col("doc_id") % 10 === 0)
    val exact = Curation.decontaminate(corpus, bench, "doc_id", col("text"), 6)
      .as[(Long, Long)].collect().toSet
    val bloomed = Curation.decontaminateBloom(corpus, bench, "doc_id", col("text"), 6)
      .as[(Long, Long)].collect().toSet
    assert(bloomed === exact)
    assert(exact.nonEmpty) // the comparison must not pass vacuously
  }
}
