package graft

import graft.functions.StringRollingHash
import graft.operators.Multimodal
import graft.streaming.IngestionMetrics
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the metrics surface and cross-module hash
  * consistency.
  */
class ObservabilitySpec extends AnyFunSuite {

  test("latency histogram buckets are cumulative-compatible (Prometheus DefBuckets shape)") {
    val m = new IngestionMetrics
    assert(m.bucketBoundsMs.toSeq === Seq(5, 10, 25, 50, 100, 250, 500, 1000, 2500, 5000, 10000))
    assert(m.bucketBoundsMs.sliding(2).forall(p => p(0) < p(1)))
    val r = m.render()
    assert(r.contains("ingest_rows_total 0"))
    assert(r.linesIterator.count(_.startsWith("ingest_batch_ms_bucket")) === 12)
  }

  test("multimodal decode checksum is the same base-31 polynomial as rolling_hash") {
    val payload = "some document text".getBytes("UTF-8")
    val (crc, _, _) = Multimodal.decodeStub(payload)
    assert(crc === StringRollingHash.hash(payload))
  }

  test("decodeStub features are deterministic and bounded") {
    val p = Array.tabulate(5000)(i => (i % 251).toByte)
    val a = Multimodal.decodeStub(p)
    val b = Multimodal.decodeStub(p)
    assert(a === b)
    assert(a._2 >= 0.0 && a._2 <= 1.0)
    assert(Multimodal.decodeStub(Array.empty[Byte]) === ((0L, 0.0, 0.0)))
  }
}
