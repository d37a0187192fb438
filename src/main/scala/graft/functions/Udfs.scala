package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** §2.11: the three Spark user-extension points, demonstrated once
  * each (SURVEY.md §2.11 — the reference has no user-extensible
  * functions; this is the minimum-viable extension surface).
  *
  * Preference order stays: built-in functions > native Expression >
  * UDF (SURVEY.md §4.2) — each item here documents why/when the
  * extension point is warranted over the built-in it shadows.
  */
object Udfs {

  // ---------------------------------------------------------------
  // 1. Typed Aggregator (UDAF surface)
  // ---------------------------------------------------------------

  /** Versioned row for the LatestByLsn aggregator — mirrors the
    * reference's CDCUserRow version columns
    * (/root/reference/internal/model/cdc.go:33-41).
    */
  case class Versioned(id: Long, lsn: Long, op: Int, payload: String)

  /** `Aggregator[IN,BUF,OUT]` reproducing A8/W1 argmax-by-version
    * ("latest row wins") semantics. Production code should prefer the
    * built-in `max_by(struct(...), struct(_lsn, _op))` — this typed
    * form exists to prove the UDAF surface and for callers that need
    * typed buffers (e.g. richer merge logic than lexicographic max).
    * Merge is associative+commutative → partial aggregation applies,
    * same 100 TB shape as max_by.
    */
  object LatestByLsn extends Aggregator[Versioned, Versioned, Versioned] {
    private val minRow = Versioned(0L, Long.MinValue, Int.MinValue, null)
    override def zero: Versioned = minRow
    private def later(a: Versioned, b: Versioned): Versioned =
      if (a.lsn > b.lsn || (a.lsn == b.lsn && a.op >= b.op)) a else b
    override def reduce(b: Versioned, in: Versioned): Versioned = later(b, in)
    override def merge(a: Versioned, b: Versioned): Versioned = later(a, b)
    override def finish(r: Versioned): Versioned = r
    override def bufferEncoder: Encoder[Versioned] = Encoders.product[Versioned]
    override def outputEncoder: Encoder[Versioned] = Encoders.product[Versioned]
  }

  // ---------------------------------------------------------------
  // 2. Scalar UDF (and why the native form is preferred)
  // ---------------------------------------------------------------

  /** Cosine similarity as a Scala UDF over float arrays. The native
    * composition (VectorFns.cosine: zip_with+aggregate) is the
    * production path — it stays inside codegen with no
    * serialization boundary; this UDF exists as the §2.11 scalar
    * surface proof and as a cross-check in tests. Identical
    * float→double sequential accumulation order, so both forms agree
    * bit-for-bit.
    */
  val cosineUdf = udf { (a: Seq[Float], b: Seq[Float]) =>
    if (a == null || b == null) None // null-propagate like the native form
    else {
      var dp = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dp += x * y; na += x * x; nb += y * y
        i += 1
      }
      val d = math.sqrt(na) * math.sqrt(nb)
      Some(if (d == 0.0) 0.0 else dp / d)
    }
  }

  // ---------------------------------------------------------------
  // 3. Generator / UDTF surface
  // ---------------------------------------------------------------

  /** Tokenizer as Spark's sanctioned UDTF form: a function returning
    * `array<string>`, exploded by the caller (X4; SURVEY.md §2.11).
    * The UDF body lowercases and splits on non-alphanumeric runs —
    * slightly richer than the codegen'd `split` (which the query layer
    * uses); registered as `graft_tokenize` for SQL callers.
    */
  val tokenizeUdf = udf { (text: String) =>
    if (text == null) Array.empty[String]
    else text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
  }

  /** UDTF-style usage: one row per token. */
  def explodeTokens(text: Column): Column = explode(tokenizeUdf(text))

  /** Register SQL-callable names for all three surfaces. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("graft_latest_by_lsn", udaf(LatestByLsn))
    spark.udf.register("graft_cosine", cosineUdf)
    spark.udf.register("graft_tokenize", tokenizeUdf)
  }
}
