package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** ClickHouse `uniqUpTo(N)(x)`: EXACT distinct count when it is
  * ≤ N, the sentinel N+1 otherwise — with state bounded at N+1
  * witnesses regardless of stream size. The shape behind "show the
  * exact count up to 100, then '100+'" UI facets: a plain
  * count_distinct shuffles every distinct value; this carries at
  * most N+1 per group through the map-side combine, so cardinality
  * spikes cannot balloon the exchange.
  *
  * The merge is the capped set union — associative and commutative
  * (once any side saturates past N the result saturates), so Spark
  * runs it as partial+final aggregation. Exactness law: for
  * |distinct| <= N the result equals count_distinct EXACTLY (the
  * registered query's oracle-able regime); beyond, the sentinel.
  * Nulls are skipped like count_distinct.
  */
class UniqUpTo(n: Int) extends Aggregator[String, Set[String], Long] {
  require(n >= 1, s"n must be >= 1: $n")

  override def zero: Set[String] = Set.empty

  override def reduce(b: Set[String], v: String): Set[String] =
    if (v == null || b.size > n) b else b + v

  override def merge(a: Set[String], b: Set[String]): Set[String] = {
    // capped union: stop absorbing once saturated — the result only
    // needs to WITNESS that the count exceeds n
    if (a.size > n) a
    else if (b.size > n) b
    else {
      var out = a
      val it = b.iterator
      while (it.hasNext && out.size <= n) out = out + it.next()
      out
    }
  }

  override def finish(b: Set[String]): Long = math.min(b.size, n + 1).toLong

  override def bufferEncoder: Encoder[Set[String]] =
    Encoders.kryo[Set[String]]
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
