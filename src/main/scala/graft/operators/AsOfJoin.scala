package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** J6: as-of join — for each left row, the single latest right row with
  * the same key and rightTime <= leftTime. Spark has no native as-of
  * join, so this composes built-ins (SURVEY.md §2.3 J6).
  *
  * Two formulations:
  *
  * 1. [[asofJoin]] — union + running `last_value`: tag both inputs,
  *    union them, sort within key by (time, side), and carry the most
  *    recent right payload forward with a running window. Cost is ONE
  *    shuffle of |L|+|R| rows and never materializes the L×R_match
  *    cross product — this is the 100 TB-safe path (an equi-join with
  *    `rt <= lt` predicate would explode: every left row matches every
  *    earlier right row of its key before the per-row top-1 filter).
  *
  * 2. [[asofJoinViaJoin]] — naive join + row_number, kept as the
  *    reference/oracle-shaped formulation for tests.
  *
  * Skew caveat (100 TB): the union+window path partitions by `key`, so
  * one pathological key lands on one task. Salting is NOT applicable
  * here — a running `last` must see the key's full time-ordered history,
  * and salt boundaries would break carry-forward. Mitigations at scale:
  * pre-filter right rows to the left side's time range (shrinks the
  * window input), split the time axis into coarse range buckets and
  * seed each bucket with the previous bucket's final right row (a
  * two-phase carry), or fall back to [[asofJoinViaJoin]] + AQE skew
  * join when matches-per-key are bounded. The equi-join salting helper
  * in operators/SkewJoin.scala covers the join-shaped cases.
  */
object AsOfJoin {

  /** @param left      left (probe) rows
    * @param right     right (reference) rows
    * @param key       equi-join key column name (same name both sides)
    * @param leftTime  event-time column on `left`
    * @param rightTime event-time column on `right`
    * @param rightTiebreak breaks ties among right rows at equal time
    *                     (latest wins by this column, e.g. a unique id)
    * @param rightPayload  right columns to carry onto left rows
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: Column,
      rightTime: Column,
      rightTiebreak: Column,
      rightPayload: Seq[String]): DataFrame = {
    // the tiebreak keeps its NATIVE type in the union schema — a blind
    // cast("long") would null out e.g. string tiebreaks and make the
    // equal-timestamp winner nondeterministic. Resolve the type against
    // `right` and fail fast on non-orderable (map/udt) columns.
    val tbType = right.select(rightTiebreak).schema.head.dataType
    require(
      org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(tbType),
      s"as-of tiebreak must be an orderable column, got ${tbType.simpleString}")
    val l = left
      .withColumn("__t", leftTime)
      .withColumn("__side", lit(1)) // left sorts AFTER right at equal t
      .withColumn("__tb", lit(null).cast(tbType))
      .withColumn("__r", lit(null).cast(
        s"struct<${rightPayload.map(c => s"$c:string").mkString(",")}>"))
    // carry right payload as strings to keep the union schema simple;
    // callers cast back (query layer outputs strings anyway — O3).
    val r = right
      .withColumn("__t", rightTime)
      .withColumn("__side", lit(0))
      .withColumn("__tb", rightTiebreak)
      .withColumn("__r", struct(rightPayload.map(c => col(c).cast("string").as(c)): _*))
      .select((Seq(col(key), col("__t"), col("__side"), col("__tb"), col("__r")) ): _*)

    val lCols = l.columns.filterNot(Set(key, "__t", "__side", "__tb", "__r").contains)
    val unioned = l.select((Seq(col(key), col("__t"), col("__side"), col("__tb"), col("__r"))
        ++ lCols.map(col)): _*)
      .unionByName(r.withColumns(lCols.map(c => c -> lit(null).cast(left.schema(c).dataType)).toMap),
        allowMissingColumns = false)

    val w = Window
      .partitionBy(col(key))
      .orderBy(col("__t").asc, col("__side").asc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__last", last(when(col("__side") === 0, col("__r")), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__side", "__tb", "__r", "__t")
      .withColumnRenamed("__last", "asof")
  }

  /** Join + per-left-row top-1 window. Quadratic in matches-per-key —
    * fine for tests/small dims, not the scale path.
    */
  def asofJoinViaJoin(
      left: DataFrame,
      leftId: Column,
      right: DataFrame,
      joinCond: Column,
      rightTime: Column,
      rightTiebreak: Column): DataFrame = {
    val joined = left.join(right, joinCond, "inner")
    val w = Window.partitionBy(leftId).orderBy(rightTime.desc, rightTiebreak.desc)
    joined.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
