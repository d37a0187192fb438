package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** J6: as-of join — for each left row, the single closest right row
  * with the same key on the chosen side of leftTime. Spark has no
  * native as-of join, so this composes built-ins (SURVEY.md §2.3 J6).
  * All four ClickHouse ASOF inequalities are covered
  * (`direction`/`strict`): backward inclusive `rt <= lt` (the ASOF
  * default, latest-at-or-before wins), backward strict `rt < lt`,
  * forward inclusive `rt >= lt` (earliest-at-or-after), forward
  * strict `rt > lt`; [[asofJoinNearest]] adds the fifth arm, pandas
  * merge_asof's `nearest` (min |rt - lt|, equidistant tie → backward).
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
    *                     (backward: LATEST wins by this column;
    *                      forward: EARLIEST wins — the mirror rule)
    * @param rightPayload  right columns to carry onto left rows
    * @param direction "backward" (rt ≤/< lt, the ASOF default) or
    *                  "forward" (rt ≥/> lt)
    * @param strict    exclude the equal-time right row (< / > forms)
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: Column,
      rightTime: Column,
      rightTiebreak: Column,
      rightPayload: Seq[String],
      direction: String = "backward",
      strict: Boolean = false): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"as-of direction must be backward|forward, got $direction")
    // the tiebreak keeps its NATIVE type in the union schema — a blind
    // cast("long") would null out e.g. string tiebreaks and make the
    // equal-timestamp winner nondeterministic. Resolve the type against
    // `right` and fail fast on non-orderable (map/udt) columns.
    val tbType = right.select(rightTiebreak).schema.head.dataType
    require(
      org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(tbType),
      s"as-of tiebreak must be an orderable column, got ${tbType.simpleString}")
    // side ordering encodes the inequality's strictness: inclusive
    // sorts the right row FIRST at equal time (the left row's running
    // carry sees it), strict sorts the left row first (it doesn't)
    val (leftSide, rightSide) = if (strict) (0, 1) else (1, 0)
    val l = left
      .withColumn("__t", leftTime)
      .withColumn("__side", lit(leftSide))
      .withColumn("__tb", lit(null).cast(tbType))
      .withColumn("__r", lit(null).cast(
        s"struct<${rightPayload.map(c => s"$c:string").mkString(",")}>"))
    // carry right payload as strings to keep the union schema simple;
    // callers cast back (query layer outputs strings anyway — O3).
    val r = right
      .withColumn("__t", rightTime)
      .withColumn("__side", lit(rightSide))
      .withColumn("__tb", rightTiebreak)
      .withColumn("__r", struct(rightPayload.map(c => col(c).cast("string").as(c)): _*))
      .select((Seq(col(key), col("__t"), col("__side"), col("__tb"), col("__r")) ): _*)

    val lCols = l.columns.filterNot(Set(key, "__t", "__side", "__tb", "__r").contains)
    val unioned = l.select((Seq(col(key), col("__t"), col("__side"), col("__tb"), col("__r"))
        ++ lCols.map(col)): _*)
      .unionByName(r.withColumns(lCols.map(c => c -> lit(null).cast(left.schema(c).dataType)).toMap),
        allowMissingColumns = false)

    // backward walks time ascending (running carry = latest right so
    // far); forward walks it DESCENDING (running carry = earliest right
    // still ahead). The tiebreak mirrors: walking toward the left row,
    // the LAST right seen at a tied time must be the winner — max tb
    // going forward in time, min tb going backward in time.
    val ordering =
      if (direction == "backward")
        Seq(col("__t").asc, col("__side").asc, col("__tb").asc)
      else
        Seq(col("__t").desc, col("__side").asc, col("__tb").desc)
    val w = Window
      .partitionBy(col(key))
      .orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__last",
        last(when(col("__side") === rightSide, col("__r")), ignoreNulls = true).over(w))
      .filter(col("__side") === leftSide)
      .drop("__side", "__tb", "__r", "__t")
      .withColumnRenamed("__last", "asof")
  }

  /** J6d: NEAREST as-of (pandas `merge_asof(direction="nearest")`) —
    * for each left row, the right row of the same key closest in
    * ABSOLUTE time distance; an equidistant tie prefers the backward
    * (at-or-before) row, and ties at one timestamp fall to the same
    * mirror tiebreak rule as the directional arms (backward: max
    * `rightTiebreak`; forward: min).
    *
    * Single-pass plan: the same union as [[asofJoin]], ONE shuffle and
    * ONE sort (time asc, right-before-left at equal time), with TWO
    * window frames over that sort — a running backward carry
    * (`last` over unboundedPreceding..current) and a forward probe
    * (`first` over current..unboundedFollowing) — then a per-row
    * pick of the smaller gap. Equal-time right rows sort before the
    * left row, so only the backward frame sees them; that is correct,
    * not a miss: their gap is 0 and the tie rule prefers backward.
    * Never materializes L×R_match; same skew caveat as [[asofJoin]].
    *
    * @param rightTimeField name of the `rightPayload` field holding
    *        the right time (payload fields are carried as strings;
    *        gaps compare in double — exact for epoch-seconds ranges)
    */
  def asofJoinNearest(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: Column,
      rightTime: Column,
      rightTiebreak: Column,
      rightPayload: Seq[String],
      rightTimeField: String): DataFrame = {
    require(rightPayload.contains(rightTimeField),
      s"rightTimeField $rightTimeField must be one of rightPayload")
    val tbType = right.select(rightTiebreak).schema.head.dataType
    require(
      org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(tbType),
      s"as-of tiebreak must be an orderable column, got ${tbType.simpleString}")
    // inclusive ordering: right rows sort before left at equal time
    val (leftSide, rightSide) = (1, 0)
    val l = left
      .withColumn("__t", leftTime)
      .withColumn("__side", lit(leftSide))
      .withColumn("__tb", lit(null).cast(tbType))
      .withColumn("__r", lit(null).cast(
        s"struct<${rightPayload.map(c => s"$c:string").mkString(",")}>"))
    val r = right
      .withColumn("__t", rightTime)
      .withColumn("__side", lit(rightSide))
      .withColumn("__tb", rightTiebreak)
      .withColumn("__r", struct(rightPayload.map(c => col(c).cast("string").as(c)): _*))
      .select(col(key), col("__t"), col("__side"), col("__tb"), col("__r"))
    val lCols = l.columns.filterNot(Set(key, "__t", "__side", "__tb", "__r").contains)
    val unioned = l.select((Seq(col(key), col("__t"), col("__side"), col("__tb"), col("__r"))
        ++ lCols.map(col)): _*)
      .unionByName(r.withColumns(lCols.map(c => c -> lit(null).cast(left.schema(c).dataType)).toMap),
        allowMissingColumns = false)
    // one sort serves both frames; __tb asc makes the backward carry's
    // last-seen = max tb and the forward probe's first-seen = min tb —
    // exactly the directional arms' mirror rule
    val ordering = Seq(col("__t").asc, col("__side").asc, col("__tb").asc)
    val wb = Window.partitionBy(col(key)).orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(col(key)).orderBy(ordering: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val onlyRight = when(col("__side") === rightSide, col("__r"))
    val picked = unioned
      .withColumn("__b", last(onlyRight, ignoreNulls = true).over(wb))
      .withColumn("__f", first(onlyRight, ignoreNulls = true).over(wf))
      .filter(col("__side") === leftSide)
    val lt = col("__t").cast("double")
    val bGap = abs(lt - col("__b").getField(rightTimeField).cast("double"))
    val fGap = abs(col("__f").getField(rightTimeField).cast("double") - lt)
    picked
      .withColumn("asof",
        when(col("__b").isNull, col("__f"))
          .when(col("__f").isNull, col("__b"))
          .when(bGap <= fGap, col("__b"))
          .otherwise(col("__f")))
      .drop("__side", "__tb", "__r", "__t", "__b", "__f")
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
