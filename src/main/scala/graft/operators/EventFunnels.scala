package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ClickHouse parametric-aggregate analytics over the events table —
  * `windowFunnel`, `retention`, and `sequenceMatch`/`sequenceCount`,
  * the canonical dashboard queries the
  * reference's append-only `events_db.events` sink exists to serve
  * (`/root/reference/internal/ingestion/clickhouse.go:74`,
  * `internal/model/event.go:5-10`; the function family is public
  * ClickHouse SQL surface).
  *
  * Both are per-user aggregations: ONE shuffle keyed on the user
  * column, then whole-partition window minima (funnel) or plain
  * conditional aggregation (retention). No collect_list, no per-user
  * fold state, no UDAF — at 100 TB the funnel is N unordered
  * partition-window passes stacked on a single user-keyed exchange
  * (Catalyst runs them over one sort, same shape as the resample
  * window stack in PLANS.md).
  */
object EventFunnels {

  /** First-match step tagging: an event tags as the FIRST condition
    * it satisfies (1-based), 0 when none match. The single definition
    * every funnel/sequence arm shares — batch (`windowFunnel`,
    * `sequenceStrings`) and streaming (`StreamingFunnel`) parity
    * depends on this being one expression, not three copies.
    *
    * SEMANTIC RESTRICTION (every operator in this file defaults to
    * it): with OVERLAPPING step conditions an event serves only its
    * first satisfied step, so it cannot also advance a later step —
    * ClickHouse's windowFunnel/sequenceMatch record EVERY satisfied
    * condition per event. Disjoint conditions (the dashboard norm)
    * are unaffected; ClickHouse-parity callers with non-disjoint
    * conditions pass `multiTag = true`, which expands each event into
    * one row per satisfied condition ([[multiTagSteps]]). Note
    * ClickHouse's own 'strict_dedup' mode exists precisely to turn
    * that default multi-tagging OFF.
    */
  def stepTag(steps: Seq[Column]): Column =
    steps.zipWithIndex.foldRight(lit(0)) {
      case ((c, i), els) => when(c, i + 1).otherwise(els)
    }

  /** Multi-tag step tagging: ALL 1-based step indices the event
    * satisfies (ClickHouse's per-condition recording). Empty array
    * when none match.
    */
  def multiTagSteps(steps: Seq[Column]): Column =
    filter(array(steps.zipWithIndex.map { case (c, i) =>
      when(c, lit(i + 1)).otherwise(lit(null).cast("int"))
    }: _*), x => x.isNotNull)

  /** Shared (user, __t, __step) projection: first-match tagging by
    * default; `multiTag` explodes one row per satisfied condition
    * (explode drops events matching nothing, preserving the
    * unmatched-events-dropped default).
    */
  private def taggedBase(events: DataFrame, user: String, ts: Column,
      steps: Seq[Column], multiTag: Boolean): DataFrame =
    if (!multiTag)
      events
        .select(col(user), ts.cast("long").as("__t"),
          stepTag(steps).as("__step"))
        .where(col("__step") >= 1)
    else
      events
        .select(col(user), ts.cast("long").as("__t"),
          explode(multiTagSteps(steps)).as("__step"))

  /** Skew guard: keep each user's EARLIEST `cap` rows by the given
    * total-order sort key (a prefix in event-time order), so one
    * pathological user (a bot with millions of step events) cannot
    * balloon a single aggregation group — per-user state is bounded
    * at `cap` rows by a filter that runs BEFORE any collect. The
    * row_number window repartitions on the same user key the
    * downstream aggregation uses, so the guard adds a sort but no
    * extra shuffle. `cap <= 0` disables. The capped answer is
    * deterministic and documented: the operator's exact semantics
    * over the user's first `cap` step-events (rows tied on the full
    * sort key are interchangeable for every DP in this file, so
    * row_number's tie choice cannot change the result).
    */
  private def capPerUser(base: DataFrame, user: String, cap: Int,
      order: Seq[Column]): DataFrame =
    if (cap <= 0) base
    else {
      val w = Window.partitionBy(col(user)).orderBy(order: _*)
      base.withColumn("__rn", row_number().over(w))
        .where(col("__rn") <= cap).drop("__rn")
    }

  /** First-touch window funnel: for each user, how many funnel steps
    * completed IN ORDER within `window` time units of the user's
    * EARLIEST step-1 event. Level times are defined closed-form:
    *
    *   t1 = min ts of a step-1 event
    *   tk = min ts of a step-k event with tk >= t(k-1) and tk <= t1 + window
    *
    * and the level is the largest k with tk defined. This is the
    * deterministic "first-touch" member of the ClickHouse
    * `windowFunnel` family: ClickHouse explores every chain start,
    * first-touch anchors the window at the earliest entry — the
    * standard dashboard conversion definition, and closed-form means
    * both engines compute it from the same conditional minima (full
    * value-level oracle, no fold-order sensitivity). Ties at the same
    * timestamp count (non-strict >=), matching the oracle SQL.
    *
    * An event matches the FIRST step condition it satisfies; users
    * with no step event at all do not appear (enter-the-funnel
    * population), while users entering at step >= 2 only report
    * level 0.
    *
    * Returns (user, level).
    */
  def windowFunnel(
      events: DataFrame, user: String, ts: Column, window: Long,
      steps: Seq[Column]): DataFrame =
    windowFunnel(events, user, ts, window, steps,
      strictIncrease = false, strictOrder = false)

  /** [[windowFunnel]] with ClickHouse's strict modes:
    *
    *  - `strictIncrease` ('strict_increase'): level times must
    *    strictly increase — `tk > t(k-1)` instead of `>=`, so
    *    same-timestamp ties no longer chain.
    *  - `strictOrder` ('strict_order'): no OTHER tracked event may
    *    fall strictly between t(k-1) and tk — an interloper kills the
    *    chain at level k-1. (Events matching no step condition are
    *    dropped before the scan, per the default semantics, so only
    *    step events can interlope; keep ClickHouse's "any event
    *    interrupts" reading by tagging the relevant conditions.)
    *
    * Both stay closed-form: strict order adds one conditional
    * partition-count per level BETWEEN the already-computed minima —
    * a second Window pass riding the SAME user-keyed exchange and
    * sort, still zero extra shuffles, still value-oracle-able.
    *
    * `multiTag` switches to ClickHouse's per-condition tagging for
    * overlapping step conditions ([[stepTag]]'s restriction note);
    * `maxEventsPerUser` is the skew guard ([[capPerUser]]): the
    * funnel over each user's earliest `maxEventsPerUser` step-events,
    * bounding per-user state.
    */
  def windowFunnel(
      events: DataFrame, user: String, ts: Column, window: Long,
      steps: Seq[Column], strictIncrease: Boolean,
      strictOrder: Boolean, multiTag: Boolean = false,
      maxEventsPerUser: Int = 0): DataFrame = {
    val (withGuards, level) = funnelCore(events, user, ts, window, steps,
      strictIncrease, strictOrder, multiTag, maxEventsPerUser)
    // every __lk/__xk is partition-constant, so level is identical on
    // all of a user's rows — max() just collapses them
    withGuards.groupBy(col(user)).agg(max(level).as("level"))
  }

  /** Shared closed-form core: the stacked level-minima windows and
    * the achieved-level expression, all partition-constant on one
    * user-keyed exchange. Both the level view ([[windowFunnel]]) and
    * the latency view ([[windowFunnelTimes]]) collapse it.
    */
  private def funnelCore(
      events: DataFrame, user: String, ts: Column, window: Long,
      steps: Seq[Column], strictIncrease: Boolean,
      strictOrder: Boolean, multiTag: Boolean,
      maxEventsPerUser: Int): (DataFrame, Column) = {
    require(steps.nonEmpty, "windowFunnel needs at least one step")
    val base = capPerUser(
      taggedBase(events, user, ts, steps, multiTag),
      user, maxEventsPerUser, Seq(col("__t"), col("__step")))
    val w = Window.partitionBy(col(user))
    def after(t: Column, prev: Column): Column =
      if (strictIncrease) t > prev else t >= prev
    val withLevels = (2 to steps.size).foldLeft(
      base.withColumn("__l1",
        min(when(col("__step") === 1, col("__t"))).over(w))) { (df, k) =>
      df.withColumn(s"__l$k",
        min(when(col("__step") === k &&
          col(s"__l${k - 1}").isNotNull &&
          after(col("__t"), col(s"__l${k - 1}")) &&
          col("__t") <= col("__l1") + window, col("__t"))).over(w))
    }
    // strict order: count interlopers strictly inside each
    // (l(k-1), lk) gap — partition-constant like the minima, so the
    // whole check is one more stacked Window on the same sort
    val withGuards =
      if (!strictOrder) withLevels
      else (2 to steps.size).foldLeft(withLevels) { (df, k) =>
        df.withColumn(s"__x$k",
          sum(when(col("__t") > col(s"__l${k - 1}") &&
            col("__t") < col(s"__l$k"), 1L).otherwise(0L)).over(w))
      }
    def clean(k: Int): Column =
      if (!strictOrder) lit(true)
      else (2 to k).map(j => coalesce(col(s"__x$j"), lit(0L)) === 0L)
        .foldLeft(lit(true))(_ && _)
    val level = (steps.size to 1 by -1).foldRight(lit(0)) {
      case (k, els) =>
        when(col(s"__l$k").isNotNull && clean(k), k).otherwise(els)
    }
    (withGuards, level)
  }

  /** W6g: funnel with level TIMES — the latency view: per user the
    * achieved level, the anchor time t1 and the time of the deepest
    * achieved level; `t_conv - t_anchor` over full-level users is the
    * conversion-lag distribution a funnel dashboard quantiles (the
    * axis `windowFunnel`'s level histogram is blind to). Identical
    * plan shape to [[windowFunnel]]: the same stacked minima on ONE
    * user-keyed exchange, one collapse agg. Returns (user, level,
    * t_anchor, t_conv) — t_anchor/t_conv null for level-0 users.
    */
  def windowFunnelTimes(
      events: DataFrame, user: String, ts: Column, window: Long,
      steps: Seq[Column]): DataFrame = {
    val (withGuards, level) = funnelCore(events, user, ts, window, steps,
      strictIncrease = false, strictOrder = false, multiTag = false,
      maxEventsPerUser = 0)
    val tConv = (steps.size to 1 by -1).foldRight(lit(null).cast("long")) {
      case (k, els) => when(level === k, col(s"__l$k")).otherwise(els)
    }
    withGuards.groupBy(col(user)).agg(
      max(level).as("level"),
      max(col("__l1")).as("t_anchor"),
      max(tConv).as("t_conv"))
  }

  /** W8b: `sequenceMatchEvents` (ClickHouse) — the EVENT TIMES of the
    * earliest satisfying chain, one column per step: where W6g
    * reports only the anchor and the deepest time, this emits the
    * whole matched chain (the "which exact events converted this
    * user" read an attribution audit wants). The earliest chain IS
    * the W6 stacked minima, so the operator is the same funnelCore on
    * ONE user-keyed exchange with a wider collapse aggregate — zero
    * extra plan. Returns (user, level, t_1..t_n), t_k null beyond the
    * reached level.
    */
  def sequenceMatchEvents(
      events: DataFrame, user: String, ts: Column, window: Long,
      steps: Seq[Column]): DataFrame = {
    val (withGuards, level) = funnelCore(events, user, ts, window, steps,
      strictIncrease = false, strictOrder = false, multiTag = false,
      maxEventsPerUser = 0)
    val stepTimes = (1 to steps.size).map(k =>
      max(col(s"__l$k")).as(s"t_$k"))
    withGuards.groupBy(col(user))
      .agg(max(level).as("level"), stepTimes: _*)
  }

  /** The closed form of [[windowFunnel]] as a plain Scala fold over
    * one user's (t, step) events — the SINGLE definition the
    * streaming arm (`streaming.StreamingFunnel`) executes per group
    * and the property tests cross-check the Catalyst form against.
    * Order-insensitive by construction (minima and counts over the
    * set), so out-of-order arrival cannot change the answer.
    */
  def levelOf(events: Seq[(Long, Int)], nSteps: Int, window: Long,
      strictIncrease: Boolean = false,
      strictOrder: Boolean = false): Int = {
    val l = new Array[Option[Long]](nSteps + 1)
    l(1) = events.collect { case (t, 1) => t }
      .foldLeft(Option.empty[Long])((a, t) => Some(a.fold(t)(math.min(_, t))))
    for (k <- 2 to nSteps) {
      def ok(t: Long): Boolean = l(k - 1).exists(p =>
        (if (strictIncrease) t > p else t >= p) && t <= l(1).get + window)
      l(k) = events.collect { case (t, s) if s == k && ok(t) => t }
        .foldLeft(Option.empty[Long])((a, t) => Some(a.fold(t)(math.min(_, t))))
    }
    def clean(k: Int): Boolean = !strictOrder || (2 to k).forall { j =>
      events.count { case (t, _) =>
        l(j - 1).exists(t > _) && l(j).exists(t < _) } == 0
    }
    (nSteps to 1 by -1).find(k => l(k).isDefined && clean(k)).getOrElse(0)
  }

  /** ClickHouse `sequenceMatch`'s time-bounded chain —
    * `(?1)(?t<=g1)(?2)(?t<=g2)(?3)` — with TRUE existence semantics:
    * the level is the largest k for which SOME chain t1 <= t2 <= …
    * <= tk exists with each t(j) within `maxGaps(j-2)` of t(j-1)
    * (ClickHouse's backtracking matcher explores every assignment;
    * greedy chained minima would under-report — a later step-j event
    * can enable a chain the earliest one cannot).
    *
    * Exact scalar DP, O(events·levels) per user: scan the user's
    * events in (t, step) order keeping, per level k, the MAXIMUM
    * achievable chain time m(k). Processing in time order makes the
    * max sufficient: any achievable t(k-1) is <= the current t, so
    * "some achievable t(k-1) in [t - gap, t]" ⇔ "m(k-1) >= t - gap".
    *
    * Shape: the same group-then-order-inside-one-aggregation as the
    * sequence operators (sort_array over collected structs), then the
    * DP as a codegen-free but UDF-free `aggregate` HOF over the
    * sorted array — ONE user-keyed ObjectHashAggregate, no window,
    * no second shuffle. Per-group state = that user's step events,
    * the family's documented bound. Returns (user, level).
    */
  def gapFunnel(
      events: DataFrame, user: String, ts: Column,
      steps: Seq[Column], maxGaps: Seq[Long],
      multiTag: Boolean = false, maxEventsPerUser: Int = 0): DataFrame = {
    require(steps.size >= 2 && maxGaps.size == steps.size - 1,
      "need one maxGap per step transition")
    // prepended 0L keeps indices aligned with the 1-based level k:
    // element_at(gapsLit, k) is the (k-1)->k transition bound (the
    // k=1 slot is never read — level 1 has no incoming transition)
    val gapsLit = typedlit(0L +: maxGaps)
    chainDp(events, user, ts, steps, multiTag, maxEventsPerUser,
      (acc, e, k) =>
        when(e("__step") === k &&
          (k === 1 ||
            (element_at(acc, k - 1).isNotNull &&
              e("__t") <= element_at(acc, k - 1) + element_at(gapsLit, k))),
          e("__t"))
          .otherwise(element_at(acc, k)))
  }

  /** Shared scalar-DP scaffolding for the chain operators: sort each
    * user's (t, step) events inside ONE user-keyed aggregation, fold
    * the caller's per-event merge over them with an `aggregate` HOF
    * (acc = one nullable long per level, null = unreachable; the
    * non-null slots always form a prefix), and count the prefix as
    * the level. The merge receives (acc, event, k) per level slot.
    */
  private def chainDp(
      events: DataFrame, user: String, ts: Column, steps: Seq[Column],
      multiTag: Boolean, maxEventsPerUser: Int,
      merge: (Column, Column, Column) => Column): DataFrame = {
    val n = steps.size
    val init = array_repeat(lit(null).cast("long"), n)
    val evs = sort_array(collect_list(struct(col("__t"), col("__step"))))
    val dp = aggregate(evs, init, (acc, e) =>
      transform(sequence(lit(1), lit(n)), k => merge(acc, e, k)))
    capPerUser(taggedBase(events, user, ts, steps, multiTag),
      user, maxEventsPerUser, Seq(col("__t"), col("__step")))
      .groupBy(col(user))
      .agg(size(filter(dp, x => x.isNotNull)).cast("int").as("level"))
  }

  /** ClickHouse `windowFunnel`'s DEFAULT (any-anchor existence)
    * semantics: the largest k for which some ordered chain exists
    * with t_k <= t_1 + window — every step-1 event is a candidate
    * anchor, where [[windowFunnel]] deliberately anchors at the
    * earliest (the deterministic first-touch dashboard definition;
    * both now exist, documented side by side).
    *
    * Exact scalar DP, the anchor-tracking sibling of [[gapFunnel]]'s:
    * scan in (t, step) order keeping, per level k, the MAXIMUM anchor
    * t_1 over all achievable level-k chains. An event (t, step k)
    * extends some chain iff m1(k-1) >= t - window — the max-anchor
    * chain is optimal because the window test is monotone in the
    * anchor, and it stays optimal for every future extension. Same
    * one-ObjectHashAggregate shape as the other sequence operators.
    * Returns (user, level).
    */
  def windowFunnelAny(
      events: DataFrame, user: String, ts: Column, window: Long,
      steps: Seq[Column], multiTag: Boolean = false,
      maxEventsPerUser: Int = 0): DataFrame = {
    require(steps.nonEmpty, "windowFunnelAny needs at least one step")
    // acc(k) = max anchor t1 over achievable level-k chains
    chainDp(events, user, ts, steps, multiTag, maxEventsPerUser,
      (acc, e, k) =>
      when(e("__step") === k && k === 1,
        greatest(coalesce(element_at(acc, k), e("__t")), e("__t")))
        .when(e("__step") === k && k > 1 &&
          element_at(acc, k - 1).isNotNull &&
          e("__t") <= element_at(acc, k - 1) + window,
          greatest(coalesce(element_at(acc, k), element_at(acc, k - 1)),
            element_at(acc, k - 1)))
        .otherwise(element_at(acc, k)))
  }

  /** In-memory reference of [[windowFunnelAny]]'s anchor DP. */
  def anyLevelOf(events: Seq[(Long, Int)], nSteps: Int,
      window: Long): Int = {
    val m = Array.fill[Option[Long]](nSteps + 1)(None)
    events.sortBy(e => (e._1, e._2)).foreach { case (t, s) =>
      if (s == 1) m(1) = Some(math.max(m(1).getOrElse(Long.MinValue), t))
      else if (s >= 2 && s <= nSteps &&
        m(s - 1).exists(a => t <= a + window))
        m(s) = Some(math.max(m(s).getOrElse(Long.MinValue), m(s - 1).get))
    }
    (nSteps to 1 by -1).find(k => m(k).isDefined).getOrElse(0)
  }

  /** In-memory reference of [[gapFunnel]]'s DP — the property test's
    * cross-check. Same (t, step)-ordered scan, same max-per-level
    * update.
    */
  def gapLevelOf(events: Seq[(Long, Int)], nSteps: Int,
      maxGaps: Seq[Long]): Int = {
    val m = Array.fill[Option[Long]](nSteps + 1)(None)
    events.sortBy(e => (e._1, e._2)).foreach { case (t, s) =>
      if (s >= 1 && s <= nSteps &&
        (s == 1 || m(s - 1).exists(p => t <= p + maxGaps(s - 2))))
        m(s) = Some(t)
    }
    (nSteps to 1 by -1).find(k => m(k).isDefined).getOrElse(0)
  }

  /** In-memory closed form of [[sequenceCount]] for one user's
    * (t, tie, step) events — the streaming arm's per-group compute;
    * the Catalyst form's property test uses the same digit-string
    * construction. Order-insensitive: the string is built from the
    * SORTED set.
    */
  def sequenceCountOf(events: Seq[(Long, Long, Int)],
      pattern: String): Long = {
    val s = events.sorted.map(_._3).mkString
    pattern.r.findAllIn(s).length.toLong
  }

  /** ClickHouse `sequenceMatch(pattern)(ts, cond1..condN)`: per user,
    * does the time-ordered event sequence match `pattern`? Events are
    * tagged with the FIRST condition they satisfy (1-based); following
    * ClickHouse, events matching no condition are dropped before the
    * sequence is formed (pass `keepUnmatched = true` to keep them as
    * step 0). The per-user sequence becomes a digit string ordered by
    * (ts, tieBreak, step) — a total order, so both engines build the
    * identical string — and `pattern` is a plain regex over the digit
    * alphabet: ClickHouse `(?1).*(?2)` is written `1.*2`.
    *
    * Scale shape: ONE shuffle keyed on the user column; per-group
    * state is that user's condition-matching events — the same bound
    * ClickHouse's own sequence functions carry (they buffer the
    * group's (ts, cond) pairs in memory). Dashboard sequences are
    * short; a user with millions of matching events would need
    * pre-aggregation regardless of engine. Returns (user, seq_match:
    * 0/1 long).
    */
  def sequenceMatch(
      events: DataFrame, user: String, ts: Column, tieBreak: Column,
      conds: Seq[Column], pattern: String,
      keepUnmatched: Boolean = false,
      multiTag: Boolean = false, maxEventsPerUser: Int = 0): DataFrame =
    sequenceStrings(events, user, ts, tieBreak, conds, keepUnmatched,
      multiTag, maxEventsPerUser)
      .select(col(user),
        when(regexp_like(col("__seq"), lit(pattern)), 1L).otherwise(0L)
          .as("seq_match"))

  /** ClickHouse `sequenceCount`: number of NON-OVERLAPPING matches of
    * `pattern` in the user's ordered sequence, scanning left to right
    * (use lazy quantifiers — `1.*?2` — so each match completes at the
    * earliest opportunity, the standard maximal-count form). Same
    * one-shuffle shape and per-group bound as [[sequenceMatch]].
    * Returns (user, seq_count long).
    */
  def sequenceCount(
      events: DataFrame, user: String, ts: Column, tieBreak: Column,
      conds: Seq[Column], pattern: String,
      keepUnmatched: Boolean = false,
      multiTag: Boolean = false, maxEventsPerUser: Int = 0): DataFrame =
    sequenceStrings(events, user, ts, tieBreak, conds, keepUnmatched,
      multiTag, maxEventsPerUser)
      .select(col(user),
        regexp_count(col("__seq"), lit(pattern)).cast("long")
          .as("seq_count"))

  /** Per-user ordered step-digit string: tag each event with the first
    * condition it satisfies, drop (or keep, as '0') unmatched events,
    * sort each user's (ts, tieBreak, step) triples, and join the step
    * digits. sort_array over the collected structs keeps the whole
    * group-then-order step inside ONE user-keyed aggregation — no
    * second window shuffle.
    */
  private def sequenceStrings(
      events: DataFrame, user: String, ts: Column, tieBreak: Column,
      conds: Seq[Column], keepUnmatched: Boolean,
      multiTag: Boolean = false, maxEventsPerUser: Int = 0): DataFrame = {
    require(conds.nonEmpty && conds.size <= 9,
      "sequenceMatch/Count support 1..9 conditions (digit alphabet)")
    require(!(multiTag && keepUnmatched),
      "multiTag drops unmatched events by construction")
    val digits = array((0 to conds.size).map(i => lit(i.toString)): _*)
    val tagged = events
      .select(col(user), ts.cast("long").as("__t"),
        tieBreak.cast("long").as("__tie"),
        (if (multiTag) explode(multiTagSteps(conds))
         else stepTag(conds)).as("__step"))
    val kept =
      if (keepUnmatched || multiTag) tagged
      else tagged.where(col("__step") >= 1)
    capPerUser(kept, user, maxEventsPerUser,
      Seq(col("__t"), col("__tie"), col("__step")))
      .groupBy(col(user))
      .agg(sort_array(collect_list(struct(
        col("__t"), col("__tie"), col("__step")))).as("__evs"))
      .withColumn("__seq", array_join(
        transform(col("__evs"), e => element_at(digits, e("__step") + 1)), ""))
      .drop("__evs")
  }

  /** ClickHouse `retention`: per user, flag f_k = "some event
    * satisfies condition k", and the result column r_k = f_1 AND f_k
    * (r_1 = f_1) — cohort retention anchored on the first condition.
    * One conditional-max aggregation per condition on a single
    * user-keyed shuffle. Returns (user, r1..rN) as 0/1 longs.
    */
  /** W6h: `sequenceNextNode` (ClickHouse, forward / first_match arm):
    * per key, the event value that immediately FOLLOWS the first
    * event satisfying `matchCond` in (ts, tie) order — "what do users
    * do right after signing up", the next-step read the funnel family
    * (W6) does not answer. Keys with no match, or whose first match
    * is the last event, yield a null `next_node` (matched tells the
    * two cases apart).
    *
    * Shape: one whole-partition window (min matched ord) + one
    * aggregate on the SAME key hash — the window's exchange is the
    * only shuffle, and the aggregate's min-struct carries one
    * candidate per key per partition map-side. (ts, tie) must totally
    * order each key's events (the W1 tiebreak discipline), which
    * makes both the match pick and the successor pick deterministic.
    * Output: keys :+ (matched, match_t, next_node).
    */
  def sequenceNextNode(df: DataFrame, keys: Seq[String], ts: Column,
      tie: Column, event: Column, matchCond: Column): DataFrame = {
    val ord = struct(ts.cast("long").as("t"), tie.as("k"))
    val w = Window.partitionBy(keys.map(col): _*)
    df.withColumn("__ord", ord)
      .withColumn("__ev", event)
      .withColumn("__m", min(when(matchCond, col("__ord"))).over(w))
      .groupBy(keys.map(col): _*)
      .agg(
        min(col("__m")).as("__mm"),
        min(when(col("__ord") > col("__m"),
          struct(col("__ord"), col("__ev").as("e")))).as("__n"))
      .select((keys.map(col) ++ Seq(
        col("__mm").isNotNull.as("matched"),
        col("__mm.t").as("match_t"),
        col("__n.e").as("next_node"))): _*)
  }

  /** W10: conversion attribution — for every conversion event, the
    * source (touch) event credited under the FIRST-touch and
    * LAST-touch rules within a lookback window: the read behind
    * "which channel gets the purchase". Both rules in one pass.
    *
    * Shape (deliberately NOT a per-user ordered window): conversions
    * become [ep − lookback, ep] ranges and sources are points in the
    * keyed point-in-range bucket join ([[IntervalJoin.pointInRangeJoin]]
    * — per-(user, bucket) hash exchange, candidate pairs bounded by
    * bucket co-residence, no per-user sort of raw volume), then ONE
    * partial+final `min_by`/`max_by` aggregate per conversion picks
    * the first/last touch deterministically by (ep, tie, type) — the
    * W1 tiebreak discipline, immune to the RANGE-frame tie ambiguity
    * a window formulation has. Conversions with no touch in the
    * window survive with null attribution (left join back — the
    * unattributed share IS the metric's denominator). Same-second
    * touches count (source ep ≤ conversion ep, inclusive).
    * Output: (user, conv_ep, conv_tie, first_type, first_ep,
    * last_type, last_ep).
    */
  def attribution(events: DataFrame, user: String, ts: Column, tie: Column,
      eventType: Column, conversion: String, sources: Seq[String],
      lookbackSecs: Long, bucketWidth: Double = 86400.0): DataFrame = {
    val (convs, paired) = touchPairs(events, user, ts, tie, eventType,
      conversion, sources, lookbackSecs, bucketWidth)
    val ord = struct(col("__sep"), col("__stie"), col("__stype"))
    val picked = paired
      .groupBy(col("__cu"), col("conv_ep"), col("conv_tie"))
      .agg(
        min_by(struct(col("__stype"), col("__sep")), ord).as("__f"),
        max_by(struct(col("__stype"), col("__sep")), ord).as("__l"))
    // renamed join keys: picked descends from convs, so a by-column
    // self-join would hit ambiguous-attribute resolution
    val p2 = picked.select(col("__cu").as("__pu"),
      col("conv_ep").as("__pep"), col("conv_tie").as("__ptie"),
      col("__f"), col("__l"))
    convs.join(p2,
        col("__cu") === col("__pu") && col("conv_ep") === col("__pep") &&
          col("conv_tie") === col("__ptie"), "left")
      .select(col("__cu").as(user), col("conv_ep"), col("conv_tie"),
        col("__f.__stype").as("first_type"), col("__f.__sep").as("first_ep"),
        col("__l.__stype").as("last_type"), col("__l.__sep").as("last_ep"))
  }

  /** W6i: the BACKWARD arm of [[sequenceNextNode]] — ClickHouse
    * `sequenceNextNode('backward', 'last_match')`: "what did users do
    * right BEFORE X" (the step into churn/purchase, where the forward
    * arm reads the step out of signup). Mirror construction: the LAST
    * match (max (ts, tie)) and the max event struct strictly before
    * it — same single keys exchange, same one-candidate-per-partition
    * map-side combine, match-at-head keys distinguished by (matched,
    * null prev_node). Output: keys :+ (matched, match_t, prev_node).
    */
  def sequencePrevNode(df: DataFrame, keys: Seq[String], ts: Column,
      tie: Column, event: Column, matchCond: Column): DataFrame = {
    val ord = struct(ts.cast("long").as("t"), tie.as("k"))
    val w = Window.partitionBy(keys.map(col): _*)
    df.withColumn("__ord", ord)
      .withColumn("__ev", event)
      .withColumn("__m", max(when(matchCond, col("__ord"))).over(w))
      .groupBy(keys.map(col): _*)
      .agg(
        max(col("__m")).as("__mm"),
        max(when(col("__ord") < col("__m"),
          struct(col("__ord"), col("__ev").as("e")))).as("__p"))
      .select((keys.map(col) ++ Seq(
        col("__mm").isNotNull.as("matched"),
        col("__mm.t").as("match_t"),
        col("__p.e").as("prev_node"))): _*)
  }

  /** Shared W10 machinery: (conversions, in-window touch pairs). */
  private def touchPairs(events: DataFrame, user: String, ts: Column,
      tie: Column, eventType: Column, conversion: String,
      sources: Seq[String], lookbackSecs: Long,
      bucketWidth: Double): (DataFrame, DataFrame) = {
    require(sources.nonEmpty && !sources.contains(conversion),
      "sources must be non-empty and exclude the conversion type")
    require(lookbackSecs > 0, "lookback must be positive")
    val convs = events.where(eventType === conversion)
      .select(col(user).as("__cu"), ts.cast("long").as("conv_ep"),
        tie.as("conv_tie"))
    val touches = events.where(eventType.isin(sources: _*))
      .select(col(user).as("__su"), ts.cast("long").as("__sep"),
        tie.as("__stie"), eventType.as("__stype"))
    val paired = IntervalJoin.pointInRangeJoin(
      points = touches, p = col("__sep"),
      ranges = convs.withColumn("__lo",
        (col("conv_ep") - lookbackSecs).cast("double"))
        .withColumn("__hi2", (col("conv_ep") + 1L).cast("double")),
      lo = col("__lo"), hi = col("__hi2"),
      bucketWidth = bucketWidth,
      keys = Seq("__su" -> "__cu"))
    (convs, paired)
  }

  /** W10b: MULTI-touch attribution — total credit per source type
    * under the position-based models every marketing stack offers
    * next to first/last-touch:
    *
    *  - `linear`: each of a conversion's n in-window touches gets 1/n;
    *  - `u_shaped` (position-based 40/40/20): first 0.4, last 0.4,
    *    the n−2 middles split 0.2 (n = 1 → 1.0, n = 2 → 0.5 each).
    *
    * Every conversion distributes EXACTLY 1.0 of credit, so
    * Σ credit = attributed conversions (spec-pinned law). Touch order
    * within a conversion is the W10 (ep, tie, type) total order via
    * one row_number over the PAIR table (pairs-cardinality, bounded
    * by lookback matches — never raw volume); per-touch weights are
    * fixed double trees round-9 DECIMAL-summed ([[graft.operators.StatsAgg]]
    * discipline). Output: (source_type, n_touches, credit round-6).
    */
  def attributionWeighted(events: DataFrame, user: String, ts: Column,
      tie: Column, eventType: Column, conversion: String,
      sources: Seq[String], lookbackSecs: Long,
      model: String = "linear",
      bucketWidth: Double = 86400.0): DataFrame = {
    require(model == "linear" || model == "u_shaped",
      s"unknown attribution model: $model")
    val (_, paired) = touchPairs(events, user, ts, tie, eventType,
      conversion, sources, lookbackSecs, bucketWidth)
    val convKey = Seq(col("__cu"), col("conv_ep"), col("conv_tie"))
    val w = Window.partitionBy(convKey: _*)
      .orderBy(col("__sep"), col("__stie"), col("__stype"))
    val wn = Window.partitionBy(convKey: _*)
    val ranked = paired
      .withColumn("__rk", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wn))
    val n = col("__n").cast("double")
    val weight = model match {
      case "linear" => lit(1.0) / n
      case "u_shaped" =>
        when(col("__n") === 1, lit(1.0))
          .when(col("__n") === 2, lit(0.5))
          .when(col("__rk") === 1 || col("__rk") === col("__n"), lit(0.4))
          .otherwise(lit(0.2) / (n - lit(2.0)))
    }
    // The EXACTLY-1.0 law needs a remainder carrier: round(w, 9)
    // truncates 1/n and 0.2/(n−2), and the per-conversion residue
    // (e.g. 3×0.333333333 = 0.999999999) would accumulate across
    // conversions into each source_type's credit. The last touch by
    // the (ep, tie, type) order takes 1 − Σ(other rounded weights),
    // closed-form per model — per-conversion credit is then exactly
    // 1.000000000 in DECIMAL(28,9).
    // operand precisions kept small — decimal(10,0) × decimal(10,9)
    // yields decimal(21,9), lossless; wider operands would push the
    // product past precision 38 and Spark would silently truncate the
    // scale to 6, defeating the 9-place exactness
    val one = lit(BigDecimal(1)).cast("decimal(28,9)")
    val othersRounded = model match {
      case "linear" =>
        (col("__n") - 1).cast("decimal(10,0)") *
          round(lit(1.0) / n, 9).cast("decimal(10,9)")
      case "u_shaped" =>
        when(col("__n") === 1, lit(BigDecimal(0)).cast("decimal(28,9)"))
          .when(col("__n") === 2, lit(BigDecimal("0.5")).cast("decimal(28,9)"))
          .otherwise(lit(BigDecimal("0.4")).cast("decimal(28,9)") +
            (col("__n") - 2).cast("decimal(10,0)") *
              round(lit(0.2) / (n - lit(2.0)), 9).cast("decimal(10,9)"))
    }
    ranked
      .withColumn("__w9",
        when(col("__rk") === col("__n"),
          (one - othersRounded).cast("decimal(28,9)"))
          .otherwise(round(weight, 9).cast("decimal(28,9)")))
      .groupBy(col("__stype").as("source_type"))
      .agg(count(lit(1)).as("n_touches"),
        round(sum(col("__w9")).cast("double"), 6).as("credit"))
  }

  def retention(
      events: DataFrame, user: String, conds: Seq[Column]): DataFrame = {
    require(conds.nonEmpty, "retention needs at least one condition")
    val aggs = conds.zipWithIndex.map { case (c, i) =>
      max(when(c, 1L).otherwise(0L)).as(s"__f${i + 1}")
    }
    val flags = events.groupBy(col(user)).agg(aggs.head, aggs.tail: _*)
    val outs = col(user) +: conds.indices.map { i =>
      (if (i == 0) col("__f1")
       else col("__f1") * col(s"__f${i + 1}")).as(s"r${i + 1}")
    }
    flags.select(outs: _*)
  }
}
