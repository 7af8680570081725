package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch event-log analytics: ordered funnels, retention cohorts, CDC
  * latest-wins compaction, and robust (IQR) outlier detection. These are the
  * product-analytics / log-compaction operators a warehouse runs over the
  * same event stream the [[graft.streaming.EventStream]] operators ingest.
  *
  * Determinism contract: all time arithmetic is integer microseconds /
  * epoch-days (`unix_micros`, `div`), never engine-local date casts, so the
  * DuckDB mirrors (`epoch_us`, `//`) are bit-identical.
  */
object EventAnalytics {

  /** Last-touch attribution: each conversion event credits the user's most
    * recent PRECEDING touch event (by strict event order) within
    * `windowMicros`; conversions with no in-window touch credit
    * `"direct"`. Returns per-channel conversion counts and attributed
    * value — the marketing-analytics sibling of [[funnel]].
    *
    * Scale design: ONE user-keyed exchange — the last-touch type and time
    * are two `last(..., ignoreNulls)` windows over the same
    * `partitionBy(user)` sort (Catalyst chains them on one Exchange), the
    * attribution is a projection, and the channel rollup is a tiny final
    * aggregate. No self-join of the log. Total event order is (ts,
    * event_id) so ties are deterministic; value sums go through the
    * DECIMAL(18,4) accumulator rule.
    */
  def lastTouchAttribution(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      valueCol: String,
      idCol: String,
      touchTypes: Seq[String],
      convType: String,
      windowMicros: Long,
  ): DataFrame = {
    require(touchTypes.nonEmpty && !touchTypes.contains(convType), "touchTypes must be non-empty and exclude convType")
    val isTouch = col(typeCol).isin(touchTypes: _*)
    val w = Window
      .partitionBy(col(userCol))
      .orderBy(unix_micros(col(tsCol)), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .filter(isTouch || col(typeCol) === convType)
      .withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("__lt", last(when(isTouch, col(typeCol)), ignoreNulls = true).over(w))
      .withColumn("__lus", last(when(isTouch, unix_micros(col(tsCol))), ignoreNulls = true).over(w))
      .filter(col(typeCol) === convType)
      .select(
        coalesce(
          when(col("__lus").isNotNull && col("__us") - col("__lus") <= windowMicros, col("__lt")),
          lit("direct"),
        ).as("channel"),
        col(valueCol),
      )
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_conversions"), graft.Tables.dsum(col(valueCol)).as("total_value"))
  }

  /** Ordered funnel: for each user, stage i+1 counts only if an event of
    * stage i+1's type occurs STRICTLY AFTER the user's earliest completion
    * of stage i (the standard strictly-ordered funnel, not a bag-of-events
    * intersection). Returns one row per stage with the user count and the
    * conversion-from-previous-stage ratio as a scaled long (integer div —
    * exact cross-engine).
    *
    * Scale design: one shuffle. The per-user stage times are stacked
    * unbounded windows over the same `partitionBy(user)` — Catalyst plans
    * one Exchange and chains the Window operators on it — and the final
    * stage counts are a scalar aggregate over one row per user. No
    * self-joins of the event log.
    *
    * `maxGapMinutes > 0` time-boxes each transition: stage i counts only
    * when it happens within that many minutes of the user's stage-(i-1)
    * time — the product form of "did they convert PROMPTLY". 0 = unbounded
    * (the classic funnel). Same single user-keyed exchange either way.
    */
  def funnel(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      stages: Seq[String],
      maxGapMinutes: Long = 0,
  ): DataFrame = {
    require(stages.size >= 2, "funnel: need at least two stages")
    require(maxGapMinutes >= 0, s"funnel: maxGapMinutes must be >= 0: $maxGapMinutes")
    val gapUs = maxGapMinutes * 60 * 1000000
    val w = Window.partitionBy(col(userCol))
    val us = col("__us")
    // narrow BEFORE the windows: the one user-keyed exchange must carry
    // (user, type, us), not every log column (props JSON etc.)
    val narrowed = events.select(col(userCol), col(typeCol), unix_micros(col(tsCol)).as("__us"))
    val staged = stages.zipWithIndex.foldLeft(narrowed) { case (df, (stage, i)) =>
      val ordered =
        if (i == 0) lit(true)
        else if (gapUs == 0) us > col(s"__t${i - 1}")
        else us > col(s"__t${i - 1}") && us <= col(s"__t${i - 1}") + gapUs
      val cond = col(typeCol) === stage && ordered
      df.withColumn(s"__t$i", min(when(cond, us)).over(w))
    }
    val stageTimes = stages.indices.map(i => max(col(s"__t$i")).as(s"__t$i"))
    val perUser = staged
      .groupBy(col(userCol))
      .agg(stageTimes.head, stageTimes.tail: _*)
    val stageCounts = stages.indices.map(i => count(col(s"__t$i")).as(s"__n$i"))
    val counts = perUser.agg(stageCounts.head, stageCounts.tail: _*)
    val rows = stages.indices.map { i =>
      val prev = if (i == 0) col("__n0") else col(s"__n${i - 1}")
      struct(
        lit(i + 1).as("stage"),
        lit(stages(i)).as("event_type"),
        col(s"__n$i").as("users"),
        when(prev > 0, expr(s"(__n$i * 1000000) div __n${math.max(i - 1, 0)}"))
          .otherwise(lit(0L))
          .as("conv_scaled"),
      )
    }
    counts
      .select(explode(array(rows: _*)).as("r"))
      .select(col("r.stage"), col("r.event_type"), col("r.users"), col("r.conv_scaled"))
  }

  /** Weekly retention cohorts: cohort = the user's first-ever event week,
    * cell (cohort_week, week_offset) = distinct users from that cohort
    * active that many weeks later. Weeks are epoch-day integer buckets
    * (`epoch_us div 86400e6 div 7`) — no calendar/timezone semantics to
    * mirror across engines.
    *
    * Scale design: first-event time is an unbounded window over
    * `partitionBy(user)` (one shuffle, reused directly by the groupBy via
    * the user-prefixed grouping key being unnecessary — the second shuffle
    * is on the (cohort, offset) cell, whose cardinality is weeks², tiny).
    */
  def retentionCohorts(
      events: DataFrame,
      userCol: String,
      tsCol: String,
  ): DataFrame = {
    val w = Window.partitionBy(col(userCol))
    events
      .select(col(userCol), expr(s"unix_micros($tsCol) div 86400000000").as("__day"))
      .withColumn("__first", min(col("__day")).over(w))
      .select(
        col(userCol),
        expr("__first div 7").as("cohort_week"),
        expr("(__day - __first) div 7").as("week_offset"),
      )
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col(userCol)).as("users"))
  }

  /** CDC latest-wins compaction: one surviving row per key, the one with
    * the greatest (ordering, tiebreak) — the read-side of a MERGE INTO /
    * upsert log. Tiebreak column keeps the result total-ordered when the
    * ordering column has duplicates (e.g. equal timestamps).
    *
    * Scale design: `row_number` over `partitionBy(keys)` is one shuffle and
    * streams each key group (no buffering of the group); the filter keeps
    * exactly one row per key. At 100 TB this is the standard log-compaction
    * plan; if a single key is pathologically hot, salt the log first and
    * compact twice ([[SkewJoin]] has the salting).
    */
  def latestWins(
      log: DataFrame,
      keys: Seq[String],
      orderCol: String,
      tiebreakCol: String,
  ): DataFrame = {
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(orderCol).desc, col(tiebreakCol).desc)
    log
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Robust per-group outlier detection on Tukey fences: a value is an
    * outlier when it falls outside `[p25 - 1.5*IQR, p75 + 1.5*IQR]`, with
    * DISCRETE (SQL-standard `percentile_disc`) quartiles — actual data
    * values, never interpolated doubles, so with a scaled-long `valueExpr`
    * (the caller quantizes, e.g. `floor(value*1e6+0.5)`) every comparison
    * is integer-exact cross-engine. The fence comparison multiplies both
    * sides by 2 so the 1.5 factor is the integer 3 — no `1.5*` rounding.
    *
    * Scale design: quartiles are a per-group aggregate (groups are the
    * shuffle key; exact percentiles buffer a group's values, so this wants
    * group value-counts that fit an executor — true for typed event logs,
    * not for a single global group at 100 TB); the tiny fence table then
    * broadcasts back onto the stream, so the detail pass is a map-side
    * join + partial-aggregated projection.
    */
  def iqrOutliers(
      df: DataFrame,
      groupCol: String,
      valueExpr: Column,
  ): DataFrame = {
    val vals = df.select(col(groupCol), valueExpr.cast("long").as("__v"))
    val fences = vals
      .groupBy(col(groupCol))
      .agg(
        expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY __v)").cast("long").as("p25"),
        expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY __v)").cast("long").as("p75"),
      )
    val v2 = col("__v") * 2
    val isOut = v2 < col("p25") * 2 - (col("p75") - col("p25")) * 3 ||
      v2 > col("p75") * 2 + (col("p75") - col("p25")) * 3
    vals
      .join(broadcast(fences), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        sum(when(isOut, 1L).otherwise(0L)).as("n_outliers"),
        min(when(isOut, col("__v"))).as("min_outlier"),
        max(when(isOut, col("__v"))).as("max_outlier"),
      )
  }

  /** Exact distributed `percentile_disc` for DISCRETE value domains — the
    * scale answer to the exact-percentile caveat documented on q40/q88/q97
    * (a single group's exact percentile buffers the group's values). For a
    * value domain whose CARDINALITY is bounded (integer quantities, token
    * counts, quantized scores), the same exact answer falls out of a
    * value-histogram: per-value counts (one partial-aggregated pass over
    * fixed-width values), a cumulative sum over the |domain|-row histogram,
    * then `percentile_disc(num/den)` = the smallest value whose cumulative
    * count `cc` satisfies `cc * den >= num * N` — the SQL-standard
    * "first value at cume_dist >= q" rule in exact integer arithmetic
    * (pass binary-exact fractions like i/8 if the oracle side compares in
    * doubles).
    *
    * Scale design: the corpus pass is a map-side-combined groupBy on the
    * value; the global window runs on the materialized |domain|-row
    * histogram (bounded by value cardinality, NOT row count), and each
    * requested fraction is a one-row aggregate over it.
    */
  def quantilesByCount(
      df: DataFrame,
      valueExpr: Column,
      fracs: Seq[(Int, Int)],
  ): DataFrame = weightedQuantilesByCount(df, valueExpr, lit(1L), fracs)

  /** [[quantilesByCount]] with a row weight: `percentile_disc` over the
    * multiset where each row's value appears `weight` times — e.g. value =
    * doc token count weighted by itself answers "p% of all TOKENS live in
    * docs of at most L tokens", the token-mass length percentile a
    * curriculum or packing policy actually wants. Weights must be
    * non-negative integers; the rule stays exact integer arithmetic.
    */
  def weightedQuantilesByCount(
      df: DataFrame,
      valueExpr: Column,
      weightExpr: Column,
      fracs: Seq[(Int, Int)],
  ): DataFrame = {
    require(fracs.nonEmpty && fracs.forall { case (n, d) => d > 0 && n > 0 && n <= d }, s"fractions must be in (0,1]: $fracs")
    val counts = df.groupBy(valueExpr.cast("long").as("v")).agg(sum(weightExpr.cast("long")).as("c"))
    val cum = Lineage.truncate(
      counts.withColumn(
        "cc",
        sum(col("c")).over(
          Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
      )
    )
    val n = cum.agg(max(col("cc")).as("n"))
    fracs
      .map { case (num, den) =>
        cum
          .crossJoin(broadcast(n))
          .filter(col("cc") * den >= lit(num.toLong) * col("n"))
          .agg(min(col("v")).as("value"))
          .select(lit(num).as("q_num"), lit(den).as("q_den"), col("value"))
      }
      .reduce(_ unionAll _)
  }

  /** Trailing-window anomaly detection on hourly event-type counts: an hour
    * is anomalous when its count deviates from the trailing `windowHours`
    * baseline by more than `k` standard deviations. The z-test is
    * cross-multiplied into pure integers — with baseline row count `n`,
    * sum `s`, and sum-of-squares `q`, the condition `|x - s/n| > k·σ` is
    * exactly `(n·x - s)² > k²·(n·q - s²)` — so there is no float epsilon to
    * mirror between engines. Hours with fewer than `minBaseline` trailing
    * observed hours are never flagged (cold-start guard).
    *
    * Scale design: the raw log collapses to (type, hour) counts in one
    * partial-aggregated pass before anything windows — the RANGE window
    * (over the integer epoch-hour, so GAPS in the log are handled — ROWS
    * would silently stretch the baseline across quiet days) then runs on
    * the tiny counts table, partitioned by type.
    */
  def countAnomalies(
      events: DataFrame,
      typeCol: String,
      tsCol: String,
      windowHours: Int = 24,
      k: Int = 2,
      minBaseline: Int = 12,
  ): DataFrame = {
    val hourly = events
      .select(col(typeCol).as("event_type"), unix_micros(col(tsCol)).as("__us"))
      .select(col("event_type"), expr("__us div 3600000000").as("hr"))
      .groupBy(col("event_type"), col("hr"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window
      .partitionBy(col("event_type"))
      .orderBy(col("hr"))
      .rangeBetween(-windowHours, -1)
    hourly
      .withColumn("base_n", count(col("cnt")).over(w))
      .withColumn("base_s", coalesce(sum(col("cnt")).over(w), lit(0L)))
      .withColumn("base_q", coalesce(sum(col("cnt") * col("cnt")).over(w), lit(0L)))
      .withColumn("__dev", col("base_n") * col("cnt") - col("base_s"))
      .filter(
        col("base_n") >= minBaseline &&
          col("__dev") * col("__dev") > lit(k.toLong * k) * (col("base_n") * col("base_q") - col("base_s") * col("base_s"))
      )
      .select(col("event_type"), col("hr"), col("cnt"), col("base_n"), col("base_s"))
  }

  /** First-order Markov transitions between consecutive events of one user
    * within a session: `(from_type, to_type)` counts plus the conditional
    * probability `P(to | from)` as a scaled long (integer div — exact
    * cross-engine). A transition exists iff the next event follows within
    * `gapMinutes` — the same gap rule as sessionization, expressed on the
    * ADJACENT pair, so no session ids need materializing. This is the
    * session-graph feature behind next-event prediction and bot detection
    * (bots have degenerate transition rows).
    *
    * Scale design: ONE pass over the event log. The `lead` window
    * partitions by user — identical key to every other per-user window
    * here, so stacked analyses share the Exchange — the transition counts
    * are a partial-aggregated groupBy on a low-cardinality (type, type)
    * key, and the per-from totals are a WINDOW over that |types|²-row
    * counts table (a join back would physically duplicate the whole
    * events→window subtree: Spark does not CSE DataFrame branches, so
    * "derive from counts" must stay linear to stay one-pass).
    */
  def sessionTransitions(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      tiebreakCol: String,
      gapMinutes: Int = 30,
  ): DataFrame = {
    val gapUs = gapMinutes.toLong * 60 * 1000000
    val w = Window.partitionBy(col(userCol)).orderBy(col("__us"), col(tiebreakCol))
    val adjacent = events
      .select(col(userCol), col(typeCol), unix_micros(col(tsCol)).as("__us"), col(tiebreakCol))
      .withColumn("__to", lead(col(typeCol), 1).over(w))
      .withColumn("__dt", lead(col("__us"), 1).over(w) - col("__us"))
      .filter(col("__to").isNotNull && col("__dt") <= gapUs)
    adjacent
      .groupBy(col(typeCol).as("from_type"), col("__to").as("to_type"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("__tot", sum(col("cnt")).over(Window.partitionBy(col("from_type"))))
      .select(
        col("from_type"),
        col("to_type"),
        col("cnt"),
        expr("cnt * 1000000 div __tot").as("p_scaled"),
      )
  }

  /** Gaps-and-islands run-length encoding of per-key state — the SCD
    * Type-2 dimension build: the event log collapses to one row per MAXIMAL
    * RUN of consecutive equal `stateCol` values per key, carrying
    * `[valid_from_us, valid_to_us)` validity bounds (the last period's
    * `valid_to_us` is NULL = still current) and the run's event count.
    * Change detection is null-safe (`<=>`), so a null state forms its own
    * runs exactly like any other value — the same rule as SQL's
    * `IS DISTINCT FROM`.
    *
    * Scale design: ONE key-partitioned exchange end to end. The change
    * flag (`lag`) and the running period id (`sum` over rows-unbounded)
    * stack on the same `partitionBy(key)` sort; the per-period groupBy's
    * key set (key, pid, state) is a superset of the window's partitioning,
    * so `HashPartitioning(key)` already satisfies its distribution — no
    * re-shuffle — and the closing `lead` window runs on the COMPACTED
    * periods table with the same key. The input is narrowed to four
    * columns before the exchange.
    */
  def statePeriods(
      log: DataFrame,
      keyCol: String,
      stateCol: String,
      tsCol: String,
      tiebreakCol: String,
  ): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__us"), col(tiebreakCol))
    val flagged = log
      .select(col(keyCol), col(stateCol), unix_micros(col(tsCol)).as("__us"), col(tiebreakCol))
      .withColumn("__chg", when(lag(col(stateCol), 1).over(w) <=> col(stateCol), 0L).otherwise(1L))
      // first row's lag is null -> not <=> a non-null state -> 1, so the
      // running sum is a 1-based dense period number per key.
      .withColumn("__pid", sum(col("__chg")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val periods = flagged
      .groupBy(col(keyCol), col("__pid"), col(stateCol))
      .agg(min(col("__us")).as("valid_from_us"), count(lit(1)).as("n_events"))
    val pw = Window.partitionBy(col(keyCol)).orderBy(col("__pid"))
    periods.select(
      col(keyCol),
      col("__pid").as("period"),
      col(stateCol).as("state"),
      col("valid_from_us"),
      lead(col("valid_from_us"), 1).over(pw).as("valid_to_us"),
      col("n_events"),
    )
  }

  /** Batch CDC MERGE (upsert): applies an update log onto a keyed snapshot
    * — the write-side sibling of [[latestWins]] (which is the read-side
    * compaction). The update log is compacted to its latest row per key
    * first; then for every key the UPDATE row wins WHOLESALE (whole-row
    * replacement — never a per-field coalesce, which would silently keep a
    * stale snapshot field wherever an update field is null). Each output
    * row is tagged `op`: `insert` (new key), `update` (key in both), or
    * `carry` (snapshot key untouched by the log).
    *
    * Both inputs must share one schema: `keys` ++ payload.
    *
    * Scale design: one exchange per side on the merge key. The update-side
    * compaction's `row_number` window partitions on the same key the join
    * shuffles on, so the compacted side arrives at the join already
    * hash-partitioned (no extra exchange); the snapshot side shuffles
    * once. A typical CDC batch is small next to the snapshot — AQE
    * downgrades the join to broadcast when it fits, carrying the big
    * snapshot shuffle-free.
    */
  def cdcMerge(
      snapshot: DataFrame,
      updates: DataFrame,
      keys: Seq[String],
      orderCol: String,
      tiebreakCol: String,
  ): DataFrame = {
    require(keys.nonEmpty, "cdcMerge: need at least one merge key")
    require(
      snapshot.columns.toSeq == updates.columns.toSeq,
      s"cdcMerge: schema mismatch: snapshot ${snapshot.columns.mkString(",")} vs updates ${updates.columns.mkString(",")}",
    )
    val payload = snapshot.columns.filterNot(keys.contains).toSeq
    def pack(df: DataFrame, as: String): DataFrame =
      df.select(keys.map(col) :+ struct(payload.map(col): _*).as(as): _*)
    val s = pack(snapshot, "__s")
    val u = pack(latestWins(updates, keys, orderCol, tiebreakCol), "__u")
    val pick = when(col("__u").isNotNull, col("__u")).otherwise(col("__s"))
    s.join(u, keys, "full_outer")
      .select(
        keys.map(col) ++
          Seq(
            when(col("__u").isNotNull && col("__s").isNotNull, lit("update"))
              .when(col("__u").isNotNull, lit("insert"))
              .otherwise(lit("carry"))
              .as("op")
          ) ++
          payload.map(p => pick.getField(p).as(p)): _*
      )
  }

  /** Top session paths: the most common ordered event-type sequences per
    * session (truncated to the first `maxLen` events) — the product-
    * analytics "common journeys" report, and the bot-detection complement
    * of [[sessionTransitions]] (which sees only adjacent pairs; a path
    * sees the whole opening sequence).
    *
    * Sessions are the q44 rule: a new session starts after a gap >
    * `gapMinutes` per user, events ordered by (µs, tiebreak). The path is
    * built by sorting each session's (µs, tiebreak, type) structs inside
    * an ARRAY (order by construction — never `collect_list` order, which
    * is undefined post-shuffle) and joining the first `maxLen` types with
    * '>'.
    *
    * Scale design: the sessionizing windows and the per-session aggregate
    * share ONE user-keyed exchange (the groupBy key (user, session) is a
    * superset of the windows' partitioning); the path census is a partial-
    * aggregated groupBy on the path string, and the final top-N is
    * TakeOrdered — no global sort. Per-session buffering is bounded by
    * session length (cap sessions upstream if a bot emits millions of
    * events in one session).
    */
  def topSessionPaths(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      tiebreakCol: String,
      gapMinutes: Int = 30,
      maxLen: Int = 5,
      topN: Int = 20,
  ): DataFrame = {
    require(maxLen >= 1 && topN >= 1, s"topSessionPaths: maxLen/topN must be positive: $maxLen/$topN")
    val gapUs = gapMinutes.toLong * 60 * 1000000
    val w = Window.partitionBy(col(userCol)).orderBy(col("__us"), col(tiebreakCol))
    val paths = events
      .select(col(userCol), col(typeCol), unix_micros(col(tsCol)).as("__us"), col(tiebreakCol))
      .withColumn("__prev", lag(col("__us"), 1).over(w))
      .withColumn("__new", when(col("__prev").isNull || col("__us") - col("__prev") > gapUs, 1).otherwise(0))
      .withColumn("__sid", sum(col("__new")).over(w))
      .groupBy(col(userCol), col("__sid"))
      .agg(
        count(lit(1)).as("__n_events"),
        array_join(
          slice(
            transform(
              array_sort(collect_list(struct(col("__us"), col(tiebreakCol).as("__tb"), col(typeCol).as("__ty")))),
              e => e.getField("__ty"),
            ),
            1,
            maxLen,
          ),
          ">",
        ).as("path"),
      )
    paths
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(topN)
  }

  /** Cumulative distinct users by day — "users seen to date", the classic
    * growth metric that a naive per-day `COUNT(DISTINCT)` over expanding
    * windows recomputes from scratch daily. Here: each user collapses to
    * their FIRST epoch-day (one user-keyed partial aggregate), first-days
    * collapse to per-day new-user counts, and the running total is a
    * window over the |days|-row table — the log is scanned once and the
    * single-partition window touches days, never events.
    */
  def cumulativeDistinctUsers(
      events: DataFrame,
      userCol: String,
      tsCol: String,
  ): DataFrame = {
    val firstDay = events
      .select(col(userCol), expr(s"unix_micros($tsCol) div 86400000000").as("__day"))
      .groupBy(col(userCol))
      .agg(min(col("__day")).as("day"))
    firstDay
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_new"))
      .withColumn(
        "cum_users",
        sum(col("n_new")).over(
          Window.orderBy(col("day")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
      )
  }

  /** Per-user inter-arrival statistics: event count, gap count, mean gap
    * (exact telescoping — `(last − first) / (n−1)`, integer µs then ONE
    * IEEE division), and exact min/max gaps from a `lag` pass. The
    * bot/burst fingerprint feature: bots have tiny, low-variance gaps.
    * Users with fewer than two events are excluded (no gaps).
    *
    * Scale design: the lag window and the per-user aggregate share one
    * user-keyed exchange (grouping key == window partition key).
    */
  def interArrivalStats(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      tiebreakCol: String,
  ): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col("__us"), col(tiebreakCol))
    events
      .select(col(userCol), unix_micros(col(tsCol)).as("__us"), col(tiebreakCol))
      .withColumn("__gap", col("__us") - lag(col("__us"), 1).over(w))
      .groupBy(col(userCol))
      .agg(
        count(lit(1)).as("n_events"),
        count(col("__gap")).as("n_gaps"),
        min(col("__gap")).as("min_gap_us"),
        max(col("__gap")).as("max_gap_us"),
        (max(col("__us")) - min(col("__us"))).as("__span"),
      )
      .filter(col("n_gaps") >= 1)
      .select(
        col(userCol),
        col("n_events"),
        col("n_gaps"),
        (col("__span").cast("double") / col("n_gaps").cast("double")).as("mean_gap_us"),
        col("min_gap_us"),
        col("max_gap_us"),
      )
  }

  /** KMV ("k minimum values") approximate distinct count per group — the
    * cross-engine-reproducible alternative to `approx_count_distinct`
    * (HLL++ registers are engine-private; a KMV sketch is an order
    * statistic of a deterministic hash, so DuckDB mirrors it exactly).
    *
    * Per group: hash the value ([[graft.functions.Hashing.hash64]], uniform
    * on [0, 2^60)), keep the k smallest DISTINCT hashes via the bounded
    * [[graft.functions.MinKAggregator]] — partial aggregation ships ≤ k
    * longs per (group × partition), never the distinct set — and estimate
    * `(k-1) · 2^60 / h_k` (exact sketch size when the group has fewer than
    * k distinct values). The constant `(k-1) · 2^60` is exactly double-
    * representable, and double-divided by the integer h_k identically in
    * any IEEE engine.
    *
    * Output: (groupCol, n_sketch, kth_min, est_distinct). ±~1/√k relative
    * error (k=64 ≈ 12%); sketches from disjoint shards merge losslessly
    * (keep the k smallest of the union) — the property the mergeability
    * spec pins.
    */
  def kmvDistinct(
      df: DataFrame,
      groupCol: String,
      valueCol: Column,
      k: Int = 64,
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val numerator = (k - 1).toDouble * (1L << 60).toDouble
    df.select(col(groupCol), graft.functions.Hashing.hash64(valueCol).as("__h"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new graft.functions.MinKAggregator(k).toColumn.name("__mins"))
      .toDF(groupCol, "__mins")
      .select(
        col(groupCol),
        size(col("__mins")).cast("long").as("n_sketch"),
        element_at(col("__mins"), -1).as("kth_min"),
        when(size(col("__mins")) < k, size(col("__mins")).cast("double"))
          .otherwise(lit(numerator) / element_at(col("__mins"), -1).cast("double"))
          .as("est_distinct"),
      )
  }

  /** Tumbling-window rate limiting: the FIRST event per (user, type,
    * `windowMinutes`-bucket) survives; bursts, retries, and bot repeats
    * within the window drop. One map-side-combined aggregate — the
    * min-struct carries (µs, tiebreak id) so the survivor is total-order
    * deterministic — NOT a row_number window, which would sort every
    * group's rows after shuffling all of them; the aggregate ships one row
    * per (user, type, bucket) per map partition.
    */
  def rateLimitFirst(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      idCol: String,
      windowMinutes: Int = 10,
  ): DataFrame = {
    val winUs = windowMinutes.toLong * 60 * 1000000
    events
      .select(
        col(userCol),
        col(typeCol),
        expr(s"unix_micros($tsCol) div $winUs").as("__bucket"),
        struct(unix_micros(col(tsCol)).as("__us"), col(idCol).as("__id")).as("__first"),
      )
      .groupBy(col(userCol), col(typeCol), col("__bucket"))
      .agg(count(lit(1)).as("n_events"), min(col("__first")).as("__keep"))
      .select(
        col(userCol),
        col(typeCol),
        col("__bucket").as("bucket"),
        col("__keep.__id").as(idCol),
        col("__keep.__us").as("kept_us"),
        col("n_events"),
      )
  }

  /** OHLC bars: per (type, hour) open/high/low/close/volume — the
    * warehouse form of a market-data candle, and a general "first/last
    * value per bucket" pattern. ONE map-side-combined aggregate: open and
    * close ride min/max structs keyed (µs, tiebreak id) — the id is unique,
    * so the struct comparison never reaches the value field and the
    * selection is total-order deterministic. No window, no sort, no
    * second pass.
    */
  def ohlcBars(
      events: DataFrame,
      typeCol: String,
      tsCol: String,
      idCol: String,
      valueCol: String,
      barHours: Int = 1,
  ): DataFrame = {
    val barUs = barHours.toLong * 3600 * 1000000
    events
      .select(
        col(typeCol),
        expr(s"unix_micros($tsCol) div $barUs").as("bar"),
        struct(unix_micros(col(tsCol)).as("__us"), col(idCol).as("__id"), col(valueCol).as("__v")).as("__e"),
        col(valueCol),
      )
      .groupBy(col(typeCol), col("bar"))
      .agg(
        min(col("__e")).getField("__v").as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max(col("__e")).getField("__v").as("close"),
        count(lit(1)).as("n_events"),
      )
  }

  /** Sliding-window distinct counts from MERGED daily KMV sketches — the
    * "sketch once, window many" pattern: the event log is scanned ONCE to
    * build one bounded sketch per day, and every `windowDays`-day trailing
    * window's distinct estimate is then computed purely by merging ≤
    * `windowDays` sketches (k smallest of their union — the lossless KMV
    * merge [[graft.functions.MinKAggregator]] pins). At 100 TB the
    * alternative — one distinct-aggregation per overlapping window —
    * re-shuffles the log `windowDays`×; this shuffles it once and the
    * window pass touches only (day, k-longs) rows.
    *
    * Output: (day, n_sketch, kth_min, est_distinct) per day WITH data,
    * estimating distinct `valueCol` over [day − windowDays + 1, day].
    */
  def kmvDistinctSlidingDays(
      events: DataFrame,
      tsCol: String,
      valueCol: Column,
      windowDays: Int = 3,
      k: Int = 64,
  ): DataFrame = {
    require(windowDays >= 1, s"windowDays must be positive: $windowDays")
    val spark = events.sparkSession
    import spark.implicits._
    val numerator = (k - 1).toDouble * (1L << 60).toDouble
    val dayUs = 86400L * 1000000
    val daily = events
      .select(expr(s"unix_micros($tsCol) div $dayUs").as("__day"), graft.functions.Hashing.hash64(valueCol).as("__h"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new graft.functions.MinKAggregator(k).toColumn.name("__mins"))
      .toDF("__day", "__mins")
    val contributions = daily
      .select(explode(sequence(col("__day"), col("__day") + (windowDays - 1))).as("day"), col("__mins"))
    val merged = contributions
      .groupBy(col("day"))
      .agg(slice(array_sort(array_distinct(flatten(collect_list(col("__mins"))))), 1, k).as("__u"))
      // only days that themselves have data (the leading edge of a window)
      .join(daily.select(col("__day").as("day")), "day")
    merged.select(
      col("day"),
      size(col("__u")).cast("long").as("n_sketch"),
      element_at(col("__u"), -1).as("kth_min"),
      when(size(col("__u")) < k, size(col("__u")).cast("double"))
        .otherwise(lit(numerator) / element_at(col("__u"), -1).cast("double"))
        .as("est_distinct"),
    )
  }

  /** Join-cardinality estimation from two KMV sketches — "how big is
    * `a ⋈ b` on this key" WITHOUT running the join, the statistic a planner
    * (or a human sizing a 100 TB shuffle) wants first.
    *
    * Theory: the k smallest hashes of A ∪ B all live in sketch(A) ∪
    * sketch(B), so the union sketch is computable from the two sketches
    * alone; and any union-sketch member belonging to A is ≤ A's k-th
    * minimum, hence present in sketch(A) — membership tests against the
    * sketches are EXACT for union-sketch elements. The fraction of
    * union-sketch members present in both sides estimates the Jaccard of
    * the key sets, and `est_union · est_jaccard` estimates the distinct
    * join keys (for a key unique on one side — the FK⟶PK case — that is
    * the row count driver).
    *
    * One bounded aggregate per side (≤ k longs each), then a
    * single-row × single-row crossJoin and pure array expressions — no
    * shuffle touches the data again. Both output doubles are built with
    * the exact expression shapes the DuckDB mirror uses, so the compare is
    * bit-identical.
    */
  def kmvJoinEstimate(
      a: DataFrame,
      aKey: Column,
      b: DataFrame,
      bKey: Column,
      k: Int = 64,
  ): DataFrame = {
    val sparkA = a.sparkSession
    import sparkA.implicits._
    val numerator = (k - 1).toDouble * (1L << 60).toDouble
    def sketch(df: DataFrame, key: Column, out: String): DataFrame =
      df.select(graft.functions.Hashing.hash64(key).as("__h"))
        .as[Long]
        .select(new graft.functions.MinKAggregator(k).toColumn.name(out))
        .toDF(out)
    val ka = sketch(a, aKey, "__ma")
    val kb = sketch(b, bKey, "__mb")
    val unionK = slice(array_sort(array_distinct(concat(col("__ma"), col("__mb")))), 1, k)
    ka.crossJoin(kb)
      .withColumn("__u", unionK)
      .withColumn(
        "__both",
        filter(col("__u"), h => array_contains(col("__ma"), h) && array_contains(col("__mb"), h)),
      )
      .select(
        size(col("__u")).cast("long").as("n_sketch"),
        element_at(col("__u"), -1).as("kth_min"),
        when(size(col("__u")) < k, size(col("__u")).cast("double"))
          .otherwise(lit(numerator) / element_at(col("__u"), -1).cast("double"))
          .as("est_union"),
        (size(col("__both")).cast("double") / size(col("__u")).cast("double")).as("est_jaccard"),
        (when(size(col("__u")) < k, size(col("__u")).cast("double"))
          .otherwise(lit(numerator) / element_at(col("__u"), -1).cast("double"))
          * (size(col("__both")).cast("double") / size(col("__u")).cast("double")))
          .as("est_join_keys"),
      )
  }

  /** Per-day Population Stability Index of a bounded metric — the drift
    * monitor that pages before a model does: bucket the value equi-width
    * (`floor(value / width)`), compare each day's bucket distribution
    * against the all-time distribution with
    * `PSI = Σ_b (p_day − p_global)·ln(p_day / p_global)`.
    *
    * Determinism: proportions quantized to integer per-micro
    * (`c·10^6 div n`), the ln factored through the quantized-ln trick
    * (`l(c_d) − l(n_d) − l(c_g) + l(n_g)`, each on an integer count), the
    * per-bucket term an exact LONG product, the per-day sum exact 64-bit —
    * ONE IEEE division (by 10^12: per-micro proportions × per-micro ln
    * scale the summed term by 10^6·10^6) at the end. Buckets empty on either side
    * contribute 0 (the standard finite-PSI rule).
    *
    * Scale: one (day, bucket) partial-aggregated pass over the log; the
    * global table is |buckets| rows (broadcast), day totals ride a window
    * over the |days|·|buckets| table. Nothing re-scans the events.
    */
  def psiDrift(
      events: DataFrame,
      tsCol: String,
      value: Column,
      bucketWidth: Double,
  ): DataFrame = {
    val lq: Column => Column = x => floor(log(x.cast("double")) * 1000000 + 0.5).cast("long")
    val perDay = Lineage.truncate(
      events
        .select(
          expr(s"unix_micros($tsCol) div 86400000000").as("day"),
          floor(value / bucketWidth).cast("long").as("bucket"),
        )
        .groupBy(col("day"), col("bucket"))
        .agg(count(lit(1)).as("cd"))
    )
    val global = perDay.groupBy(col("bucket")).agg(sum(col("cd")).as("cg"))
    val ng     = global.agg(sum(col("cg")).as("ng"))
    val wDay   = Window.partitionBy(col("day"))
    perDay
      .withColumn("nd", sum(col("cd")).over(wDay))
      .join(broadcast(global), "bucket")
      .crossJoin(broadcast(ng))
      .withColumn("__pd", expr("cd * 1000000 div nd"))
      .withColumn("__pg", expr("cg * 1000000 div ng"))
      .withColumn("__lq", lq(col("cd")) - lq(col("nd")) - lq(col("cg")) + lq(col("ng")))
      .groupBy(col("day"))
      .agg(
        sum(col("cd")).as("n_events"),
        sum((col("__pd") - col("__pg")) * col("__lq")).as("__s"),
      )
      .select(
        col("day"),
        col("n_events"),
        (col("__s").cast("double") / lit(1e12)).as("psi"),
      )
  }

  /** Per-transition latency profile of consecutive events: for each ordered
    * (type → next_type) pair, how long the hop takes — count, exact median,
    * and exact p90 of the gap (µs). The UX/funnel-latency sibling of
    * [[sessionTransitions]]' count matrix.
    *
    * Exactness without a quantile sketch: rank rows per pair (`row_number`
    * by gap), pick positions `(n+1) div 2` and `ceil(0.9·n)` =
    * `(9n+9) div 10` — value-at-position is multiset-determined, so tie
    * order inside equal gaps cannot change the answer. The rank window and
    * the conditional-pick aggregate share ONE (type, next_type) exchange;
    * the gap projection itself rides the user-keyed lead window.
    */
  def transitionLatency(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      idCol: String,
      typeCol: String,
  ): DataFrame = {
    val wUser = Window.partitionBy(col(userCol)).orderBy(col("__us"), col(idCol))
    val hops = events
      .select(col(userCol), unix_micros(col(tsCol)).as("__us"), col(idCol), col(typeCol).as("type_a"))
      // A NULL timestamp would both corrupt the per-user ordering and make
      // the gap-rank median engine-dependent (NULLS FIRST vs LAST) — drop
      // such rows before any window sees them.
      .filter(col("__us").isNotNull)
      .withColumn("type_b", lead(col("type_a"), 1).over(wUser))
      .withColumn("__gap", lead(col("__us"), 1).over(wUser) - col("__us"))
      .filter(col("type_b").isNotNull)
    val wPair = Window.partitionBy(col("type_a"), col("type_b"))
    hops
      .withColumn("__rn", row_number().over(wPair.orderBy(col("__gap"), col(userCol), col(idCol))))
      .withColumn("__n", count(lit(1)).over(wPair))
      .groupBy(col("type_a"), col("type_b"))
      .agg(
        count(lit(1)).as("n"),
        max(when(col("__rn") === expr("(__n + 1) div 2"), col("__gap"))).as("median_gap_us"),
        max(when(col("__rn") === expr("(9 * __n + 9) div 10"), col("__gap"))).as("p90_gap_us"),
      )
  }

  /** Pairwise corpus-overlap matrix via per-group KMV sketches — the
    * "how much do my sources share?" audit (near-identical crawls, mirror
    * sites, re-crawled domains) at sketch cost: each group collapses to its
    * k smallest distinct key hashes (bounded [[graft.functions.MinKAggregator]]
    * state, mergeable partials), then every group PAIR is estimated from
    * two k-arrays — `est_jaccard = |both ∩ union-k| / |union-k|`,
    * `est_union = (k−1)·2^60 / h_k`, `est_common = est_union · est_jaccard`
    * (the [[kmvJoinEstimate]] estimator, G×G times). The pair join is over
    * the G-row sketch table — G = #groups, so the quadratic surface is
    * groups², never rows².
    */
  def kmvOverlapMatrix(
      df: DataFrame,
      groupCol: String,
      key: Column,
      k: Int = 64,
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val numerator = (k - 1).toDouble * (1L << 60).toDouble
    val sk = df
      .select(col(groupCol), graft.functions.Hashing.hash64(key).as("__h"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new graft.functions.MinKAggregator(k).toColumn.name("__mins"))
      .toDF("g", "__mins")
    val a = sk.select(col("g").as("src_a"), col("__mins").as("__ma"))
    val b = sk.select(col("g").as("src_b"), col("__mins").as("__mb"))
    val estUnion = when(size(col("__u")) < k, size(col("__u")).cast("double"))
      .otherwise(lit(numerator) / element_at(col("__u"), -1).cast("double"))
    val estJaccard = size(col("__both")).cast("double") / size(col("__u")).cast("double")
    a.join(b, col("src_a") < col("src_b"))
      .withColumn("__u", slice(array_sort(array_distinct(concat(col("__ma"), col("__mb")))), 1, k))
      .withColumn(
        "__both",
        filter(col("__u"), h => array_contains(col("__ma"), h) && array_contains(col("__mb"), h)),
      )
      .select(
        col("src_a"),
        col("src_b"),
        size(col("__u")).cast("long").as("n_sketch"),
        estUnion.as("est_union"),
        estJaccard.as("est_jaccard"),
        (estUnion * estJaccard).as("est_common"),
      )
  }

  /** Per-key rolling median over the last `n` observations (event order =
    * (µs, tiebreak) — total, deterministic): the robust rolling baseline a
    * monitoring/feature pipeline keeps per entity, immune to the single
    * spikes that wreck a rolling MEAN. Median rule: lower median —
    * `sorted[(len+1) div 2]` (1-based) — a pure integer pick, identical in
    * any engine; partial windows (first n−1 rows) use the same rule over
    * what exists.
    *
    * Scale: ONE key-partitioned window; state per row is an n-element list
    * (n is a small constant), so the sort-per-row is O(n log n) on
    * constant-size arrays — no per-group global sort beyond the window's
    * own, and the exchange carries (key, µs, id, value) only.
    */
  def rollingMedian(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      valueCol: String,
      n: Int,
  ): DataFrame = {
    val w = Window
      .partitionBy(col(keyCol))
      .orderBy(col("__us"), col(idCol))
      .rowsBetween(-(n - 1), Window.currentRow)
    events
      .select(col(keyCol), unix_micros(col(tsCol)).as("__us"), col(idCol), col(valueCol))
      .withColumn("__w", sort_array(collect_list(col(valueCol)).over(w)))
      .select(
        col(keyCol),
        col(idCol),
        col(valueCol),
        expr("element_at(__w, cast((size(__w) + 1) div 2 as int))").as("roll_med"),
      )
  }

  /** Per-key daily time-series gap fill (forward fill / LOCF): one row per
    * key per epoch-day between the key's first and last observation, each
    * missing day carrying the last observed value. The daily carrier value
    * is the LATEST event that day (total order (ts, tiebreak) — ties
    * deterministic). Output: (key, day, value, filled) where `filled` marks
    * generated rows. Reference semantics: the reference zero-fills missing
    * dates when combining series (parser3.py's per-date merge); LOCF is the
    * time-series-repair sibling a feature pipeline needs.
    *
    * Scale design: NO date-spine join, and NO window over raw events. The
    * daily carrier is a `max_by` AGGREGATE (map-side combine — only
    * collapsed (key, day) rows ever shuffle, not the raw log), then
    * `lead(day)` over the ~1000×-smaller daily table names the next
    * observed day and `sequence(day, next_day - 1)` explodes the run each
    * carrier covers. The fill itself is a projection; no row is revisited —
    * vs the naive spine-outer-join + `last(ignoreNulls)` window which
    * shuffles the raw log and scans every null slot. Run length is bounded
    * by the key's observation span in days, so skew = max gap, not corpus
    * size.
    */
  def gapFillDaily(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      tiebreakCol: String,
  ): DataFrame = {
    val wLead = Window.partitionBy(col(keyCol)).orderBy(col("__day"))
    events
      .select(
        col(keyCol),
        unix_micros(col(tsCol)).as("__us"),
        expr(s"unix_micros($tsCol) div 86400000000").as("__day"),
        col(valueCol),
        col(tiebreakCol),
      )
      .groupBy(col(keyCol), col("__day"))
      .agg(max_by(col(valueCol), struct(col("__us"), col(tiebreakCol))).as("__v"))
      .withColumn("__next", lead(col("__day"), 1).over(wLead))
      .select(
        col(keyCol),
        col("__day"),
        col("__v"),
        explode(sequence(col("__day"), coalesce(col("__next") - 1, col("__day")))).as("day"),
      )
      .select(
        col(keyCol),
        col("day"),
        col("__v").as("value"),
        (col("day") =!= col("__day")).as("filled"),
      )
  }

  /** Two-proportion z-test between experiment arms: unit = user, arm =
    * `armExpr` (must be constant per user — e.g. a hash bucket of the user
    * id), conversion = the user has >= 1 event satisfying `convExpr`.
    * Returns ONE row: per-arm user and conversion counts, rates, and the
    * pooled-variance z statistic — the decision gate an experimentation
    * pipeline computes over the full event log.
    *
    * Scale design: one user-keyed partial-aggregated exchange (the per-user
    * collapse), then a scalar global aggregate; the z arithmetic is a
    * driver-free projection on the single result row. Counts are exact
    * integers; the only floating-point steps are the final divisions and
    * one `sqrt`, written in ONE fixed expression order so any IEEE engine
    * reproduces the statistic bit-identically.
    */
  def abTestTwoProportion(
      events: DataFrame,
      userCol: String,
      armExpr: Column,
      convExpr: Column,
  ): DataFrame = {
    val perUser = events
      .groupBy(col(userCol))
      .agg(
        min(armExpr).as("__arm"),
        max(convExpr.cast("int")).as("__conv"),
      )
    val counts = perUser
      .groupBy()
      .agg(
        sum(when(col("__arm") === 0, 1).otherwise(0)).as("n0"),
        sum(when(col("__arm") === 0, col("__conv")).otherwise(0)).as("c0"),
        sum(when(col("__arm") === 1, 1).otherwise(0)).as("n1"),
        sum(when(col("__arm") === 1, col("__conv")).otherwise(0)).as("c1"),
      )
    val (n0d, c0d) = (col("n0").cast("double"), col("c0").cast("double"))
    val (n1d, c1d) = (col("n1").cast("double"), col("c1").cast("double"))
    val p0     = c0d / n0d
    val p1     = c1d / n1d
    val pooled = (c0d + c1d) / (n0d + n1d)
    // Degenerate designs (an empty arm, or 0%/100% pooled conversion) have
    // no defined z — guard OUTSIDE the division so the untaken branch is
    // never evaluated (ANSI divide-by-zero). Nested so `pooled` itself is
    // only computed when both arms are populated.
    val z = when(
      col("n0") === 0 || col("n1") === 0,
      lit(null).cast("double"),
    ).otherwise(
      when(pooled === 0.0 || pooled === 1.0, lit(null).cast("double"))
        .otherwise((p1 - p0) / sqrt(pooled * (lit(1.0) - pooled) * (lit(1.0) / n0d + lit(1.0) / n1d)))
    )
    counts.select(
      col("n0"),
      col("c0"),
      col("n1"),
      col("c1"),
      when(col("n0") === 0, lit(null).cast("double")).otherwise(p0).as("p0"),
      when(col("n1") === 0, lit(null).cast("double")).otherwise(p1).as("p1"),
      z.as("z"),
    )
  }

  /** Robust per-group outlier census via median absolute deviation — the
    * heavy-tail-safe alternative to the z-score (one wild value wrecks a
    * mean/stddev fence; the median and MAD barely move). Per group:
    * `median` = the lower median of `value`, `mad` = the lower median of
    * `|value − median|`, and `n_outliers` counts rows with
    * `|value − median| > cutoff · mad`.
    *
    * Determinism: both medians are rank-POSITION picks
    * (`sorted[(n+1) div 2]`, the [[transitionLatency]] rule) — the picked
    * value is multiset-determined regardless of tie order — and the cutoff
    * comparison is one mirrored IEEE expression over values both engines
    * computed identically. Scale: two rank windows keyed on the SAME group
    * column (the median join back is a broadcast of the per-group table, so
    * the second window rides the first window's exchange — asserted in
    * PlanSpec), then one partial-aggregating groupBy. No global sort, no
    * quantile sketch.
    */
  def madOutliers(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      cutoff: Double = 3.0,
  ): DataFrame = {
    val wG   = Window.partitionBy(col(groupCol))
    // NULL values are excluded up front: the rank-position median would
    // otherwise be engine-dependent (Spark windows sort NULLS FIRST,
    // DuckDB NULLS LAST), silently shifting the pick. The census is over
    // non-null values; `n` counts the same.
    val base = df
      .select(col(groupCol), col(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull)
    val meds = base
      .withColumn("__rn", row_number().over(wG.orderBy(col("__v"))))
      .withColumn("__n", count(lit(1)).over(wG))
      .groupBy(col(groupCol))
      .agg(max(when(col("__rn") === expr("(__n + 1) div 2"), col("__v"))).as("median"))
    val dev = base
      .join(broadcast(meds), Seq(groupCol))
      .withColumn("__dev", abs(col("__v") - col("median")))
    val mads = dev
      .withColumn("__rn", row_number().over(wG.orderBy(col("__dev"))))
      .withColumn("__n", count(lit(1)).over(wG))
      .groupBy(col(groupCol))
      .agg(max(when(col("__rn") === expr("(__n + 1) div 2"), col("__dev"))).as("mad"))
    dev
      .join(broadcast(mads), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        min(col("median")).as("median"),
        min(col("mad")).as("mad"),
        sum(when(col("__dev") > lit(cutoff) * col("mad"), 1L).otherwise(0L)).as("n_outliers"),
      )
  }

  /** Time-decay multi-touch attribution: every conversion credits EVERY
    * prior touch inside `windowMicros`, weighted by an exact halving decay
    * `credit_s = 1000000 >> min(gap div halfLifeMicros, maxShift)` — the
    * "recent touches matter more" model next to [[lastTouchAttribution]]'s
    * winner-take-all, with the power-of-two decay keeping every credit an
    * exact integer (no float pow to mirror). Returns per-channel touch
    * counts and summed scaled credit.
    *
    * Scale: one user-keyed equi-join of two NARROWED projections (touches:
    * user/channel/µs; conversions: user/µs) with the window bound as a join
    * predicate — fan-out per user is touches×conversions inside the window,
    * the honest cost of all-touch attribution; the rollup map-side
    * combines. A pathological power user concentrates a key: salt via
    * [[SkewJoin.saltedJoin]] at cluster scale.
    */
  def decayAttribution(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      touchTypes: Seq[String],
      convType: String,
      windowMicros: Long,
      halfLifeMicros: Long,
      maxShift: Int = 20,
  ): DataFrame = {
    require(touchTypes.nonEmpty && !touchTypes.contains(convType), "touchTypes must be non-empty and exclude convType")
    require(windowMicros > 0 && halfLifeMicros > 0 && maxShift >= 0, "window/halfLife/maxShift must be positive")
    val touches = events
      .filter(col(typeCol).isin(touchTypes: _*))
      .select(col(userCol), col(typeCol).as("channel"), unix_micros(col(tsCol)).as("__tus"))
    val convs = events
      .filter(col(typeCol) === convType)
      .select(col(userCol), unix_micros(col(tsCol)).as("__cus"))
    touches
      .join(convs, Seq(userCol))
      .filter(col("__tus") < col("__cus") && col("__cus") - col("__tus") <= windowMicros)
      .withColumn(
        "__credit",
        expr(s"shiftright(1000000L, cast(least((__cus - __tus) div $halfLifeMicros, $maxShift) as int))"),
      )
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_credits"), sum(col("__credit")).as("credit_s"))
  }

  /** Out-of-orderness audit for watermark tuning: per event type, the
    * histogram of `lateness = max-event-time-so-far − event-time` in
    * arrival order (`idCol` — monotone ingest ids stand in for arrival
    * when the log has no arrival column). The p99 bucket of this histogram
    * IS the watermark delay a streaming job should declare; guessing it is
    * how pipelines silently drop late data.
    *
    * Exact integers end to end: running max over one type-keyed window in
    * arrival order, integer-µs subtraction, integer-div bucketing, then a
    * partial-aggregating rollup on (type, bucket).
    */
  def latenessHistogram(
      events: DataFrame,
      typeCol: String,
      tsCol: String,
      idCol: String,
      bucketMicros: Long,
  ): DataFrame = {
    require(bucketMicros > 0, s"latenessHistogram: bucketMicros must be positive: $bucketMicros")
    val w = Window
      .partitionBy(col(typeCol))
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    events
      .select(col(typeCol), unix_micros(col(tsCol)).as("__us"), col(idCol))
      .withColumn("__late", max(col("__us")).over(w) - col("__us"))
      .groupBy(col(typeCol), expr(s"__late div $bucketMicros").as("bucket"))
      .agg(count(lit(1)).as("n"), max(col("__late")).as("max_late_us"))
  }

  /** User-lifetime survival curve (Kaplan–Meier shape without censoring —
    * every user's span is fully observed in the log): lifetime = whole days
    * between first and last event; `n_surviving(t)` = users whose lifetime
    * is ≥ t; `survival_milli = n_surviving·1000 div total` — the retention
    * curve product teams read before any cohort drilldown.
    *
    * Scale: one user-keyed partial aggregate collapses the log to a row
    * per user, a second collapses to the ≤ span-days histogram; the
    * descending running sum and the total run on THAT tiny table (the
    * [[Quality.equiDepthHistogram]] stance on single-partition windows
    * over collapsed relations). All integer arithmetic.
    */
  def survivalCurve(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val life = events
      .select(col(userCol), unix_micros(col(tsCol)).as("__us"))
      .groupBy(col(userCol))
      .agg(expr("(max(__us) - min(__us)) div 86400000000").as("lifetime_days"))
    val hist = life.groupBy(col("lifetime_days")).agg(count(lit(1)).as("n_users"))
    val wDesc = Window
      .orderBy(col("lifetime_days").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    hist
      .withColumn("n_surviving", sum(col("n_users")).over(wDesc))
      .withColumn("__total", sum(col("n_users")).over(wAll))
      .select(
        col("lifetime_days"),
        col("n_users"),
        col("n_surviving"),
        expr("n_surviving * 1000 div __total").as("survival_milli"),
      )
  }

  /** Two-level MERGEABLE stats card — the incremental-maintenance
    * demonstration: per-partition partials (rows, min/max, a bounded
    * [[graft.functions.MinKAggregator]] KMV sketch of the key) roll up to
    * the global card WITHOUT rescanning the data, because every statistic
    * is mergeable — sums/min/max trivially, and the k smallest distinct
    * hashes of a union are always contained in the union of per-part
    * k-smallest sets (the KMV merge property). At 100 TB this is how
    * table stats stay fresh under appends: re-card the new partition,
    * merge.
    *
    * Output is ONE row: part count, merged rows/min/max, merged sketch
    * size, kth min, and the KMV distinct estimate for the whole table.
    */
  def mergeableStatsCard(
      df: DataFrame,
      partCol: String,
      keyExpr: Column,
      valueCol: Column,
      k: Int = 64,
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val numerator = (k - 1).toDouble * (1L << 60).toDouble
    val basic = df
      .groupBy(col(partCol))
      .agg(count(lit(1)).as("n_rows"), min(valueCol).as("min_v"), max(valueCol).as("max_v"))
    val sketch = df
      .select(col(partCol), graft.functions.Hashing.hash64(keyExpr).as("__h"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new graft.functions.MinKAggregator(k).toColumn.name("__mins"))
      .toDF(partCol, "__mins")
    val partials = Lineage.truncate(basic.join(sketch, Seq(partCol)))
    val mergedBasic = partials
      .agg(
        count(lit(1)).as("n_parts"),
        sum(col("n_rows")).as("n_rows"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"),
      )
    val mergedMins = partials
      .select(explode(col("__mins")).as("__h"))
      .distinct()
      .orderBy(col("__h"))
      .limit(k)
      .agg(count(lit(1)).as("n_sketch"), max(col("__h")).as("kth_min"))
    mergedBasic
      .crossJoin(mergedMins)
      .select(
        col("n_parts"),
        col("n_rows"),
        col("min_v"),
        col("max_v"),
        col("n_sketch"),
        col("kth_min"),
        when(col("n_sketch") < k, col("n_sketch").cast("double"))
          .otherwise(lit(numerator) / col("kth_min").cast("double"))
          .as("est_distinct"),
      )
  }

  /** Concurrency gauge from session intervals (sweep line): +1 at each
    * session start, −1 just after its inclusive end, and the running sum IS
    * the number of simultaneously open sessions — reported as the per-hour
    * maximum, the load number capacity planning reads. Hours with no
    * boundary events carry the previous level and are omitted (the gauge
    * didn't change).
    *
    * Scale: the interval table collapses to one (µs, net) row per distinct
    * boundary timestamp (partial agg), and the GLOBAL running sum is the
    * two-phase trick — per-hour net totals → tiny offsets table (window
    * over hours only) broadcast back → hour-local cumulative windows. No
    * single-partition pass over the boundary table.
    */
  def concurrentSessions(sessions: DataFrame, startUsCol: String, endUsCol: String): DataFrame = {
    val deltas = sessions
      .select(col(startUsCol).as("us"), lit(1L).as("d"))
      .unionAll(sessions.select((col(endUsCol) + 1).as("us"), lit(-1L).as("d")))
      .groupBy(col("us"))
      .agg(sum(col("d")).as("net"))
      .withColumn("hr", expr("us div 3600000000"))
    val wOff = Window.orderBy(col("hr")).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = deltas
      .groupBy(col("hr"))
      .agg(sum(col("net")).as("__hnet"))
      .withColumn("off", coalesce(sum(col("__hnet")).over(wOff), lit(0L)))
      .select(col("hr"), col("off"))
    val wHr = Window.partitionBy(col("hr")).orderBy(col("us")).rowsBetween(Window.unboundedPreceding, 0)
    deltas
      .join(broadcast(offsets), Seq("hr"))
      .withColumn("__cum", col("off") + sum(col("net")).over(wHr))
      .groupBy(col("hr"))
      .agg(max(col("__cum")).as("max_concurrent"))
  }

  /** Events-pipeline capstone — the daily product-analytics batch as ONE
    * composition: volumes, session count, strict-funnel stage counts, and
    * last-touch attribution conversions, emitted as a (stat, value) card.
    * Every number is an existing operator's rule ([[funnel]]'s stacked
    * min-windows, the q44 session-flag rule, [[lastTouchAttribution]]'s
    * window) so the card cannot drift from the individually-oracled pieces.
    *
    * Scale: the log narrows to (user, id, µs, type) and materializes ONCE
    * ([[Lineage.truncate]]); the four consumers are each one user-keyed
    * window/aggregate pass over that fixed-width table. Session COUNT
    * needs no per-session groupBy at all — it is the SUM of new-session
    * flags. Output is a handful of integer rows.
    */
  def eventsOpsCard(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      idCol: String,
      gapMinutes: Int,
      stages: Seq[String],
      touchTypes: Seq[String],
      convType: String,
      windowMicros: Long,
  ): DataFrame = {
    require(stages.size >= 2 && touchTypes.nonEmpty && !touchTypes.contains(convType), "bad card config")
    val gapUs = gapMinutes * 60L * 1000000L
    val e = Lineage.truncate(
      events.select(
        col(userCol).as("u"),
        col(idCol).as("i"),
        unix_micros(col(tsCol)).as("__us"),
        col(typeCol).as("t"),
      )
    )
    val wOrd = Window.partitionBy(col("u")).orderBy(col("__us"), col("i"))
    val vol = e
      .agg(count(lit(1)).as("ne"), countDistinct(col("u")).as("nu"))
      .selectExpr("stack(2, 'n_events', cast(ne as long), 'n_users', cast(nu as long)) as (stat, value)")
    val sessions = e
      .withColumn("__prev", lag(col("__us"), 1).over(wOrd))
      .withColumn("__ns", when(col("__prev").isNull || col("__us") - col("__prev") > gapUs, 1L).otherwise(0L))
      .agg(sum(col("__ns")).as("v"))
      .select(lit("n_sessions").as("stat"), col("v").cast("long").as("value"))
    val wU = Window.partitionBy(col("u"))
    val staged = stages.zipWithIndex.foldLeft(e) { case (df, (stage, i)) =>
      val ordered = if (i == 0) lit(true) else col("__us") > col(s"__t${i - 1}")
      df.withColumn(s"__t$i", min(when(col("t") === stage && ordered, col("__us"))).over(wU))
    }
    val funnelAggs = stages.indices.map(i => count(col(s"__t$i")).as(s"__n$i"))
    val funnelRows = stages.zipWithIndex
      .map { case (st, i) => s"'funnel_$st', cast(__n$i as long)" }
      .mkString(", ")
    val funnelCard = staged
      .groupBy(col("u"))
      .agg(max(col("__t0")).as("__t0"), stages.indices.tail.map(i => max(col(s"__t$i")).as(s"__t$i")): _*)
      .agg(funnelAggs.head, funnelAggs.tail: _*)
      .selectExpr(s"stack(${stages.size}, $funnelRows) as (stat, value)")
    val isTouch = col("t").isin(touchTypes: _*)
    val wPrev = wOrd.rowsBetween(Window.unboundedPreceding, -1)
    val attrRows = (touchTypes.map(c => s"'attr_$c', cast(a_$c as long)") :+ "'attr_direct', cast(a_direct as long)")
      .mkString(", ")
    val attrCard = e
      .filter(isTouch || col("t") === convType)
      .withColumn("__lt", last(when(isTouch, col("t")), ignoreNulls = true).over(wPrev))
      .withColumn("__lus", last(when(isTouch, col("__us")), ignoreNulls = true).over(wPrev))
      .filter(col("t") === convType)
      .withColumn(
        "__ch",
        coalesce(when(col("__lus").isNotNull && col("__us") - col("__lus") <= windowMicros, col("__lt")), lit("direct")),
      )
      .agg(
        (touchTypes.map(c => sum(when(col("__ch") === c, 1L).otherwise(0L)).as(s"a_$c")) :+
          sum(when(col("__ch") === "direct", 1L).otherwise(0L)).as("a_direct")).head,
        (touchTypes.map(c => sum(when(col("__ch") === c, 1L).otherwise(0L)).as(s"a_$c")) :+
          sum(when(col("__ch") === "direct", 1L).otherwise(0L)).as("a_direct")).tail: _*
      )
      .selectExpr(s"stack(${touchTypes.size + 1}, $attrRows) as (stat, value)")
    vol.unionAll(sessions).unionAll(funnelCard).unionAll(attrCard)
  }

  /** Within-session strict funnel: [[funnel]]'s stacked min-windows scoped
    * to q44-rule session boundaries — stage i+1 counts only strictly after
    * stage i INSIDE the same sitting. The product metric "completed the
    * journey in one session", which the per-user funnel over-counts
    * whenever the journey spans days. Returns per-stage SESSION counts.
    *
    * Scale: sessionizing windows and the per-(user, session) funnel
    * windows are all keyed by user — one exchange carries every stage.
    */
  def sessionFunnel(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      idCol: String,
      gapMinutes: Int,
      stages: Seq[String],
  ): DataFrame = {
    require(stages.size >= 2, "sessionFunnel: need at least two stages")
    val gapUs = gapMinutes * 60L * 1000000L
    val wOrd = Window.partitionBy(col(userCol)).orderBy(col("__us"), col(idCol))
    val sess = events
      .select(col(userCol), col(idCol), col(typeCol), unix_micros(col(tsCol)).as("__us"))
      .withColumn("__prev", lag(col("__us"), 1).over(wOrd))
      .withColumn("__ns", when(col("__prev").isNull || col("__us") - col("__prev") > gapUs, 1).otherwise(0))
      .withColumn("__sid", sum(col("__ns")).over(wOrd))
    val wS = Window.partitionBy(col(userCol), col("__sid"))
    val staged = stages.zipWithIndex.foldLeft(sess) { case (df, (stage, i)) =>
      val ordered = if (i == 0) lit(true) else col("__us") > col(s"__t${i - 1}")
      df.withColumn(s"__t$i", min(when(col(typeCol) === stage && ordered, col("__us"))).over(wS))
    }
    val aggs = stages.indices.map(i => count(col(s"__t$i")).as(s"__n$i"))
    val rows = stages.zipWithIndex
      .map { case (st, i) => s"${i + 1}, '$st', cast(__n$i as long)" }
      .mkString(", ")
    staged
      .groupBy(col(userCol), col("__sid"))
      .agg(max(col("__t0")).as("__t0"), stages.indices.tail.map(i => max(col(s"__t$i")).as(s"__t$i")): _*)
      .agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${stages.size}, $rows) as (stage, event_type, sessions)")
  }

  /** Funnel stage counts PER ACQUISITION COHORT: every user belongs to the
    * epoch-week of their first event, and each cohort reports how many of
    * its users reached each strict-funnel stage — the growth-accounting
    * readout ("is conversion improving for newer cohorts?") that a global
    * funnel averages away.
    *
    * One user-keyed exchange carries everything: the first-event window,
    * the stacked stage min-windows, and the per-user collapse all share
    * `partitionBy(user)`; the final (cohort, stage) rollup is tiny.
    */
  def funnelByCohort(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      stages: Seq[String],
  ): DataFrame = {
    require(stages.size >= 2, "funnelByCohort: need at least two stages")
    val wU = Window.partitionBy(col(userCol))
    val base = events
      .select(col(userCol), col(typeCol), unix_micros(col(tsCol)).as("__us"))
      .withColumn("__first", min(col("__us")).over(wU))
      .withColumn("__cohort", expr("__first div 604800000000"))
    val staged = stages.zipWithIndex.foldLeft(base) { case (df, (stage, i)) =>
      val ordered = if (i == 0) lit(true) else col("__us") > col(s"__t${i - 1}")
      df.withColumn(s"__t$i", min(when(col(typeCol) === stage && ordered, col("__us"))).over(wU))
    }
    val stageAggs = stages.indices.map(i => count(col(s"__t$i")).as(s"__n$i"))
    val rows = stages.zipWithIndex
      .map { case (st, i) => s"${i + 1}, '$st', cast(__n$i as long)" }
      .mkString(", ")
    staged
      .groupBy(col(userCol), col("__cohort"))
      .agg(max(col("__t0")).as("__t0"), stages.indices.tail.map(i => max(col(s"__t$i")).as(s"__t$i")): _*)
      .groupBy(col("__cohort").as("cohort_week"))
      .agg(stageAggs.head, stageAggs.tail: _*)
      .selectExpr("cohort_week", s"stack(${stages.size}, $rows) as (stage, event_type, users)")
  }

  /** Daily metric timeline: per (type, epoch-day) the event count and the
    * exact p50/p90 of `valueCol` as rank-position picks — the dashboard
    * time-series behind every "did yesterday look weird" question, built
    * on the same multiset-determined quantile rule as [[transitionLatency]]
    * (no sketch, no interpolation ambiguity to mirror).
    *
    * One (type, day) exchange shared by the rank window, the count window,
    * and the final collapse.
    */
  def dailyValueTimeline(
      events: DataFrame,
      typeCol: String,
      tsCol: String,
      valueCol: String,
  ): DataFrame = {
    // NULL values excluded for the same engine-dependent-NULL-ordering
    // reason as [[madOutliers]]; `n` counts non-null values per cell.
    val base = events
      .select(
        col(typeCol),
        expr(s"unix_micros($tsCol) div 86400000000").as("day"),
        col(valueCol).cast("double").as("__v"),
      )
      .filter(col("__v").isNotNull)
    val wG = Window.partitionBy(col(typeCol), col("day"))
    base
      .withColumn("__rn", row_number().over(wG.orderBy(col("__v"))))
      .withColumn("__n", count(lit(1)).over(wG))
      .groupBy(col(typeCol), col("day"))
      .agg(
        count(lit(1)).as("n"),
        max(when(col("__rn") === expr("(__n + 1) div 2"), col("__v"))).as("p50"),
        max(when(col("__rn") === expr("(9 * __n + 9) div 10"), col("__v"))).as("p90"),
      )
  }

  /** Weekday activity profile: per (type, epoch-day mod 7) counts and the
    * per-mille share of the type's volume — integer day-of-week (day 0 =
    * the epoch's Thursday; a LABEL, not calendar semantics, so there is no
    * timezone/locale behavior to mirror). The staffing/batch-window shape
    * readout.
    */
  def weekdayProfile(events: DataFrame, typeCol: String, tsCol: String): DataFrame = {
    // Column-API window (not a spliced SQL string, which would break for
    // names needing backticks); the share stays an exact integer div.
    val wT = Window.partitionBy(col(typeCol))
    events
      .select(col(typeCol), expr(s"unix_micros($tsCol) div 86400000000 % 7").as("dow"))
      .groupBy(col(typeCol), col("dow"))
      .agg(count(lit(1)).as("n"))
      .withColumn("__tot", sum(col("n")).over(wT))
      .withColumn("share_milli", expr("n * 1000 div __tot"))
      .drop("__tot")
  }

  /** Day-over-day volume change per type: each (type, day) with its count,
    * the previous OBSERVED day's count, and the signed per-mille change —
    * the "what moved since yesterday" report. `lag` is over observed days
    * (a silent zero-volume day shows as a larger gap on the next observed
    * day, which is exactly when a human should look). Change is an exact
    * cross-multiplied integer; the first observed day reports NULL.
    */
  def dailyChangeReport(events: DataFrame, typeCol: String, tsCol: String): DataFrame = {
    val wT = Window.partitionBy(col(typeCol)).orderBy(col("day"))
    events
      .select(col(typeCol), expr(s"unix_micros($tsCol) div 86400000000").as("day"))
      .groupBy(col(typeCol), col("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("prev_n", lag(col("n"), 1).over(wT))
      // Spark `div` and DuckDB `//` BOTH truncate toward zero (verified on
      // negative deltas: -7000 // 9 = -777 in each) — plain integer
      // division mirrors exactly even though the delta can be negative.
      .withColumn("change_milli", expr("(n - prev_n) * 1000 div prev_n"))
  }

  /** Day-N retention KPI: per signup day (each user's first active day),
    * cohort size and the users active EXACTLY N days later for N in
    * `offsets`, as counts plus exact per-mille rates — the D1/D7/D30
    * numbers a growth dashboard leads with (the daily-granularity KPI
    * beside [[retentionCohorts]]' weekly matrix).
    *
    * Scale: the log collapses to DISTINCT (user, day) first; the
    * first-day window rides the user exchange of that collapsed table;
    * the offset flags are per-user aggregates over it (no join against
    * the log), and the final rollup is days-sized.
    */
  def dayNRetention(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      offsets: Seq[Int],
  ): DataFrame = {
    require(offsets.nonEmpty && offsets.forall(_ >= 1), "dayNRetention: offsets must be >= 1")
    val wU = Window.partitionBy(col(userCol))
    val ud = events
      .select(col(userCol), expr(s"unix_micros($tsCol) div 86400000000").as("__day"))
      .distinct()
      .withColumn("__first", min(col("__day")).over(wU))
    val flagAggs = offsets.map(o => max(when(col("__day") === col("__first") + o, 1L).otherwise(0L)).as(s"__r$o"))
    val perUser = ud
      .groupBy(col(userCol), col("__first"))
      .agg(flagAggs.head, flagAggs.tail: _*)
    val rateAggs = offsets.flatMap(o =>
      Seq(
        sum(col(s"__r$o")).as(s"d${o}_retained"),
      )
    )
    val out = perUser
      .groupBy(col("__first").as("signup_day"))
      .agg((count(lit(1)).as("cohort_users") +: rateAggs).head,
           (count(lit(1)).as("cohort_users") +: rateAggs).tail: _*)
    offsets.foldLeft(out) { (df, o) =>
      df.withColumn(s"d${o}_milli", expr(s"d${o}_retained * 1000 div cohort_users"))
    }
  }

  /** Per-user event-type trigram census — the 3-step navigation-path mining
    * behind "what do users do next" dashboards (the 3-gram sibling of the
    * bigram transition table). Paths are read off each user's total-ordered
    * stream (`(ts, id)` — the [[transitionLatency]] ordering rule, so ties
    * are deterministic); NULL timestamps are dropped for the same
    * engine-dependent-NULL-ordering reason.
    *
    * Scale: one user-partitioned window (two `lead`s ride the same sort)
    * then a partial-aggregating groupBy over a |types|³-bounded key space —
    * no self-joins, nothing quadratic in events.
    */
  def pathTrigrams(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      idCol: String,
      typeCol: String,
  ): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col("__us"), col(idCol))
    events
      .select(col(userCol), unix_micros(col(tsCol)).as("__us"), col(idCol), col(typeCol).as("t1"))
      .filter(col("__us").isNotNull)
      .withColumn("t2", lead(col("t1"), 1).over(w))
      .withColumn("t3", lead(col("t1"), 2).over(w))
      .filter(col("t3").isNotNull)
      .groupBy(col("t1"), col("t2"), col("t3"))
      .agg(count(lit(1)).as("n"))
  }

  /** Daily stickiness (DAU / trailing-`window`-day AU): the engagement KPI
    * that distinguishes "many users daily" from "the same users daily".
    * Exact integer per-mille, reported for every OBSERVED day.
    *
    * Scale shape: the log collapses to distinct (user, day) FIRST (the
    * [[dayNRetention]] rule — nothing downstream ever re-touches events),
    * then each user-day fans out to the `window` trailing-window ends it
    * supports (a bounded ×7 explode of the already-collapsed table, not of
    * the log), and both aggregations are partial-combining counts. No
    * self-joins, no per-day rescans.
    */
  def stickinessReport(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      window: Int = 7,
  ): DataFrame = {
    require(window >= 1, s"stickinessReport: bad window $window")
    val ud = Lineage.truncate(
      events
        .select(col(userCol).as("__u"), expr(s"unix_micros($tsCol) div 86400000000").as("day"))
        .distinct()
    )
    val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val wau = ud
      .withColumn("__d", explode(sequence(col("day"), col("day") + lit(window - 1))))
      .select(col("__u"), col("__d"))
      .distinct()
      .groupBy(col("__d"))
      .agg(count(lit(1)).as("wau"))
    dau
      .join(wau.withColumnRenamed("__d", "day"), Seq("day"))
      .select(
        col("day"),
        col("dau"),
        col("wau"),
        expr("dau * 1000 div wau").as("stickiness_milli"),
      )
  }

  /** Per-group Gini concentration of user activity — "is the volume a broad
    * base or a few whales?" (mixture weighting and abuse triage both read
    * this). Users rank ascending by (count, user) — the unique-key
    * tie-break makes the rank multiset-determined on any engine — and the
    * coefficient is the exact integer rank form
    * `G = (2·Σ r·c − (n+1)·Σc) / (n·Σc)`, reported in per-micro with NO
    * IEEE arithmetic anywhere.
    *
    * Scale: one (group, user) partial-aggregating count, one rank window
    * keyed on the group, one collapse. Events are touched once.
    */
  def activityGini(events: DataFrame, groupCol: String, userCol: String): DataFrame = {
    val c = events.groupBy(col(groupCol), col(userCol)).agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__c"), col(userCol))
    c.withColumn("__r", row_number().over(w))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_users"),
        sum(col("__c")).as("total_events"),
        sum(col("__r") * col("__c")).as("__rc"),
      )
      .select(
        col(groupCol),
        col("n_users"),
        col("total_events"),
        // DECIMAL(38,0) promotion before the per-micro scaling: the raw
        // LONG form wraps once n_users·total_events exceeds ~9.2e18-ish
        // products (1M users × 10M events), and Spark wraps silently
        // while the oracle errors — the dsum38 stance applies here too.
        expr(
          "CAST((2 * CAST(__rc AS DECIMAL(38,0)) - (n_users + 1) * CAST(total_events AS DECIMAL(38,0))) * 1000000" +
            " div (CAST(n_users AS DECIMAL(38,0)) * total_events) AS BIGINT)"
        ).as("gini_micro"),
      )
  }
}
