package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators: as-of join and gap sessionization — the two
  * temporal primitives every event/metrics pipeline needs and vanilla
  * Spark SQL lacks as operators.
  *
  * Scale contract: both operators are ONE hash-partition-by-key + sort
  * — no range-condition join anywhere. The naive as-of formulation
  * (`JOIN ON key = key AND r.ts <= q.ts` + windowed pick) makes Spark
  * build every (query, earlier-ref) pair before discarding all but one
  * — quadratic per key; the union+window shape below is O(n log n) per
  * key and never materializes a pair.
  */
object Events {

  /** As-of join: attach to each row of `queries` the single most recent
    * `refs` row with the same `keyCol` and `ref.tsCol <= query.tsCol`
    * (ties on ts: highest `idCol` wins; a ref exactly at the query's
    * timestamp matches). Null ref columns when no ref precedes.
    *
    * Shape: tag both sides, union, ONE window per key ordered by
    * (ts, side, id) carrying the last non-null ref row as a packed
    * struct — the whole ref row travels in one column, so the matched
    * id/ts/payload can never mix rows. One shuffle on `keyCol`, one
    * sort, zero joins: the as-of shape that survives 100× key skew
    * better than any range join (AQE can split a hot key's sort, but
    * not a hot key's pair explosion).
    *
    * Both inputs need (`keyCol`, `tsCol` BIGINT, `idCol`); `payload`
    * names the ref columns to carry (emitted as `ref_<name>`, plus
    * `ref_<idCol>` / `ref_<tsCol>`).
    */
  def asofJoin(queries: DataFrame, refs: DataFrame,
      keyCol: String = "user_id", tsCol: String = "ts_us",
      idCol: String = "event_id", payload: Seq[String] = Seq("value")): DataFrame = {
    val qCols = queries.columns
    val refStruct = struct(
      (Seq(idCol, tsCol) ++ payload).map(c => col(c).as(c)): _*)
    val qTagged = queries
      .withColumn("__side", lit(1))
      .withColumn("__ref", lit(null).cast(
        refs.select(refStruct).schema.head.dataType))
    val rTagged = refs
      .select((Seq(col(keyCol), col(tsCol), col(idCol)) :+
        refStruct.as("__ref")): _*)
      .withColumn("__side", lit(0))
    val unioned = qTagged.unionByName(rTagged, allowMissingColumns = true)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__side"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = unioned
      .withColumn("__m", last(col("__ref"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    out.select(
      qCols.map(col) ++
        Seq(col(s"__m.$idCol").as(s"ref_$idCol"),
          col(s"__m.$tsCol").as(s"ref_$tsCol")) ++
        payload.map(c => col(s"__m.$c").as(s"ref_$c")): _*)
  }

  /** Last-touch conversion attribution — the marketing-analytics
    * rollup built on [[asofJoin]]: each conversion event credits the
    * user's most recent touchpoint at-or-before it (ties: the later
    * touch id — the as-of join's own tie rule), but only within the
    * lookback window; conversions with no touch in the window land in
    * an explicit `unattributed` bucket (never dropped — the report
    * must account for every conversion). Output per channel:
    * conversion count, exact DECIMAL revenue, mean gap in µs (BIGINT
    * DIV — exact).
    *
    * Scale shape: inherits the as-of join's single user-keyed
    * exchange; the rollup is a channels-cardinality aggregation with
    * map-side combine. Nothing pairwise, nothing driver-side.
    */
  def lastTouchAttribution(events: DataFrame, touchTypes: Seq[String],
      conversionType: String, windowUs: Long): DataFrame = {
    val conv = events.filter(col("event_type") === conversionType)
      .select(col("event_id"), col("user_id"), col("ts_us"), col("value"))
    val touches = events.filter(col("event_type").isin(touchTypes: _*))
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("event_type").as("channel"))
    val att = asofJoin(conv, touches, payload = Seq("channel"))
    val attributed = col("ref_event_id").isNotNull &&
      (col("ts_us") - col("ref_ts_us")) <= lit(windowUs)
    att
      .withColumn("__ch",
        when(attributed, col("ref_channel")).otherwise(lit("unattributed")))
      .withColumn("__gap",
        when(attributed, col("ts_us") - col("ref_ts_us")).otherwise(lit(0L)))
      .groupBy(col("__ch").as("channel"))
      .agg(count(lit(1)).as("n_conversions"),
        sum(col("value").cast("decimal(18,2)")).as("__rev"),
        sum(col("__gap")).as("__gapsum"))
      .select(col("channel"), col("n_conversions"),
        col("__rev").cast("decimal(38,2)").cast("string").as("revenue"),
        expr("__gapsum DIV n_conversions").as("avg_gap_us"))
  }

  /** Bucketized range (interval-containment) join: every `points` row
    * paired with every `intervals` row of the same `keyCol` whose
    * `[startCol, endCol]` contains `tsCol` (bounds inclusive, BIGINT
    * µs). This is the scale-safe form of `JOIN ON key = key AND ts
    * BETWEEN start AND end` — which Spark plans as a per-key pair
    * explosion (and, keyless, as BroadcastNestedLoopJoin): quadratic
    * in the hot key. Here both sides map to integer time buckets
    * (`DIV bucketUs`), intervals EXPLODE to the buckets they span,
    * and the pairing is a plain hash equi-join on (key, bucket) +
    * exact BETWEEN filter.
    *
    * Correctness needs only that bucketing is MONOTONE: a contained
    * point's bucket always lies in `[bucket(start), bucket(end)]`, so
    * every qualifying pair meets in the point's (single) bucket —
    * and meets exactly once, since a point has one bucket row. No
    * dedup step. Cost: interval replication = `span/bucketUs + 1`
    * rows; pick `bucketUs` ≈ the typical interval span so replication
    * is O(1) per interval. The join shuffles on (key, bucket) — long
    * intervals spread across bucket partitions instead of piling on
    * one key, and AQE broadcasts the (usually dimension-sized)
    * interval side when it fits.
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame,
      keyCol: String = "user_id", tsCol: String = "ts_us",
      startCol: String = "start_us", endCol: String = "end_us",
      bucketUs: Long = 3600L * 1000000): DataFrame =
    rangeJoinOn(points, intervals, Seq(keyCol), tsCol, startCol, endCol,
      bucketUs)

  /** Keyless range join: every `points` row paired with every
    * `intervals` row whose `[startCol, endCol]` contains `tsCol` — no
    * entity key, the calendar/campaign-window case. Same bucketized
    * plan as [[rangeJoin]] with the time bucket as the ONLY join key:
    * the shuffle spreads across time instead of piling onto a
    * nonexistent entity, and since a global interval relation is
    * normally dimension-sized, AQE broadcasts it and the shuffle
    * disappears entirely. Without this shape Spark plans the pure
    * inequality join as BroadcastNestedLoopJoin — points × intervals
    * pairs. Replication is still `span/bucketUs + 1` per interval, so
    * pick `bucketUs` near the typical interval span.
    */
  def rangeJoinGlobal(points: DataFrame, intervals: DataFrame,
      tsCol: String = "ts_us", startCol: String = "start_us",
      endCol: String = "end_us",
      bucketUs: Long = 3600L * 1000000): DataFrame =
    rangeJoinOn(points, intervals, Nil, tsCol, startCol, endCol, bucketUs)

  /** Shared bucketized-containment core: join keys = `keys` + the
    * derived time bucket (monotone-bucket argument in [[rangeJoin]]'s
    * doc; exactly-once pairing holds for any `keys`, including none).
    */
  def rangeJoinOn(points: DataFrame, intervals: DataFrame,
      keys: Seq[String], tsCol: String, startCol: String, endCol: String,
      bucketUs: Long): DataFrame = {
    require(bucketUs > 0)
    val iv = intervals.withColumn("__bucket",
      explode(sequence(expr(s"$startCol DIV $bucketUs"),
        expr(s"$endCol DIV $bucketUs"))))
    val pt = points.withColumn("__bucket", expr(s"$tsCol DIV $bucketUs"))
    pt.join(iv, keys :+ "__bucket")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__bucket")
  }

  /** Gap sessionization: per `keyCol`, events ordered by (`tsCol`,
    * `idCol`) start a new session when the gap from the previous event
    * exceeds `gapUs`. Adds `session_seq` (1-based per key) and
    * `event_seq` (1-based within session). Pure integer window
    * arithmetic over ONE key-partitioned sort — deterministic in any
    * engine, parallelism = key count.
    */
  def sessionize(events: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts_us", idCol: String = "event_id",
      gapUs: Long = 30L * 60 * 1000000): DataFrame = {
    val wOrd = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("__prev", lag(col(tsCol), 1).over(wOrd))
      .withColumn("__start",
        when(col("__prev").isNull || col(tsCol) - col("__prev") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("__start")).over(wRun))
      .withColumn("event_seq", row_number().over(
        Window.partitionBy(col(keyCol), col("session_seq"))
          .orderBy(col(tsCol), col(idCol))).cast("long"))
      .drop("__prev", "__start")
  }

  /** Per-session rollup of [[sessionize]]: bounds, size, duration.
    * The session window runs inside the same key partitioning — at
    * scale the sessionize sort and this agg share one shuffle.
    */
  def sessions(events: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts_us", idCol: String = "event_id",
      gapUs: Long = 30L * 60 * 1000000): DataFrame =
    sessionize(events, keyCol, tsCol, idCol, gapUs)
      .groupBy(col(keyCol), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("start_us"),
        max(col(tsCol)).as("end_us"))
      .withColumn("duration_us", col("end_us") - col("start_us"))

  /** Per-session ordered action paths — the clickstream-to-sequence
    * assembly that turns an event log into training trajectories
    * (conversation threading for SFT data is the same shape): each
    * [[sessionize]] session becomes ONE row carrying its first
    * `maxSteps` actions joined in (ts, id) order, plus the uncapped
    * event count and start time.
    *
    * Bounded-state discipline: the path aggregates only rows with
    * `event_seq ≤ maxSteps` — collect_list over a raw session would
    * let one runaway key blow an executor at 100 TB; the cap is
    * applied BEFORE the collect, so per-group state is ≤ maxSteps
    * structs no matter how hot the key. Stats and path are two aggs
    * over the same (key, session) grouping joined back together —
    * the sessionize sort, both aggs, and the join all share one key
    * exchange. Ordering inside the path is array_sort over
    * (ts, id, action) structs: (ts, id) is unique, so the sort is
    * total and the joined string is engine-deterministic.
    */
  def threadPaths(events: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts_us", idCol: String = "event_id",
      actionCol: String = "event_type",
      gapUs: Long = 30L * 60 * 1000000, maxSteps: Int = 20): DataFrame = {
    val s = sessionize(events, keyCol, tsCol, idCol, gapUs)
    val stats = s.groupBy(col(keyCol), col("session_seq"))
      .agg(count(lit(1)).as("n_events"), min(col(tsCol)).as("start_us"))
    val paths = s.filter(col("event_seq") <= maxSteps)
      .groupBy(col(keyCol), col("session_seq"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col(tsCol), col(idCol),
          col(actionCol).as("a")))),
        x => x.getField("a")), ">").as("path"))
    stats.join(paths, Seq(keyCol, "session_seq"))
  }

  private val WeekUs = 7L * 86400 * 1000000

  /** FLOOR-division day bucket of a µs timestamp — engine-identical to
    * the DuckDB oracles' `//` for NEGATIVE (pre-epoch) timestamps too,
    * where Spark's DIV truncates toward zero and would both bucket
    * ts_us = −1 and +1 into day 0 and disagree with the oracle
    * (ADVICE r12). For ts_us ≥ 0 the correction term is 0, so every
    * existing oracle hash is unchanged.
    */
  private def dayBucket(tsCol: String): org.apache.spark.sql.Column =
    expr(s"$tsCol DIV 86400000000" +
      s" - (CASE WHEN $tsCol % 86400000000 < 0 THEN 1 ELSE 0 END)")

  /** Rolling event-rate features: for every event, the count and value
    * sum of the SAME user's events in the trailing `windowUs` (event
    * included) — the per-entity rate/velocity feature every abuse or
    * engagement model starts with. A time-RANGE frame over the µs
    * BIGINT (not ROWS): gaps and bursts are handled by the frame
    * bound, not row offsets. One key-partitioned sort; the running
    * frame is O(1) memory per key (Spark maintains a sliding
    * aggregate, never materializing the frame). The value is quantized
    * ONCE to integer cents (`floor(v·100 + 0.5)` — one exact IEEE op,
    * the repo's fixed-point parity recipe, [[graft.ext.Similarity]])
    * and the window sums BIGINTs: associative, so no fold order,
    * engine version, or decimal-rounding mode can move the result —
    * the per-row DOUBLE→DECIMAL cast this replaces rounded ties
    * engine-dependently and failed the r5 driver hash.
    */
  def rollingCounts(events: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts_us", valueCol: String = "value",
      windowUs: Long = 3600L * 1000000): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
      .rangeBetween(-windowUs, 0)
    val cents = floor(col(valueCol).cast("double") * 100 + 0.5).cast("long")
    // both aggregates in ONE projection → a single Window node sharing
    // the frame scan (two withColumns would stack two Window passes)
    events.select(col("*"),
      count(lit(1)).over(w).as("n_trailing"),
      sum(cents).over(w).as("sum_trailing_cents"))
  }

  /** Per-key inter-arrival gap statistics — the burstiness features
    * (min/median/max/mean gap between consecutive events) abuse and
    * engagement models consume next to [[rollingCounts]]. Gaps are
    * BIGINT µs differences over one (key, ts, id)-sorted pass; the
    * median is EXACT via rank selection inside the same key
    * partitioning (per-key gap counts are bounded by per-key event
    * counts — there is no global sort anywhere), lower-median on even
    * counts so selection is integer-deterministic; the mean is one
    * truncating integer division. Same-ts events contribute gap 0.
    * Two sorts (arrival order, then gap order) share ONE key exchange.
    */
  def interArrival(events: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts_us", idCol: String = "event_id"): DataFrame = {
    val wOrd = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val gaps = events
      .withColumn("__gap", col(tsCol) - lag(col(tsCol), 1).over(wOrd))
      .filter(col("__gap").isNotNull)
    val wGap = Window.partitionBy(col(keyCol))
      .orderBy(col("__gap"), col(idCol))
    gaps
      .withColumn("__rn", row_number().over(wGap))
      .withColumn("__n",
        count(lit(1)).over(Window.partitionBy(col(keyCol))))
      .groupBy(col(keyCol))
      .agg(max(col("__n")).cast("long").as("n_gaps"),
        min(col("__gap")).cast("long").as("min_gap_us"),
        max(when(col("__rn") === expr("(__n + 1) DIV 2"), col("__gap")))
          .cast("long").as("median_gap_us"),
        max(col("__gap")).cast("long").as("max_gap_us"),
        expr("sum(__gap) DIV count(1)").as("mean_gap_us"))
  }

  /** Cohort retention: users grouped by first-seen week, counted as
    * retained in every later week they are active. Epoch weeks are
    * integer floor-divisions of µs — exact in any engine. Shape:
    * (user, week) distinct FIRST — map-side combined, so raw events
    * collapse before anything is sorted — then the cohort week as a
    * min window over the distinct relation, then the tiny (cohort,
    * offset) agg. No self-join — the classic formulation joins a
    * first-seen relation back to activity; the window form does it in
    * the distinct relation's own exchange.
    */
  def retention(events: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts_us"): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
    val wk = floor(col(tsCol) / WeekUs).cast("long")
    events
      .select(col(keyCol), wk.as("week")).distinct()
      .withColumn("cohort_week", min(col("week")).over(w))
      .select(col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Ordered funnel: for each user, the earliest completion of
    * `steps` in sequence — t₁ = first step-1 event, tₖ = first step-k
    * event at or after tₖ₋₁ — plus a conversion flag requiring the
    * whole chain inside `windowUs`. One shuffle: every tₖ is a
    * conditional-min window over the SAME user partitioning (k chained
    * Window projections, one Exchange; the sort is reused), then one
    * row per user via the same-keyed agg. The naive per-step
    * aggregate-and-self-join plan shuffles k + 1 times.
    */
  def funnel(events: DataFrame, steps: Seq[String],
      keyCol: String = "user_id", tsCol: String = "ts_us",
      typeCol: String = "event_type",
      windowUs: Long = 7L * 86400 * 1000000): DataFrame = {
    require(steps.nonEmpty)
    val w = Window.partitionBy(col(keyCol))
    val stepped = steps.zipWithIndex.foldLeft(events) { case (df, (s, i)) =>
      val cond =
        if (i == 0) when(col(typeCol) === s, col(tsCol))
        else when(col(typeCol) === s &&
          col(tsCol) >= col(s"t${i - 1}"), col(tsCol))
      df.withColumn(s"t$i", min(cond).over(w))
    }
    val tCols = steps.indices.map(i => s"t$i")
    stepped
      .groupBy(col(keyCol))
      .agg(min(col(tCols.head)).as(tCols.head),
        tCols.tail.map(c => min(col(c)).as(c)): _*)
      .withColumn("converted",
        col(tCols.last).isNotNull &&
          col(tCols.last) - col(tCols.head) <= windowUs)
  }

  /** Skew-salted two-stage aggregation: count + integer-cents sum per
    * `keyCol`, computed as groupBy(key, salt) partials then a final
    * groupBy(key) merge. Semantically IDENTICAL to the plain
    * aggregation (count and BIGINT sum are associative-commutative;
    * the oracle is the plain GROUP BY) — the shape exists for the
    * skew case the plain plan cannot survive: a key holding 30% of
    * 100 TB pins its entire partial-agg output to one reducer, while
    * the salted first stage spreads it over `salts` reducers and the
    * second stage merges `salts` rows per key, not billions. Salt =
    * `pmod(hash(idCol), salts)` — deterministic, no RNG. (AQE skew
    * handling splits skewed JOIN partitions but does NOT split a
    * skewed aggregation key; this is the documented recipe for aggs.)
    */
  def saltedAgg(events: DataFrame, keyCol: String = "event_type",
      valueCol: String = "value", idCol: String = "event_id",
      salts: Int = 16): DataFrame = {
    val cents = floor(col(valueCol).cast("double") * 100 + 0.5).cast("long")
    events
      .groupBy(col(keyCol), pmod(hash(col(idCol)), lit(salts)).as("__salt"))
      .agg(count(lit(1)).as("__n"), sum(cents).as("__cents"))
      .groupBy(col(keyCol))
      .agg(sum(col("__n")).as("n_events"),
        sum(col("__cents")).as("sum_cents"))
  }

  /** First-order action-transition matrix over [[sessionize]]
    * sessions — the Markov-chain summary of behavioral sequences
    * (next-action prediction baselines, UX-funnel discovery, and the
    * sanity screen run on [[threadPaths]]' trajectories before they
    * become training data): for every consecutive in-session pair,
    * count(from → to) and the row-normalized transition probability
    * in e6 fixed point (`cnt·1e6 DIV from_total` — truncating
    * positive DIV, engine-exact). Session boundaries do NOT produce
    * transitions (the lag restarts per (key, session)).
    *
    * Shape: the lag window rides the sessionize exchange (same
    * (key, ts, id) partitioning+ordering), then ONE action-pair agg
    * over the vocabulary-bounded pair space and a broadcast-sized
    * row-total join.
    */
  def actionTransitions(events: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts_us", idCol: String = "event_id",
      actionCol: String = "event_type",
      gapUs: Long = 30L * 60 * 1000000): DataFrame = {
    val s = sessionize(events, keyCol, tsCol, idCol, gapUs)
    val w = Window.partitionBy(col(keyCol), col("session_seq"))
      .orderBy(col(tsCol), col(idCol))
    val pairs = s
      .withColumn("__prev", lag(col(actionCol), 1).over(w))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("from_action"),
        col(actionCol).as("to_action"))
      .agg(count(lit(1)).as("cnt"))
    val totals = pairs.groupBy("from_action").agg(sum(col("cnt")).as("tot"))
    pairs.join(broadcast(totals), "from_action")
      .select(col("from_action"), col("to_action"), col("cnt"),
        expr("cnt * 1000000 DIV tot").as("p_e6"))
  }

  /** Salted dimension join — the hot-KEY JOIN companion to
    * [[saltedAgg]]'s hot-key aggregation: a shuffle join hashes every
    * row of a key to ONE reducer, so a fact table where one key
    * dominates (the celebrity user, the null-ish default) pins a
    * single task while the cluster idles — and AQE's skew splitting
    * cannot always help, because every split of the hot fact
    * partition still needs the matching dim rows. Salting solves it
    * structurally: the FACT side gets a deterministic salt in
    * [0, salts), the DIM side is replicated once per salt value
    * (explode of a literal sequence — dims are small; replication is
    * the price of spreading), and the join key becomes (key, salt),
    * fanning the hot key across `salts` reducers. Dropping the salt
    * afterwards restores exactly the unsalted join's rows, which is
    * why the oracle is the plain join SQL — the salt is a physical
    * rewrite, invisible in the result.
    */
  def saltedDimJoin(fact: DataFrame, dim: DataFrame, key: String,
      idCol: String = "event_id", salts: Int = 8): DataFrame = {
    val sf = fact.withColumn("__salt",
      pmod(hash(col(idCol)), lit(salts)))
    val sd = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    // pin the shuffle join: a broadcast dim would make the salt moot
    // (and hide the property at gate scale)
    sf.hint("merge").join(sd, Seq(key, "__salt")).drop("__salt")
  }

  /** Join-key skew profile — the DIAGNOSIS that chooses
    * [[saltedAgg]]/[[saltedDimJoin]]'s salt factor before a 100 TB
    * shuffle is attempted: per-key row counts, each hot key's share of
    * the table in permille, and the per-key salt recommendation
    * `ceil(n_rows / mean-key-load)` (the number of buckets that
    * spreads the key back to the average reducer load; 1 for
    * non-skewed keys). All-BIGINT arithmetic — ceil division as
    * `(a·k + total − 1) DIV total` on nonnegative terms, so any
    * engine reproduces the recommendation bit-for-bit.
    *
    * Shape: one key-keyed count agg (map-side partials absorb the
    * skew the profile is measuring — a count per key is salts-proof
    * by itself), one 2-column global agg broadcast back via
    * crossJoin, TakeOrderedAndProject for the top-K hot list.
    */
  def keySkewProfile(facts: DataFrame, keyCol: String,
      topK: Int = 10): DataFrame = {
    // key-cardinality-bounded and feeding TWO consumers (the totals
    // and the join) — eager localCheckpoint so the corpus-sized count
    // agg runs once (the collocations discipline; Spark has no subtree
    // reuse). localCheckpoint, not persist: the returned DataFrame
    // outlives this call, so an explicit unpersist has nowhere to go —
    // checkpoint storage is GC-released when the relation drops
    // (ADVICE r9: repeated calls must not accumulate cached relations).
    val counts = facts.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n_rows")).localCheckpoint(true)
    val tot = counts.agg(sum(col("n_rows")).as("total"),
      count(lit(1)).as("n_keys"))
    counts.crossJoin(broadcast(tot))
      .select(col("key"), col("n_rows"),
        expr("n_rows * 1000 DIV total").as("share_permille"),
        expr("greatest(CAST(1 AS BIGINT), " +
          "(n_rows * n_keys + total - 1) DIV total)").as("salt_factor"))
      .orderBy(col("n_rows").desc, col("key"))
      .limit(topK)
  }

  /** Recency-weighted (time-decay) sampling audit — the freshness-mix
    * recipe: keep-rate HALVES per 30-day age bucket (floored at 31‰)
    * relative to the corpus's max event time, and a row is kept iff
    * its portable id-hash mod 1000 clears the bucket's rate. Hash
    * thresholding makes the sample reshuffle-proof and MONOTONE: a
    * bucket whose rate rises keeps a superset of its previous sample
    * (the mixSample discipline applied to the time axis).
    *
    * Scale shape: max(ts) is a 1-row broadcast scalar; the decision
    * is pure in-row integer arithmetic; the output is the per-bucket
    * audit aggregate (buckets × 1 rows), so nothing data-sized ever
    * exchanges except the one bucket-keyed count.
    */
  def timeDecaySample(events: DataFrame, idCol: String = "event_id",
      tsUsCol: String = "ts_us", bucketUs: Long = 2592000000000L): DataFrame = {
    val mx = events.agg(max(col(tsUsCol)).as("__mx"))
    events.crossJoin(broadcast(mx))
      .withColumn("age_bucket", expr(s"(__mx - $tsUsCol) DIV $bucketUs"))
      .withColumn("__kp", expr(
        "greatest(1000 DIV (1 << least(CAST(age_bucket AS INT), 5)), 31)"))
      .withColumn("__keep",
        pmod(Dedup.portableHash(col(idCol).cast("string")), lit(1000)) < col("__kp"))
      .groupBy("age_bucket")
      .agg(max(col("__kp")).cast("long").as("keep_permille"),
        count(lit(1)).as("n_events"),
        sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"))
  }

  /** SCD2 interval build — event-sourced dimension versioning: from a
    * change stream (key, ts, attribute) derive one validity interval
    * per attribute VERSION: consecutive duplicate values collapse,
    * `valid_from` = the change's timestamp, `valid_to` = the next
    * change's (NULL while current), `version` = 1-based change ordinal.
    * The point-in-time lookup against the result is [[asofJoin]] — the
    * pair is the warehouse dimension-versioning pattern.
    *
    * Shape: ONE key exchange shared by both windows — the lag
    * (change detection) and the lead (interval close) use the same
    * (key, ts, id) partitioning+ordering, and the filter between them
    * preserves both, so Catalyst plans a single Exchange+Sort (the
    * funnel precedent). All values BIGINT µs; ties on ts break on the
    * unique `idCol`, so versions are total-ordered in any engine.
    */
  def scd2(events: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts_us", attrCol: String = "event_type",
      idCol: String = "event_id"): DataFrame = {
    val wOrd = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    events
      .withColumn("__prev", lag(col(attrCol), 1).over(wOrd))
      .filter(col("__prev").isNull || col("__prev") =!= col(attrCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(wOrd))
      .withColumn("version", row_number().over(wOrd).cast("long"))
      .select(col(keyCol), col(attrCol), col(tsCol).as("valid_from"),
        col("valid_to"), col("version"))
  }

  /** Per-key rate anomalies: z-score of each (key, time-bucket) event
    * count against that key's own bucket-count distribution — the
    * burst/outage detector over an event stream (monitoring twin of
    * [[interArrival]]; buckets are the OBSERVED ones — a key's silent
    * buckets aren't rows, which biases toward activity, the standard
    * operational choice).
    *
    * Shapes: one (key, bucket) count agg, one key-level moment agg,
    * one key-keyed join back — everything keyed, nothing global.
    * Parity: with k buckets, Σn and Σn² exact BIGINTs,
    * z = (n·k − Σn) / √(k·Σn² − (Σn)²) — an integer numerator over
    * the square root of an exact integer: one sqrt + one division,
    * both correctly rounded (the [[Similarity.centroidOutliers]] IEEE
    * chain), quantized once to e6. Constant-rate keys (variance 0)
    * score 0. `is_anomaly` = |z| ≥ 3.
    */
  def rateAnomalies(events: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts_us", bucketUs: Long = 600000000L,
      zE6Threshold: Long = 3000000L): DataFrame = {
    val buckets = events
      .select(col(keyCol), expr(s"$tsCol DIV $bucketUs").as("bucket"))
      .groupBy(col(keyCol), col("bucket"))
      .agg(count(lit(1)).as("n_events"))
    val moments = buckets.groupBy(col(keyCol))
      .agg(count(lit(1)).as("k"), sum(col("n_events")).as("s1"),
        sum(col("n_events") * col("n_events")).as("s2"))
    buckets.join(moments, keyCol)
      .withColumn("__var_num", col("k") * col("s2") - col("s1") * col("s1"))
      .withColumn("z_e6",
        when(col("__var_num") <= 0, lit(0L))
          .otherwise(floor(
            (col("n_events") * col("k") - col("s1")).cast("double") /
              sqrt(col("__var_num").cast("double")) * lit(1e6) + lit(0.5))
            .cast("long")))
      .select(col(keyCol), (col("bucket") * bucketUs).as("bucket_start_us"),
        col("n_events"), col("z_e6"),
        (abs(col("z_e6")) >= zE6Threshold).as("is_anomaly"))
  }

  /** Event-time lateness profile — the measurement that SIZES a
    * streaming watermark (`withWatermark` in the x_stream_* twins is a
    * promise that events later than the bound may drop; this operator
    * reports what the bound must be). Arrival order is the ingest
    * sequence (`idCol`); an event's lateness is how far its event time
    * lags the latest event time already seen for its key:
    * `max(0, max_{id' < id}(ts) − ts)` — 0 for in-order arrivals.
    *
    * Per key: event count, late count, max and total lateness (all
    * exact BIGINT µs — `max_late_us` IS the per-key safe watermark).
    * ONE key exchange shared by the window and the aggregation.
    */
  def latenessProfile(events: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts_us", idCol: String = "event_id"): DataFrame = {
    val wArr = Window.partitionBy(col(keyCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .withColumn("__late",
        greatest(coalesce(max(col(tsCol)).over(wArr) - col(tsCol), lit(0L)),
          lit(0L)))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("__late") > 0, 1L).otherwise(0L)).as("n_late"),
        max(col("__late")).as("max_late_us"),
        sum(col("__late")).as("sum_late_us"))
  }

  /** Lag-k autocorrelation of the daily ingest-volume series — the
    * TEMPORAL drift monitor beside the three distributional ones
    * (KL / χ² / KS): a strong lag-7 peak is weekly seasonality a
    * time-based train/val split must respect; a slowly-decaying
    * positive tail is volume drift that invalidates "shuffle by day"
    * assumptions; white noise reads ≈ 0 everywhere.
    *
    * Estimator: the standard sample ACF — r_k = Σ_{t≤n−k}(x_t−x̄)
    * (x_{t+k}−x̄) / Σ_t(x_t−x̄)² over the day-bucketed count series
    * (µs DIV 86400e6; row-indexed, so a missing day contracts the
    * series rather than contributing a synthetic zero). Multiplying
    * both sums through by n² keeps every term INTEGER-EXACT
    * (dd_t = n·x_t − S ∈ BIGINT); the only float step is the final
    * num/den divide of two exact integers (the cosE6 chain — one
    * correctly-rounded IEEE op + floor(·1e6 + 0.5)), so ac_e6 is
    * engine-identical. BIGINT bound: Σdd² ≤ days·(days·max_daily)² —
    * safe past 10⁸ events/day at a 10-year series; beyond that the
    * products move to DECIMAL(38,0) (the ks_drift precedent).
    *
    * Scale shape: ONE map-side-combinable corpus aggregation collapses
    * events to the day histogram (bounded by calendar days, not
    * corpus size; checkpointed for its two consumers); everything
    * after — row_number, the lag self-join, the moment sums — runs on
    * that bounded relation with the 1-row totals broadcast.
    */
  def dailyAutocorr(events: DataFrame, maxLag: Int = 7,
      tsCol: String = "ts_us"): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val spark = events.sparkSession
    val daily = events
      .groupBy(dayBucket(tsCol).as("day"))
      .agg(count(lit(1)).as("x"))
      .localCheckpoint(true)
    val ser = daily // bounded: one row per day
      .withColumn("rn", row_number().over(Window.orderBy("day")).cast("long"))
    val tot = ser.agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
    val dev = ser.crossJoin(broadcast(tot))
      .select(col("rn"), (col("n") * col("x") - col("s")).as("dd"))
    val den = dev.agg(sum(col("dd") * col("dd")).as("den"))
    val lags = spark.range(1, maxLag + 1L).select(col("id").as("lag"))
    dev.crossJoin(broadcast(lags))
      .join(dev.select(col("rn").as("rnb"), col("dd").as("ddb")),
        col("rnb") === col("rn") + col("lag"))
      .groupBy("lag")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("dd") * col("ddb")).as("num"))
      .crossJoin(broadcast(den))
      .select(col("lag"), col("n_pairs"), col("num"), col("den"),
        when(col("den") <= 0, lit(0L)).otherwise(
          floor(col("num").cast("double") / col("den").cast("double") *
            lit(1e6) + lit(0.5)).cast("long")).as("ac_e6"))
  }

  /** CUSUM change-point scan over the daily ingest-volume series
    * (Page 1954) — the WHEN companion to [[dailyAutocorr]]'s "is
    * there structure": a level shift in daily volume (a source went
    * dark, a scraper doubled) shows as a ramp in the one-sided
    * cumulative sums, and the ramp's peak marks the most likely
    * change day. Zero-slack two-sided form over mean-centered counts.
    *
    * Integer contract: deviations are the n²-scaling trick
    * (dd_t = n·x_t − S, exact BIGINT); the max(0, ·) recurrence is
    * computed by its prefix closed form — S⁺_t = P_t − min(0,
    * min_{j≤t} P_j), S⁻_t = max(0, max_{j≤t} P_j) − P_t, with P the
    * running sum of dd — so the whole scan is window algebra on the
    * BOUNDED day histogram, no sequential fold, no float anywhere.
    * The flagged peak is the argmax of max(S⁺, S⁻), earliest day on
    * ties.
    *
    * Scale shape: ONE map-side-combinable corpus aggregation to the
    * day histogram (checkpointed); windows, the peak scalars and the
    * flag join all run on the bounded relation with broadcast 1-row
    * sides.
    */
  def cusumChangePoint(events: DataFrame,
      tsCol: String = "ts_us"): DataFrame =
    cusumFromDaily(events
      .groupBy(dayBucket(tsCol).as("day"))
      .agg(count(lit(1)).as("x"))
      .localCheckpoint(true))

  /** The CUSUM algebra half of [[cusumChangePoint]], split out so the
    * streaming twin can apply the IDENTICAL window algebra to a
    * stream-maintained day histogram (`day`, `x` count columns —
    * bounded by calendar days). Same output contract.
    */
  def cusumFromDaily(daily: DataFrame): DataFrame = {
    val tot = daily.agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
    val wCum = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dev = daily.crossJoin(broadcast(tot)) // bounded: one row per day
      .withColumn("dd", col("n") * col("x") - col("s"))
      .withColumn("p", sum(col("dd")).over(wCum))
      .withColumn("cusum_pos",
        col("p") - least(min(col("p")).over(wCum), lit(0L)))
      .withColumn("cusum_neg",
        greatest(max(col("p")).over(wCum), lit(0L)) - col("p"))
      .withColumn("m", greatest(col("cusum_pos"), col("cusum_neg")))
      .localCheckpoint(true)
    val mx = dev.agg(max(col("m")).as("mx"))
    val pk = dev.crossJoin(broadcast(mx)).filter(col("m") === col("mx"))
      .agg(min(col("day")).as("peak_day"))
    dev.crossJoin(broadcast(pk))
      .select(col("day"), col("x"), col("dd"),
        col("cusum_pos"), col("cusum_neg"),
        (col("day") === col("peak_day")).as("is_peak"))
  }

  /** Two-state burst detection over the daily event-count series
    * (Kleinberg 2002, "Bursty and hierarchical structure in streams",
    * the discrete/batched two-state automaton) — the third temporal
    * monitor: autocorr says whether the series has structure, CUSUM
    * says when the level shifted once, this one LABELS every bursty
    * day (scraper storms, replayed feeds, event-loop bugs) even when
    * bursts repeat. State 0 emits at the base rate λ₀ = S/n, state 1
    * at λ₁ = s·λ₀; day cost is the Poisson negative log-likelihood
    * λᵢ − x_t·ln λᵢ (per-day constants dropped — they cancel across
    * states); entering the burst state costs γ·ln n. Minimum-cost
    * state sequence by Viterbi.
    *
    * Parity discipline: the four cost constants (λᵢ·1e9, ln λᵢ·1e9,
    * γ·ln n·1e9) quantize ONCE to nano-nat BIGINTs (the kn_lm/zipf
    * convention — the only transcendental is a fixed ln of a ratio of
    * exact integers, evaluated identically in both engines); every
    * Viterbi cell is then pure BIGINT arithmetic with a ≤-prefers-
    * state-0 tie rule, so the state sequence is engine-identical. The
    * oracle unrolls the DP as a recursive CTE carrying the two
    * frontier costs AND their backtraces as strings.
    *
    * Scale shape: ONE map-side-combinable corpus aggregation to the
    * day histogram; the Viterbi runs driver-side on the COLLECTED
    * series (bounded by calendar days — the codebook discipline, same
    * as mmrRerank's pool), O(n) cells, two states. BIGINT bound:
    * x_t·ln λ in nano-nats is safe past 10⁸ events/day; beyond that
    * re-quantize the constants to e6.
    */
  def burstDetect(events: DataFrame, s: Long = 3,
      gammaMilli: Long = 1000, tsCol: String = "ts_us"): DataFrame = {
    require(s >= 2, s"burst multiplier s must be >= 2, got $s")
    require(gammaMilli >= 0, s"gammaMilli must be >= 0, got $gammaMilli")
    val spark = events.sparkSession
    import spark.implicits._
    val daily = events
      .groupBy(dayBucket(tsCol).as("day"))
      .agg(count(lit(1)).as("x"))
      .orderBy("day")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    require(daily.nonEmpty, "burstDetect needs at least one event")
    val n = daily.length.toLong
    val sum = daily.map(_._2).sum
    val lam0 = sum.toDouble / n.toDouble
    val lam1 = s.toDouble * lam0
    def q9(v: Double): Long = math.floor(v * 1e9 + 0.5).toLong
    val c0base = q9(lam0); val c1base = q9(lam1)
    val ln0 = q9(math.log(lam0)); val ln1 = q9(math.log(lam1))
    val gam = q9(gammaMilli.toDouble / 1000.0 * math.log(n.toDouble))
    def dayCost(x: Long, base: Long, ln: Long): Long = base - x * ln
    // Viterbi: c0/c1 = min cost ending in state 0/1; sequences start
    // in state 0 (Kleinberg), so state 1 pays gam at entry
    var c0 = dayCost(daily(0)._2, c0base, ln0)
    var c1 = gam + dayCost(daily(0)._2, c1base, ln1)
    var p0 = Vector(0); var p1 = Vector(1)
    for (t <- 1 until daily.length) {
      val (x0, x1) = (dayCost(daily(t)._2, c0base, ln0),
        dayCost(daily(t)._2, c1base, ln1))
      val (n0, q0) =
        if (c0 <= c1) (c0 + x0, p0 :+ 0) else (c1 + x0, p1 :+ 0)
      val (n1, q1) =
        if (c0 + gam <= c1) (c0 + gam + x1, p0 :+ 1)
        else (c1 + x1, p1 :+ 1)
      c0 = n0; c1 = n1; p0 = q0; p1 = q1
    }
    val states = if (c0 <= c1) p0 else p1
    daily.zip(states).zipWithIndex.map { case (((day, x), st), i) =>
      val prev = if (i == 0) 0 else states(i - 1)
      (day, x, st.toLong, st == 1 && prev == 0)
    }.toSeq.toDF("day", "x", "burst_state", "is_burst_start")
  }
}
