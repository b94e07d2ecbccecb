package graft

import graft.core.Schema
import graft.ext.{Dedup, Events, Pipeline, Quality, Similarity, TextAnalysis}
import graft.index.IndexJob
import org.apache.spark.sql.functions._
/** Event-analytics family: as-of join, sessionization, JSON props, rolling rates, inter-arrival stats, retention, funnel.
  * Oracle-checked via CORRECTNESS_r* (see SURVEY §7.5).
  */
private[graft] object ExtEventQueries {
  import ExtShared._

  val defs: Seq[QueryDef] = Seq(

    // As-of join: every click matched to the user's most recent view at
    // or before it. Union+window shape — one shuffle on user_id, zero
    // joins, no pair explosion; the oracle is an independent LATERAL
    // formulation, so parity proves semantics, not the algorithm.
    QueryDef("x_evt_asof",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        val ev = spark.table("events")
          .withColumn("ts_us", unix_micros(col("ts")))
        val clicks = ev.filter(col("event_type") === "click")
          .select("event_id", "user_id", "ts_us", "value")
        val views = ev.filter(col("event_type") === "view")
          .select("event_id", "user_id", "ts_us", "value")
        Events.asofJoin(clicks, views).orderBy("event_id")
      },
      defsAsofOracle),

    // Last-touch conversion attribution: every purchase credits the
    // user's most recent click/view at-or-before it within a 7-day
    // lookback (as-of tie rule: later touch id wins); purchases with
    // no touch in window land in an explicit 'unattributed' bucket.
    // One user-keyed exchange (the as-of join's) + a channels-sized
    // rollup; revenue is exact DECIMAL, gap mean is BIGINT DIV.
    QueryDef("x_evt_attribution",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        Events.lastTouchAttribution(
            spark.table("events").withColumn("ts_us", unix_micros(col("ts"))),
            touchTypes = Seq("click", "view"), conversionType = "purchase",
            windowUs = 7L * 86400 * 1000000)
          .orderBy("channel")
      },
      Some(
        """WITH p AS (
          |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
          |  FROM events WHERE event_type = 'purchase'
          |),
          |t AS (
          |  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
          |         event_type AS channel
          |  FROM events WHERE event_type IN ('click', 'view')
          |),
          |lt AS (
          |  SELECT p.event_id, p.value, t.channel,
          |         p.ts_us - t.ts_us AS gap,
          |         row_number() OVER (PARTITION BY p.event_id
          |           ORDER BY t.ts_us DESC, t.event_id DESC) AS rn
          |  FROM p JOIN t ON t.user_id = p.user_id AND t.ts_us <= p.ts_us
          |),
          |att AS (
          |  SELECT p.event_id, p.value,
          |         CASE WHEN l.event_id IS NOT NULL AND l.gap <= 604800000000
          |              THEN l.channel ELSE 'unattributed' END AS channel,
          |         CASE WHEN l.event_id IS NOT NULL AND l.gap <= 604800000000
          |              THEN l.gap ELSE 0 END AS gap
          |  FROM p LEFT JOIN (SELECT * FROM lt WHERE rn = 1) l
          |    ON l.event_id = p.event_id
          |)
          |SELECT channel,
          |       CAST(count(*) AS BIGINT) AS n_conversions,
          |       CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS STRING) AS revenue,
          |       CAST(sum(gap) // count(*) AS BIGINT) AS avg_gap_us
          |FROM att
          |GROUP BY channel
          |ORDER BY channel""".stripMargin)),

    // Recency-weighted sampling audit: keep-rate halves per age
    // bucket (floor 31‰) off the corpus max event time; keeps are
    // hash-thresholded (reshuffle-proof, monotone under rate raises —
    // the mixSample discipline on the time axis). In-row decision,
    // one bucket-keyed agg.
    QueryDef("x_evt_decay",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        // the fixture spans ~30 days; 3-day buckets give a 10-step curve
        Events.timeDecaySample(spark.table("events")
            .withColumn("ts_us", unix_micros(col("ts"))), bucketUs = 259200000000L)
          .orderBy("age_bucket")
      },
      Some(
        s"""WITH e AS (SELECT event_id, epoch_us(ts) AS ts_us FROM events),
           |mx AS (SELECT max(ts_us) AS m FROM e),
           |b AS (
           |  SELECT event_id,
           |         (m - ts_us) // 259200000000 AS age_bucket,
           |         greatest(1000 // (1 << least(CAST((m - ts_us) // 259200000000
           |                                          AS INTEGER), 5)), 31) AS kp
           |  FROM e, mx
           |)
           |SELECT age_bucket, CAST(max(kp) AS BIGINT) AS keep_permille,
           |       CAST(count(*) AS BIGINT) AS n_events,
           |       CAST(sum(CASE WHEN ${duckHash("CAST(event_id AS VARCHAR)")} % 1000 < kp
           |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
           |FROM b GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Per-user top-3 events by value via the TopKDesc bounded
    // aggregate — the leaderboard shape that motivates the aggregate
    // over a window: map-side k-item heaps cut each (user, partition)
    // to ≤ 3 rows before the ONE exchange, the reducer merges heaps,
    // and a whale user costs O(partitions·k) reduce work instead of a
    // full-group sort. Oracle shared with the streaming twin
    // x_stream_topk (three implementations, one contract).
    QueryDef("x_evt_topk",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        graft.functions.TopKFunctions.register(spark)
        spark.table("events")
          .groupBy("user_id")
          .agg(graft.functions.TopKFunctions.topk_desc(
            col("value"), lpad(col("event_id").cast("string"), 20, "0"),
            struct(col("event_id"), col("value")), 3).as("__top"))
          .select(col("user_id"), posexplode(col("__top")).as(Seq("__r", "__s")))
          .select(col("user_id"), (col("__r") + 1).cast("long").as("topk_rank"),
            col("__s.event_id").as("event_id"), col("__s.value").as("value"))
          .orderBy("user_id", "topk_rank")
      },
      defsTopkOracle),

    // Gap sessionization (4 h gap — the corpus' median per-user gap is
    // ~7 h, so sessions are non-degenerate): one key-partitioned sort;
    // integer window arithmetic end to end.
    QueryDef("x_evt_sessions",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        val ev = spark.table("events")
          .withColumn("ts_us", unix_micros(col("ts")))
          .select("event_id", "user_id", "ts_us")
        Events.sessions(ev, gapUs = 4L * 3600 * 1000000)
          .orderBy("user_id", "session_seq")
      },
      defsSessionOracle),

    // Session action paths — the clickstream-to-training-sequence
    // assembly (conversation threading has the same shape): each 4 h
    // session becomes one row with its first-20 actions joined in
    // (ts, id) order plus uncapped stats. The cap is applied BEFORE
    // the collect (event_seq ≤ 20), so per-group state is bounded no
    // matter how hot a key is; stats + path are two aggs on the same
    // grouping sharing the sessionize key exchange.
    QueryDef("x_evt_threads",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        val ev = spark.table("events")
          .withColumn("ts_us", unix_micros(col("ts")))
          .select("event_id", "user_id", "ts_us", "event_type")
        Events.threadPaths(ev, gapUs = 4L * 3600 * 1000000, maxSteps = 20)
          .orderBy("user_id", "session_seq")
      },
      defsThreadsOracle),

    // Bucketized range join: each purchase attached to its containing
    // 4 h-gap session interval. The engine never writes the BETWEEN
    // join — points and intervals meet on integer (user, ts DIV 6h)
    // buckets (intervals exploded to their bucket span) and the exact
    // containment filter runs on the equi-join's survivors; the oracle
    // IS the naive BETWEEN join, so parity proves the bucketed plan
    // computes the textbook semantics.
    QueryDef("x_evt_range_join",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        val ev = spark.table("events")
          .withColumn("ts_us", unix_micros(col("ts")))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts_us")
        val sess = Events.sessions(
          ev.select("event_id", "user_id", "ts_us"),
          gapUs = 4L * 3600 * 1000000)
          .select("user_id", "session_seq", "start_us", "end_us")
        Events.rangeJoin(purchases, sess, bucketUs = 6L * 3600 * 1000000)
          .select(col("event_id"), col("user_id"), col("ts_us"),
            col("session_seq"), col("start_us"), col("end_us"))
          .orderBy("event_id")
      },
      Some(
        """WITH e AS (
          |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type FROM events
          |),
          |s AS (
          |  SELECT user_id, event_id, ts_us,
          |         CASE WHEN lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) IS NULL
          |                OR ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
          |                   > 14400000000
          |              THEN 1 ELSE 0 END AS st
          |  FROM e
          |),
          |g AS (
          |  SELECT user_id, ts_us,
          |         sum(st) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
          |                       ROWS UNBOUNDED PRECEDING) AS session_seq
          |  FROM s
          |),
          |sess AS (
          |  SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
          |         CAST(min(ts_us) AS BIGINT) AS start_us,
          |         CAST(max(ts_us) AS BIGINT) AS end_us
          |  FROM g GROUP BY user_id, session_seq
          |)
          |SELECT p.event_id, p.user_id, CAST(p.ts_us AS BIGINT) AS ts_us,
          |       s.session_seq, s.start_us, s.end_us
          |FROM e p JOIN sess s
          |  ON p.user_id = s.user_id AND p.ts_us BETWEEN s.start_us AND s.end_us
          |WHERE p.event_type = 'purchase'
          |ORDER BY p.event_id""".stripMargin)),

    // Keyless (global-interval) range join: click events attached to
    // every containing "campaign window" — ±30 min around each anchor
    // purchase (users ≡ 0 mod 50), windows overlap and carry no entity
    // key. The only join key is the derived time bucket; the oracle is
    // again the naive BETWEEN join.
    QueryDef("x_evt_range_join_global",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        val ev = spark.table("events")
          .withColumn("ts_us", unix_micros(col("ts")))
        val clicks = ev.filter(col("event_type") === "click")
          .select("event_id", "ts_us")
        val windows = ev
          .filter(col("event_type") === "purchase" &&
            col("user_id") % 50 === 0)
          .select(col("event_id").as("anchor_id"),
            (col("ts_us") - 1800000000L).as("start_us"),
            (col("ts_us") + 1800000000L).as("end_us"))
        Events.rangeJoinGlobal(clicks, windows,
          bucketUs = 3600L * 1000000)
          .select(col("event_id"), col("ts_us"), col("anchor_id"),
            col("start_us"), col("end_us"))
          .orderBy("event_id", "anchor_id")
      },
      Some(
        """WITH e AS (
          |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type FROM events
          |),
          |w AS (
          |  SELECT event_id AS anchor_id,
          |         ts_us - 1800000000 AS start_us,
          |         ts_us + 1800000000 AS end_us
          |  FROM e WHERE event_type = 'purchase' AND user_id % 50 = 0
          |)
          |SELECT p.event_id, CAST(p.ts_us AS BIGINT) AS ts_us, w.anchor_id,
          |       CAST(w.start_us AS BIGINT) AS start_us,
          |       CAST(w.end_us AS BIGINT) AS end_us
          |FROM e p JOIN w
          |  ON p.ts_us BETWEEN w.start_us AND w.end_us
          |WHERE p.event_type = 'click'
          |ORDER BY p.event_id, w.anchor_id""".stripMargin)),

    // Z-ordered layout box query: events written ONCE per scale dir
    // as a Morton-interleaved (user_id, ts_us) parquet layout
    // (ext/Layout), then probed with a 2-D box predicate. Results are
    // layout-INVARIANT — the oracle is the same box filter on the
    // unordered table, so the hash proves the rewrite-free contract;
    // LayoutSpec separately asserts the pruning (file min/max boxes
    // tight on BOTH dimensions). Box bounds derive from the data by
    // integer span fractions, identically on both sides — scale-
    // independent.
    QueryDef("x_layout_zorder_box",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        val zdir = zorderDir(spark, sfDir)
        val b = spark.table("events")
          .withColumn("ts_us", unix_micros(col("ts")))
          .agg(min("user_id"), max("user_id"), min("ts_us"), max("ts_us"))
          .head()
        val (umin, umax, tmin, tmax) =
          (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
        val (u1, u2) = (umin + (umax - umin) * 2 / 10,
          umin + (umax - umin) * 4 / 10)
        val (t1, t2) = (tmin + (tmax - tmin) * 4 / 10,
          tmin + (tmax - tmin) * 6 / 10)
        spark.read.parquet(zdir)
          .filter(col("user_id").between(u1, u2) &&
            col("ts_us").between(t1, t2))
          .orderBy("event_id")
      },
      Some(
        """WITH e AS (
          |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, value, event_type
          |  FROM events
          |),
          |b AS (
          |  SELECT min(user_id) AS umin, max(user_id) AS umax,
          |         min(ts_us) AS tmin, max(ts_us) AS tmax
          |  FROM e
          |)
          |SELECT e.event_id, e.user_id, CAST(e.ts_us AS BIGINT) AS ts_us,
          |       e.value, e.event_type
          |FROM e, b
          |WHERE e.user_id BETWEEN b.umin + (b.umax - b.umin) * 2 // 10
          |                    AND b.umin + (b.umax - b.umin) * 4 // 10
          |  AND e.ts_us BETWEEN b.tmin + (b.tmax - b.tmin) * 4 // 10
          |                  AND b.tmin + (b.tmax - b.tmin) * 6 // 10
          |ORDER BY e.event_id""".stripMargin)),

    // First-order action-transition matrix over 4 h sessions — the
    // Markov summary of behavioral sequences (next-action baselines,
    // the sanity screen on x_evt_threads' trajectories): consecutive
    // in-session pairs counted, row-normalized to e6 probabilities
    // (cnt·1e6 DIV from_total). Session boundaries yield NO
    // transition; the lag rides the sessionize exchange, the pair agg
    // is vocabulary-bounded, the row-total join broadcasts.
    QueryDef("x_evt_transitions",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        val ev = spark.table("events")
          .withColumn("ts_us", unix_micros(col("ts")))
          .select("event_id", "user_id", "ts_us", "event_type")
        Events.actionTransitions(ev, gapUs = 4L * 3600 * 1000000)
          .orderBy("from_action", "to_action")
      },
      Some(
        """WITH e AS (
          |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type FROM events
          |),
          |s AS (
          |  SELECT user_id, event_id, ts_us, event_type,
          |         CASE WHEN lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) IS NULL
          |                OR ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
          |                   > 14400000000
          |              THEN 1 ELSE 0 END AS st
          |  FROM e
          |),
          |x AS (
          |  SELECT user_id, event_id, ts_us, event_type,
          |         sum(st) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
          |                       ROWS UNBOUNDED PRECEDING) AS session_seq
          |  FROM s
          |),
          |p AS (
          |  SELECT event_type,
          |         lag(event_type) OVER (PARTITION BY user_id, session_seq
          |                               ORDER BY ts_us, event_id) AS prev
          |  FROM x
          |),
          |c AS (
          |  SELECT prev AS from_action, event_type AS to_action, count(*) AS cnt
          |  FROM p WHERE prev IS NOT NULL GROUP BY 1, 2
          |),
          |t AS (SELECT from_action, sum(cnt) AS tot FROM c GROUP BY 1)
          |SELECT c.from_action, c.to_action, CAST(c.cnt AS BIGINT) AS cnt,
          |       CAST(c.cnt * 1000000 // t.tot AS BIGINT) AS p_e6
          |FROM c JOIN t ON t.from_action = c.from_action
          |ORDER BY c.from_action, c.to_action""".stripMargin)),

    // Small-file compaction — the table-maintenance pass a long-lived
    // dataset needs: the fixture manufactures the problem (64 tiny
    // files), compact() rewrites them as 8 range-partitioned files
    // sorted on event_id (tight min/max → the rewrite also buys
    // pruning), and this query reads the COMPACTED copy — the oracle
    // runs on the source table, so hash parity IS the
    // content-invariance proof. LayoutSpec asserts the file counts
    // and per-file sort-column disjointness.
    QueryDef("x_layout_compaction",
      (spark, sfDir) => {
        val dir = compactedEventsDir(spark, sfDir)
        spark.read.parquet(dir)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            sum(col("event_id")).as("sum_ids"),
            min(col("ts_us")).as("min_ts_us"),
            max(col("ts_us")).as("max_ts_us"))
          .orderBy("event_type")
      },
      Some(
        """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
          |       CAST(sum(event_id) AS BIGINT) AS sum_ids,
          |       CAST(min(epoch_us(ts)) AS BIGINT) AS min_ts_us,
          |       CAST(max(epoch_us(ts)) AS BIGINT) AS max_ts_us
          |FROM events
          |GROUP BY 1
          |ORDER BY event_type""".stripMargin)),

    // Schema evolution across parquet generations — the
    // decade-of-data reality at 100 TB: generation 1 predates the
    // lang column, generation 2 has it; a mergeSchema read unions
    // the file schemas and the missing column surfaces as NULLs,
    // never a failure. count(lang) — non-null counting — is exactly
    // the per-generation coverage audit a migration plan starts with.
    QueryDef("x_layout_schema_evolution",
      (spark, sfDir) => {
        val root = schemaEvoDir(spark, sfDir)
        spark.read.option("mergeSchema", "true").parquet(root)
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            count(col("lang")).as("n_with_lang"))
          .orderBy("source")
      },
      Some(
        """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
          |       CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_with_lang
          |FROM documents
          |GROUP BY 1
          |ORDER BY source""".stripMargin)),

    // Salted dimension join — the hot-KEY JOIN companion to
    // x_evt_salted_agg: fact rows get a deterministic salt, the dim
    // replicates once per salt value, and the join key becomes
    // (key, salt), fanning a dominant key across `salts` reducers —
    // the structural fix when AQE's skew split can't help (every
    // split still needs the dim rows). Dropping the salt restores
    // exactly the plain join's rows, so the oracle is the unsalted
    // SQL — the salt is a physical rewrite, invisible in the result.
    // Key-skew profile — the diagnosis that picks the salted shapes'
    // salt factor: per-key share of the fact table in permille and
    // the ceil(n/mean-load) bucket recommendation, top-10 hottest
    // keys. One count agg (map-side partials absorb the skew being
    // measured) + one broadcast 2-column total.
    QueryDef("x_evt_skew_profile",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        Events.keySkewProfile(spark.table("events"), "user_id", topK = 10)
          .withColumnRenamed("key", "user_id")
      },
      Some(
        """WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_rows
          |           FROM events GROUP BY 1),
          |t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS total,
          |             CAST(count(*) AS BIGINT) AS n_keys FROM c)
          |SELECT c.user_id, c.n_rows,
          |       CAST(c.n_rows * 1000 // t.total AS BIGINT) AS share_permille,
          |       CAST(greatest(1, (c.n_rows * t.n_keys + t.total - 1) // t.total)
          |            AS BIGINT) AS salt_factor
          |FROM c CROSS JOIN t
          |ORDER BY c.n_rows DESC, c.user_id
          |LIMIT 10""".stripMargin)),

    QueryDef("x_evt_skew_join",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        val ev = spark.table("events")
          .select("event_id", "user_id", "value")
        val dim = ev.select("user_id").distinct()
          .withColumn("tier", pmod(col("user_id"), lit(5)))
        Events.saltedDimJoin(ev, dim, "user_id", salts = 8)
          .groupBy("tier")
          .agg(count(lit(1)).as("n_events"),
            sum(floor(col("value") * 100 + 0.5).cast("long")).as("sum_cents"))
          .orderBy("tier")
      },
      Some(
        """WITH dim AS (SELECT DISTINCT user_id, user_id % 5 AS tier FROM events)
          |SELECT d.tier, CAST(count(*) AS BIGINT) AS n_events,
          |       CAST(sum(CAST(floor(e.value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
          |FROM events e JOIN dim d ON d.user_id = e.user_id
          |GROUP BY 1
          |ORDER BY tier""".stripMargin)),

    // Bucketed co-located join: orders and lineitem are written
    // bucketed+sorted on the order key at setup time (the pre-paid
    // shuffle), so the fact⋈fact join AND the per-order rollup above
    // it run with ZERO runtime Exchange — at 100 TB this turns the
    // dominant network cost of the join into a per-bucket local
    // merge. LayoutSpec pins the no-Exchange plan; the result is
    // layout-invariant, so the oracle is the plain join SQL.
    QueryDef("x_layout_bucketed_join",
      (spark, sfDir) => {
        val (ot, lt) = bucketedTables(spark, sfDir)
        graft.ext.Layout.bucketedOrderRevenue(spark, ot, lt)
          .orderBy("o_orderkey")
      },
      Some(
        """SELECT o.o_orderkey, strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
          |       CAST(count(*) AS BIGINT) AS n_items,
          |       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
          |                CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
          |FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
          |GROUP BY 1, 2
          |ORDER BY o.o_orderkey""".stripMargin)),

    // Hive-style partition pruning: events written one DIRECTORY per
    // event_type at setup time; the type predicate then eliminates
    // whole directories at planning time — before any file is opened
    // — the third pruning axis beside z-order min/max stats and
    // bucketing. LayoutSpec asserts the filtered scan touches only
    // matching partition paths. Value money in the fixed-point cents
    // convention (floor(v·100 + 0.5), one exact IEEE op).
    QueryDef("x_layout_partition_prune",
      (spark, sfDir) => {
        val dir = eventsByTypeDir(spark, sfDir)
        spark.read.parquet(dir)
          .filter(col("event_type") === "purchase")
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_purchases"),
            sum(floor(col("value") * 100 + 0.5).cast("long")).as("sum_cents"))
          .orderBy("user_id")
      },
      Some(
        """SELECT user_id, CAST(count(*) AS BIGINT) AS n_purchases,
          |       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
          |FROM events WHERE event_type = 'purchase'
          |GROUP BY 1
          |ORDER BY user_id""".stripMargin)),

    // Semi-structured props: JSON path extraction feeding a relational
    // agg — get_json_object is a pure in-row map (Jackson in Spark,
    // yyjson in DuckDB — both strict JSON, same value); integer stats
    // so engines can't disagree.
    QueryDef("x_evt_props_json",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        spark.table("events")
          .select(col("event_type"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            count(col("k")).as("n_with_k"),
            sum(col("k")).as("sum_k"),
            min(col("k")).as("min_k"),
            max(col("k")).as("max_k"))
          .orderBy("event_type")
      },
      Some(
        """SELECT event_type,
          |       CAST(count(*) AS BIGINT) AS n_events,
          |       CAST(count(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS n_with_k,
          |       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
          |       CAST(min(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
          |       CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
          |FROM events
          |GROUP BY event_type
          |ORDER BY event_type""".stripMargin)),

    // Rolling 24 h per-user event rate: time-RANGE frame over BIGINT µs
    // (bursts bounded by time, not row offsets). Value quantized ONCE to
    // integer cents on BOTH engines — floor(v*100+0.5) is one exact IEEE
    // op and BIGINT sums are associative, so no decimal tie-rounding or
    // fold order can diverge (the r5 driver hash failure was the per-row
    // DOUBLE→DECIMAL(18,2) cast rounding ties engine-dependently).
    QueryDef("x_evt_rolling",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        val ev = spark.table("events")
          .withColumn("ts_us", unix_micros(col("ts")))
          .select("event_id", "user_id", "ts_us", "value")
        Events.rollingCounts(ev, windowUs = 86400L * 1000000)
          .select(col("event_id"), col("user_id"), col("ts_us"),
            col("n_trailing"), col("sum_trailing_cents"))
          .orderBy("event_id")
      },
      defsRollingOracle),

    // Per-user inter-arrival gap stats (burstiness features): exact
    // integer µs gaps; the median is rank-selected INSIDE the user
    // partitioning (lower median on even counts — deterministic), the
    // mean one truncating division. No global sort at any scale.
    QueryDef("x_evt_interarrival",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        val ev = spark.table("events")
          .withColumn("ts_us", unix_micros(col("ts")))
          .select("event_id", "user_id", "ts_us")
        Events.interArrival(ev).orderBy("user_id")
      },
      Some(
        """WITH e AS (
          |  SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
          |),
          |g AS (
          |  SELECT user_id, event_id,
          |         ts_us - lag(ts_us) OVER (PARTITION BY user_id
          |                                  ORDER BY ts_us, event_id) AS gap
          |  FROM e
          |),
          |gg AS (
          |  SELECT user_id, gap,
          |         row_number() OVER (PARTITION BY user_id ORDER BY gap, event_id) AS rn,
          |         count(*) OVER (PARTITION BY user_id) AS n
          |  FROM g WHERE gap IS NOT NULL
          |)
          |SELECT user_id,
          |       CAST(max(n) AS BIGINT) AS n_gaps,
          |       CAST(min(gap) AS BIGINT) AS min_gap_us,
          |       CAST(max(CASE WHEN rn = (n + 1) // 2 THEN gap END) AS BIGINT) AS median_gap_us,
          |       CAST(max(gap) AS BIGINT) AS max_gap_us,
          |       CAST(sum(gap) // count(*) AS BIGINT) AS mean_gap_us
          |FROM gg GROUP BY user_id
          |ORDER BY user_id""".stripMargin)),

    // Event-time lateness profile — the measurement that SIZES the
    // streaming twins' watermarks: per key, how far each event's time
    // lags the latest event time already ingested (arrival order =
    // event_id). max_late_us IS the per-key safe withWatermark bound.
    // One key exchange shared by the arrival window and the agg; all
    // µs arithmetic exact BIGINT.
    QueryDef("x_evt_lateness",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        val ev = spark.table("events")
          .withColumn("ts_us", unix_micros(col("ts")))
          .select("event_id", "user_id", "ts_us")
        Events.latenessProfile(ev).orderBy("user_id")
      },
      Some(
        """WITH e AS (
          |  SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
          |),
          |l AS (
          |  SELECT user_id,
          |         greatest(coalesce(
          |           max(ts_us) OVER (PARTITION BY user_id ORDER BY event_id
          |                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
          |           - ts_us, 0), 0) AS late
          |  FROM e
          |)
          |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
          |       CAST(count(*) FILTER (late > 0) AS BIGINT) AS n_late,
          |       CAST(max(late) AS BIGINT) AS max_late_us,
          |       CAST(sum(late) AS BIGINT) AS sum_late_us
          |FROM l GROUP BY user_id
          |ORDER BY user_id""".stripMargin)),

    // Per-key rate anomalies: z-score of each (user, 10-min bucket)
    // event count against the user's own bucket distribution — the
    // burst/outage monitor. One bucket agg + one moment agg + a keyed
    // join; z = integer numerator over sqrt of an exact integer (one
    // sqrt + one division, correctly rounded), quantized once to e6.
    QueryDef("x_evt_anomaly",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        val ev = spark.table("events")
          .withColumn("ts_us", unix_micros(col("ts")))
          .select("event_id", "user_id", "ts_us")
        Events.rateAnomalies(ev).orderBy("user_id", "bucket_start_us")
      },
      Some(
        """WITH b AS (
          |  SELECT user_id, epoch_us(ts) // 600000000 AS bucket,
          |         count(*) AS n_events
          |  FROM events GROUP BY 1, 2
          |),
          |m AS (
          |  SELECT user_id, count(*) AS k, sum(n_events) AS s1,
          |         sum(n_events * n_events) AS s2
          |  FROM b GROUP BY 1
          |)
          |SELECT b.user_id,
          |       CAST(b.bucket * 600000000 AS BIGINT) AS bucket_start_us,
          |       CAST(b.n_events AS BIGINT) AS n_events,
          |       CAST(CASE WHEN m.k * m.s2 - m.s1 * m.s1 <= 0 THEN 0
          |            ELSE floor(CAST(b.n_events * m.k - m.s1 AS DOUBLE)
          |                       / sqrt(CAST(m.k * m.s2 - m.s1 * m.s1 AS DOUBLE))
          |                       * 1e6 + 0.5) END AS BIGINT) AS z_e6,
          |       abs(CAST(CASE WHEN m.k * m.s2 - m.s1 * m.s1 <= 0 THEN 0
          |            ELSE floor(CAST(b.n_events * m.k - m.s1 AS DOUBLE)
          |                       / sqrt(CAST(m.k * m.s2 - m.s1 * m.s1 AS DOUBLE))
          |                       * 1e6 + 0.5) END AS BIGINT)) >= 3000000 AS is_anomaly
          |FROM b JOIN m USING (user_id)
          |ORDER BY user_id, bucket_start_us""".stripMargin)),

    // Cohort retention: first-seen-week cohorts × active-week offsets.
    // Engine uses the distinct-first + window shape; the oracle is the
    // independent join-back formulation.
    QueryDef("x_evt_retention",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        val ev = spark.table("events")
          .withColumn("ts_us", unix_micros(col("ts")))
        Events.retention(ev).orderBy("cohort_week", "week_offset")
      },
      Some(
        """WITH e AS (
          |  SELECT user_id, epoch_us(ts) // 604800000000 AS week FROM events
          |),
          |d AS (SELECT DISTINCT user_id, week FROM e),
          |c AS (SELECT user_id, min(week) AS cohort_week FROM d GROUP BY user_id)
          |SELECT c.cohort_week, d.week - c.cohort_week AS week_offset,
          |       CAST(count(*) AS BIGINT) AS n_users
          |FROM d JOIN c USING (user_id)
          |GROUP BY 1, 2
          |ORDER BY 1, 2""".stripMargin)),

    // Ordered funnel view → click → purchase within 7 days: chained
    // conditional-min windows over ONE user exchange; the oracle is the
    // independent per-step aggregate-and-join chain.
    QueryDef("x_evt_funnel",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        val ev = spark.table("events")
          .withColumn("ts_us", unix_micros(col("ts")))
          .select("event_id", "user_id", "ts_us", "event_type")
        Events.funnel(ev, Seq("view", "click", "purchase"))
          .orderBy("user_id")
      },
      defsFunnelOracle),

    // Skew-salted two-stage aggregation: count + integer-cents sum per
    // event_type via groupBy(key, salt) partials then a key-only
    // merge. The oracle is the PLAIN GROUP BY — parity proves the
    // salted shape is semantically free, while at 100 TB it spreads a
    // hot key over `salts` reducers (AQE splits skewed join
    // partitions, not skewed agg keys — salting is the agg recipe).
    QueryDef("x_evt_salted_agg",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        Events.saltedAgg(spark.table("events")
            .select("event_id", "event_type", "value"))
          .orderBy("event_type")
      },
      Some(
        """SELECT event_type,
          |       count(*) AS n_events,
          |       CAST(sum(CAST(floor(CAST(value AS DOUBLE) * 100 + 0.5)
          |                     AS BIGINT)) AS BIGINT) AS sum_cents
          |FROM events
          |GROUP BY event_type
          |ORDER BY event_type""".stripMargin)),

    // SCD2 interval build (event-sourced dimension versioning): each
    // user's event_type change stream becomes validity intervals —
    // consecutive duplicates collapse, valid_to = next change's ts
    // (NULL while current). ONE key exchange for both windows; the
    // point-in-time lookup against this table is the as-of join.
    QueryDef("x_evt_scd2",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        val ev = spark.table("events")
          .withColumn("ts_us", unix_micros(col("ts")))
          .select("event_id", "user_id", "ts_us", "event_type")
        Events.scd2(ev).orderBy("user_id", "version")
      },
      Some(
        """WITH e AS (
          |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type
          |  FROM events
          |),
          |c AS (
          |  SELECT user_id, event_type, ts_us, event_id,
          |         lag(event_type) OVER (PARTITION BY user_id
          |                               ORDER BY ts_us, event_id) AS prev
          |  FROM e
          |),
          |f AS (
          |  SELECT user_id, event_type, ts_us, event_id FROM c
          |  WHERE prev IS NULL OR prev <> event_type
          |)
          |SELECT user_id, event_type, ts_us AS valid_from,
          |       lead(ts_us) OVER (PARTITION BY user_id
          |                         ORDER BY ts_us, event_id) AS valid_to,
          |       CAST(row_number() OVER (PARTITION BY user_id
          |                               ORDER BY ts_us, event_id) AS BIGINT)
          |         AS version
          |FROM f
          |ORDER BY user_id, version""".stripMargin)),

    // Lag-k autocorrelation of the daily event-count series — the
    // TEMPORAL drift monitor beside KL/χ²/KS: lag-7 peaks = weekly
    // seasonality a time split must respect. One corpus agg to the
    // day histogram; all moments exact BIGINT (n²-scaled deviations),
    // one IEEE divide of two exact integers per lag.
    QueryDef("x_evt_autocorr",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        Events.dailyAutocorr(spark.table("events")
            .withColumn("ts_us", unix_micros(col("ts"))), maxLag = 7)
          .orderBy("lag")
      },
      Some(
        """WITH e AS (SELECT epoch_us(ts) // 86400000000 AS day FROM events),
          |d AS (SELECT day, count(*) AS x FROM e GROUP BY day),
          |s AS (SELECT day, x, row_number() OVER (ORDER BY day) AS rn FROM d),
          |t AS (SELECT count(*) AS n, sum(x) AS s FROM s),
          |v AS (SELECT rn, CAST(t.n * s.x - t.s AS BIGINT) AS dd FROM s, t),
          |den AS (SELECT CAST(sum(dd * dd) AS BIGINT) AS den FROM v),
          |lags AS (SELECT unnest(range(1, 8)) AS lag),
          |nums AS (
          |  SELECT l.lag, count(*) AS n_pairs,
          |         CAST(sum(a.dd * b.dd) AS BIGINT) AS num
          |  FROM lags l
          |  JOIN v a ON true
          |  JOIN v b ON b.rn = a.rn + l.lag
          |  GROUP BY l.lag
          |)
          |SELECT CAST(lag AS BIGINT) AS lag,
          |       CAST(n_pairs AS BIGINT) AS n_pairs,
          |       num, den.den AS den,
          |       CAST(CASE WHEN den.den <= 0 THEN 0
          |            ELSE floor(CAST(num AS DOUBLE) / CAST(den.den AS DOUBLE)
          |                       * 1e6 + 0.5) END AS BIGINT) AS ac_e6
          |FROM nums, den
          |ORDER BY lag""".stripMargin)),

    // CUSUM change-point scan (Page): WHEN did daily volume shift.
    // The max(0,·) recurrence runs as its prefix-min/max closed form —
    // pure window algebra over the bounded day histogram, exact
    // BIGINT end-to-end; the peak day flags the most likely change.
    QueryDef("x_evt_cpd",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        Events.cusumChangePoint(spark.table("events")
            .withColumn("ts_us", unix_micros(col("ts"))))
          .orderBy("day")
      },
      defsCpdOracle),

    // Kleinberg two-state burst labeling over the daily series — the
    // third temporal monitor (structure → level shift → per-day burst
    // labels). Viterbi over nano-nat Poisson costs, quantized once;
    // the fixture's daily volume is near-uniform (302-364), so the
    // input is augmented with three deterministic 4× spike days (the
    // mattr precedent: the burst branch must fire under the DRIVER
    // gate, not just the unit fixture). Oracle carries the two
    // Viterbi frontiers AND their backtraces through a recursive CTE.
    QueryDef("x_evt_bursts",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        val ev = spark.table("events")
          .select(unix_micros(col("ts")).as("ts_us"))
        val dmin = ev.agg(min(expr("ts_us DIV 86400000000")).as("d0"))
        val spikes = ev.crossJoin(broadcast(dmin))
          .filter(expr("ts_us DIV 86400000000 < d0 + 3"))
          .crossJoin(spark.range(4).select(col("id").as("r")))
          .select((col("ts_us") + lit(40L * 86400000000L)).as("ts_us"))
        Events.burstDetect(ev.select("ts_us").unionByName(spikes))
          .orderBy("day")
      },
      Some(
        """WITH RECURSIVE ev AS (SELECT epoch_us(ts) AS ts_us FROM events),
          |dm AS (SELECT min(ts_us // 86400000000) AS d0 FROM ev),
          |aug AS (
          |  SELECT ts_us FROM ev
          |  UNION ALL
          |  SELECT e.ts_us + 40 * 86400000000 AS ts_us
          |  FROM ev e, dm, (SELECT unnest(range(4)) AS r) rs
          |  WHERE e.ts_us // 86400000000 < dm.d0 + 3
          |),
          |d AS MATERIALIZED (
          |  SELECT ts_us // 86400000000 AS day, count(*) AS x
          |  FROM aug GROUP BY 1
          |),
          |srt AS MATERIALIZED (
          |  SELECT day, x, row_number() OVER (ORDER BY day) AS rn FROM d
          |),
          |t AS (SELECT count(*) AS n, sum(x) AS s FROM srt),
          |k AS MATERIALIZED (
          |  SELECT CAST(floor((CAST(s AS DOUBLE) / n) * 1e9 + 0.5) AS BIGINT) AS c0b,
          |         CAST(floor((3.0 * (CAST(s AS DOUBLE) / n)) * 1e9 + 0.5) AS BIGINT) AS c1b,
          |         CAST(floor(ln(CAST(s AS DOUBLE) / n) * 1e9 + 0.5) AS BIGINT) AS ln0,
          |         CAST(floor(ln(3.0 * (CAST(s AS DOUBLE) / n)) * 1e9 + 0.5) AS BIGINT) AS ln1,
          |         CAST(floor(ln(CAST(n AS DOUBLE)) * 1e9 + 0.5) AS BIGINT) AS gam
          |  FROM t
          |),
          |rec AS (
          |  SELECT s0.rn, k.c0b - s0.x * k.ln0 AS c0,
          |         k.gam + k.c1b - s0.x * k.ln1 AS c1,
          |         '0' AS p0, '1' AS p1
          |  FROM srt s0, k WHERE s0.rn = 1
          |  UNION ALL
          |  SELECT s1.rn,
          |         (CASE WHEN r.c0 <= r.c1 THEN r.c0 ELSE r.c1 END)
          |           + k.c0b - s1.x * k.ln0,
          |         (CASE WHEN r.c0 + k.gam <= r.c1 THEN r.c0 + k.gam ELSE r.c1 END)
          |           + k.c1b - s1.x * k.ln1,
          |         (CASE WHEN r.c0 <= r.c1 THEN r.p0 ELSE r.p1 END) || '0',
          |         (CASE WHEN r.c0 + k.gam <= r.c1 THEN r.p0 ELSE r.p1 END) || '1'
          |  FROM rec r, srt s1, k WHERE s1.rn = r.rn + 1
          |),
          |fin AS (SELECT * FROM rec ORDER BY rn DESC LIMIT 1),
          |best AS (SELECT CASE WHEN c0 <= c1 THEN p0 ELSE p1 END AS path FROM fin)
          |SELECT s.day, CAST(s.x AS BIGINT) AS x,
          |       CAST(substr(b.path, CAST(s.rn AS INT), 1) AS BIGINT) AS burst_state,
          |       (substr(b.path, CAST(s.rn AS INT), 1) = '1'
          |        AND (s.rn = 1 OR substr(b.path, CAST(s.rn - 1 AS INT), 1) = '0'))
          |         AS is_burst_start
          |FROM srt s, best b
          |ORDER BY s.day""".stripMargin))
  )
}
