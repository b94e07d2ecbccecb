package graft.ext

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge semantics of the temporal operators: as-of tie-breaks and
  * session gap boundaries — the cases the corpus oracle can't pin.
  */
class EventsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("asofJoin: latest-at-or-before, equal-ts tie → highest id, no-ref → null") {
    import spark.implicits._
    val refs = Seq(
      (10L, 1L, 100L, 1.0), // user 1, ts 100
      (11L, 1L, 100L, 2.0), // same ts — higher id wins ties
      (12L, 1L, 200L, 3.0)
    ).toDF("event_id", "user_id", "ts_us", "value")
    val queries = Seq(
      (20L, 1L, 100L, 0.0), // ref exactly at query ts matches (≤)
      (21L, 1L, 150L, 0.0), // between refs → ts-100 pair, id 11
      (22L, 1L, 250L, 0.0), // after all → id 12
      (23L, 1L, 50L, 0.0),  // before all → null
      (24L, 2L, 500L, 0.0)  // other user, no refs → null
    ).toDF("event_id", "user_id", "ts_us", "value")
    val r = Events.asofJoin(queries, refs).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(20L).getAs[Long]("ref_event_id") == 11L)
    assert(r(21L).getAs[Long]("ref_event_id") == 11L)
    assert(r(21L).getAs[Double]("ref_value") == 2.0)
    assert(r(22L).getAs[Long]("ref_event_id") == 12L)
    assert(r(23L).isNullAt(r(23L).fieldIndex("ref_event_id")))
    assert(r(24L).isNullAt(r(24L).fieldIndex("ref_event_id")))
  }

  test("saltedAgg: equals the plain aggregation; hot key spreads over salts") {
    import spark.implicits._
    // one hot key (9 of 12 rows) + two cold keys; values with a
    // half-cent boundary to pin the quantize-then-sum order
    val ev = ((1L to 9L).map(i => (i, "hot", 0.005 + i)) ++
      Seq((10L, "cold_a", 1.0), (11L, "cold_a", 2.25), (12L, "cold_b", 0.0)))
      .toDF("event_id", "event_type", "value")
    val r = Events.saltedAgg(ev, salts = 4).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2))).toMap
    // parity with the single-stage plan — the semantic claim itself
    val plain = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 100 + 0.5).cast("long")).as("c"))
      .collect().map(x => x.getString(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r == plain)
    assert(r("cold_a") == ((2L, 325L)))
    assert(r("cold_b") == ((1L, 0L)))
  }

  test("scd2: duplicate runs collapse, valid_to chains, current row open") {
    import spark.implicits._
    val ev = Seq(
      (1L, 7L, 100L, "free"),
      (2L, 7L, 200L, "free"), // duplicate run — collapses into v1
      (3L, 7L, 300L, "pro"),
      (4L, 7L, 400L, "pro"),
      (5L, 7L, 500L, "free"), // back to a PRIOR value → new version
      (6L, 8L, 900L, "pro")   // other key, single open interval
    ).toDF("event_id", "user_id", "ts_us", "event_type")
    val r = Events.scd2(ev).collect()
      .map(x => (x.getLong(0), x.getLong(4)) ->
        (x.getString(1), x.getLong(2),
          if (x.isNullAt(3)) -1L else x.getLong(3)))
      .toMap
    assert(r((7L, 1L)) == (("free", 100L, 300L)))
    assert(r((7L, 2L)) == (("pro", 300L, 500L)))
    assert(r((7L, 3L)) == (("free", 500L, -1L)))
    assert(r((8L, 1L)) == (("pro", 900L, -1L)))
    assert(r.size == 4)
  }

  test("retention: first-seen cohort, distinct user-weeks, offsets") {
    import spark.implicits._
    val wk = 7L * 86400 * 1000000
    // user 1: weeks 0, 0, 2 → cohort 0, offsets {0, 2}
    // user 2: weeks 1, 2    → cohort 1, offsets {0, 1}
    val ev = Seq(
      (1L, 10L), (1L, 20L), (1L, 2 * wk + 5),
      (2L, wk + 1), (2L, 2 * wk + 1)
    ).toDF("user_id", "ts_us")
    val r = Events.retention(ev).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    assert(r == Map((0L, 0L) -> 1L, (0L, 2L) -> 1L,
      (1L, 0L) -> 1L, (1L, 1L) -> 1L))
  }

  test("funnel: ordered chain, out-of-order steps don't count, window gate") {
    import spark.implicits._
    val day = 86400L * 1000000
    val ev = Seq(
      // user 1: view@1d, click@2d, purchase@3d → converted
      (1L, 1L, 1 * day, "view"), (2L, 1L, 2 * day, "click"),
      (3L, 1L, 3 * day, "purchase"),
      // user 2: click BEFORE first view — that click can't count;
      // no later click → chain stops at t0
      (4L, 2L, 1 * day, "click"), (5L, 2L, 2 * day, "view"),
      (6L, 2L, 3 * day, "purchase"), // purchase needs a click first
      // user 3: full chain but purchase lands past the 7-day window
      (7L, 3L, 1 * day, "view"), (8L, 3L, 2 * day, "click"),
      (9L, 3L, 10 * day, "purchase"),
      // user 4: no funnel events at all → all null, not converted
      (10L, 4L, 1 * day, "error")
    ).toDF("event_id", "user_id", "ts_us", "event_type")
    val r = Events.funnel(ev, Seq("view", "click", "purchase")).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getAs[Boolean]("converted"))
    assert(r(1L).getAs[Long]("t2") == 3 * day)
    assert(!r(2L).getAs[Boolean]("converted"))
    assert(r(2L).isNullAt(r(2L).fieldIndex("t1"))) // pre-view click ignored
    assert(!r(3L).getAs[Boolean]("converted")) // chain complete, window missed
    assert(r(3L).getAs[Long]("t2") == 10 * day)
    assert(!r(4L).getAs[Boolean]("converted"))
    assert(r(4L).isNullAt(r(4L).fieldIndex("t0")))
  }

  test("sessionize: gap strictly greater than gapUs starts a session") {
    import spark.implicits._
    // gaps: 10 (continue), exactly 100 (continue — rule is >), 101 (new)
    val ev = Seq(
      (1L, 1L, 1000L), (2L, 1L, 1010L), (3L, 1L, 1110L), (4L, 1L, 1211L),
      (5L, 2L, 9999L)
    ).toDF("event_id", "user_id", "ts_us")
    val r = Events.sessionize(ev, gapUs = 100L).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getAs[Long]("session_seq") == 1L)
    assert(r(2L).getAs[Long]("session_seq") == 1L)
    assert(r(3L).getAs[Long]("session_seq") == 1L) // gap == 100 continues
    assert(r(4L).getAs[Long]("session_seq") == 2L) // gap 101 splits
    assert(r(4L).getAs[Long]("event_seq") == 1L)
    assert(r(5L).getAs[Long]("session_seq") == 1L) // keys are independent
    val s = Events.sessions(ev, gapUs = 100L).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> x).toMap
    assert(s((1L, 1L)).getAs[Long]("n_events") == 3L)
    assert(s((1L, 1L)).getAs[Long]("duration_us") == 110L)
    assert(s((1L, 2L)).getAs[Long]("duration_us") == 0L)
  }

  test("rangeJoin: inclusive bounds, multi-bucket intervals pair exactly once") {
    import spark.implicits._
    val pts = Seq(
      (1L, 1L, 100L),  // inside [100, 200] — start bound inclusive
      (2L, 1L, 200L),  // end bound inclusive
      (3L, 1L, 201L),  // just outside a, but inside c
      (4L, 1L, 5000L), // inside the long interval [900, 9000] only
      (5L, 2L, 150L)   // other key — no intervals
    ).toDF("event_id", "user_id", "ts_us")
    val ivs = Seq(
      (1L, 100L, 200L, "a"),
      (1L, 900L, 9000L, "b"), // spans ~81 buckets at bucketUs=100
      (1L, 150L, 1000L, "c")
    ).toDF("user_id", "start_us", "end_us", "tag")
    // tiny bucket vs interval spans: forces heavy interval replication,
    // so duplicate pairs would show up if the bucketing emitted any
    val r = Events.rangeJoin(pts, ivs, bucketUs = 100L)
      .select("event_id", "tag").collect()
      .map(x => (x.getLong(0), x.getString(1)))
    assert(r.sorted.toSeq == Seq(
      (1L, "a"), (2L, "a"), (2L, "c"), (3L, "c"), (4L, "b")))
  }

  test("rangeJoin: parity with the naive BETWEEN join on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val pts = (1 to 300).map(i =>
      (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(10000).toLong))
      .toDF("event_id", "user_id", "ts_us")
    val ivs = (1 to 60).map { i =>
      val s = rnd.nextInt(10000).toLong
      (i.toLong, rnd.nextInt(5).toLong, s, s + rnd.nextInt(3000).toLong)
    }.toDF("iv_id", "user_id", "start_us", "end_us")
    val fast = Events.rangeJoin(pts, ivs, bucketUs = 777L)
      .select("event_id", "iv_id").as[(Long, Long)].collect().sorted.toSeq
    val naive = pts.join(ivs, Seq("user_id"))
      .filter($"ts_us" >= $"start_us" && $"ts_us" <= $"end_us")
      .select("event_id", "iv_id").as[(Long, Long)].collect().sorted.toSeq
    assert(fast == naive && fast.nonEmpty)
  }

  test("rangeJoinGlobal: parity with the naive keyless BETWEEN join") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pts = (1 to 200).map(i => (i.toLong, rnd.nextInt(10000).toLong))
      .toDF("event_id", "ts_us")
    val ivs = (1 to 25).map { i =>
      val s = rnd.nextInt(10000).toLong
      (i.toLong, s, s + rnd.nextInt(4000).toLong)
    }.toDF("iv_id", "start_us", "end_us")
    val fast = Events.rangeJoinGlobal(pts, ivs, bucketUs = 333L)
      .select("event_id", "iv_id").as[(Long, Long)].collect().sorted.toSeq
    val naive = pts.crossJoin(ivs)
      .filter($"ts_us" >= $"start_us" && $"ts_us" <= $"end_us")
      .select("event_id", "iv_id").as[(Long, Long)].collect().sorted.toSeq
    assert(fast == naive && fast.nonEmpty)
  }

  test("interArrival: exact gaps, lower median on even counts, same-ts gap 0") {
    import spark.implicits._
    // user 1 ts: 0, 100, 100, 400 → gaps 100, 0, 300:
    //   median (n=3) = 100, mean = 400 DIV 3 = 133
    // user 2 ts: 0, 10, 30, 60 → gaps 10, 20, 30... wait n=3 → median 20;
    //   use 5 events for the even case: 0,10,30,60,100 → gaps
    //   10,20,30,40 (n=4) → lower median = 20, mean = 100 DIV 4 = 25
    val ev = Seq(
      (1L, 1L, 0L), (1L, 2L, 100L), (1L, 3L, 100L), (1L, 4L, 400L),
      (2L, 5L, 0L), (2L, 6L, 10L), (2L, 7L, 30L), (2L, 8L, 60L), (2L, 9L, 100L)
    ).map { case (u, e, t) => (e, u, t) }
      .toDF("event_id", "user_id", "ts_us")
    val r = Events.interArrival(ev).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getAs[Long]("n_gaps") == 3L)
    assert(r(1L).getAs[Long]("min_gap_us") == 0L)      // same-ts pair
    assert(r(1L).getAs[Long]("median_gap_us") == 100L)
    assert(r(1L).getAs[Long]("max_gap_us") == 300L)
    assert(r(1L).getAs[Long]("mean_gap_us") == 133L)   // truncating
    assert(r(2L).getAs[Long]("n_gaps") == 4L)
    assert(r(2L).getAs[Long]("median_gap_us") == 20L)  // lower median
    assert(r(2L).getAs[Long]("mean_gap_us") == 25L)
  }

  test("rateAnomalies: hand-computed z-scores, zero-variance guard") {
    import spark.implicits._
    // u1 buckets (size 100µs): counts 1, 1, 4 → k=3 s1=6 s2=18,
    // var_num=18; u2: constant 2, 2 → variance 0 → z 0
    val ev = (Seq((1L, 10L), (1L, 110L), (1L, 210L), (1L, 220L),
        (1L, 230L), (1L, 240L)).map { case (u, t) => (u, t) } ++
      Seq((2L, 10L), (2L, 20L), (2L, 110L), (2L, 120L)))
      .zipWithIndex.map { case ((u, t), i) => (i.toLong, u, t) }
      .toDF("event_id", "user_id", "ts_us")
    def z(n: Long, k: Long, s1: Long, vn: Long): Long =
      math.floor((n * k - s1).toDouble / math.sqrt(vn.toDouble) * 1e6 + 0.5).toLong
    val r = Events.rateAnomalies(ev, bucketUs = 100L)
      .orderBy("user_id", "bucket_start_us").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getBoolean(4)))
    assert(r.toSeq == Seq(
      (1L, 0L, 1L, z(1, 3, 6, 18), false),
      (1L, 100L, 1L, z(1, 3, 6, 18), false),
      (1L, 200L, 4L, z(4, 3, 6, 18), false), // z ≈ +1.41, under 3
      (2L, 0L, 2L, 0L, false),
      (2L, 100L, 2L, 0L, false)))
    assert(z(4, 3, 6, 18) == 1414214L && z(1, 3, 6, 18) == -707107L)
  }

  test("actionTransitions: in-session pairs only, e6 row-normalized") {
    import spark.implicits._
    // u1 session1: a→b→a; session2 (after gap): b alone — the
    // boundary b must NOT create an a→b or b→b transition
    val ev = Seq(
      (1L, 1L, 100L, "a"), (2L, 1L, 110L, "b"), (3L, 1L, 120L, "a"),
      (4L, 1L, 2000L, "b"),
      (5L, 2L, 50L, "a"), (6L, 2L, 60L, "b"))
      .toDF("event_id", "user_id", "ts_us", "event_type")
    val out = Events.actionTransitions(ev, gapUs = 500L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // from a: a→b twice (u1 and u2) of 2 total; from b: b→a once of 1
    assert(out == Map(
      ("a", "b") -> (2L, 1000000L),
      ("b", "a") -> (1L, 1000000L)))
  }

  test("keySkewProfile: shares and salt recommendation, hand-computed") {
    import spark.implicits._
    // 10 rows over 4 keys: key 1 holds 7 (70%), mean load 2.5 →
    // salt ceil(7*4/10)=3; the singletons recommend 1 (floor guard)
    val ev = (Seq.fill(7)(1L) ++ Seq(2L, 3L, 4L)).zipWithIndex
      .map { case (u, i) => (i.toLong, u) }.toDF("event_id", "user_id")
    val out = Events.keySkewProfile(ev, "user_id", topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 7L, 700L, 3L),
      (2L, 1L, 100L, 1L), (3L, 1L, 100L, 1L), (4L, 1L, 100L, 1L)))
  }

  test("threadPaths: gap splits sessions, cap bounds the path, stats uncapped") {
    import spark.implicits._
    // u1: 3 events tight (gap 10), then a 1000µs jump → 2 sessions;
    // maxSteps = 2 caps the first session's path but not n_events
    val ev = Seq(
      (1L, 1L, 100L, "view"), (2L, 1L, 110L, "click"), (3L, 1L, 120L, "buy"),
      (4L, 1L, 2000L, "view"),
      (5L, 2L, 50L, "view"))
      .toDF("event_id", "user_id", "ts_us", "event_type")
    val out = Events.threadPaths(ev, gapUs = 500L, maxSteps = 2)
      .orderBy("user_id", "session_seq").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(out.toSeq == Seq(
      (1L, 1L, 3L, 100L, "view>click"), // capped at 2 steps, n_events 3
      (1L, 2L, 1L, 2000L, "view"),
      (2L, 1L, 1L, 50L, "view")))
  }

  test("dailyAutocorr: alternating series hand values; constant series reads 0") {
    import spark.implicits._
    val day = 86400000000L
    // counts per day: 1,3,1,3,1,3 → n=6, S=12, dd = 6x−12 = ±6,
    // den = 6·36 = 216; lag 1: 5 pairs of −36 → −180/216 = −.8333…;
    // lag 2: 4 pairs of +36 → +144/216 = +.6667…
    val ev = (0 until 6).flatMap { d =>
      val c = if (d % 2 == 0) 1 else 3
      (0 until c).map(i => (d.toLong * 100 + i, d * day + i * 1000L))
    }.toDF("event_id", "ts_us")
    val got = Events.dailyAutocorr(ev, maxLag = 2).orderBy("lag").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, 5L, -180L, 216L, -833333L),
      (2L, 4L, 144L, 216L, 666667L)))
    // constant series: den = 0 → ac_e6 pinned to 0, not NaN/div-zero
    val flat = (0 until 5).flatMap(d =>
      (0 until 2).map(i => (d.toLong * 10 + i, d * day + i))).toDF("event_id", "ts_us")
    val g2 = Events.dailyAutocorr(flat, maxLag = 2).orderBy("lag").collect()
    assert(g2.forall(r => r.getLong(3) == 0L && r.getLong(4) == 0L))
  }

  test("day bucketing FLOORS pre-epoch timestamps (ts_us = -1 lands in day -1, not 0)") {
    import spark.implicits._
    // ADVICE r12: Spark DIV truncates toward zero, so ts_us = -1 and
    // +1 both bucketed to day 0 while the DuckDB oracles' // floors —
    // the temporal trio now floors too. Two events a µs either side of
    // the epoch must land in DIFFERENT days.
    val ev = Seq((1L, -1L), (2L, 1L)).toDF("event_id", "ts_us")
    val days = Events.cusumChangePoint(ev).select("day").orderBy("day")
      .collect().map(_.getLong(0))
    assert(days.toSeq == Seq(-1L, 0L))
  }

  test("cusumChangePoint: level shift ramps to a peak at the boundary day") {
    import spark.implicits._
    val day = 86400000000L
    // 1,1,1,1 → 5,5,5,5: n=8, S=24, dd = 8x−24 = ∓16; P ramps to −64
    // at day 3 then back to 0 — cusum_neg peaks at 64 on day 3 (the
    // last pre-change day), cusum_pos mirrors it at day 7; earliest
    // attainer wins the flag.
    val ev = (0 until 8).flatMap { d =>
      val c = if (d < 4) 1 else 5
      (0 until c).map(i => (d.toLong * 100 + i, d * day + i * 1000L))
    }.toDF("event_id", "ts_us")
    val got = Events.cusumChangePoint(ev).orderBy("day").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    assert(got.toSeq == Seq(
      (0L, 1L, -16L, 0L, 16L, false),
      (1L, 1L, -16L, 0L, 32L, false),
      (2L, 1L, -16L, 0L, 48L, false),
      (3L, 1L, -16L, 0L, 64L, true),
      (4L, 5L, 16L, 16L, 48L, false),
      (5L, 5L, 16L, 32L, 32L, false),
      (6L, 5L, 16L, 48L, 16L, false),
      (7L, 5L, 16L, 64L, 0L, false)))
  }

  test("burstDetect: planted spikes labeled; Viterbi cost == brute-force min") {
    import spark.implicits._
    val day = 86400000000L
    // base ~3-4/day, spikes 20-22/day (λ0 = 8.7, λ1 = 26.1): days 3-4
    // and 7 must label as bursts with starts at 3 and 7
    val xs = Seq(3L, 4L, 3L, 20L, 22L, 3L, 4L, 21L, 3L, 4L)
    val ev = xs.zipWithIndex.flatMap { case (c, d) =>
      (0L until c).map(i => d * day + i)
    }.toDF("ts_us")
    val got = Events.burstDetect(ev).orderBy("day").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.map(_._2).toSeq == xs)
    assert(got.map(_._3).toSeq ==
      Seq(0L, 0L, 0L, 1L, 1L, 0L, 0L, 1L, 0L, 0L))
    assert(got.map(_._4).toSeq == Seq(false, false, false, true, false,
      false, false, true, false, false))
    // the returned sequence achieves the brute-force minimum cost
    // over ALL 2^n state sequences (independent cost mirror)
    val n = xs.length; val s = xs.sum
    def q9(v: Double) = math.floor(v * 1e9 + 0.5).toLong
    val lam0 = s.toDouble / n.toDouble; val lam1 = 3.0 * lam0
    val (c0b, c1b) = (q9(lam0), q9(lam1))
    val (l0, l1) = (q9(math.log(lam0)), q9(math.log(lam1)))
    val gam = q9(math.log(n.toDouble))
    def cost(states: Seq[Int]): Long = {
      var c = 0L; var prev = 0
      for ((st, x) <- states.zip(xs)) {
        if (st == 1 && prev == 0) c += gam
        c += (if (st == 0) c0b - x * l0 else c1b - x * l1)
        prev = st
      }
      c
    }
    val brute = (0 until (1 << n)).map { m =>
      cost((0 until n).map(i => (m >> i) & 1))
    }.min
    assert(cost(got.map(_._3.toInt).toSeq) == brute)
  }

  test("cusumChangePoint: prefix closed form == direct recurrence on random series") {
    import spark.implicits._
    val day = 86400000000L
    val r = new scala.util.Random(31)
    val xs = Seq.fill(40)(1 + r.nextInt(9))
    val ev = xs.zipWithIndex.flatMap { case (c, d) =>
      (0 until c).map(i => d.toLong * day + i * 7L)
    }.toDF("ts_us")
    val got = Events.cusumChangePoint(ev).orderBy("day").collect()
      .map(w => (w.getLong(0), w.getLong(1), w.getLong(2), w.getLong(3),
        w.getLong(4), w.getBoolean(5)))
    val n = xs.length.toLong; val s = xs.map(_.toLong).sum
    var sp = 0L; var sn = 0L
    val want = xs.zipWithIndex.map { case (x, d) =>
      val dd = n * x - s
      sp = math.max(0L, sp + dd); sn = math.max(0L, sn - dd)
      (d.toLong, x.toLong, dd, sp, sn)
    }
    assert(got.map(t => (t._1, t._2, t._3, t._4, t._5)).toSeq == want)
    val ms = want.map(w => math.max(w._4, w._5))
    val peak = ms.indexOf(ms.max).toLong
    assert(got.count(_._6) == 1 && got.find(_._6).get._1 == peak)
  }

  test("dailyAutocorr: matches the direct formula on random series") {
    import spark.implicits._
    val day = 86400000000L
    val r = new scala.util.Random(37)
    val xs = Seq.fill(30)(1 + r.nextInt(12))
    val ev = xs.zipWithIndex.flatMap { case (c, d) =>
      (0 until c).map(i => d.toLong * day + i * 13L)
    }.toDF("ts_us")
    val got = Events.dailyAutocorr(ev, maxLag = 5).orderBy("lag").collect()
      .map(w => (w.getLong(0), w.getLong(1), w.getLong(2), w.getLong(3),
        w.getLong(4)))
    val n = xs.length.toLong; val s = xs.map(_.toLong).sum
    val dd = xs.map(x => n * x - s)
    val den = dd.map(d => d * d).sum
    val want = (1 to 5).map { k =>
      val num = dd.dropRight(k).zip(dd.drop(k)).map { case (a, b) => a * b }.sum
      val ac = if (den <= 0) 0L
        else math.floor(num.toDouble / den.toDouble * 1e6 + 0.5).toLong
      (k.toLong, (xs.length - k).toLong, num, den, ac)
    }
    assert(got.toSeq == want)
  }
}
