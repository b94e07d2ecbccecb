package graft.streaming

import graft.TestSpark
import graft.ext.{Dedup, Events}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream-vs-batch parity on GENERATED event data for all four
  * temporal streaming twins (sessions, rolling, funnel, as-of): random
  * events — with deliberate timestamp ties — are fed through a
  * MemoryStream in three event-time-ordered batches, and each
  * streaming operator's final output must equal its batch twin run
  * over the full data. This generalizes the declared-query oracle
  * checks (which see only the fixed sf corpus) to arbitrary inputs,
  * including same-ts tie groups and cross-batch boundaries landing
  * mid-session / mid-window / mid-funnel.
  */
class StreamBatchParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val rnd = new scala.util.Random(11)

  // (user_id, event_id, ts_us, value, event_type) — ts ties are common
  // by construction (coarse grid), types cycle through the funnel set
  private lazy val events: Seq[(Long, Long, Long, Double, String)] = {
    val types = Vector("view", "click", "purchase")
    (1L to 240L).map { eid =>
      val u = 1L + rnd.nextInt(8)
      val ts = (rnd.nextInt(40) * 50L) // 0..1950 on a 50µs grid → ties
      val v = math.round(rnd.nextDouble() * 100) / 10.0
      (u, eid, ts, v, types(rnd.nextInt(3)))
    }
  }

  private def batchDf: DataFrame = {
    import spark.implicits._
    events.toDF("user_id", "event_id", "ts_us", "value", "event_type")
  }

  /** Feed through a MemoryStream in 3 batches split in global ts order
    * (⇒ per-key event-time order), run `op` on the stream, return the
    * named memory sink's content.
    */
  private def runStream(name: String)(
      op: DataFrame => org.apache.spark.sql.Dataset[_]): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Long, Long, Double, String)]
    val q = op(stream.toDF()
        .toDF("user_id", "event_id", "ts_us", "value", "event_type"))
      .writeStream.outputMode("update")
      .format("memory").queryName(name).start()
    val sorted = events.sortBy(e => (e._3, e._2))
    sorted.grouped((sorted.size + 2) / 3).foreach { b =>
      stream.addData(b); q.processAllAvailable()
    }
    q.stop()
    spark.table(name)
  }

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("sessionStream == batch sessions on random tied data") {
    val gap = 120L
    val batch = Events.sessions(batchDf, gapUs = gap)
      .select("user_id", "session_seq", "n_events", "start_us", "end_us")
    val streamed = runStream("parity_sessions")(
      IncrementalIndexer.sessionStream(spark, _, gapUs = gap))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "session_seq").orderBy(col("n_events").desc)
    val fin = streamed.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select("user_id", "session_seq", "n_events", "start_us", "end_us")
    assert(rows(fin) == rows(batch))
  }

  test("threadStream == batch threadPaths on random tied data") {
    val gap = 120L
    val batch = Events.threadPaths(batchDf, gapUs = gap, maxSteps = 5)
      .select("user_id", "session_seq", "n_events", "start_us", "path")
    val streamed = runStream("parity_threads")(
      IncrementalIndexer.threadStream(spark, _, gapUs = gap, maxSteps = 5))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "session_seq").orderBy(col("n_events").desc)
    val fin = streamed.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select("user_id", "session_seq", "n_events", "start_us", "path")
    assert(rows(fin) == rows(batch))
  }

  test("dropDuplicatesWithinWatermark == batch DISTINCT when dups arrive within the delay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the production streaming-distinct form (x_stream_distinct_wm):
    // duplicates of (user_id, event_type) are dense and cross the
    // batch boundaries by construction; the whole ts range sits inside
    // the delay, so the emitted set must equal the batch DISTINCT
    val stream = MemoryStream[(Long, Long, Long, Double, String)]
    val q = stream.toDF()
      .toDF("user_id", "event_id", "ts_us", "value", "event_type")
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .select("user_id", "event_type")
      .writeStream.outputMode("append")
      .format("memory").queryName("wm_distinct_parity").start()
    val sorted = events.sortBy(e => (e._3, e._2))
    sorted.grouped((sorted.size + 2) / 3).foreach { b =>
      stream.addData(b); q.processAllAvailable()
    }
    q.stop()
    assert(rows(spark.table("wm_distinct_parity")) ==
      rows(batchDf.select("user_id", "event_type").distinct()))
  }

  test("topkStream == batch TopKDesc top-k on random tied data") {
    // values sit on a 0.1 grid, so score ties are common — the id
    // tie-break must agree between the k-slot stream state and the
    // batch aggregate's heap
    graft.functions.TopKFunctions.register(spark)
    val batch = batchDf.groupBy("user_id")
      .agg(graft.functions.TopKFunctions.topk_desc(
        col("value"), lpad(col("event_id").cast("string"), 20, "0"),
        struct(col("event_id"), col("value")), 3).as("__top"))
      .select(col("user_id"), posexplode(col("__top")).as(Seq("__r", "__s")))
      .select(col("user_id"), (col("__r") + 1).cast("long").as("topk_rank"),
        col("__s.event_id").as("event_id"), col("__s.value").as("value"))
    val streamed = runStream("parity_topk")(
      IncrementalIndexer.topkStream(spark, _, k = 3))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "topk_rank").orderBy(col("n_seen").desc)
    val fin = streamed.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select("user_id", "topk_rank", "event_id", "value")
    assert(rows(fin) == rows(batch))
  }

  test("rollingStream == batch rollingCounts on random tied data") {
    val win = 300L
    val batch = Events.rollingCounts(batchDf, windowUs = win)
      .select("event_id", "user_id", "ts_us", "n_trailing", "sum_trailing_cents")
    // emissions refine when tie groups split across batches: final
    // value per event = max n_trailing (the declared query's pick)
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy("event_id").orderBy(col("n_trailing").desc)
    val streamed = runStream("parity_rolling")(
      IncrementalIndexer.rollingStream(spark, _, windowUs = win))
      .withColumn("__rn", row_number().over(wr)).filter(col("__rn") === 1)
      .select("event_id", "user_id", "ts_us", "n_trailing", "sum_trailing_cents")
    assert(rows(streamed) == rows(batch))
  }

  test("funnelStream == batch funnel on random tied data") {
    val steps = Seq("view", "click", "purchase")
    val batch = Events.funnel(batchDf, steps, windowUs = 1000L)
      .select("user_id", "t0", "t1", "t2")
    def tCol(i: Int) = {
      val m = max(element_at(col("steps"), i + 1))
      when(m === -1L, lit(null).cast("long")).otherwise(m)
    }
    val streamed = runStream("parity_funnel")(
      IncrementalIndexer.funnelStream(spark, _, steps))
      .groupBy("user_id")
      .agg(tCol(0).as("t0"), tCol(1).as("t1"), tCol(2).as("t2"))
    assert(rows(streamed) == rows(batch))
  }

  test("asofStream == batch asofJoin on random tied data") {
    val clicks = batchDf.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts_us", "value")
    val views = batchDf.filter(col("event_type") === "view")
      .select("event_id", "user_id", "ts_us", "value")
    val batch = Events.asofJoin(clicks, views)
      .select("event_id", "user_id", "ts_us", "value",
        "ref_event_id", "ref_ts_us", "ref_value")
    // a tie-split ref re-emits its queries: final row per query = the
    // emission with max (ref_ts, ref_id), nulls last
    val wa = org.apache.spark.sql.expressions.Window
      .partitionBy("event_id")
      .orderBy(col("ref_ts_us").desc_nulls_last,
        col("ref_event_id").desc_nulls_last)
    val streamed = runStream("parity_asof")(
      IncrementalIndexer.asofStream(spark, _, refType = "view",
        queryType = "click"))
      .withColumn("__rn", row_number().over(wa)).filter(col("__rn") === 1)
      .select("event_id", "user_id", "ts_us", "value",
        "ref_event_id", "ref_ts_us", "ref_value")
    assert(rows(streamed) == rows(batch))
  }

  test("streamIntervalJoin == batch interval join on random tied data") {
    // append-mode stream-stream join: each matched (view, click) pair
    // must be emitted exactly once across the 3 batches — including
    // pairs whose two sides land in DIFFERENT batches (the buffered-
    // state case) and same-ts pairs (boundary inclusive both ends).
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val horizonUs = 500L
    // +1s clock base: Spark's initial global watermark is epoch 0, and
    // a join input row whose event time EQUALS the watermark is treated
    // as late and dropped — an epoch-0-only edge no real event stream
    // hits (verified: with the raw 0-based grid, exactly the one
    // (ts=0, ts=0) pair goes missing)
    val base = 1000000L
    val shifted = batchDf.withColumn("ts_us", col("ts_us") + base)
    val batch = shifted.filter(col("event_type") === "view")
      .select(col("event_id").as("ref_id"), col("user_id"),
        col("ts_us").as("ref_ts_us"))
      .join(shifted.filter(col("event_type") === "click")
          .select(col("event_id").as("query_id"),
            col("user_id").as("qu"), col("ts_us").as("query_ts_us")),
        col("user_id") === col("qu") &&
          col("query_ts_us") >= col("ref_ts_us") &&
          col("query_ts_us") <= col("ref_ts_us") + horizonUs)
      .select("user_id", "ref_id", "query_id", "ref_ts_us", "query_ts_us")
    val stream = MemoryStream[(Long, Long, Long, Double, String)]
    val q = IncrementalIndexer.streamIntervalJoin(
        stream.toDF().toDF("user_id", "event_id", "ts_us", "value", "event_type")
          .withColumn("ts", expr(s"timestamp_micros(ts_us + $base)")),
        horizon = "500 MICROSECOND")
      .writeStream.outputMode("append")
      .format("memory").queryName("parity_sjoin").start()
    val sorted = events.sortBy(e => (e._3, e._2))
    sorted.grouped((sorted.size + 2) / 3).foreach { b =>
      stream.addData(b); q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("parity_sjoin")
      .select("user_id", "ref_id", "query_id", "ref_ts_us", "query_ts_us")
    // exactly-once: the multiset has no duplicate pairs
    assert(streamed.count() == streamed.distinct().count())
    assert(rows(streamed) == rows(batch))
  }

  test("neardup stream == batch delta screen on random docs with planted cliques") {
    import graft.ext.Dedup
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd2 = new scala.util.Random(23)
    val words = Vector("alpha", "beta", "gamma", "delta", "εψιλον",
      "zeta", "eta", "θητα", "iota", "kappa")
    val base = (1L to 60L).map { id =>
      val n = 8 + rnd2.nextInt(12)
      (id, Seq.fill(n)(words(rnd2.nextInt(words.size))).mkString(" "))
    }
    // every 6th doc near-copies its predecessor (several of these
    // pairs straddle the %5 side split by construction), plus an
    // empty doc and a sub-shingle doc — both must vanish identically
    // from stream and batch
    val docs = base.zipWithIndex.map { case ((id, t), i) =>
      if (i % 6 == 5) (id, base(i - 1)._2 + " omega") else (id, t)
    } ++ Seq((61L, ""), (62L, "x"))
    val df = docs.toDF("doc_id", "text")
    val sh = Dedup.shingleHashes(df, "text", "doc_id", 3)
    val sigs = Dedup.minhashSignatures(sh, 16, preHashed = true)
    val isCorpus = col("doc_id") % 5 =!= 0
    val batch = Dedup.deltaNearDupsFromArtifacts(
      sh.filter(isCorpus), sigs.filter(isCorpus),
      sh.filter(!isCorpus), sigs.filter(!isCorpus),
      k = 16, bands = 4, threshold = 0.4)
    val corpusBanded = Dedup.bandedKeys(sigs.filter(isCorpus), 16, 4)
      .select(col("doc_id").as("corpus_id"), col("band"), col("band_key"))
    val corpusArrs = sh.filter(isCorpus).groupBy("doc_id")
      .agg(sort_array(collect_list(col("shingle"))).as("__hc"),
        count(lit(1)).as("n_c"))
      .select(col("doc_id").as("corpus_id"), col("__hc"), col("n_c"))
    val stream = MemoryStream[(Long, String)]
    val q = IncrementalIndexer.neardupStream(spark,
        stream.toDF().toDF("doc_id", "text").filter(col("doc_id") % 5 === 0),
        corpusBanded, corpusArrs, k = 16, bands = 4, threshold = 0.4)
      .writeStream.outputMode("append")
      .format("memory").queryName("parity_neardup").start()
    docs.grouped(25).foreach { b => stream.addData(b); q.processAllAvailable() }
    q.stop()
    val got = spark.table("parity_neardup").drop("band").distinct()
    assert(batch.count() > 0, "fixture produced no cross-side pairs")
    assert(got.exceptAll(batch).count() == 0 &&
      batch.exceptAll(got).count() == 0,
      "stream emissions != batch delta screen")
  }

  test("weightedSampleStream == batch weightedSample on random weights") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd2 = new scala.util.Random(47)
    // 600 docs, weights on a skewed grid (1..500) — ties in rank_key
    // are possible by construction, exercising the (rank, id) order
    val docs = (1L to 600L).map(i => (i, 1L + rnd2.nextInt(500)))
    val batch = graft.ext.Pipeline.weightedSample(
        docs.toDF("doc_id", "w"), col("w"), k = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val stream = MemoryStream[(Long, Long)]
    val q = IncrementalIndexer.weightedSampleStream(spark,
        stream.toDF().toDF("doc_id", "weight"), k = 50, shards = 16)
      .writeStream.outputMode("update")
      .format("memory").queryName("parity_wsample").start()
    // 3 batches in id order — the fold is a set fold, any split works
    docs.grouped(200).foreach { b => stream.addData(b); q.processAllAvailable() }
    q.stop()
    val got = IncrementalIndexer
      .weightedSampleFinalize(spark.table("parity_wsample"), k = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      .sortBy(_._3)
    assert(batch.nonEmpty && got == batch.sortBy(_._3),
      "streamed reservoir != batch weighted draw")
  }

  test("containmentStream == relational delta containment on planted supersets") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(31)
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu")
    // corpus docs (id % 5 != 0) with long random texts; every delta doc
    // (id % 5 == 0) is a PREFIX SLICE of some corpus doc — contained by
    // construction — except a few independent ones that must NOT match
    val corpus = (1L to 40L).filter(_ % 5 != 0).map { id =>
      val n = 30 + rnd.nextInt(20)
      (id, Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" "))
    }
    val deltas = (1L to 40L).filter(_ % 5 == 0).zipWithIndex.map {
      case (id, i) =>
        if (i % 2 == 0) {
          val src = corpus(rnd.nextInt(corpus.size))._2.split(" ")
          (id, src.take(src.length * 3 / 4).mkString(" "))  // prefix slice
        } else (id, Seq.fill(25)(words(rnd.nextInt(words.size))).mkString(" "))
    }
    val docs = (corpus ++ deltas).sortBy(_._1)
    val df = docs.toDF("doc_id", "text")
    val sh = Dedup.shingleHashes(df, "text", "doc_id", 3)
    val shC = sh.filter(col("doc_id") % 5 =!= 0)
    val shD = sh.filter(col("doc_id") % 5 === 0)
    // relational twin of the stream: corpus-rare blocking + exact verify
    val rare = shC.groupBy("shingle").agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= 8).select("shingle")
    val sizesC = shC.groupBy("doc_id").agg(count(lit(1)).as("n_c"))
    val sizesD = shD.groupBy("doc_id").agg(count(lit(1)).as("n_d"))
    val cands = shD.join(rare, "shingle")
      .select(col("doc_id").as("delta_id"), col("shingle"))
      .join(shC.select(col("doc_id").as("corpus_id"), col("shingle")), "shingle")
      .select("delta_id", "corpus_id").distinct()
    val batch = cands
      .join(shD.select(col("doc_id").as("delta_id"), col("shingle")), "delta_id")
      .join(shC.select(col("doc_id").as("corpus_id"), col("shingle")),
        Seq("corpus_id", "shingle"))
      .groupBy("delta_id", "corpus_id").agg(count(lit(1)).as("shared"))
      .join(sizesD.withColumnRenamed("doc_id", "delta_id"), "delta_id")
      .join(sizesC.withColumnRenamed("doc_id", "corpus_id"), "corpus_id")
      .withColumn("containment_permille", expr("shared * 1000 DIV n_d"))
      .filter(col("n_d") >= 10 && col("containment_permille") >= 800)
      .select("delta_id", "corpus_id", "n_d", "n_c", "shared",
        "containment_permille")
    val rarePostings = shC.join(rare, "shingle")
      .select(col("shingle"), col("doc_id").as("corpus_id"))
    val corpusArrs = shC.groupBy("doc_id")
      .agg(sort_array(collect_list(col("shingle"))).as("__hc"),
        count(lit(1)).as("n_c"))
      .select(col("doc_id").as("corpus_id"), col("__hc"), col("n_c"))
    val stream = MemoryStream[(Long, String)]
    val q = IncrementalIndexer.containmentStream(spark,
        stream.toDF().toDF("doc_id", "text").filter(col("doc_id") % 5 === 0),
        rarePostings, corpusArrs, minShingles = 10, thresholdPermille = 800)
      .writeStream.outputMode("append")
      .format("memory").queryName("parity_containment").start()
    docs.grouped(15).foreach { b => stream.addData(b); q.processAllAvailable() }
    q.stop()
    val got = spark.table("parity_containment").drop("shingle").distinct()
    assert(batch.count() > 0, "fixture planted no contained delta docs")
    assert(got.exceptAll(batch).count() == 0 &&
      batch.exceptAll(got).count() == 0,
      "stream emissions != relational delta containment")
  }

  test("streamed day histogram + cusumFromDaily == batch cusumChangePoint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val day = 86400000000L
    val r = new scala.util.Random(23)
    val evs = (1L to 300L).map { eid =>
      (eid, r.nextInt(12) * day + r.nextInt(1000) * 1000L)
    }
    val batch = Events.cusumChangePoint(evs.toDF("event_id", "ts_us"))
    val stream = MemoryStream[(Long, Long)]
    val q = stream.toDF().toDF("event_id", "ts_us")
      .groupBy(expr("ts_us DIV 86400000000").as("day"))
      .agg(count(lit(1)).as("x"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("parity_cusum").start()
    // batch splits land mid-day: the complete-mode count state must
    // merge per-day partial counts across micro-batches
    evs.grouped(100).foreach { b => stream.addData(b); q.processAllAvailable() }
    q.stop()
    val got = Events.cusumFromDaily(
      spark.table("parity_cusum").select("day", "x"))
    assert(rows(got) == rows(batch))
  }

  test("stream curation screen == batch gates + keep-first with cross-batch dups") {
    // the x_stream_curation composition on a hand fixture that fires
    // EVERY stage: a quality/language gate drop, a near-dup component
    // suppression (non-representative member), an IN-batch exact dup
    // and a CROSS-batch exact dup folding into one digest's state
    import graft.ext.TextAnalysis
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val good = "the quick brown fox and the lazy dog were there with " +
      "many of those words that they have from this good long text it " +
      "is a fine day and the people are happy with their work"
    val docs = Seq(
      (1L, good + " one", "en"),
      (2L, good + " two", "en"),
      (3L, good + " one", "en"),         // in-batch exact dup of 1
      (4L, "12345 67890 !!!", "en"),     // fails quality AND language gates
      (5L, good + " five", "en"),        // near-dup component representative
      (6L, good + " six", "en"),         // same component, suppressed
      (7L, good + " one", "en"))         // CROSS-batch exact dup of 1
    val comps = Seq((5L, 5L), (6L, 5L)).toDF("doc_id", "__comp")
    def gate(df: DataFrame): DataFrame =
      TextAnalysis.qualityScore(TextAnalysis.languageId(df, "text"), "text")
        .filter(col("quality_score") >= 0.5 &&
          col("predicted_lang") === col("lang"))
        .join(comps, Seq("doc_id"), "left_outer")
        .filter(col("__comp").isNull || col("__comp") === col("doc_id"))
    val stream = MemoryStream[(Long, String, String)]
    val q = IncrementalIndexer.dedupStream(spark,
        gate(stream.toDF().toDF("doc_id", "text", "lang")))
      .writeStream.outputMode("update")
      .format("memory").queryName("parity_curation").start()
    docs.grouped(3).foreach { b => stream.addData(b); q.processAllAvailable() }
    q.stop()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("digest").orderBy(col("n_copies").desc)
    val got = spark.table("parity_curation")
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select("digest", "keep_id", "n_copies")
    val batch = gate(docs.toDF("doc_id", "text", "lang"))
      .groupBy(md5(coalesce(col("text"), lit("")).cast("binary")).as("digest"))
      .agg(min(col("doc_id")).as("keep_id"),
        count(lit(1)).as("n_copies"))
    val gotRows = got.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val batchRows = batch.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotRows == batchRows, s"stream $gotRows != batch $batchRows")
    // every stage fired: gate drop (4 survives nowhere), suppression
    // (6's digest absent, 5's present), the dup digest folded 3 copies
    // across two micro-batches under keeper id 1
    assert(!gotRows.exists(_._2 == 4L) && !gotRows.exists(_._2 == 6L))
    assert(gotRows.exists(_._2 == 5L))
    assert(gotRows.exists(r => r._2 == 1L && r._3 == 3L))
    assert(gotRows.size == 3) // digests of one/two/five, nothing else
  }
}
