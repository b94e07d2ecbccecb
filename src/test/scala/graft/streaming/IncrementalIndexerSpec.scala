package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.sql.Timestamp

/** Structured-Streaming incremental indexing: micro-batches REPLACE-merge
  * into the parquet index; replay is idempotent (SURVEY §1.4/§7.5).
  */
case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

class IncrementalIndexerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ev(id: Long, t: String, et: String) =
    Ev(id, Timestamp.valueOf(t), 7L, et, 1.0, s"""{"k": $id}""")

  test("micro-batches merge incrementally; replay is idempotent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-stream").toString
    val indexPath = s"$dir/index"
    val checkpoint = s"$dir/ckpt"

    val stream = MemoryStream[Ev]
    val q = IncrementalIndexer.start(spark, stream.toDF(), indexPath, checkpoint)

    stream.addData(ev(1, "2024-01-01 10:00:00", "click"),
      ev(2, "2024-01-01 11:00:00", "view"))
    q.processAllAvailable()
    assert(spark.read.parquet(indexPath).count() == 2)

    // second batch: new key 3 + replayed key 2 (REPLACE semantics)
    stream.addData(ev(3, "2024-01-02 09:00:00", "purchase"),
      ev(2, "2024-01-01 11:00:00", "view"))
    q.processAllAvailable()
    q.stop()

    val idx = spark.read.parquet(indexPath)
    assert(idx.count() == 3) // replay did not duplicate
    val row = idx.filter(col("key") === "3").collect()(0)
    assert(row.getAs[String]("title") == "purchase by user 7")
    assert(row.getAs[String]("type") == "events.db/events")
  }

  test("mapGroupsWithState: per-user state evolves across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val q = IncrementalIndexer.userStates(spark, stream.toDF())
      .writeStream.outputMode("update")
      .format("memory").queryName("user_states_spec").start()
    stream.addData(
      Ev(1, Timestamp.valueOf("2024-01-01 10:00:00"), 7L, "click", 1.0, "{}"),
      Ev(2, Timestamp.valueOf("2024-01-01 11:00:00"), 7L, "view", 1.0, "{}"),
      Ev(3, Timestamp.valueOf("2024-01-01 09:00:00"), 8L, "signup", 1.0, "{}"))
    q.processAllAvailable()
    stream.addData( // second batch: user 7 gets an OLDER event — count
      // grows, last_* stays (order-independent argmax state)
      Ev(4, Timestamp.valueOf("2024-01-01 08:00:00"), 7L, "bounce", 1.0, "{}"))
    q.processAllAvailable()
    q.stop()
    // final state per user = the emission with the max event count
    val fin = spark.table("user_states_spec")
      .orderBy(col("user_id"), col("n_events").desc)
      .collect().groupBy(_.getLong(0)).map { case (u, rs) => u -> rs.head }
    assert(fin(7L).getAs[Long]("n_events") == 3L)
    assert(fin(7L).getAs[String]("last_type") == "view") // 11:00 beats 08:00
    assert(fin(7L).getAs[String]("last_ts") == "2024-01-01 11:00:00")
    assert(fin(8L).getAs[Long]("n_events") == 1L &&
      fin(8L).getAs[String]("last_type") == "signup")
  }

  test("flatMapGroupsWithState dedup: cross-batch suppression, min-id fold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = IncrementalIndexer.dedupStream(spark,
        stream.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("update")
      .format("memory").queryName("dedup_stream_spec").start()
    // batch 1: two copies of A (ids 5, 2 — min wins), one B
    stream.addData((5L, "content A"), (2L, "content A"), (7L, "content B"))
    q.processAllAvailable()
    // batch 2: a LATER copy of A — state remembers, keep_id stays 2
    stream.addData((9L, "content A"), (1L, "content C"))
    q.processAllAvailable()
    q.stop()
    val fin = spark.table("dedup_stream_spec")
      .orderBy(col("digest"), col("n_copies").desc)
      .collect().groupBy(_.getString(0)).map { case (d, rs) => d -> rs.head }
    val byKeep = fin.values.map(r =>
      r.getAs[Long]("keep_id") -> r.getAs[Long]("n_copies")).toMap
    assert(byKeep == Map(2L -> 3L, 7L -> 1L, 1L -> 1L))
    // digest matches Spark's md5 of the utf8 bytes (oracle contract)
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest("content A".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(fin.keySet.contains(expect))
  }

  test("sessionStream: open session extends, closes, and reopens across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Long, Long)] // (user_id, event_id, ts_us)
    val q = IncrementalIndexer.sessionStream(spark,
        stream.toDF().toDF("user_id", "event_id", "ts_us"), gapUs = 100L)
      .writeStream.outputMode("update")
      .format("memory").queryName("session_stream_spec").start()
    // batch 1 arrives OUT of event-time order in-batch: sorted in-group
    stream.addData((1L, 2L, 1050L), (1L, 1L, 1000L))
    q.processAllAvailable()
    // batch 2: extends the open session (gap 50 ≤ 100), then a 500-gap
    // event opens session 2
    stream.addData((1L, 3L, 1100L), (1L, 4L, 1600L))
    q.processAllAvailable()
    q.stop()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "session_seq").orderBy(col("n_events").desc)
    val fin = spark.table("session_stream_spec")
      .withColumn("__rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("__rn") === 1).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    assert(fin((1L, 1L)).getAs[Long]("n_events") == 3L)
    assert(fin((1L, 1L)).getAs[Long]("start_us") == 1000L)
    assert(fin((1L, 1L)).getAs[Long]("end_us") == 1100L)
    assert(fin((1L, 2L)).getAs[Long]("n_events") == 1L)
    assert(fin((1L, 2L)).getAs[Long]("duration_us") == 0L)
  }

  test("rollingStream: eviction across batches, ts-tie peers count each other") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // (user_id, event_id, ts_us, value); window 100 µs
    val stream = MemoryStream[(Long, Long, Long, Double)]
    val q = IncrementalIndexer.rollingStream(spark,
        stream.toDF().toDF("user_id", "event_id", "ts_us", "value"),
        windowUs = 100L)
      .writeStream.outputMode("update")
      .format("memory").queryName("rolling_stream_spec").start()
    // batch 1: two TIED events (ts 1000) + one at 1050, out of order
    stream.addData((1L, 3L, 1050L, 2.0), (1L, 1L, 1000L, 1.5), (1L, 2L, 1000L, 1.0))
    q.processAllAvailable()
    // batch 2: 1101 evicts the ts-1000 pair (1101-100=1001 > 1000)
    stream.addData((1L, 4L, 1101L, 0.25))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("rolling_stream_spec").collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(rows(1L) == ((2L, 250L))) // both ts-1000 peers see each other
    assert(rows(2L) == ((2L, 250L)))
    assert(rows(3L) == ((3L, 450L))) // 1000 ≥ 1050-100 → all three
    assert(rows(4L) == ((2L, 225L))) // ts-1000 pair evicted, 1050 stays
  }

  test("funnelStream: steps chain across batches; same-ts chain; no regression") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // (user_id, event_id, ts_us, event_type)
    val stream = MemoryStream[(Long, Long, Long, String)]
    val q = IncrementalIndexer.funnelStream(spark,
        stream.toDF().toDF("user_id", "event_id", "ts_us", "event_type"),
        Seq("view", "click", "purchase"))
      .writeStream.outputMode("update")
      .format("memory").queryName("funnel_stream_spec").start()
    // user 1: click BEFORE any view is not step 2; view later that batch
    // user 2: view+click at the SAME ts chain in one tie group
    stream.addData((1L, 1L, 100L, "click"), (1L, 2L, 200L, "view"),
      (2L, 3L, 500L, "view"), (2L, 4L, 500L, "click"))
    q.processAllAvailable()
    // batch 2: user 1 clicks after its view (t1 = 300); a second view at
    // 250 must NOT lower t0 (in-order contract: arrival is event-time
    // ordered; 250 > 200 anyway) and a purchase completes user 2
    stream.addData((1L, 5L, 250L, "view"), (1L, 6L, 300L, "click"),
      (2L, 7L, 600L, "purchase"))
    q.processAllAvailable()
    q.stop()
    val fin = spark.table("funnel_stream_spec")
      .groupBy("user_id")
      .agg(max(element_at(col("steps"), 1)).as("t0"),
        max(element_at(col("steps"), 2)).as("t1"),
        max(element_at(col("steps"), 3)).as("t2"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(fin(1L) == ((200L, 300L, -1L))) // pre-view click ignored
    assert(fin(2L) == ((500L, 500L, 600L))) // same-ts view→click chained
  }

  test("asofStream: latest-ref carry across batches; same-ts ref matches; ref ties") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // (user_id, event_id, ts_us, value, event_type)
    val stream = MemoryStream[(Long, Long, Long, Double, String)]
    val q = IncrementalIndexer.asofStream(spark,
        stream.toDF().toDF("user_id", "event_id", "ts_us", "value", "event_type"),
        refType = "view", queryType = "click")
      .writeStream.outputMode("update")
      .format("memory").queryName("asof_stream_spec").start()
    // batch 1: click before any view → null ref; two views at the SAME
    // ts (higher id wins); a click exactly at the ref ts matches it
    stream.addData(
      (1L, 1L, 100L, 1.0, "click"),
      (1L, 2L, 200L, 2.0, "view"), (1L, 3L, 200L, 3.0, "view"),
      (1L, 4L, 200L, 4.0, "click"))
    q.processAllAvailable()
    // batch 2: the carry (view id 3) survives; a newer view replaces it
    stream.addData((1L, 5L, 300L, 5.0, "click"),
      (1L, 6L, 400L, 6.0, "view"), (1L, 7L, 500L, 7.0, "click"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("asof_stream_spec").collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(4)).map(_.asInstanceOf[Long]),
          Option(r.get(6)).map(_.asInstanceOf[Double]))).toMap
    assert(rows(1L) == ((None, None)))            // no preceding view
    assert(rows(4L) == ((Some(3L), Some(3.0))))   // same-ts ref, max id
    assert(rows(5L) == ((Some(3L), Some(3.0))))   // carry across batches
    assert(rows(7L) == ((Some(6L), Some(6.0))))   // newer ref replaces
  }

  test("watermarked windowed aggregation over the stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val q = IncrementalIndexer.windowedCounts(stream.toDF())
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_counts").start()
    stream.addData(
      ev(1, "2024-01-01 10:01:00", "click"),
      ev(2, "2024-01-01 10:04:00", "click"),
      ev(3, "2024-01-01 10:12:00", "view"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("win_counts")
      .select("event_type", "n").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows == Map("click" -> 2L, "view" -> 1L))
  }
}
