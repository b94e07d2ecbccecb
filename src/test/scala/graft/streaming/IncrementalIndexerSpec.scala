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
