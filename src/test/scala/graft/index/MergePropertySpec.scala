package graft.index

import graft.TestSpark
import graft.core.Schema
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property checks for the REPLACE-merge contract (SURVEY §1.4/§5):
  * last-writer-wins on (type, key), survivors untouched, idempotent
  * under replay — over generated batches, not just the fixtures.
  */
class MergePropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val rnd = new scala.util.Random(42)

  private def batch(tag: String, n: Int): DataFrame = {
    import spark.implicits._
    Schema.conform(
      (0 until n).map { _ =>
        val key = rnd.nextInt(12).toString
        ("g.db/t", key, s"$tag-${rnd.nextInt(1000)}")
      }.toDF("type", "key", "title"))
  }

  private def canon(df: DataFrame): Seq[(String, String)] =
    df.select("key", "title").collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq

  test("merge is idempotent under replay: merge(merge(s,b), b) == merge(s,b)") {
    for (i <- 1 to 5) {
      val s = IndexJob.dedupe(batch(s"s$i", 8))
      val b = IndexJob.dedupe(batch(s"b$i", 8))
      val once = IndexJob.merge(s, b)
      val twice = IndexJob.merge(once, b)
      assert(canon(once) == canon(twice), s"replay changed state (case $i)")
    }
  }

  test("merge is last-writer-wins and never deletes unmatched keys") {
    for (i <- 1 to 5) {
      val s = IndexJob.dedupe(batch(s"old$i", 10))
      val b = IndexJob.dedupe(batch(s"new$i", 6))
      val merged = IndexJob.merge(s, b)
      val bKeys = b.select("key").collect().map(_.getString(0)).toSet
      val sKeys = s.select("key").collect().map(_.getString(0)).toSet
      val out = canon(merged).toMap
      // every batch key took the batch's value
      canon(b).foreach { case (k, t) => assert(out(k) == t) }
      // every unmatched pre-existing key survived with its old value
      canon(s).filterNot(kv => bKeys.contains(kv._1))
        .foreach { case (k, t) => assert(out(k) == t) }
      assert(out.keySet == sKeys ++ bKeys) // nothing invented or dropped
    }
  }
}
