package graft

import graft.query.SearchEngine
import graft.query.SearchEngine.Request
import org.apache.spark.sql.SparkSession

/** Scratch smoke main — drives the driver contract surface the way the
  * driver does (entry smoke + hostile search inputs). Not library code.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 1. driver smoke: entry rows > 0
    val e = SparkEntry.entry(spark)
    println(s"ENTRY rows=${e.count()}")
    e.show(5, false)

    // 2. hostile probes through the search surface
    val idx = Corpus.searchIndex(spark, "/root/testdata/sf0.001")
    def probe(tag: String, q: String): Unit =
      try {
        val n = SearchEngine.search(spark, idx, Request(q = Some(q))).count()
        println(s"PROBE $tag -> $n rows")
      } catch { case ex: Throwable => println(s"PROBE $tag -> EXCEPTION ${ex.getClass.getSimpleName}: ${ex.getMessage}") }
    probe("garbage-symbols", "#!$% @@")
    probe("unterminated-quote", "\"slow fast")
    probe("only-operators", "AND NOT OR")
    probe("sql-injection-ish", "'; DROP TABLE search_index; --")
    probe("huge-token", "a" * 10000)
    probe("empty", "")
    probe("whitespace", "   ")
    probe("not-only", "NOT urgent")

    // 3. unknown filter values (string-typed loose filters)
    val r = SearchEngine.search(spark, idx,
      Request(q = Some("urgent"), category = Some("999"), isPublic = Some("1")))
    println(s"FILTER-no-match rows=${r.count()}")
    spark.stop()
  }
}
