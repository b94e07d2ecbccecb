package graft

import graft.query.SearchEngine.Request
import graft.serve.SearchPage
import graft.text.Tokenize
import org.apache.spark.sql.SparkSession

/** Scratch main: drive the full page assembly on real testdata. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    val index = Corpus.searchIndex(spark, sf)
    val arts = Corpus.textArtifacts(spark, sf, Tokenize.None_)
    val page = SearchPage.assemble(spark, index, Corpus.rules,
      Request(q = Some("urgent"), tokenize = Tokenize.None_), Some(arts))
    println(s"PAGE count=${page.count} results=${page.results.size}")
    page.facets.foreach(f => println(s"FACET ${f.name}: " +
      f.values.take(3).map(v => s"${v.label}=${v.count} ${v.toggleUrl}").mkString(" | ")))
    println("ENRICHED=" + page.results.head.keys.filter(_.startsWith("display_")).toSeq.sorted.mkString(","))
    // empty-query page
    val tl = SearchPage.assemble(spark, index, Corpus.rules, Request(q = None))
    println(s"TIMELINE count=${tl.count} results=${tl.results.size}")
    spark.stop()
  }
}
