package graft

import graft.query.SearchEngine.Request
import graft.serve.SearchPage
import graft.text.Tokenize
import org.apache.spark.sql.SparkSession

/** Scratch main: drive default-JSON rendering + intcomma on real data. */
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
    // 'click' matches events docs; events rule has NO display_sql
    val page = SearchPage.assemble(spark, index, Corpus.rules,
      Request(q = Some("click"), tokenize = Tokenize.None_), Some(arts))
    println("COUNT=" + SearchPage.intcomma(page.count))
    val ev = page.results.find(_("type") == "events.db/events").get
    println("DEFAULT-JSON=" + ev("display_json").take(120))
    spark.stop()
  }
}
