package graft

import graft.index.IndexJob
import graft.query.Enrich
import org.apache.spark.sql.SparkSession

/** Scratch smoke main — drives the newest surfaces on real testdata:
  * batched display_sql enrichment + SQL-registered native functions.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    Corpus.registerSources(spark, sf)

    // 1. enrichment through the rules' own display_sql (tpch rule)
    val index = Corpus.searchIndex(spark, sf)
    val rule = Corpus.rules.find(_.db == "tpch.db").get
    val page = index.filter(org.apache.spark.sql.functions.col("type") === rule.typeTag).limit(10)
    val enriched = Enrich.enrichType(spark, rule, page, "urgent")
    println("ENRICH-COLS=" + enriched.columns.filter(_.startsWith("display_")).mkString(","))
    println("ENRICH-ROWS=" + enriched.count())
    enriched.select("key", "title", "display_o_totalprice", "display_c_name").show(3, false)

    // 2. hostile display_sql shapes
    def tryRewrite(tag: String, sql: String): Unit =
      try { Enrich.rewrite(sql, "q'); drop--"); println(s"REWRITE $tag -> ok") }
      catch { case e: Exception => println(s"REWRITE $tag -> ${e.getClass.getSimpleName}") }
    tryRewrite("no-where", "select 1")
    tryRewrite("quote-in-q", "select :q as x from orders where o_orderkey = :key")

    // 3. SQL functions registered on a live session
    GraftExtensions.register(spark)
    spark.sql(
      """SELECT porter_stem('indexing') AS s,
        |       dot_product_f(array(CAST(2.0 AS FLOAT)), array(CAST(4.0 AS FLOAT))) AS d""".stripMargin)
      .show(false)
    spark.stop()
  }
}
