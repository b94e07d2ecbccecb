package graft

import graft.text.Tokenize
import org.apache.spark.sql.SparkSession

/** Scratch main: steady-state timing of the search path. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    Corpus.textArtifacts(spark, sf, Tokenize.None_).postings.count()
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      SparkEntry.queries("o1_search_topk")(spark, sf).collect()
      println(f"O1-RUN$i ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      SparkEntry.queries("p4_fts_phrase")(spark, sf).collect()
      println(f"PHRASE-RUN$i ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
