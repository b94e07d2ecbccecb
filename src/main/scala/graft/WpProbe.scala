package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: where do x_pipe_wordpiece's seconds go? The corpus
  * has ~31 distinct words at sf0.1, so the greedy fold is over 31 rows
  * — yet the query measures seconds. Phases timed separately:
  * vocab-artifact read, wordTable (scan+explode+agg), full encode;
  * each twice (cold/warm split).
  */
object WpProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String)(f: => Unit): Unit = {
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        f
        println(f"[wp] $label run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    Corpus.registerSources(spark, sfDir)
    val docs = spark.table("documents")
    t("vocab artifact count") {
      ExtShared.wordpieceVocabArtifact(spark, sfDir).count(): Unit
    }
    t("vocab artifact collect") {
      ExtShared.wordpieceVocabArtifact(spark, sfDir)
        .select("piece", "is_cont").collect(): Unit
    }
    t("wordTable scan+agg") {
      val toks = filter(split(coalesce(col("text"), lit("")), "\\s+"),
        t => t =!= "")
      docs.select(explode(toks).as("word"))
        .groupBy("word").agg(count(lit(1)).as("cnt")).collect(): Unit
    }
    t("full wordpieceEncode") {
      graft.ext.Pipeline.wordpieceEncode(docs, "text",
        ExtShared.wordpieceVocabArtifact(spark, sfDir)).collect(): Unit
    }
    spark.stop()
  }
}
