package graft

import org.apache.spark.sql.SparkSession

/** Measurement probe for the n-gram Jaccard blocking variants (VERDICT
  * r7 item 3): times the df-capped and prefix-filter formulations on
  * SPARK_GRAFT_SF_DIR and prints candidate-volume stats, so slope
  * decisions are made on numbers, not plan guesses.
  */
object NgramProbe {
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

    Corpus.registerSources(spark, sfDir)
    val sh = ExtShared.docShingles(spark, sfDir)
    sh.count() // warm the memoized shingle artifact out of the timings

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[ngramprobe] $label rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    time("capped50")(graft.ext.Dedup
      .ngramJaccardPairsFromShingles(sh, 0.4, Some(50)).count())
    time("capped50_again")(graft.ext.Dedup
      .ngramJaccardPairsFromShingles(sh, 0.4, Some(50)).count())
    spark.stop()
  }
}
