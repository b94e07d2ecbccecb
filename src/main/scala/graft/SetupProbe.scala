package graft

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic (r14): time the setup entries whose r14 code
  * changed (dedup_build's component artifact, pca_build's driver
  * fold) in isolation — the sf1 full-cut setup singles are documented
  * ±3x noise, so a suspect entry gets its own quiet measurement.
  * `runMain graft.SetupProbe <sfDir>`.
  */
object SetupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "524288")
      .config("spark.sql.files.openCostInBytes", "65536")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    time("dedup_build") { ExtQueries.warmDedupArtifacts(spark, sfDir) }
    for (rep <- 1 to 3) time(s"rep$rep pca_build") {
      ExtShared.pcaCache.clear()
      ExtShared.pcaArtifact(spark, sfDir): Unit
    }
    time("tokenizer_build") { ExtShared.warmTokenizerArtifacts(spark, sfDir) }
    spark.stop()
  }
}
