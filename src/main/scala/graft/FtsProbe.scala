package graft

import graft.text.Tokenize
import org.apache.spark.sql.SparkSession

/** Timing probe for the FTS query paths (VERDICT r3 #3: colfilter /
  * escape / phrase regressions) — runs each query N times after the
  * artifact setup so per-query latency is isolated from builds.
  * `sbt "runMain graft.FtsProbe /root/testdata/sf0.1 3"`.
  */
object FtsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // setup identical to Bench
    Corpus.searchIndex(spark, sfDir).count()
    for (mode <- Seq(Tokenize.None_, Tokenize.Porter)) {
      val arts = Corpus.textArtifacts(spark, sfDir, mode)
      arts.postings.count()
      arts.positions.foreach(_.count())
    }

    val names = Seq("p4_fts_colfilter", "p5_escape_fallback", "p4_fts_phrase",
      "p4_fts_not", "p4_fts_or", "p4_fts_prefix", "o1_search_topk")
    val defs = SparkEntry.allDefs.filter(d => names.contains(d.name))
    for (rep <- 1 to reps; d <- defs) {
      val t0 = System.nanoTime()
      d.fn(spark, sfDir).collect()
      println(f"[ftsprobe] rep$rep ${d.name}%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
