package graft

import graft.ext.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measure the winnowing crossover (VERDICT r3 #7): explode+window
  * (one shuffle of ~corpus-chars rows) vs in-row array algebra (zero
  * shuffle, heavier per-row CPU) on the sf0.1 corpus replicated ×N —
  * ×10 ≈ sf1. Replicas get a per-copy text suffix so shuffle pages
  * don't dedupe unrealistically. Prints one line per (scale, variant)
  * plus an AGREE check that both variants produce identical values.
  *
  * Usage: runMain graft.WinnowProbe [sfDir] [replicas...]
  */
object WinnowProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 4, 10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "text")

      val small = docs.limit(200)
      val a = TextAnalysis.winnowFingerprints(small, "text", "doc_id")
      val b = TextAnalysis.winnowFingerprintsInRow(small, "text", "doc_id")
      println(s"AGREE diff=${a.exceptAll(b).count() + b.exceptAll(a).count()}")

      def scaled(n: Int): DataFrame =
        if (n == 1) docs
        else docs.crossJoin(spark.range(n).as("rep"))
          .select((col("doc_id") * n + col("id")).as("doc_id"),
            concat(col("text"), lit(" copy"), col("id")).as("text"))

      for (n <- reps) {
        val d = scaled(n).persist()
        val rows = d.count() // materialize input off the clock
        val variants: Seq[(String, DataFrame => DataFrame)] = Seq(
          "explode+window" -> (d => TextAnalysis.winnowFingerprints(d, "text", "doc_id", 8, 4)),
          "in-row" -> (d => TextAnalysis.winnowFingerprintsInRow(d, "text", "doc_id", 8, 4)))
        for ((tag, f) <- variants) {
          val t0 = System.nanoTime()
          val out = f(d).count()
          val sec = (System.nanoTime() - t0) / 1e9
          println(f"WINNOW x$n docs=$rows $tag%-15s out=$out $sec%.2f s")
        }
        d.unpersist()
      }
    } finally spark.stop()
  }
}
