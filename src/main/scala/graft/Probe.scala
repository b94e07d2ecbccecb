package graft

import graft.ext.Multimodal
import graft.index.IndexJob
import graft.streaming.IncrementalIndexer
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch smoke main — drives the newest library surfaces end-to-end
  * on real testdata (not a test harness; the package-boundary drive).
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
    val dir = java.nio.file.Files.createTempDirectory("graft-probe").toString

    // 1. incremental REPLACE merges into a parquet index: two slices,
    // second overlaps the first (events 0-599, then 400-999 with the
    // same doc shape) — REPLACE semantics + self-overwrite safety.
    val docsAll = IncrementalIndexer.eventDocs(spark.table("events"))
    val s1 = docsAll.filter(col("key").cast("long") < 600)
    val s2 = docsAll.filter(col("key").cast("long") >= 400)
    IndexJob.replaceInto(spark, s"$dir/index", s1)
    println(s"AFTER-SLICE1 rows=${spark.read.parquet(s"$dir/index").count()}")
    IndexJob.replaceInto(spark, s"$dir/index", s2)
    val after = spark.read.parquet(s"$dir/index")
    println(s"AFTER-SLICE2 rows=${after.count()} distinctKeys=${after.select("key").distinct().count()}")

    // 2. replay slice 2 — idempotent
    IndexJob.replaceInto(spark, s"$dir/index", s2)
    println(s"AFTER-REPLAY rows=${spark.read.parquet(s"$dir/index").count()}")

    // 3. multimodal batch plumbing over real documents
    val mm = Multimodal.extractMeta(spark,
      Multimodal.withPayload(spark.table("documents"), "text"), "doc_id")
    println(s"MM-META rows=${mm.count()} sample=${mm.head()}")
    val feats = Multimodal.extractFeatures(spark,
      Multimodal.withPayload(spark.table("documents").limit(10), "text"),
      "doc_id", frames = 4, dim = 8)
    println(s"MM-FEATS rows=${feats.count()}")

    spark.stop()
  }
}
