package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic (r15, VERDICT item 4): decompose dedup_build —
  * the largest setup entry (39 s sf1) — into its five artifact
  * builds, each forced in dependency order so a build's timing is its
  * own work, not its inputs'. Then A/B the signature build: the
  * relational groupBy over the persisted exploded shingle relation vs
  * the in-row kernel form over per-doc hash arrays.
  * `runMain graft.DedupBuildProbe <sfDir>`.
  */
object DedupBuildProbe {
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
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    Corpus.registerSources(spark, sfDir)
    time("docShingles")   { ExtShared.docShingles(spark, sfDir).count() }
    time("docShingleArrs"){ ExtShared.docShingleArrs(spark, sfDir).count() }
    time("minhashSigs")   { ExtShared.minhashSigs(spark, sfDir).count() }
    // split minhashPairs into its two stages: LSH candidates vs verify
    time("lshCandidates only") {
      graft.ext.Dedup.lshCandidates(ExtShared.minhashSigs(spark, sfDir),
        16, 4).count(): Unit
    }
    time("simhash sig only") {
      graft.ext.Dedup.simhash(spark.table("documents"), "text", "doc_id", 60)
        .write.format("noop").mode("overwrite").save()
    }
    time("minhashPairs")  { ExtShared.minhashPairs(spark, sfDir).count() }
    time("components")    { ExtShared.dupComponentsArtifact(spark, sfDir).count() }
    time("dupSpans")      { ExtShared.dupSpans(spark, sfDir).count() }
    time("simhashPairs")  { ExtShared.simhashPairs(spark, sfDir).count() }

    // A/B the signature build itself, warm inputs, min-of-3 each
    import graft.ext.Dedup
    val sh = ExtShared.docShingles(spark, sfDir)
    for (rep <- 1 to 3) {
      time(s"rep$rep sigs_relational (groupBy over exploded)") {
        Dedup.minhashSignatures(sh, 16, preHashed = true)
          .write.format("noop").mode("overwrite").save()
      }
    }
    graft.functions.ShingleFunctions.register(spark)
    val arrForm = spark.table("documents").select(col("doc_id"),
      graft.functions.ShingleFunctions.shingle_hashes_e(lower(col("text")), 3)
        .as("__arr")).filter(size(col("__arr")) > 0)
    for (rep <- 1 to 3) {
      time(s"rep$rep sigs_inrow_hof (transform/array_min over arrays)") {
        arrForm.select(col("doc_id") +: Dedup.inRowSignature(col("__arr"), 16): _*)
          .write.format("noop").mode("overwrite").save()
      }
    }
    graft.functions.MinhashFunctions.register(spark)
    val kernelForm = spark.table("documents").select(col("doc_id"),
      graft.functions.MinhashFunctions.minhash_sigs_e(
        graft.functions.ShingleFunctions.shingle_hashes_e(
          lower(col("text")), 3), 16).as("__mh"))
      .filter(col("__mh").isNotNull)
      .select(col("doc_id") +:
        (0 until 16).map(i => col("__mh")(i).as(s"mh_$i")): _*)
    for (rep <- 1 to 3) {
      time(s"rep$rep sigs_inrow_kernel (minhash_sigs_e)") {
        kernelForm.write.format("noop").mode("overwrite").save()
      }
    }
    // parity check: kernel form == relational artifact, exact
    time("parity kernel vs relational") {
      val rel = Dedup.minhashSignatures(sh, 16, preHashed = true)
      val diff = kernelForm.exceptAll(rel).count() + rel.exceptAll(kernelForm).count()
      System.err.println(s"[probe] parity diff rows: $diff")
      require(diff == 0, "kernel sigs != relational sigs")
    }
    spark.stop()
  }
}
