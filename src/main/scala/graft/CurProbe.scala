package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic (r15, VERDICT r14 item 3): decompose
  * x_stream_curation's cost — gate CPU (quality + language projections)
  * vs the component-artifact stream-static probe vs the per-digest
  * dedup state fold vs the per-trigger commit floor.
  * `runMain graft.CurProbe <sfDir>`.
  */
object CurProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "524288")
      .config("spark.sql.files.openCostInBytes", "65536")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.types._
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    Corpus.registerSources(spark, sfDir)
    // warm the artifacts OUTSIDE the timed variants (the bench's setup
    // phase does the same), so variants time the stream only
    time("warm comps artifact") {
      ExtShared.dupComponentsArtifact(spark, sfDir).count(): Unit
    }
    val srcDir = time("warm multiFile src") {
      ExtShared.multiFileSourceDir(spark, sfDir, "documents.parquet", 4)
    }
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    def stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "2").parquet(srcDir)
    def runStream(name: String, df: org.apache.spark.sql.DataFrame,
        mode: String): Unit = {
      val q = df.writeStream.outputMode(mode)
        .format("memory").queryName(name)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.table(name).count(): Unit
    }
    val comps = ExtShared.dupComponentsArtifact(spark, sfDir)
      .withColumnRenamed("component", "__comp")
    def gated(df: org.apache.spark.sql.DataFrame) =
      graft.ext.TextAnalysis.curationGate(df, "text")
        .filter(col("quality_score") >= 0.5 &&
          col("predicted_lang") === col("lang"))
    for (rep <- 1 to 2) {
      // 1. commit floor: pass-through projection, no gates/join/state
      time(s"rep$rep passthrough (commit floor)") {
        runStream(s"cur_pass_$rep", stream.select("doc_id"), "append")
      }
      // 2. + gates only (quality + language projections + filter)
      time(s"rep$rep gates only") {
        runStream(s"cur_gates_$rep", gated(stream).select("doc_id"), "append")
      }
      // 3. + comps stream-static left join (no gates)
      time(s"rep$rep comps join only") {
        runStream(s"cur_join_$rep",
          stream.join(comps, Seq("doc_id"), "left_outer")
            .filter(col("__comp").isNull || col("__comp") === col("doc_id"))
            .select("doc_id"), "append")
      }
      // 4. + dedup state only (the x_stream_dedup fold, same source)
      time(s"rep$rep dedup state only") {
        runStream(s"cur_dedup_$rep",
          graft.streaming.IncrementalIndexer.dedupStream(spark, stream)
            .toDF(), "update")
      }
      // 5. the full declared pipeline
      time(s"rep$rep FULL x_stream_curation") {
        val d = SparkEntry.allDefs.find(_.name == "x_stream_curation").get
        d.fn(spark, sfDir).collect(): Unit
      }
    }
    spark.stop()
  }
}
