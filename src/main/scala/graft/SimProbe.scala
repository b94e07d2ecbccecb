package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic (r14): decompose x_sim_clusters over the kNN
  * artifact — per-leg times across repeated runs to localize where a
  * warm re-run spends (artifact scan? components rounds? rollup?).
  * `runMain graft.SimProbe <sfDir>`.
  */
object SimProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_CACHE_AQE", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "graft.ext", org.apache.logging.log4j.Level.INFO)
    Corpus.registerSources(spark, sfDir)
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet(): Unit
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks): Unit
      }
    })
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val (j0, s0, k0) = (jobs.get, stages.get, tasks.get)
      val r = f
      System.err.println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        f"jobs=${jobs.get - j0} stages=${stages.get - s0} tasks=${tasks.get - k0}")
      r
    }
    time("ivf warm") {
      Corpus.ivfIndex(spark, sfDir).assigned.count(): Unit
    }
    time("knn plain collect") {
      System.err.println(s"[probe] knn rows (collect) = " +
        s"${graft.ext.Similarity.knnGraph(Corpus.ivfIndex(spark, sfDir).assigned, k = 3).collect().length}")
    }
    time("knn plain collect warm") {
      System.err.println(s"[probe] knn rows (collect) = " +
        s"${graft.ext.Similarity.knnGraph(Corpus.ivfIndex(spark, sfDir).assigned, k = 3).collect().length}")
    }
    val knn = time("knn artifact persist+count") {
      val k = ExtShared.knnGraphArtifact(spark, sfDir)
      System.err.println(s"[probe] knn rows = ${k.count()}, " +
        s"partitions = ${k.rdd.getNumPartitions}")
      k
    }
    time("knn artifact count warm") { knn.count(): Unit }
    for (rep <- 1 to 3) {
      val edges = time(s"rep$rep edges filter+distinct+count") {
        val e = knn.filter(col("cos_e6") >= 300000)
          .select(least(col("vec_id"), col("nbr_id")).as("id_a"),
            greatest(col("vec_id"), col("nbr_id")).as("id_b"))
          .distinct()
        System.err.println(s"[probe] rep$rep n_edges = ${e.count()}")
        e
      }
      val comp = time(s"rep$rep components") {
        graft.ext.Dedup.duplicateComponents(edges)
      }
      time(s"rep$rep rollup+collect") {
        val out = comp.join(
            comp.groupBy("component").agg(count(lit(1)).as("cluster_size")),
            Seq("component"))
          .select(col("doc_id").as("vec_id"), col("component").as("cluster_id"),
            col("cluster_size"))
          .orderBy("vec_id").collect()
        System.err.println(s"[probe] rep$rep rows = ${out.length}")
      }
      System.err.println(s"[probe] rep$rep persisted_rdds = " +
        s"${spark.sparkContext.getPersistentRDDs.size}")
    }
    spark.stop()
  }
}
