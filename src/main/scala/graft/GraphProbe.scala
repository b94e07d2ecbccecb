package graft

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic (r14): decompose x_graph_kcore / x_graph_bfs —
  * per-round INFO trace plus job/stage/task counts per repetition.
  * `runMain graft.GraphProbe <sfDir>`.
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "graft.ext", org.apache.logging.log4j.Level.INFO)
    Corpus.registerSources(spark, sfDir)
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet(): Unit
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        tasks.addAndGet(s.stageInfo.numTasks): Unit
    })
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val (j0, k0) = (jobs.get, tasks.get)
      val r = f
      System.err.println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        f"jobs=${jobs.get - j0} tasks=${tasks.get - k0}")
      r
    }
    val e = time("copurchase edges artifact") {
      val x = ExtShared.copurchaseEdges(spark, sfDir)
      System.err.println(s"[probe] edges = ${x.count()}, " +
        s"partitions = ${x.rdd.getNumPartitions}")
      x
    }
    for (rep <- 1 to 3) {
      time(s"rep$rep kcore") {
        val r = graft.ext.Graph.kcoreRun(e, k = 80, rounds = 6,
          edgesDistinct = true)
        System.err.println(s"[probe] rep$rep rows = ${r.state.count()}, " +
          s"converged = ${r.converged}")
        graft.ext.Dedup.releaseCheckpoint(r.state)
      }
    }
    spark.stop()
  }
}
