package graft

import graft.text.{FtsQuery, Tokenize}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic (r14): decompose the NEAR positional join —
  * per-leg scan cost over the term-clustered positions artifact vs
  * the occurrence join itself. `runMain graft.NearProbe <sfDir>`.
  */
object NearProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
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
    val arts = time("artifacts build") {
      val a = Corpus.textArtifacts(spark, sfDir, Tokenize.None_)
      a.postings.count(); a.positions.foreach(_.count())
      a
    }
    val pos = arts.positions.get
    System.err.println(s"[probe] positions partitions = ${pos.rdd.getNumPartitions}")
    for (rep <- 1 to 2) {
      time(s"rep$rep leg count term=urgent") {
        System.err.println("[probe] n = " +
          pos.filter(col("term").isin("urgent")).count())
      }
      time(s"rep$rep leg full-projection term=urgent") {
        System.err.println("[probe] n = " + pos.filter(col("term").isin("urgent"))
          .queryExecution.toRdd.count())
      }
      time(s"rep$rep leg full-projection term=customer") {
        System.err.println("[probe] n = " + pos.filter(col("term").isin("customer"))
          .queryExecution.toRdd.count())
      }
      time(s"rep$rep full NEAR matchSet") {
        val node = FtsQuery.parseOrEscape("NEAR(urgent customer, 4)", Tokenize.None_).get
        System.err.println("[probe] rows = " +
          graft.query.SearchEngine.matchSet(arts, node).collect().length)
      }
    }
    spark.stop()
  }
}
