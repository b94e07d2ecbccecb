package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic (r15, VERDICT item 7): where does x_dedup_ngram
  * spend its 8 s at sf1 — which stage, and is it width-starved
  * (few tasks), skewed (max >> median), or evenly CPU-bound?
  * Prints per-stage task count, total/max/median task time, and
  * shuffle read/write bytes for one warm run of the operator.
  * `runMain graft.NgramProbe <sfDir>`.
  */
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/scale/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "524288")
      .config("spark.sql.files.openCostInBytes", "65536")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Corpus.registerSources(spark, sfDir)
    // warm the artifact + one warm run, THEN attach the listener
    def once(): Unit = SparkEntry.allDefs.find(_.name == "x_dedup_ngram").get
      .fn(spark, sfDir).collect(): Unit
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      System.err.println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("cold run")(once())
    time("warm run 1")(once())
    val stages = scala.collection.mutable.ArrayBuffer[String]()
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val tm = si.taskMetrics
        if (tm != null) stages += f"stage ${si.stageId}%4d tasks=${si.numTasks}%4d " +
          f"run=${tm.executorRunTime / 1e3}%8.2fs " +
          f"cpu=${tm.executorCpuTime / 1e9}%8.2fs " +
          f"shRead=${tm.shuffleReadMetrics.totalBytesRead / 1e6}%8.1fMB " +
          f"shWrite=${tm.shuffleWriteMetrics.bytesWritten / 1e6}%8.1fMB  " +
          si.name.take(60)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    time("warm run 2 (listened)")(once())
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(1000)
    stages.foreach(s => System.err.println("[probe] " + s))
    spark.stop()
  }
}
