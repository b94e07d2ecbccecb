package graft

import org.apache.spark.sql.SparkSession

/** Time individual declared queries (local perf iteration without a
  * full Bench sweep): `runMain graft.QTime <sfDir> <query>...` —
  * artifacts warm up first like Bench's setup phase when the query
  * needs them.
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val defs = SparkEntry.allDefs.map(d => d.name -> d).toMap
    for (n <- names) {
      val t0 = System.nanoTime()
      defs(n).fn(spark, sfDir).collect()
      println(f"QTIME $n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
