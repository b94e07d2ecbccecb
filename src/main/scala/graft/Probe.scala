package graft

import org.apache.spark.sql.SparkSession

/** Scratch main: drive the fts_match optimizer rule on real data. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.register(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    docs.createOrReplaceTempView("docs")
    val sql = "SELECT count(*) FROM docs WHERE fts_match(text, text, \"table NOT stream\")"

    val interp = spark.sql(sql).collect()(0).getLong(0)
    val t0 = System.nanoTime(); (1 to 5).foreach(_ => spark.sql(sql).collect())
    val tInterp = (System.nanoTime() - t0) / 5e9

    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.RewriteFtsMatch
    val opt = spark.sql(sql).collect()(0).getLong(0)
    val t1 = System.nanoTime(); (1 to 5).foreach(_ => spark.sql(sql).collect())
    val tOpt = (System.nanoTime() - t1) / 5e9
    val plan = spark.sql(sql).queryExecution.executedPlan.toString

    println(f"FTSMATCH interp=$interp opt=$opt agree=${interp == opt}")
    println(f"TIMING interp=$tInterp%.3f s opt=$tOpt%.3f s")
    println("PLAN-RLIKE=" + plan.contains("RLIKE") + " PLAN-FTSMATCH=" + plan.contains("fts_match"))
    spark.stop()
  }
}
