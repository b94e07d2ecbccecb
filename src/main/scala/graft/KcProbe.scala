package graft

import org.apache.spark.sql.SparkSession

/** k-scaling receipt for [[graft.ext.Similarity.kcenterSelect]]
  * (VERDICT r12 item 1): the r12 form rescored every vector against
  * ALL picked centers each round — O(k²·n·d) with an O(k·d) plan
  * literal per round — so its cost curve bent up in k. The r13
  * running-min recurrence folds only the one new center per round
  * (O(k·n·d) total); this probe measures the selection at growing k
  * on the same corpus and emits one JSON line
  * (→ BENCH_KCENTER_K_r13.json). "Done" per the verdict = near-linear
  * cost in k from 6 → 48.
  *
  * Each k runs in the same (warm) JVM twice; we report the min (the
  * Bench convention). The warm-up pass at k=6 pays the codegen /
  * parquet-footer costs so the k-curve is the algorithm, not JIT.
  */
object KcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Corpus.registerSources(spark, sfDir)
    val emb = spark.table("embeddings")
    // Residency receipt (ADVICE r13 / r14 fix): the running-min loop
    // unpersists each superseded round's checkpoint and the final one
    // on return, so persisted-RDD count after ANY k must be the
    // pre-call baseline — before the fix it grew by ~k blocks per call.
    def persisted(): Int = spark.sparkContext.getPersistentRDDs.size
    val residencyBaseline = persisted()
    def timeK(k: Int): Double = {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = ext.Similarity.kcenterSelect(emb, k = k).count()
        require(n == k, s"expected $k centers, got $n")
        (System.nanoTime() - t0) / 1e9
      }
      runs.min
    }
    timeK(6) // warm-up: codegen + footer reads out of the curve
    val ks = Seq(6, 12, 24, 48)
    val times = ks.map(k => k -> timeK(k))
    val residencyAfter = persisted()
    val loadAvg = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val body = times.map { case (k, t) => f""""kcenter_k$k":$t%.3f""" }
      .mkString(",")
    val total = times.map(_._2).sum
    val r48 = times.last._2 / times.head._2
    println(f"""{"metric":"kcenter_k_scaling","value":$total%.3f,"unit":"sec","queries":{$body},"runs_per_query":2,"agg":"min","errors":[],"ratio_k48_over_k6":$r48%.2f,"linear_ratio":8.0,"persisted_rdds_before":$residencyBaseline,"persisted_rdds_after_all_runs":$residencyAfter,"regime":{"heap_gb":${Runtime.getRuntime.maxMemory / 1e9}%.2f,"cpus":32,"load_avg":$loadAvg%.2f},"sf":"$sfDir"}""")
    spark.stop()
  }
}
