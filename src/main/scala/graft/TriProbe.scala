package graft

import org.apache.spark.sql.SparkSession

/** Measurement harness for x_graph_triangles (r8 verdict item 5 — the
  * "23.6 s standalone vs 39.6 s in-context" gap). Findings (sf1,
  * local[32], this box):
  *
  *  1. The gap's sign was an artifact of JVM warmth, not context
  *     memory pressure: six repeated executions of the identical
  *     query in one JVM measure 247 → 114 → 58 → 28 → 43 → 20 s —
  *     each run re-generates fresh codegen classes that C2 compiles
  *     from scratch, so single-shot / min-of-2 ONLY-mode numbers run
  *     2-5× over the full bench's warm in-context numbers. Standalone
  *     and in-context converge once both are warm.
  *  2. The REAL structural bug this investigation surfaced: `tri` fed
  *     the per-node credit union three ways un-materialized, so the
  *     closure join (the query's dominant term) executed 3× per run —
  *     and the pushed `size(ws) > 0` join condition evaluated the
  *     intersection a second time per row. Fixed with an eager
  *     localCheckpoint of tri ([[graft.ext.Graph.triangleStats]]),
  *     plus the sorted-adjacency merge kernel
  *     ([[graft.functions.SortedIntersect]]) replacing
  *     array_intersect's per-call hash set: warm steady-state
  *     ~20 s → the committed cut's in-context number.
  */
object TriProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/testdata/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = SparkEntry.allDefs.find(_.name == "x_graph_triangles").get
    for (i <- 1 to 6) {
      val t0 = System.nanoTime()
      d.fn(spark, sfDir).collect()
      val mem = (Runtime.getRuntime.totalMemory - Runtime.getRuntime.freeMemory) / (1 << 20)
      println(f"run$i t=${(System.nanoTime() - t0) / 1e9}%.2f s heapMB=$mem")
    }
    spark.stop()
  }
}
