package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-10 measurement harness for the x_dedup_editdist fan-out cap
  * (VERDICT r9 item 6). TWO findings:
  *
  *  1. AQE coalescing vs CPU-bound stages: the capped pair relation is
  *     ~16 B/row, so AQE coalesced the post-aggregate exchange to ~1
  *     partition — and the banded-Levenshtein DP downstream is
  *     CPU-bound, so the whole DP ran on one core. Honest A/B at sf1
  *     (bench config, DP forced): 59.2 s coalesced vs 15.2 s after an
  *     explicit repartition to the session parallelism. AQE sizes
  *     partitions by BYTES; a per-row-CPU stage needs its width
  *     asserted explicitly.
  *  2. Probe methodology: this probe's first version timed the query
  *     with .count(), and column pruning under count() DELETES the
  *     levenshtein projection — it reported 3 s for a "run" that never
  *     executed the DP, and earlier A/B numbers taken that way (26 s
  *     vs 5.3 s) timed only the join skeleton. toRdd.count() forces
  *     the final projection; bench-context numbers are the authority.
  */
object EdProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/repo/target/testdata/sf1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Corpus.registerSources(spark, sfDir)
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$tag%-28s n=$n%-9d t=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    val pairs = ExtShared.minhashPairs(spark, sfDir)
    time("pairs (build+count)") { pairs.count() }
    time("pairs (warm)") { pairs.count() }
    val d = SparkEntry.allDefs.find(_.name == "x_dedup_editdist").get
    // NOT .count(): column pruning under count() deletes the
    // levenshtein projection entirely, so a count-based probe times
    // the join skeleton and never runs the DP (measured 3 s vs the
    // bench's honest 15 s). toRdd forces the full final projection
    // without paying a driver-side collect.
    time("x_dedup_editdist run") {
      d.fn(spark, sfDir).queryExecution.toRdd.count()
    }
    d.fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
