package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-10 measurement harness for the x_dedup_editdist fan-out cap
  * (VERDICT r9 item 6). FINDING: the capped pair relation is ~16 B/row,
  * so after the top-k aggregate's exchange AQE coalesced it to ~1
  * partition — and the banded-Levenshtein stage downstream is CPU-bound
  * (~170 s of single-core work at sf1), so the "optimization" ran 5×
  * SLOWER than the uncapped form (26 s vs 5.3 s for the same ~240 k
  * pairs) until an explicit repartition restored parallelism. The
  * general lesson is pinned in the query def: AQE sizes partitions by
  * BYTES; a stage whose cost is per-row CPU needs its width asserted
  * explicitly. sf1 after fix: 11.9 s, sf0.1→sf1 slope 5.7×.
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
    time("x_dedup_editdist run") { d.fn(spark, sfDir).count() }
    d.fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
