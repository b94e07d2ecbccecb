package graft

import graft.ext.Dedup
import org.apache.spark.sql.SparkSession

/** Scratch diagnostic: time the near-dup component clustering in
  * isolation and print the per-round trace (run with
  * `runMain graft.ComponentsProbe <sfDir>`).
  */
object ComponentsProbe {
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
    Corpus.registerSources(spark, sfDir)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val pairs = time("pairs build") {
      val p = Dedup.minhashNearDups(spark.table("documents"), "text", "doc_id",
        3, 16, 4, 0.4).persist()
      System.err.println(s"[probe] n_pairs = ${p.count()}")
      p
    }
    val comps = time("components") {
      Dedup.duplicateComponents(pairs.select("id_a", "id_b")).collect()
    }
    System.err.println(s"[probe] n_nodes = ${comps.length}, " +
      s"n_components = ${comps.map(_.getLong(1)).distinct.length}")
    spark.stop()
  }
}
