package graft

import graft.text.Tokenize
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every declared query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. The one-time ETL (index build + text-index
  * build) is timed separately as `index_build` / `text_index_build`,
  * then each query runs against the persisted artifacts — mirroring the
  * reference's serving model, where indexing is a batch CLI and queries
  * hit the prebuilt index (reference dogsheep_beta/cli.py:33-41).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }

    val tIndex = time { Corpus.searchIndex(spark, sfDir).count() }
    val tText = time {
      Corpus.textArtifacts(spark, sfDir, Tokenize.None_).postings.count()
      Corpus.textArtifacts(spark, sfDir, Tokenize.Porter).postings.count()
    }

    val results = scala.collection.mutable.LinkedHashMap[String, Double](
      "index_build" -> tIndex, "text_index_build" -> tText)
    SparkEntry.allDefs.foreach { d =>
      results(d.name) = time {
        try d.fn(spark, sfDir).collect()
        catch { case e: Throwable =>
          System.err.println(s"[bench] ${d.name} failed: ${e.getMessage}")
        }
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.values.sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
