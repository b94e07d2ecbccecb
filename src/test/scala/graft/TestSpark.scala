package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for every suite (sbt forks one test
  * JVM; session startup is ~8s, so suites must not each build one).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val wh = java.nio.file.Files.createTempDirectory("graft-warehouse").toString
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", wh)
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$wh/metastore_db;create=true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    // the engine's native functions (porter_stem, token_pipe_e, ...) —
    // production paths get these from Corpus.registerSources; suites
    // that build DataFrames directly need them on the session too
    GraftExtensions.register(s)
    s
  }
}
