package graft

import graft.ext.Events
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measures the as-of join's union+window shape against the naive
  * range-join formulation (join on key AND r.ts <= q.ts, then a
  * windowed latest-pick) — on the real events table and on a skewed
  * variant where one key owns half the rows. The naive plan
  * materializes every (query, earlier-ref) pair before discarding all
  * but one per query — quadratic in a hot key's size; the union+window
  * shape sorts it instead. Numbers go to PLANS_r6.md.
  */
object AsofProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $label rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    def naive(queries: org.apache.spark.sql.DataFrame,
        refs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val r = refs.select(col("user_id").as("__ru"),
        col("event_id").as("ref_event_id"), col("ts_us").as("ref_ts_us"),
        col("value").as("ref_value"))
      val w = Window.partitionBy(col("event_id"))
        .orderBy(col("ref_ts_us").desc, col("ref_event_id").desc)
      queries.join(r,
          col("user_id") === col("__ru") && col("ref_ts_us") <= col("ts_us"),
          "left")
        .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
        .drop("__rn", "__ru")
    }

    Corpus.registerSources(spark, sfDir)
    val ev = spark.table("events").withColumn("ts_us", unix_micros(col("ts")))
      .select("event_id", "user_id", "ts_us", "value")
    val clicks = ev.filter(expr("event_id % 5 = 1"))
    val views = ev.filter(expr("event_id % 5 = 2"))

    // warm both inputs
    clicks.count(); views.count()

    for (i <- 1 to 2) {
      time(s"union_window (events, run $i)") {
        Events.asofJoin(clicks, views).count()
      }
      time(s"naive_rangejoin (events, run $i)") {
        naive(clicks, views).count()
      }
    }

    // skewed: 200k events, one user owns half of them
    val n = 200000L
    val skew = spark.range(n).select(
      col("id").as("event_id"),
      when(col("id") % 2 === 0, 7L).otherwise(pmod(col("id"), lit(500L))).as("user_id"),
      (col("id") * 1000L).as("ts_us"),
      (col("id") % 100).cast("double").as("value"))
      .localCheckpoint()
    val sq = skew.filter(expr("event_id % 5 = 1"))
    val sr = skew.filter(expr("event_id % 5 = 2"))
    for (i <- 1 to 2) {
      time(s"union_window (skewed hot key, run $i)") {
        Events.asofJoin(sq, sr).count()
      }
      time(s"naive_rangejoin (skewed hot key, run $i)") {
        naive(sq, sr).count()
      }
    }
    // equivalence on the real table (sanity: same matches)
    val a = Events.asofJoin(clicks, views)
      .select("event_id", "ref_event_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val b = naive(clicks, views)
      .select("event_id", "ref_event_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    println(s"PROBE equivalence ${if (a == b) "OK" else "MISMATCH"} (${a.size} rows)")
    spark.stop()
  }
}
