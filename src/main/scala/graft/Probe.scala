package graft

import graft.ext.Similarity
import graft.functions.VectorFunctions
import org.apache.spark.sql.SparkSession

/** Scratch smoke main — plan inspection + surface drive for the
  * perf-path changes (native dot product, postings match path).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    Corpus.registerSources(spark, sf)
    val vecs = spark.table("embeddings")
    val q = Similarity.vectorOf(vecs, "vec_id", 0L)

    // 1. native expression reaches the physical plan + codegen
    val plan = Similarity.bruteForceTopK(vecs, q, 5).queryExecution.executedPlan.toString
    println("PLAN-HAS-DOT=" + plan.contains("dot_product_f"))
    println("PLAN-HAS-WSCG=" + (plan.contains("WholeStageCodegen") || plan.contains("*(")))
    println("PLAN:\n" + plan.linesIterator.take(12).mkString("\n"))
    Similarity.bruteForceTopK(vecs, q, 5).show(5, false)

    // 2. SQL surface: registered function callable from user SQL
    VectorFunctions.register(spark)
    spark.sql(
      s"""SELECT vec_id, dot_product_f(embedding, embedding) AS sq_norm
         |FROM embeddings ORDER BY vec_id LIMIT 3""".stripMargin).show(false)

    // 3. postings match path: explain o1 search (AND-of-terms)
    val o1 = SparkEntry.queries("o1_search_topk")(spark, sf)
    val p1 = o1.queryExecution.executedPlan.toString
    println("O1-ROWS=" + o1.count())
    println("O1-USES-TAKEORDERED=" + p1.contains("TakeOrderedAndProject"))

    // 4. parquet scan pushdown sanity on a filtered timeline
    val tl = SparkEntry.queries("p2_filter_eq")(spark, sf)
    println("P2-ROWS=" + tl.count())
    spark.stop()
  }
}
