package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every declared operator from SURVEY §2 (plus the scale extensions) is
  * one [[QueryDef]]: a Spark implementation and, where SQL-expressible,
  * a DuckDB oracle equivalent. Definitions live in:
  *  - [[CoreQueries]] — the reference's own operator surface;
  *  - [[SearchQueries]] — FTS/BM25 text-search pipeline;
  *  - [[TpchQueries]] — the arbitrary-user-SQL analytical surface;
  *  - [[ExtQueries]] — 100 TB pipeline extensions (dedup, similarity,
  *    text analysis, multimodal, streaming-equivalent merge).
  */
object SparkEntry {

  def allDefs: Seq[QueryDef] =
    CoreQueries.defs ++ SearchQueries.defs ++ TpchQueries.defs ++ ExtQueries.defs

  /** Flagship query on sf=0.001; driver smoke-checks rows>0: the full
    * search pipeline (index build → FTS match → BM25 rank → top-k).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("o1_search_topk")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryDef.toQueries(allDefs)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (Porter stemming, xxhash-based sketches) → rows-only check.
    */
  def oracleSql: Map[String, String] = QueryDef.toOracles(allDefs)
}
