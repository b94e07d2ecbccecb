package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Core data model of the search engine.
  *
  * Mirrors the reference's `search_index` wide table
  * (reference: dogsheep_beta/utils.py:5-21) — one row per indexed
  * document, identity = (type, key). SQLite's rowid is deliberately NOT
  * reproduced (reference/dogsheep_beta/__init__.py:10 uses it only as a
  * join key / tie-break; it is unstable across rebuilds — SURVEY §1.2).
  *
  * Spark-first choices:
  *  - columnar Parquet storage, partitionable by `type` (low cardinality,
  *    aligns with the hottest filter + facet dimension);
  *  - `timestamp` kept as ISO-8601 text exactly like the reference
  *    (README.md:66) so lexicographic ORDER BY == chronological ORDER BY
  *    and oracle hashing is byte-stable; a derived `ts_date` (first 10
  *    chars) serves date facets sargably.
  */
object Schema {

  /** A document in the search index (reference utils.py:5-15). */
  final case class SearchDoc(
      `type`: String,
      key: String,
      title: String,
      timestamp: String,
      category: Option[Int],
      is_public: Int,
      search_1: String,
      search_2: String,
      search_3: String
  )

  /** Column order of the wide schema (reference utils.py:5-15). */
  val columns: Seq[String] = Seq(
    "type", "key", "title", "timestamp", "category",
    "is_public", "search_1", "search_2", "search_3")

  val structType: StructType = StructType(Seq(
    StructField("type", StringType, nullable = false),
    StructField("key", StringType, nullable = false),
    StructField("title", StringType, nullable = true),
    StructField("timestamp", StringType, nullable = true),
    StructField("category", IntegerType, nullable = true),
    StructField("is_public", IntegerType, nullable = false),
    StructField("search_1", StringType, nullable = true),
    StructField("search_2", StringType, nullable = true),
    StructField("search_3", StringType, nullable = true)
  ))

  /** Dimension seed rows (reference utils.py:23-27). Always broadcast in
    * joins — 3 rows is the canonical "small dim" case.
    */
  val categorySeed: Seq[(Int, String)] =
    Seq((1, "created"), (2, "saved"), (3, "received"))

  def categories(spark: SparkSession): DataFrame = {
    import spark.implicits._
    categorySeed.toDF("id", "name")
  }

  /** Conform an arbitrary extraction result to the wide schema: keep the
    * intersection of produced columns, pad the rest with NULL, apply the
    * NOT-NULL-default on is_public, and coerce `key` to text (the
    * reference stores every key as TEXT — proven by tests/test_cli.py:80).
    * This reproduces the reference's inferred-ingest contract
    * (utils.py:68-70 + §1.3 of SURVEY.md) without per-rule DDL.
    */
  def conform(df: DataFrame): DataFrame = {
    val present = df.columns.toSet
    val cols = columns.map {
      case c if !present.contains(c) =>
        c match {
          case "is_public" => lit(0).cast(IntegerType).as(c)
          case "category"  => lit(null).cast(IntegerType).as(c)
          case other       => lit(null).cast(StringType).as(other)
        }
      case "key"       => col("key").cast(StringType).as("key")
      case "category"  => col("category").cast(IntegerType).as("category")
      case "is_public" =>
        coalesce(col("is_public").cast(IntegerType), lit(0)).as("is_public")
      case "type"      => col("type").cast(StringType).as("type")
      case c           => col(c).cast(StringType).as(c)
    }
    df.select(cols: _*)
  }
}
