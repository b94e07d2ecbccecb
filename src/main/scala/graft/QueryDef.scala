package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared operator query: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle equivalent over
  * the same parquet tables. Both sides alias output columns identically
  * and end in a deterministic total ORDER BY, so the driver's
  * sorted-column value hash matches bit-for-bit.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

object QueryDef {
  def toQueries(defs: Seq[QueryDef]): Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.fn).toMap
  def toOracles(defs: Seq[QueryDef]): Map[String, String] =
    defs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
