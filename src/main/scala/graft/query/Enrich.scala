package graft.query

import graft.core.IndexRule
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-result enrichment: the reference's `display_sql` contract — a
  * per-type SQL with named params `:key` (the result's key) and `:q`
  * (the query string), executed once per result row
  * (reference dogsheep_beta/__init__.py:161-168; documented contract
  * README.md:147-160).
  *
  * The reference defends its N+1 point queries with "many small queries
  * are efficient in SQLite" (README.md:162). On Spark that's an
  * anti-pattern (a job per row), so the same contract executes as ONE
  * batched join per type:
  *
  *  - `:q` is substituted as a string literal (it is constant for the
  *    page);
  *  - `... WHERE <expr> = :key` is rewritten to project `<expr>` as a
  *    join column, and the detail relation is joined to the result
  *    keys — Catalyst broadcasts the small (≤ page size) key side;
  *  - if `display_sql` can return multiple rows per key, the
  *    reference's `.first()` semantics are reproduced with a
  *    deterministic row_number()=1 per key (SURVEY §2.3 J3).
  */
object Enrich {

  private val whereKey = """(?is)(.*)\bwhere\b(.*?)=\s*:key\s*$""".r

  /** Rewrite one display_sql into (projection SQL, join expression SQL).
    * Supports the documented shape `select ... from ... where <expr> = :key`.
    */
  private[graft] def rewrite(displaySql: String, q: String): (String, String) = {
    val escapedQ = "'" + q.replace("'", "''") + "'"
    val sql = displaySql.replace(":q", escapedQ)
    sql match {
      case whereKey(head, keyExpr) => (head.trim, keyExpr.trim)
      case _ =>
        throw new IllegalArgumentException(
          s"display_sql must end in `where <expr> = :key` (README.md:147-160): $displaySql")
    }
  }

  /** Batched enrichment for one rule: join its display_sql detail
    * relation to the page's result keys.
    *
    * @param results page rows (must contain `type` and `key`)
    * @param q       the user query string (substituted for `:q`)
    * @return results of this rule's type, left-joined with the
    *         display_sql columns (prefixed `display_`)
    */
  def enrichType(spark: SparkSession, rule: IndexRule, results: DataFrame,
      q: String): DataFrame = rule.displaySql match {
    case None => results.filter(col("type") === rule.typeTag)
    case Some(displaySql) => enrichWith(spark, rule, results, displaySql, q)
  }

  private def enrichWith(spark: SparkSession, rule: IndexRule,
      results: DataFrame, displaySql: String, q: String): DataFrame = {
    val (body, keyExpr) = rewrite(displaySql, q)
    val detail = spark.sql(body)
      .withColumn("__join_key", expr(keyExpr).cast("string"))
    // reference takes the FIRST row if display_sql yields several
    val detailOne = detail
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("__join_key"))
          .orderBy(detail.columns.map(col): _*)))
      .filter(col("__rn") === 1).drop("__rn")
    val prefixed = detailOne.columns.filterNot(_ == "__join_key").foldLeft(detailOne) {
      (df, c) => df.withColumnRenamed(c, s"display_$c")
    }
    results.filter(col("type") === rule.typeTag)
      .join(broadcast(prefixed), col("key") === col("__join_key"), "left")
      .drop("__join_key")
  }

  /** Enrich a full page: one batched join per type present in the
    * results (≲ number of rules, each against ≤ pageSize keys), then
    * union — versus the reference's one query per RESULT ROW.
    */
  def enrichPage(spark: SparkSession, rules: Seq[IndexRule], results: DataFrame,
      q: String): Map[String, DataFrame] =
    rules.map(r => r.typeTag -> enrichType(spark, r, results, q)).toMap
}
