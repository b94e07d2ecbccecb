package graft

import org.apache.spark.sql.functions._

/** The arbitrary-user-SQL analytical surface (SURVEY §2.1 S3, §2.3 J2):
  * the reference promises to execute any extraction SELECT the user
  * writes (reference README.md:30-48); on Spark that surface is Spark
  * SQL itself. These queries prove it at TPC-H shape and anchor the
  * benchmark.
  *
  * Float-parity rule: every money aggregate casts to DECIMAL(18,2)
  * BEFORE summing (exact, order-independent) and to DOUBLE after — the
  * same bits on both engines regardless of partial-aggregation order
  * (doubles summed in different orders are NOT reproducible; decimals
  * are).
  */
object TpchQueries {

  private def sql(q: String) =
    (spark: org.apache.spark.sql.SparkSession, sfDir: String) => {
      Corpus.registerSources(spark, sfDir)
      spark.sql(q)
    }

  // Pricing summary (TPC-H Q1 shape): wide scan, 4-group aggregation —
  // tests map-side partial aggregation; only l_returnflag/l_linestatus/
  // measure columns are read (column pruning to the parquet scan).
  // Money sums are emitted as fixed-scale DECIMAL STRINGS, not
  // DOUBLEs. Two layers of cross-engine exactness (r7 sf1 gate
  // finding, 16th-digit divergence at 6M rows):
  //  1. factors cast to DECIMAL(12,2) so even the sum_charge TRIPLE
  //     product lands exactly at DECIMAL(38,6) in Spark (25+12+1) and
  //     (36,6) in DuckDB — no precision-cap truncation anywhere;
  //  2. the final cast goes decimal → string, never decimal → double:
  //     once a sum's integer form crosses 2^53 (6M rows at scale 6),
  //     DuckDB's decimal→DOUBLE double-rounds (int→double, then
  //     /10^scale) while Java rounds once — adjacent doubles from the
  //     SAME exact decimal. Strings carry the exact value at any
  //     corpus size.
  private val q1Spark =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS STRING) AS sum_base_price,
      |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2))) AS DECIMAL(38,4)) AS STRING) AS sum_disc_price,
      |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2)) * CAST(1 + l_tax AS DECIMAL(12,2))) AS DECIMAL(38,6)) AS STRING) AS sum_charge,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE CAST(l_shipdate AS DATE) <= DATE '2001-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // Shipping-priority top-k (TPC-H Q3 shape): 3-way join + group +
  // TakeOrderedAndProject; the `orders`/`customer` sides are hash-joined
  // on the shuffle-free broadcast path when small enough (AQE decides).
  private val q3Spark =
    """SELECT l_orderkey,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  date_format(o_orderdate, 'yyyy-MM-dd') AS order_date, o_orderpriority
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND CAST(o_orderdate AS DATE) < DATE '1999-06-30'
      |  AND CAST(l_shipdate AS DATE) > DATE '1997-06-30'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  private val q3Duck = q3Spark.replace(
    "date_format(o_orderdate, 'yyyy-MM-dd')",
    "strftime(o_orderdate, '%Y-%m-%d')")

  // Local-supplier revenue (TPC-H Q5 shape): 6-way join through two
  // dimension chains; region/nation/supplier are broadcast dims.
  private val q5Spark =
    """SELECT n_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  // Forecasting-revenue-change (TPC-H Q6 shape): single wide scan with
  // three pushable predicates and NO join/group key — the pure
  // filter-pushdown + map-side-aggregate showcase: the parquet scan
  // must read only 4 columns and the plan is Scan → Filter → partial
  // agg → 1-row final agg.
  private val q6Spark =
    """SELECT
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
      |  AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  // Returned-item reporting (TPC-H Q10 shape): selective flag filter on
  // the fact side, two broadcastable dims, top-20 customers by lost
  // revenue via TakeOrderedAndProject.
  private val q10Spark =
    """SELECT c_custkey, c_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  n_name
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |  AND CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
      |  AND CAST(o_orderdate AS DATE) < DATE '1997-07-01'
      |GROUP BY c_custkey, c_name, n_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  // Parts/brand rollup with CASE + string predicates (F2/F3 surface at
  // analytical scale).
  private val q16Spark =
    """SELECT p_brand, p_type,
      |  count(DISTINCT l_suppkey) AS supplier_cnt,
      |  count(*) AS n_items
      |FROM part JOIN lineitem ON p_partkey = l_partkey
      |WHERE p_size >= 20
      |GROUP BY p_brand, p_type
      |ORDER BY supplier_cnt DESC, p_brand, p_type""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q1_pricing_summary", sql(q1Spark), Some(q1Spark)),
    QueryDef("q3_topk_revenue", sql(q3Spark), Some(q3Duck)),
    QueryDef("q5_nation_revenue", sql(q5Spark), Some(q5Spark)),
    QueryDef("q6_forecast_revenue", sql(q6Spark), Some(q6Spark)),
    QueryDef("q10_returned_items", sql(q10Spark), Some(q10Spark)),
    QueryDef("q16_parts_rollup", sql(q16Spark), Some(q16Spark))
  )
}
