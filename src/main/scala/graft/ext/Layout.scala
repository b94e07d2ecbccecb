package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Storage-layout operators — the write-side half of scan performance
  * at 100 TB. A table queried by TWO dimensions at once (user and
  * time, host and date, ...) cannot be pruned by sorting on either
  * one alone: sort by time and a user-filter touches every file; sort
  * by user and a time-filter does. Z-ORDERING interleaves the bits of
  * both dimensions into one sort key, so consecutive rows are close
  * in BOTH dimensions, every file's (min, max) box on each ORIGINAL
  * column is tight, and a box predicate prunes to O(perimeter) files
  * via ordinary parquet min/max stats — no index structure, no query
  * rewrite: the pushed-down filters the scan already does are what
  * skips the files (the Delta/Iceberg OPTIMIZE ZORDER design,
  * relationalized to plain parquet).
  *
  * Query results are layout-INVARIANT (same rows whatever the file
  * order), so the declared query is oracle-checked exactly against
  * the unordered table; the pruning claim is asserted separately by
  * LayoutSpec over per-file min/max boxes.
  */
object Layout {

  /** Bits per dimension: 2 × 21 = 42 interleaved bits in a BIGINT. */
  val ZBits = 21

  /** N-D Morton (Z-order) key: bit-interleave of already-quantized
    * non-negative dimensions (each < 2^bits, n·bits ≤ 63). Pure
    * integer Column algebra — n·bits shift/mask terms OR-folded,
    * fully codegen'd, zero shuffle. Dimension j's bit i lands at
    * position i·n + j, so earlier columns get the lower (finer)
    * interleave slots — order columns by query selectivity.
    */
  def zValueN(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty && cols.size * bits <= 63,
      s"${cols.size} dims x $bits bits exceeds a BIGINT")
    val n = cols.size
    (0 until bits).flatMap { i =>
      cols.zipWithIndex.map { case (c, j) =>
        shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + j)
      }
    }.reduce(_.bitwiseOR(_))
  }

  /** 2-D convenience form of [[zValueN]]. */
  def zValue(a: Column, b: Column, bits: Int = ZBits): Column =
    zValueN(Seq(a, b), bits)

  /** Affine quantization of a LONG column onto [0, 2^bits): the rank
    * space the z-key interleaves. Double arithmetic is deliberate —
    * `(c - min) · (2^bits - 1)` overflows BIGINT for wide µs spans,
    * and the quantizer only decides file PLACEMENT, never a query
    * result, so IEEE determinism (same data → same layout) is all
    * that is required.
    */
  def quantize(c: Column, minV: Long, maxV: Long, bits: Int = ZBits): Column = {
    val span = math.max(1L, maxV - minV)
    floor((c - lit(minV)).cast("double") / span * ((1L << bits) - 1))
      .cast("long")
  }

  /** Write `df` as `nFiles` parquet files z-ordered on two or more
    * LONG columns: quantize each dimension by its global (min, max)
    * — ONE 1-row aggregate, the only driver state — interleave,
    * range-partition on the z-key (so files tile the z-curve), sort
    * within partitions (so row-group stats are tight inside each
    * file too). The z-key is dropped before writing: readers prune
    * on the ORIGINAL columns' stats and need never know the layout.
    * Bits per dimension = min(ZBits, 63 / n dims).
    */
  def writeZOrderedN(df: DataFrame, zCols: Seq[String], dir: String,
      nFiles: Int = 32): Unit = {
    val bits = math.min(ZBits, 63 / zCols.size)
    val r = df.agg(
      zCols.flatMap(c => Seq(min(col(c)), max(col(c)))).head,
      zCols.flatMap(c => Seq(min(col(c)), max(col(c)))).tail: _*).head()
    val z = zValueN(
      zCols.zipWithIndex.map { case (c, j) =>
        quantize(col(c), r.getLong(2 * j), r.getLong(2 * j + 1), bits)
      }, bits)
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(dir)
  }

  /** 2-D convenience form of [[writeZOrderedN]]. */
  def writeZOrdered(df: DataFrame, colA: String, colB: String,
      dir: String, nFiles: Int = 32): Unit =
    writeZOrderedN(df, Seq(colA, colB), dir, nFiles)

  /** Write `df` as a bucketed+sorted parquet table: rows are hash-
    * partitioned into `nBuckets` files BY KEY at write time, each file
    * sorted on the key. Bucketing is the PRE-PAID shuffle: two tables
    * bucketed the same way on their join key co-locate matching keys
    * file-by-file, so the join (and any same-key rollup above it)
    * runs with ZERO runtime Exchange — at 100 TB that turns the
    * fact⋈fact join from the dominant network cost into a local merge
    * per bucket. Registered through the session catalog because
    * bucket metadata (count, key, sort) is a table property the
    * reader's planner must see; the files themselves are plain
    * parquet under the warehouse dir.
    */
  def writeBucketed(df: DataFrame, keyCol: String, table: String,
      nBuckets: Int = 8): Unit = {
    val spark = df.sparkSession
    // The warehouse DIRECTORY outlives the in-memory catalog: a table
    // written by a previous JVM leaves its location on disk while the
    // new session's catalog has no entry, and saveAsTable then fails
    // with LOCATION_ALREADY_EXISTS instead of overwriting. Drop both
    // halves explicitly so the build is idempotent across sessions.
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true): Unit
    df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, keyCol).sortBy(keyCol).saveAsTable(table)
  }

  /** The bucketed-join consumer: orders ⋈ lineitem on the bucket key
    * plus a per-order rollup — all inside the buckets' partitioning.
    * The `merge` hint pins SortMergeJoin (a broadcast would "win" on
    * a gate-sized dim and hide the property under a
    * BroadcastExchange); the groupBy keys start with the bucket key,
    * so the aggregation reuses the scan partitioning too. LayoutSpec
    * asserts the whole plan has zero Exchange of any kind. Money in
    * the TpchQueries parity discipline: DECIMAL(18,2) factors summed
    * exactly, one cast to DOUBLE at the end.
    */
  def bucketedOrderRevenue(spark: org.apache.spark.sql.SparkSession,
      ordersTable: String, lineitemTable: String): DataFrame =
    spark.table(ordersTable).hint("merge")
      .join(spark.table(lineitemTable),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(count(lit(1)).as("n_items"),
        sum(expr("CAST(l_extendedprice AS DECIMAL(18,2)) * " +
          "CAST(1 - l_discount AS DECIMAL(18,2))")).cast("double")
          .as("revenue"))
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        col("n_items"), col("revenue"))

  /** Small-file compaction — the table-maintenance pass every long-
    * lived 100 TB dataset needs: streaming appends, per-partition
    * writers, and incremental upserts all leave thousands of tiny
    * files whose per-file open/footer cost eventually dominates scans
    * (and whose count strains the metastore). Compaction rewrites
    * them as `nFiles` range-partitioned, internally-sorted files on
    * `sortCol` — content-IDENTICAL to the input (the consumer query
    * oracle-checks that), with tight per-file min/max on the sort
    * column so the rewrite also BUYS pruning on it. This is the
    * OPTIMIZE/rewrite_data_files half of the z-order story, on the
    * same plain-parquet terms.
    */
  def compact(df: DataFrame, sortCol: String, dir: String,
      nFiles: Int = 8): Unit =
    df.repartitionByRange(nFiles, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite").parquet(dir)

  /** Per-file (min, max) box of two columns — the layout-audit view
    * LayoutSpec asserts pruning with: a file whose box misses the
    * query box is a file a stats-pruning reader skips. One scan,
    * file-keyed agg; file count is the write-side `nFiles`, so the
    * result is always tiny.
    */
  def fileBoxes(df: DataFrame, colA: String, colB: String): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(min(col(colA)).as("min_a"), max(col(colA)).as("max_a"),
        min(col(colB)).as("min_b"), max(col(colB)).as("max_b"),
        count(lit(1)).as("n_rows"))
}
