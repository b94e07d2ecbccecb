package graft.ext

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout: key correctness, layout invariance, and the actual
  * pruning claim — a 2-D box predicate must intersect FEWER file
  * boxes under the z-layout than under any single-dimension sort
  * (where one of the two dimensions spans every file).
  */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("zValue interleaves bits (Morton order)") {
    import spark.implicits._
    // a = 101b, b = 011b → z = b2 a2 b1 a1 b0 a0 = 0 1 1 0 1 1 = 27
    val r = Seq((5L, 3L)).toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b"), bits = 3)).head().getLong(0)
    assert(r == 27L)
    // z is monotone on each dim with the other fixed
    val zs = Seq((0L, 2L), (1L, 2L), (2L, 2L), (3L, 2L)).toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b"), bits = 3))
      .collect().map(_.getLong(0)).toSeq
    assert(zs == zs.sorted && zs.distinct.size == 4)
  }

  test("zValueN: 3-D interleave pinned; dim j bit i lands at i*n+j") {
    import spark.implicits._
    // a=1 (bit0 → pos 0), b=1 (bit0 → pos 1), c=1 (bit0 → pos 2) = 7
    // a=2 (bit1 → pos 3), others 0 → 8
    val r = Seq((1L, 1L, 1L), (2L, 0L, 0L)).toDF("a", "b", "c")
      .select(Layout.zValueN(Seq(col("a"), col("b"), col("c")), bits = 2))
      .collect().map(_.getLong(0)).toSeq
    assert(r == Seq(7L, 8L))
    // 2-D convenience form is zValueN with n = 2
    val two = Seq((5L, 3L)).toDF("a", "b")
      .select(Layout.zValueN(Seq(col("a"), col("b")), bits = 3))
      .head().getLong(0)
    assert(two == 27L)
  }

  // 64×64 grid: user = i mod 64, t = i div 64 — every (user, t) cell
  // exactly once, so file-box geometry is exact and assertable.
  private def grid = {
    import spark.implicits._
    (0L until 4096L).map(i => (i, i % 64, i / 64)).toDF("id", "user", "t")
  }

  test("z-layout: box query exact; files prune on BOTH dimensions") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zspec")
    dir.toFile.deleteOnExit()
    val zdir = dir.resolve("z").toString
    val tdir = dir.resolve("t").toString
    Layout.writeZOrdered(grid, "user", "t", zdir, nFiles = 16)
    // contrast layout: single-dimension range sort on t
    grid.repartitionByRange(16, col("t")).sortWithinPartitions("t")
      .write.parquet(tdir)

    // layout invariance: the box result is exactly the source's
    val box = col("user").between(0, 31) && col("t").between(0, 31)
    val zRows = spark.read.parquet(zdir).filter(box)
      .orderBy("id").collect().map(_.getLong(0)).toSeq
    val srcRows = grid.filter(box).orderBy("id")
      .collect().map(_.getLong(0)).toSeq
    assert(zRows == srcRows && zRows.size == 1024)

    def intersecting(path: String): (Long, Long) = {
      val boxes = Layout.fileBoxes(spark.read.parquet(path), "user", "t")
      val n = boxes.count()
      val hit = boxes.filter(col("min_a") <= 31 && col("max_a") >= 0 &&
        col("min_b") <= 31 && col("max_b") >= 0).count()
      (hit, n)
    }
    val (zHit, zTotal) = intersecting(zdir)
    val (tHit, tTotal) = intersecting(tdir)
    assert(zTotal == 16 && tTotal == 16)
    // a quarter box tiles ~1/4 of the z-curve (range-partition
    // boundaries are sampled, so allow slack) ...
    assert(zHit <= 6, s"z-layout pruned too little: $zHit/16 files hit")
    // ... while the t-sorted layout prunes ONLY on t — every file
    // spans all users, so the box hits every file in the t half
    assert(tHit >= 8, s"t-sort contrast unexpectedly tight: $tHit/16")
    assert(zHit < tHit)
  }

  test("bucketed join + same-key rollup: ZERO Exchange, result exact") {
    import spark.implicits._
    val orders = (1L to 40L).map(k =>
      (k, java.sql.Date.valueOf("2024-01-0" + (k % 9 + 1)), 10.0))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val li = (1L to 40L).flatMap(k => (0 until (k % 3 + 1).toInt).map(_ =>
      (k, 100.50, 0.10))).toDF("l_orderkey", "l_extendedprice", "l_discount")
    Layout.writeBucketed(orders, "o_orderkey", "spec_buck_orders", nBuckets = 4)
    Layout.writeBucketed(li, "l_orderkey", "spec_buck_li", nBuckets = 4)
    val joined = Layout.bucketedOrderRevenue(spark,
      "spec_buck_orders", "spec_buck_li")
    // the pre-paid shuffle: join AND rollup reuse the bucket
    // partitioning — no Exchange node of ANY kind in the plan
    assert(!joined.queryExecution.executedPlan.toString.contains("Exchange"),
      joined.queryExecution.executedPlan.toString)
    val rows = joined.orderBy("o_orderkey").collect()
    assert(rows.length == 40)
    // order 3: 1 item of 100.50 at 10% discount = 90.45
    val r3 = rows(2)
    assert(r3.getLong(0) == 3L && r3.getLong(2) == 1L &&
      math.abs(r3.getDouble(3) - 90.45) < 1e-9)
  }

  test("compact: 64 tiny files become n sorted files with disjoint ranges") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-compactspec")
    dir.toFile.deleteOnExit()
    val small = dir.resolve("small").toString
    val out = dir.resolve("out").toString
    val src = (1L to 1000L).map(i => (i, i % 7)).toDF("id", "v")
    src.repartition(64).write.parquet(small)
    assert(new java.io.File(small).listFiles()
      .count(_.getName.endsWith(".parquet")) == 64)
    Layout.compact(spark.read.parquet(small), "id", out, nFiles = 4)
    assert(new java.io.File(out).listFiles()
      .count(_.getName.endsWith(".parquet")) == 4)
    // content-identical
    val back = spark.read.parquet(out)
    assert(back.count() == 1000L &&
      back.agg(sum(col("id"))).head().getLong(0) == 500500L)
    // per-file id ranges are disjoint (range partitioning): sorting
    // files by min, each min must exceed the previous max
    val boxes = back.groupBy(input_file_name())
      .agg(min(col("id")).as("mn"), max(col("id")).as("mx"))
      .orderBy("mn").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(boxes.sliding(2).forall {
      case Array((_, mx1), (mn2, _)) => mn2 > mx1
      case _ => true
    })
  }

  test("hive partitioning: a type predicate prunes whole directories") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-hivespec")
    dir.toFile.deleteOnExit()
    val out = dir.resolve("ev").toString
    val ev = Seq((1L, "purchase", 2.0), (2L, "view", 3.0), (3L, "purchase", 4.0),
      (4L, "click", 5.0)).toDF("event_id", "event_type", "value")
    ev.write.partitionBy("event_type").parquet(out)
    val filtered = spark.read.parquet(out)
      .filter(col("event_type") === "purchase")
    // every file the executed scan actually touches lives under the
    // matching partition directory — the others were never opened
    val files = filtered.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty &&
      files.forall(_.contains("event_type=purchase")), files.mkString(","))
    assert(filtered.count() == 2L)
  }
}
