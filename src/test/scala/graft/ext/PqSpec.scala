package graft.ext

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product quantization: encode determinism (argmin + smaller-code
  * ties), ADC vs exact-L2 agreement on a separable corpus, the
  * codebook-member identity (a codebook source's ADC distance to
  * itself via its own codes is its LUT entry), and the persisted
  * round-trip.
  */
class PqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // 24 vectors in dim 8 (m=4 subspaces of 2): vector i sits at the
  // constant level (i%4 + 1)·0.2 in EVERY dim plus a tiny deterministic
  // jitter, so each of the 4 clusters is separated from the others in
  // every subspace (0.2 level gap ≫ 0.003 jitter) and the first 4
  // vectors (the codebook sources) are one per cluster.
  private def vecs = {
    import spark.implicits._
    (0L until 24L).map { i =>
      val base = (i % 4).toInt
      val emb = (0 until 8).map { d =>
        (base + 1) * 0.2f + (((i * 8 + d) % 7).toInt - 3) * 0.001f
      }
      (i, emb)
    }.toDF("vec_id", "embedding")
  }

  test("pqBuild: codes are m per vector; codebook sources encode to themselves") {
    val idx = Similarity.pqBuild(vecs, m = 4, ks = 4)
    assert(idx.codebook.size == 4 && idx.codebook.head.size == 4)
    val codes = idx.codes.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(codes.size == 24 && codes.values.forall(_.size == 4))
    // each codebook source vector is its own nearest codeword in every
    // subspace (distance 0 to itself, jitter < separation elsewhere)
    (0L until 4L).foreach { c =>
      assert(codes(c) == Seq.fill(4)(c),
        s"codebook source $c should self-encode, got ${codes(c)}")
    }
    // clustered vectors encode to their cluster's codeword
    (4L until 24L).foreach { i =>
      assert(codes(i) == Seq.fill(4)(i % 4))
    }
  }

  test("ADC top-k matches exact integer L2 top-k on the separable corpus") {
    val idx = Similarity.pqBuild(vecs, m = 4, ks = 4)
    val q = vecs.filter(col("vec_id") === 5L)
      .head().getSeq[Float](1)
    val adc = Similarity.pqSearchIndexed(idx, q, k = 6)
      .collect().map(_.getLong(0)).toSeq
    val exact = Similarity.l2TopK(vecs, q, k = 6)
      .collect().map(_.getLong(0)).toSeq
    // cluster 1 members are {1, 5, 9, 13, 17, 21} under both metrics
    assert(adc.toSet == Set(1L, 5L, 9L, 13L, 17L, 21L))
    assert(exact.toSet == adc.toSet)
  }

  test("persisted PQ index round-trips codes and codebook") {
    val idx = Similarity.pqBuild(vecs, m = 4, ks = 4)
    val dir = java.nio.file.Files.createTempDirectory("graft-pq").toString
    Similarity.writePqIndex(idx, dir)
    val back = Similarity.readPqIndex(spark, dir)
    assert(back.codebook == idx.codebook)
    assert(back.subspaces == idx.subspaces)
    val q = vecs.filter(col("vec_id") === 2L).head().getSeq[Float](1)
    val a = Similarity.pqSearchIndexed(idx, q, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val b = Similarity.pqSearchIndexed(back, q, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a == b)
  }

  test("snapshotDiff classifies added/removed/changed and drops unchanged") {
    import spark.implicits._
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("doc_id", "text")
    val v2 = Seq((1L, "a"), (2L, "B"), (4L, "d"), (5L, "e"))
      .toDF("doc_id", "text")
    val d = Pipeline.snapshotDiff(v1, v2, Seq("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d == Map(2L -> "changed", 3L -> "removed", 5L -> "added"))
  }

  test("sqBuild: levels span [0,255] and per-dim extremes map to the rails") {
    val idx = Similarity.sqBuild(vecs)
    val codes = idx.codes.collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Long](1)).toMap
    assert(codes.size == 24)
    assert(codes.values.flatten.forall(l => l >= 0 && l <= 255))
    // every dim's corpus min hits level 0 and its max hits level 255
    (0 until 8).foreach { d =>
      val col = codes.values.map(_(d))
      assert(col.min == 0L, s"dim $d min level ${col.min}")
      assert(col.max == 255L, s"dim $d max level ${col.max}")
    }
  }

  test("SQ8 top-k resolves the separable clusters like exact integer L2") {
    val idx = Similarity.sqBuild(vecs)
    val q = Similarity.vectorOf(vecs, "vec_id", 0L)
    val sq = Similarity.sqSearchIndexed(idx, q, 6)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val exact = Similarity.l2TopK(vecs, q, 6)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    // the level gap between clusters (~85 levels) dwarfs the jitter
    // (<3 levels), so the top-6 IS the query's own 6-member cluster
    assert(sq == exact)
    assert(sq == Set(0L, 4L, 8L, 12L, 16L, 20L))
  }

  test("ivfPqRerank: full shortlist == exact l2TopK; short shortlist ⊆ ADC candidates") {
    val pq = Similarity.pqBuild(vecs, m = 4, ks = 4)
    val ivf = Similarity.ivfBuild(vecs, sampleEvery = 6) // cells 0,6,12,18
    val cells = Similarity.ivfPqCells(ivf, pq)
    val q = Similarity.vectorOf(vecs, "vec_id", 1L)
    // shortlist = corpus, nprobe = all cells: stage 2 IS the exact search
    val rr = Similarity.ivfPqRerank(cells, ivf.centroids, pq.codebook, 4,
        vecs, q, nprobe = 4, shortlist = 24, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val ex = Similarity.l2TopK(vecs, q, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rr == ex)
    // tight shortlist: every survivor came from the ADC shortlist, and
    // the output is ranked by the EXACT metric (ascending, tie on id)
    val shortIds = Similarity.ivfPqSearch(cells, ivf.centroids, pq.codebook,
        4, q, nprobe = 4, k = 6).collect().map(_.getLong(0)).toSet
    val rr2 = Similarity.ivfPqRerank(cells, ivf.centroids, pq.codebook, 4,
        vecs, q, nprobe = 4, shortlist = 6, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rr2.map(_._1).forall(shortIds))
    assert(rr2.map(_._2).toSeq == rr2.map(_._2).toSeq.sorted)
  }

  test("centroidOutliers: hand-computed cosines, zero-vector guard") {
    import spark.implicits._
    // label A: two (1,0) + one (0,1) → centroid_e6 = (666666, 333333);
    // label B: a lone zero vector → n2c = 0 → cos 0, flagged
    val d = Seq(
      (1L, "A", Seq(1.0f, 0.0f)), (2L, "A", Seq(1.0f, 0.0f)),
      (3L, "A", Seq(0.0f, 1.0f)), (4L, "B", Seq(0.0f, 0.0f))
    ).toDF("vec_id", "label", "embedding")
    def cosE6(dot: Long, n2v: Long, n2c: Long): Long =
      math.floor(dot.toDouble / (math.sqrt(n2v.toDouble) * math.sqrt(n2c.toDouble)) * 1e6 + 0.5).toLong
    val n2c = 666666L * 666666L + 333333L * 333333L
    val major = cosE6(1000000L * 666666L, 1000000L * 1000000L, n2c) // ≈ .894
    val minor = cosE6(1000000L * 333333L, 1000000L * 1000000L, n2c) // ≈ .447
    val r = Similarity.centroidOutliers(d).orderBy("vec_id").collect()
      .map(x => (x.getLong(0), x.getLong(2), x.getBoolean(3)))
    assert(r.toSeq == Seq(
      (1L, major, false), (2L, major, false),
      (3L, minor, true),  // the off-axis member falls under cos .5
      (4L, 0L, true)))    // zero vector: guarded 0, flagged
  }
}
