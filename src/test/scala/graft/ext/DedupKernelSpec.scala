package graft.ext

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r15 dedup kernels (VERDICT item 4): the compiled in-row forms must
  * be BIT-EQUAL to the relational builds they replace — the relational
  * forms stay in the tree (or inline here) as the parity reference,
  * and the DuckDB oracles keep computing the relational SQL, so these
  * pins are what licenses the swap.
  */
class DedupKernelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again"),
    (3L, "a b c"),                      // exactly one 3-shingle
    (4L, "xy"),                         // tokens but NO 3-shingle
    (5L, "!!! --- ..."),                // no tokens at all
    (6L, null.asInstanceOf[String]),    // null text
    (7L, "Café Kilo DATA data Data 42 42"), // case folding + non-ASCII
    (8L, "pack my box with five dozen liquor jugs every single day")
  ).toDF("doc_id", "text")

  test("minhash_sigs_e kernel: bit-equal to the batch aggregate, same row set") {
    val sh = Dedup.shingleHashes(docs, "text", "doc_id", 3)
    val batch = Dedup.minhashSignatures(sh, 16, preHashed = true)
    graft.functions.MinhashFunctions.register(spark)
    val arrs = sh.groupBy("doc_id")
      .agg(sort_array(collect_list(col("shingle"))).as("__arr"))
    val kernel = arrs
      .select(col("doc_id"),
        graft.functions.MinhashFunctions.minhash_sigs_e(col("__arr"), 16).as("__mh"))
      .select(col("doc_id") +:
        (0 until 16).map(i => col("__mh")(i).as(s"mh_$i")): _*)
    assert(batch.exceptAll(kernel).count() == 0 &&
      kernel.exceptAll(batch).count() == 0)
    // docs without shingles (4, 5, 6) appear in neither form
    assert(kernel.filter(col("doc_id").isin(4L, 5L, 6L)).count() == 0)
  }

  test("simhash_e kernel: bit-equal to the relational aggregate, same row set") {
    val kernel = Dedup.simhash(docs, "text", "doc_id", 60)
    val relational = Dedup.simhashAgg(docs, "text", "doc_id", 60)
    assert(kernel.exceptAll(relational).count() == 0 &&
      relational.exceptAll(kernel).count() == 0)
    // no-token docs (5, 6) emit no row in either form
    assert(kernel.filter(col("doc_id").isin(5L, 6L)).count() == 0)
    assert(kernel.count() == 6)
  }

  test("simhash_e kernel: bit-equal to the relational aggregate on the sf0.001 corpus") {
    graft.Corpus.registerSources(spark, "/root/testdata/sf0.001")
    val d = spark.table("documents")
    val kernel = Dedup.simhash(d, "text", "doc_id", 60)
    val relational = Dedup.simhashAgg(d, "text", "doc_id", 60)
    assert(kernel.exceptAll(relational).count() == 0 &&
      relational.exceptAll(kernel).count() == 0)
  }

  test("minhashNearDupsFromDocArrs == minhashNearDupsFromArtifacts") {
    val sh = Dedup.shingleHashes(docs, "text", "doc_id", 3).persist()
    val sigs = Dedup.minhashSignatures(sh, 16, preHashed = true).persist()
    val arrs = sh.groupBy("doc_id")
      .agg(sort_array(collect_list(col("shingle"))).as("__arr"),
        count(lit(1)).as("n_sh"))
    val old = Dedup.minhashNearDupsFromArtifacts(sh, sigs, 16, 4, 0.4)
    val neu = Dedup.minhashNearDupsFromDocArrs(arrs, sigs, 16, 4, 0.4)
    assert(old.exceptAll(neu).count() == 0 && neu.exceptAll(old).count() == 0)
    assert(old.schema == neu.schema)
    // the exact-dup pair survives with jaccard 1.0
    assert(neu.collect().exists(r =>
      r.getAs[Long]("id_a") == 1L && r.getAs[Long]("id_b") == 2L &&
        r.getAs[Double]("jaccard") == 1.0))
    sh.unpersist(); sigs.unpersist()
  }

  test("deltaNearDupsFromDocArrs == deltaNearDupsFromArtifacts") {
    val sh = Dedup.shingleHashes(docs, "text", "doc_id", 3).persist()
    val sigs = Dedup.minhashSignatures(sh, 16, preHashed = true).persist()
    val arrs = sh.groupBy("doc_id")
      .agg(sort_array(collect_list(col("shingle"))).as("__arr"),
        count(lit(1)).as("n_sh"))
    def sideC(df: org.apache.spark.sql.DataFrame) = df.filter(col("doc_id") % 2 === 0)
    def sideD(df: org.apache.spark.sql.DataFrame) = df.filter(col("doc_id") % 2 =!= 0)
    val old = Dedup.deltaNearDupsFromArtifacts(
      sideC(sh), sideC(sigs), sideD(sh), sideD(sigs), 16, 4, 0.4)
    val neu = Dedup.deltaNearDupsFromDocArrs(
      sideC(arrs), sideC(sigs), sideD(arrs), sideD(sigs), 16, 4, 0.4)
    assert(old.exceptAll(neu).count() == 0 && neu.exceptAll(old).count() == 0)
    assert(old.schema == neu.schema)
    // the exact-dup cross pair (2 corpus-side, 1 delta-side) survives
    assert(neu.collect().exists(r =>
      r.getAs[Long]("delta_id") == 1L && r.getAs[Long]("corpus_id") == 2L &&
        r.getAs[Double]("jaccard") == 1.0))
    sh.unpersist(); sigs.unpersist()
  }
}
