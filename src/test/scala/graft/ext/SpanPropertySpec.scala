package graft.ext

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Property checks for duplicated-span detection over GENERATED corpora
  * (tiny vocab forces heavy k-gram sharing): the engine's spans must be
  * exactly the maximal non-overlapping intervals of the brute-force
  * duplicated-token coverage set, and the cut stats must tie out. The
  * reference implementation below recomputes coverage directly from
  * the definition (gram df ≥ minDf over distinct docs), independent of
  * the engine's windows/joins — a second oracle beside the DuckDB one.
  */
class SpanPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val rnd = new scala.util.Random(7)
  private val vocab = Vector("a", "b", "c", "d", "e", "f")

  private def corpus(nDocs: Int, minLen: Int, maxLen: Int): Seq[(Long, String)] =
    (0 until nDocs).map { i =>
      val len = minLen + rnd.nextInt(maxLen - minLen + 1)
      (i.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }

  /** Brute-force duplicated-token coverage per doc, straight from the
    * definition: position p is covered iff SOME gram starting in
    * [p-k+1, p] ∩ valid-starts occurs in ≥ minDf distinct docs.
    */
  private def refCoverage(docs: Seq[(Long, String)], k: Int,
      minDf: Int): Map[Long, Set[Int]] = {
    val toks = docs.map { case (id, t) =>
      id -> t.split("\\s+").filter(_.nonEmpty).toVector }
    val gramDocs = scala.collection.mutable.Map.empty[Seq[String], Set[Long]]
    toks.foreach { case (id, ts) =>
      ts.sliding(k).filter(_.size == k).foreach { g =>
        gramDocs(g) = gramDocs.getOrElse(g, Set.empty) + id
      }
    }
    toks.map { case (id, ts) =>
      val cov = scala.collection.mutable.Set.empty[Int]
      ts.sliding(k).filter(_.size == k).zipWithIndex.foreach { case (g, p) =>
        if (gramDocs(g).size >= minDf) (p until p + k).foreach(cov += _)
      }
      id -> cov.toSet
    }.toMap
  }

  test("spans are exactly the maximal intervals of duplicated coverage") {
    import spark.implicits._
    for (trial <- 1 to 3) {
      val k = 2 + trial // k = 3, 4, 5
      val docs = corpus(8, 6, 18)
      val df = docs.toDF("doc_id", "text")
      val spans = Dedup.duplicateSpans(df, "text", "doc_id", k = k, minDf = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.map(s => (s._2, s._3)).sortBy(_._1)).toMap
      val ref = refCoverage(docs, k, minDf = 2)
      // 1. non-overlapping AND non-adjacent (maximality) per doc
      spans.values.foreach { ss =>
        ss.sliding(2).foreach {
          case Array((_, e1), (s2, _)) => assert(s2 > e1 + 1,
            s"adjacent/overlapping spans should have merged (k=$k)")
          case _ =>
        }
      }
      // 2. span union == brute-force coverage, doc by doc
      docs.foreach { case (id, _) =>
        val engine = spans.getOrElse(id, Array.empty[(Long, Long)])
          .flatMap { case (s, e) => s.toInt to e.toInt }.toSet
        assert(engine == ref(id),
          s"coverage mismatch doc $id (k=$k): engine $engine vs ref ${ref(id)}")
      }
      // 3. cut stats tie out against the same coverage
      val cut = Dedup.spanCutStats(df, "text", "doc_id", k = k, minDf = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)))
      cut.foreach { case (id, total, cutToks, kept) =>
        assert(cutToks == ref(id).size.toLong, s"cut_tokens doc $id (k=$k)")
        assert(kept == total - cutToks)
      }
    }
  }
}
