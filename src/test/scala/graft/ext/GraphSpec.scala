package graft.ext

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** PageRank: hand-computed e9 fixed-point ranks on a 3-node star
  * (every integer truncation pinned), and co-occurrence edge
  * construction (bidirectional, deduped, no self-loops).
  */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("cooccurrenceEdges: bidirectional, deduped, no self-loops") {
    import spark.implicits._
    val items = Seq((1L, "a"), (1L, "b"), (1L, "b"), (1L, "c"), (2L, "a"), (2L, "b"))
      .toDF("doc_id", "host")
    val edges = Graph.cooccurrenceEdges(items, "doc_id", "host")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(edges == Set(("a", "b"), ("b", "a"), ("a", "c"), ("c", "a"),
      ("b", "c"), ("c", "b")))
  }

  test("pageRank: e9 fixed-point star ranks match the hand-unrolled rounds") {
    import spark.implicits._
    // star: hub h ↔ x, h ↔ y. N=3, base = 333333333.
    // round 1: contrib(h)=2·base=666666666; contrib(x)=base/2=166666666
    //   pr1(h) = (15·base + 85·666666666)//100 = 616666666
    //   pr1(x) = (15·base + 85·166666666)//100 = 191666666
    // round 2: contrib(h)=2·191666666=383333332; contrib(x)=616666666/2=308333333
    //   pr2(h) = (4999999995 + 85·383333332)//100 = 375833332
    //   pr2(x) = (4999999995 + 85·308333333)//100 = 312083333
    val edges = Seq(("h", "x"), ("x", "h"), ("h", "y"), ("y", "h"))
      .toDF("src", "dst")
    val pr = Graph.pageRank(edges, iters = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pr == Map("h" -> 375833332L, "x" -> 312083333L, "y" -> 312083333L))
  }
}
