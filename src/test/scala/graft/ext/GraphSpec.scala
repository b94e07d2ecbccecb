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

  test("personalizedPageRank: trust stays near the seed; other component dark") {
    import spark.implicits._
    // A ↔ B, B ↔ C chain; D ↔ E a separate component. Seed {A},
    // base = 1e9, damp 85. Hand-unrolled:
    //   pr1: A = 15e7, B = 85e7, C = 0
    //   pr2: A = (15·1e9 + 85·(85e7 DIV 2))·/100 = 511250000
    //        B = 85·(15e7 DIV 1)/100 = 127500000
    //        C = 85·(85e7 DIV 2)/100 = 361250000
    //   D = E = 0 at every round — no trusted walk reaches them.
    val edges = Seq(("A", "B"), ("B", "A"), ("B", "C"), ("C", "B"),
      ("D", "E"), ("E", "D")).toDF("src", "dst")
    val seeds = Seq("A").toDF("node")
    val r = Graph.personalizedPageRank(edges, seeds, iters = 2)
      .collect().map(x => (x.getString(0), x.getLong(1))).toMap
    assert(r == Map("A" -> 511250000L, "B" -> 127500000L,
      "C" -> 361250000L, "D" -> 0L, "E" -> 0L))
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

  test("hits: e6 fixed-point hubs/authorities match the hand-unrolled rounds") {
    import spark.implicits._
    // directed: a→x, a→y, b→x. hub0 = 1e6 each.
    // round 1: authRaw x=2e6 y=1e6, Σ=3e6 → auth x=666666 y=333333
    //          hubRaw a=999999 b=666666, Σ=1666665
    //          → hub a=999999e6//1666665=600000, b=400000 (both exact)
    // round 2: authRaw x=1000000 y=600000, Σ=1600000
    //          → auth x=625000, y=375000
    //          hubRaw a=1000000 b=625000, Σ=1625000
    //          → hub a=1e12//1625000=615384, b=625000e6//1625000=384615
    val edges = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "x"))
      .toDF("src", "dst") // duplicate edge must collapse
    val out = Graph.hits(edges, iters = 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(
      "a" -> (615384L, 0L), "b" -> (384615L, 0L),
      "x" -> (0L, 625000L), "y" -> (0L, 375000L)))
  }

  test("labelPropagation: hand-unrolled sync rounds with min-label ties") {
    import spark.implicits._
    // triangle {a,b,c} + pendant d—c (symmetric edge list)
    val und = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    // round 1 (all neighbor labels distinct → min-label ties):
    //   a←{b,c}→b   b←{a,c}→a   c←{a,b,d}→a   d←{c}→c
    val r1 = Graph.labelPropagation(edges, iters = 1)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(r1 == Map("a" -> "b", "b" -> "a", "c" -> "a", "d" -> "c"))
    // round 2: a←{a,a}→a  b←{b,a}→a  c←{b,a,c}→a  d←{a}→a; round 3 fixed
    val r3 = Graph.labelPropagation(edges, iters = 3)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(r3 == Map("a" -> "a", "b" -> "a", "c" -> "a", "d" -> "a"))
  }

  private def sym(und: Seq[(String, String)]) = {
    import spark.implicits._
    (und ++ und.map(_.swap)).toDF("src", "dst")
  }

  test("triangleStats: K4 — every node in 3 triangles, cc exactly 1e6") {
    val edges = sym(Seq(("a", "b"), ("a", "c"), ("a", "d"),
      ("b", "c"), ("b", "d"), ("c", "d")))
    val out = Graph.triangleStats(edges)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out == Map("a" -> (3L, 3L, 1000000L), "b" -> (3L, 3L, 1000000L),
      "c" -> (3L, 3L, 1000000L), "d" -> (3L, 3L, 1000000L)))
  }

  test("triangleStats: diamond — mixed orientations both counted") {
    // a—b, b—c, c—a, c—d, d—a: triangles {a,b,c} and {a,c,d}.
    // degs a=3 b=2 c=3 d=2: the wedge at b closes via an edge whose
    // orientation depends on the (deg, node) comparator — the case a
    // raw-id wedge order gets wrong.
    val edges = sym(Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "a")))
    val out = Graph.triangleStats(edges)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out == Map(
      "a" -> (3L, 2L, 666666L), "b" -> (2L, 1L, 1000000L),
      "c" -> (3L, 2L, 666666L), "d" -> (2L, 1L, 1000000L)))
  }

  test("triangleStats: path has zero triangles") {
    val out = Graph.triangleStats(sym(Seq(("a", "b"), ("b", "c"))))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out == Map("a" -> 0L, "b" -> 0L, "c" -> 0L))
  }

  test("textRankKeywords: star graph hand-unrolled; short tokens filtered") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    // one doc, candidates [alpha, beta, alpha, gamma] ("of" drops at
    // minLen=4): pairs (alpha,beta),(beta,alpha),(alpha,gamma) →
    // undirected distinct edges {alpha-beta, alpha-gamma} — a star on
    // alpha. N=3, base=333333333; outdeg alpha=2, beta=gamma=1.
    val docs = Seq("alpha of beta alpha gamma").toDF("text")
    val base = 333333333L
    def damp(s: Long) = (15L * base + 85L * s) / 100
    // round 1: alpha <- beta+gamma; leaf <- alpha DIV 2
    val a1 = damp(2 * base); val l1 = damp(base / 2)
    // round 2 over round-1 ranks
    val a2 = damp(2 * l1);   val l2 = damp(a1 / 2)
    val out = TextAnalysis.textRankKeywords(docs, "text", minLen = 4,
        iters = 2, topK = 50)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("alpha" -> a2, "beta" -> l2, "gamma" -> l2))
    assert(a2 > l2) // the hub out-ranks the leaves
  }

  test("kcore: pendant peels, triangle survives with residual degree") {
    // triangle {a,b,c} + pendant d—a: 2-core drops d in round 1;
    // survivors' residual degree is 2 each.
    val edges = sym(Seq(("a", "b"), ("a", "c"), ("b", "c"), ("a", "d")))
    val out = Graph.kcore(edges, k = 2, rounds = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 2L, "b" -> 2L, "c" -> 2L))
    // k=3: the whole graph cascades to empty
    assert(Graph.kcore(edges, k = 3, rounds = 2).count() == 0L)
  }

  test("kcoreRun: round-cap hit emits residual state, not an exception") {
    // a 140-node path peels 2 endpoints per round at k=2, so the
    // 64-round hard cap leaves a 12-node residual (the true 2-core is
    // EMPTY) — the capped path must hand back the partial state with
    // converged=false (VERDICT r11 item 6), never throw.
    val path = sym((0 until 139).map(i => (f"n$i%03d", f"n${i + 1}%03d")))
    val run = Graph.kcoreRun(path, k = 2, rounds = 1)
    assert(!run.converged)
    assert(run.roundsUsed == 64)
    val residual = run.state.collect().map(r => r.getString(0)).sorted
    // rounds peel symmetrically from both ends: survivors are the
    // middle 140 - 2*64 = 12 nodes, each with residual degree ≥ 1
    assert(residual.length == 12)
    assert(residual.head == "n064" && residual.last == "n075")
    // the converged path still reports converged and the same relation
    val tri = sym(Seq(("a", "b"), ("a", "c"), ("b", "c")))
    val ok = Graph.kcoreRun(tri, k = 2, rounds = 2)
    assert(ok.converged && ok.roundsUsed <= 2)
    assert(ok.state.count() == 3L)
  }

  test("edgeStructuralSim: diamond — per-edge triangle credit and exact jaccard") {
    // diamond a-b, a-c, b-c, b-d, c-d (no a-d): triangles (a,b,c),(b,c,d).
    // tri per edge: b-c carries 2 (both), the other four carry 1 each.
    // jaccard_e6: b-c = 2e6/(3+3-2) = 500000; a-b = 1e6/(2+3-1) = 250000 …
    val edges = sym(Seq(("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "d")))
    val rows = Graph.edgeStructuralSim(edges, k = 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.toSeq == Seq(
      ("b", "c", 3L, 3L, 2L, 500000L),
      ("a", "b", 2L, 3L, 1L, 250000L),
      ("a", "c", 2L, 3L, 1L, 250000L),
      ("b", "d", 3L, 2L, 1L, 250000L),
      ("c", "d", 3L, 2L, 1L, 250000L)))
  }

  test("bfsFromHubs: two hubs, min-hub tie at equal distance, unreachable absent") {
    // hub "a" (deg 4: 1,2,3,4) and hub "b" (deg 3: 4,5,6) with 4
    // adjacent to BOTH; isolated pair (x,y) below the hub threshold.
    val edges = sym(Seq(("a", "1"), ("a", "2"), ("a", "3"), ("a", "4"),
      ("b", "4"), ("b", "5"), ("b", "6"), ("x", "y")))
    val out = Graph.bfsFromHubs(edges, minHubDegree = 3, rounds = 3)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(out == Map(
      "a" -> ((0L, "a")), "b" -> ((0L, "b")),
      "1" -> ((1L, "a")), "2" -> ((1L, "a")), "3" -> ((1L, "a")),
      "4" -> ((1L, "a")), // both hubs at dist 1 → smallest hub id wins
      "5" -> ((1L, "b")), "6" -> ((1L, "b"))))
    // x, y below the hub threshold and unreachable from any hub: absent
    assert(!out.contains("x") && !out.contains("y"))
  }

  test("bfsFromHubs: bounded radius truncates a chain; layers settle once") {
    // star hub h (deg 3) + chain 3—c1—c2—c3: dist(c1)=2, dist(c2)=3,
    // dist(c3)=4. rounds=2 keeps the radius-2 ball only; rounds=6
    // reaches everything and the frontier empties early (no error).
    val edges = sym(Seq(("h", "1"), ("h", "2"), ("h", "3"),
      ("3", "c1"), ("c1", "c2"), ("c2", "c3")))
    def run(r: Int) = Graph.bfsFromHubs(edges, minHubDegree = 3, rounds = r)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(run(2) == Map("h" -> 0L, "1" -> 1L, "2" -> 1L, "3" -> 1L, "c1" -> 2L))
    assert(run(6) == Map("h" -> 0L, "1" -> 1L, "2" -> 1L, "3" -> 1L,
      "c1" -> 2L, "c2" -> 3L, "c3" -> 4L))
  }

  test("iterative loops: bounded checkpoint residency across repeated calls") {
    // r14 optimization invariant (the ADVICE r13 kcenter finding applied
    // engine-wide): every round loop releases its superseded round's
    // localCheckpoint blocks and unpersists its temporaries, so repeated
    // calls leave AT MOST the returned frame's own checkpoint behind —
    // before the fix each pageRank call leaked iters checkpoints + the
    // nodes persist (O(rounds·n) block-manager growth at production
    // iteration counts, and the leaked persists were plan-matched by the
    // cache manager across bench runs: accidental result caching).
    import spark.implicits._
    val edges = Seq(("h", "x"), ("x", "h"), ("h", "y"), ("y", "h"))
      .toDF("src", "dst")
    def persisted(): Int = spark.sparkContext.getPersistentRDDs.size
    val calls = 3
    val base = persisted()
    for (_ <- 1 to calls)
      Graph.pageRank(edges, iters = 4).collect(): Unit
    assert(persisted() - base <= calls,
      s"pageRank leaked ${persisted() - base} persisted RDDs over $calls " +
        s"calls (allowed: 1 returned checkpoint per call)")
    val base2 = persisted()
    for (_ <- 1 to calls)
      Graph.personalizedPageRank(edges, Seq("h").toDF("node"), iters = 4)
        .collect(): Unit
    assert(persisted() - base2 <= calls,
      s"personalizedPageRank leaked ${persisted() - base2} persisted RDDs " +
        s"over $calls calls")
    val base3 = persisted()
    for (_ <- 1 to calls)
      Graph.kcoreRun(edges, k = 2, rounds = 8).state.collect(): Unit
    assert(persisted() - base3 <= calls,
      s"kcoreRun leaked ${persisted() - base3} persisted RDDs over $calls calls")
  }
}
