package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit-level checks of [[GraphOps.randomWalks]] (the oracle twin
  * `graphp_random_walks` pins cross-engine hash determinism; this pins the
  * walk mechanics on hand-built graphs).
  */
class RandomWalkSpec extends SparkSpec {

  private def mkGraph(edges: Seq[(Long, Long)]): GraphTables = {
    import spark.implicits._
    val ids = edges.flatMap(e => Seq(e._1, e._2)).distinct
    GraphTables(
      ids.map(i => NodeRow(i, "N", s"n$i", "", "", "base", Seq.empty)).toDS(),
      edges.map { case (s, d) => EdgeRow(s, d, "E", "", "base") }.toDS())
  }

  private def roots(ids: Long*) = {
    import spark.implicits._
    ids.toDF("root_id")
  }

  private def walks(g: GraphTables, rs: Seq[Long], perRoot: Int, len: Int)
      : Seq[(Long, Long, Int, Long)] =
    GraphOps.randomWalks(spark, g, roots(rs: _*), perRoot, len)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .toSeq

  // a small DAG with branching: 1 → {2,3}, 2 → {4,5}, 3 → {6}, leaves sink
  private val dag = mkGraph(Seq(1L -> 2L, 1L -> 3L, 2L -> 4L, 2L -> 5L,
    3L -> 6L))

  test("every consecutive walk pair is a real edge; step 0 is the root") {
    val edgeSet = Set(1L -> 2L, 1L -> 3L, 2L -> 4L, 2L -> 5L, 3L -> 6L)
    val got = walks(dag, Seq(1L), perRoot = 8, len = 3)
    val byWalk = got.groupBy(t => (t._1, t._2)).values
    assert(byWalk.size == 8)
    byWalk.foreach { steps =>
      val path = steps.sortBy(_._3).map(_._4)
      assert(path.head == 1L, s"walk must start at its root: $path")
      path.sliding(2).foreach {
        case Seq(a, b) => assert(edgeSet.contains(a -> b),
          s"non-edge step $a->$b in $path")
        case _ => ()
      }
    }
  }

  test("walks stop at sinks instead of emitting null steps") {
    // 1 → 2 → sink: every walk has exactly steps 0,1,2 — never 3
    val chain = mkGraph(Seq(1L -> 2L, 2L -> 3L))
    val got = walks(chain, Seq(1L), perRoot = 3, len = 5)
    val byWalk = got.groupBy(_._2)
    assert(byWalk.size == 3)
    byWalk.values.foreach { steps =>
      assert(steps.map(_._3).sorted == Seq(0, 1, 2), steps.toString)
      assert(steps.sortBy(_._3).map(_._4) == Seq(1L, 2L, 3L))
    }
  }

  test("the sampler is deterministic across invocations and explores " +
      "more than one branch") {
    val a = walks(dag, Seq(1L), perRoot = 8, len = 3).sorted
    val b = walks(dag, Seq(1L), perRoot = 8, len = 3).sorted
    assert(a == b, "content-addressed steps must be replay-identical")
    // 8 hash-indexed walks over a branching factor of 2 collide onto one
    // branch with probability 2^-8 per level under any uniform-ish hash;
    // the fixed md5 family is pinned here so this cannot flake
    val firstSteps = a.filter(_._3 == 1).map(_._4).toSet
    assert(firstSteps == Set(2L, 3L),
      s"expected both branches sampled, got $firstSteps")
  }

  test("duplicate edges do not skew the choice set") {
    // 1 → 2 listed twice: the rank index must see ONE neighbor
    val g = mkGraph(Seq(1L -> 2L, 1L -> 2L))
    val got = walks(g, Seq(1L), perRoot = 4, len = 1)
    assert(got.filter(_._3 == 1).forall(_._4 == 2L), got.toString)
    assert(got.count(_._3 == 1) == 4)
  }

  test("rejects non-positive walk counts") {
    intercept[IllegalArgumentException] {
      GraphOps.randomWalks(spark, dag, roots(1L), 0, 3)
    }
  }

  test("skip-gram pairs: window-2 counts on a hand-built corpus") {
    import spark.implicits._
    // walk 0 = [1,2,3,4]; walk 1 = [1,2] — the (1,2)/(2,1) pairs repeat
    val walks = Seq(
      (9L, 0L, 0, 1L), (9L, 0L, 1, 2L), (9L, 0L, 2, 3L), (9L, 0L, 3, 4L),
      (9L, 1L, 0, 1L), (9L, 1L, 1, 2L))
      .toDF("root_id", "walk", "step", "node")
    val got = GraphOps.skipGramPairs(walks, window = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got((1L, 2L)) == 2 && got((2L, 1L)) == 2, got.toString)
    assert(got((1L, 3L)) == 1 && got((3L, 1L)) == 1, got.toString)
    assert(got((2L, 4L)) == 1 && got((3L, 4L)) == 1, got.toString)
    assert(!got.contains((1L, 4L)), "distance 3 exceeds the window")
    assert(!got.contains((1L, 1L)), "zero-distance pairs are excluded")
    assert(got.values.sum == 12, got.toString) // 10 from walk 0, 2 from walk 1
  }

  test("negative samples: k draws per pair, always corpus members, " +
      "replay-identical") {
    import spark.implicits._
    val walks = Seq(
      (9L, 0L, 0, 1L), (9L, 0L, 1, 2L), (9L, 0L, 2, 3L), (9L, 0L, 3, 4L),
      (9L, 1L, 0, 5L), (9L, 1L, 1, 6L))
      .toDF("root_id", "walk", "step", "node")
    val pairs = GraphOps.skipGramPairs(walks, window = 2)
    def draw() = GraphOps.negativeSamples(walks, pairs, k = 3)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .sorted.toSeq
    val got = draw()
    val nPairs = pairs.count()
    assert(got.length == nPairs * 3, s"${got.length} vs $nPairs pairs * 3")
    val corpus = Set(1L, 2L, 3L, 4L, 5L, 6L)
    assert(got.forall(t => corpus.contains(t._4)),
      "negatives must be corpus occurrences")
    got.groupBy(t => (t._1, t._2)).values.foreach(ds =>
      assert(ds.map(_._3).sorted.toSeq == Seq(0, 1, 2), ds.toString))
    assert(got == draw(), "content-addressed draws must replay identically")
  }

  test("GraphSAGE sampling: fanout caps per layer, frontier follows only " +
      "sampled nodes, small degrees kept whole") {
    // 1 → {10..14} (deg 5, cap 2); each 1x → {100·1x + 0..2} (deg 3,
    // cap 2); 2 → {20} (deg 1 < cap)
    val edges = (10L to 14L).map(1L -> _) ++
      (10L to 14L).flatMap(x => (0L to 2L).map(i => x -> (100 * x + i))) :+
      (2L -> 20L)
    val g = mkGraph(edges)
    val got = GraphOps.sampleNeighborhood(spark, g, roots(1L, 2L).toDF()
        .withColumnRenamed("root_id", "id"), Seq(2, 2))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    val l1 = got.filter(_._1 == 1)
    val l2 = got.filter(_._1 == 2)
    // layer 1: exactly 2 of node 1's five neighbors; node 2's single
    // neighbor survives whole
    assert(l1.count(_._2 == 1L) == 2, l1.toString)
    assert(l1.filter(_._2 == 2L).map(_._3) == Seq(20L), l1.toString)
    // layer 2 expands ONLY the sampled layer-1 dsts (20 is a sink)
    val sampledDsts = l1.filter(_._2 == 1L).map(_._3).toSet
    assert(l2.map(_._2).toSet == sampledDsts, s"$sampledDsts vs $l2")
    assert(l2.groupBy(_._2).values.forall(_.size == 2), l2.toString)
    // replay-identical
    val again = GraphOps.sampleNeighborhood(spark, g, roots(1L, 2L).toDF()
        .withColumnRenamed("root_id", "id"), Seq(2, 2))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.sorted == again.sorted)
  }

  test("node2vec bias classes steer the walk: common-neighbor weight " +
      "closes triangles, return weight backtracks, far weight explores") {
    // bidirectional triangle 1-2-3: after the first step every candidate
    // is either the return node or a prev-adjacent (common) node
    val tri = mkGraph(Seq(1L -> 2L, 2L -> 1L, 2L -> 3L, 3L -> 2L,
      3L -> 1L, 1L -> 3L))
    def steps(g: GraphTables, wr: Int, wc: Int, wf: Int, len: Int = 3) =
      GraphOps.biasedWalks(spark, g, roots(1L), walksPerRoot = 6,
          maxLen = len, wReturn = wr, wCommon = wc, wFar = wf)
        .collect().map(r => ((r.getLong(0), r.getLong(1)),
          (r.getInt(2), r.getLong(3)))).toSeq
        .groupBy(_._1).values.map(_.map(_._2).sortBy(_._1).map(_._2))
    // overwhelming common weight: no walk ever immediately backtracks
    steps(tri, 1, 1000000, 1).foreach { path =>
      path.sliding(3).foreach {
        case Seq(a, _, c) => assert(a != c, s"backtracked: $path")
        case _ => ()
      }
    }
    // overwhelming return weight: every walk oscillates root-x-root-x
    steps(tri, 1000000, 1, 1).foreach { path =>
      assert(path(0) == 1L && path(2) == 1L && path(1) == path(3),
        s"expected oscillation, got $path")
    }
    // far class on a bidirectional line 1-2-3-4 (no triangles): from 2
    // with prev=1 the candidates are 1 (return) and 3 (far); an
    // overwhelming far weight walks straight down the line
    val line = mkGraph(Seq(1L -> 2L, 2L -> 1L, 2L -> 3L, 3L -> 2L,
      3L -> 4L, 4L -> 3L))
    steps(line, 1, 1, 1000000).foreach { path =>
      assert(path == Seq(1L, 2L, 3L, 4L), s"expected straight, got $path")
    }
    // determinism
    assert(steps(tri, 1, 4, 2).toSet == steps(tri, 1, 4, 2).toSet)
  }

  test("weighted walks follow the props weight; defaults degenerate to " +
      "the uniform sampler; garbage weights fall back") {
    import spark.implicits._
    def g(edges: Seq[(Long, Long, Map[String, String])]) = {
      val ids = edges.flatMap(e => Seq(e._1, e._2)).distinct
      GraphTables(
        ids.map(i => NodeRow(i, "N", s"n$i", "", "", "base", Seq.empty))
          .toDS(),
        edges.map { case (s, d, p) => EdgeRow(s, d, "E", "", "base", p) }
          .toDS())
    }
    def run(gt: GraphTables, n: Int, len: Int) =
      GraphOps.weightedWalks(spark, gt, roots(1L), n, len)
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).sorted
        .toSeq
    // weight 1000000 vs 1: all 8 walks take the heavy edge
    val heavy = g(Seq((1L, 2L, Map("weight" -> "1000000")),
      (1L, 3L, Map.empty[String, String])))
    assert(run(heavy, 8, 1).filter(_._3 == 1).forall(_._4 == 2L))
    // all-default weights reproduce randomWalks EXACTLY (unit intervals
    // in dst order are the rank index)
    val plain = Seq((1L, 2L), (1L, 3L), (2L, 4L), (2L, 5L), (3L, 6L))
    val unif = GraphOps.randomWalks(spark,
        g(plain.map { case (a, b) => (a, b, Map.empty[String, String]) }),
        roots(1L), 8, 3)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).sorted
      .toSeq
    val dflt = run(
      g(plain.map { case (a, b) => (a, b, Map.empty[String, String]) }),
      8, 3)
    assert(dflt == unif, "default-weight walks must equal the uniform " +
      "sampler step for step")
    // a non-numeric weight falls back to the default, not an error
    val garbage = g(Seq((1L, 2L, Map("weight" -> "abc")),
      (1L, 3L, Map.empty[String, String])))
    val got = run(garbage, 8, 1).filter(_._3 == 1).map(_._4).toSet
    assert(got.subsetOf(Set(2L, 3L)) && got.size == 2,
      s"expected both branches under equal fallback weights, got $got")
  }

  test("GraphSAGE sampling rejects empty or non-positive fanouts") {
    intercept[IllegalArgumentException] {
      GraphOps.sampleNeighborhood(spark, dag,
        roots(1L).withColumnRenamed("root_id", "id"), Seq.empty)
    }
    intercept[IllegalArgumentException] {
      GraphOps.sampleNeighborhood(spark, dag,
        roots(1L).withColumnRenamed("root_id", "id"), Seq(2, 0))
    }
  }
}
