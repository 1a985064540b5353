package graft

import org.apache.spark.sql.functions._

import graft.graph.{EdgeRow, GraphOps, GraphTables, NodeRow}

/** Scaling-curve evidence for the heavy dedup/graph family (round-7
  * directive 3): every plan is ARGUED scale-safe, this measures it. The
  * sf0.01 documents corpus is replicated 10× with token-salted content —
  * each copy keeps the original intra-copy near-dup structure exactly,
  * while cross-copy shingle/window sets are DISJOINT, so the true output
  * (and the work of any sub-quadratic plan) grows linearly with the
  * corpus. Wall-time at 10× must stay under a generous linear bound; a
  * quadratic term (an all-pairs join hiding under the sf0.1 constant)
  * would show up as ~100× and fail loudly.
  *
  * The bound is [[ScaleCurveSpec.MaxRatio]]·max(t1, floor): fixed session
  * overhead dominates the 1× runs at this corpus size, so the floor keeps
  * a 0.3s→3s reading from being misread as super-linear. Observed ratios
  * land well inside the bound (see PLANS.md round-8 notes).
  */
class ScaleCurveSpec extends SparkSpec {
  import ScaleCurveSpec._

  /** 1×/10×/100× corpora written through the SAME pipeline (identical
    * file layout policy), each a directory holding only documents.parquet
    * — the sole table the heavy family reads. Copies are token-salted per
    * copy index, so copy k's shingles never collide with copy j's — no
    * synthetic cross-copy near-dups inflating the output super-linearly.
    * The 100× build salts with a SINGLE column expression (one
    * `~<copyid>` suffix derived from the replica index) instead of 100
    * unioned branches, so building the fixture is itself linear.
    */
  private def replicateDocs(copies: Int, out: String): String = {
    val docs = spark.read.parquet(sf("sf0.01") + "/documents.parquet")
    docs.crossJoin(
        spark.range(copies).select(col("id").as("copy_k")))
      .select(
        (col("doc_id") + col("copy_k") * lit(1000000000L)).as("doc_id"),
        when(col("copy_k") === 0, col("text"))
          .otherwise(regexp_replace(col("text"), lit("(\\S+)"),
            concat(lit("$1~"), col("copy_k").cast("string")))).as("text"),
        col("lang"), col("source"), col("n_chars"))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    out
  }

  private lazy val dir1x: String = replicateDocs(1,
    java.nio.file.Files.createTempDirectory("scale1x").toString)
  private lazy val dir10x: String = replicateDocs(10,
    java.nio.file.Files.createTempDirectory("scale10x").toString)
  private lazy val dir100x: String = replicateDocs(100,
    java.nio.file.Files.createTempDirectory("scale100x").toString)

  private def timed(body: => Unit): Double = {
    val t0 = System.nanoTime()
    body
    (System.nanoTime() - t0) / 1e9
  }

  /** Min of two timed runs — the same noise discipline as Bench.scala's
    * min-of-2: a GC pause or a concurrent suite's CPU burst inflates ONE
    * reading, and the min discards it. A genuine quadratic term inflates
    * BOTH runs and still fails the bound.
    */
  private def timedMin2(body: => Unit): Double =
    math.min(timed(body), timed(body))

  /** Byte-count scale ratio (guards the empty-baseline edge). Used by the
    * contention-immune decade pins, where the measured quantity is
    * shuffle bytes rather than wall-time.
    */
  private def ratioOf(big: Long, base: Long): Double =
    big.toDouble / math.max(base, 1L).toDouble

  private def assertLinear(name: String, t1: Double, t10: Double,
      bound: Double = MaxRatio): Unit = {
    val ratio = t10 / math.max(t1, OverheadFloorSec)
    info(f"$name: 1x=${t1}%.2fs 10x=${t10}%.2fs ratio=$ratio%.1f " +
      f"(bound $bound%.0f)")
    assert(ratio <= bound,
      f"$name scaled super-linearly: 1x=$t1%.2fs 10x=$t10%.2fs " +
        f"ratio=$ratio%.1f > $bound%.0f — a quadratic term is hiding " +
        "in this plan")
  }

  // l38/l40 (round 8): token-salting keeps each copy's bigram/unigram
  // vocabulary disjoint, so the word-keyed shuffles grow linearly in
  // keys — exactly the property the curve must confirm
  // l43 (round 8): the pair fan-out runs over the DISTINCT-word census,
  // which the salted copies grow linearly — the curve confirms the
  // dedup-before-expand shape holds
  // l56 (round 11): dup windows live WITHIN the salted copies, so the
  // coverage relation (8 positions per dup window) and the doc_id-keyed
  // text join both grow linearly — the curve confirms the rewrite stays
  // as scalable as the l30 signal it extends
  for (q <- Seq("l2_minhash_lsh", "l2c_ngram_jaccard", "l30_dup_spans",
      "l34_verified_neardup", "l38_lm_perplexity", "l40_slice_drift",
      "l43_bpe_pair_merge", "l56_dup_span_removal")) {
    test(s"$q wall-time grows ~linearly from 1x to 10x corpus") {
      val run = SparkEntry.queries(q)
      run(spark, dir1x).count() // warm-up: JIT + codegen + footer caches
      val t1 = timedMin2(run(spark, dir1x).count())
      val t10 = timedMin2(run(spark, dir10x).count())
      assertLinear(q, t1, t10)
    }
  }

  // round-9 directive 5: one more order of magnitude on the core dedup
  // kernels. The 10× curves show the quadratic term dead at 10×; this
  // point shows it STAYS dead at 100× (where an all-pairs join would run
  // ~10,000× the 1× work and a bucket-quadratic one ~100× the 10×
  // reading). Runtime-budgeted: single timed run at 100× against the
  // min-of-2 10× baseline, one 10×-step bound — same MaxRatio.
  for (q <- Seq("l2_minhash_lsh", "l2c_ngram_jaccard",
      "l34_verified_neardup")) {
    test(s"$q wall-time stays ~linear from 10x to 100x corpus") {
      val run = SparkEntry.queries(q)
      run(spark, dir10x).count() // warm-up: JIT + codegen + footer caches
      val t10 = timedMin2(run(spark, dir10x).count())
      val t100 = timed(run(spark, dir100x).count())
      assertLinear(s"$q(10x→100x)", t10, t100)
    }
  }

  test("louvain wall-time grows ~linearly on a 10x disjoint-clique bank") {
    // disjoint identical K5s: every copy converges through the SAME move
    // sequence in parallel, so the accepted/failed round count is a
    // constant of K5, not of the copy count — the curve isolates the
    // per-round join work, which must scale with edges. A plan carrying
    // an all-pairs (node × community) term would blow the bound.
    def cliqueBank(copies: Int): GraphTables = {
      import spark.implicits._
      val pairs = (for { i <- 0 until 5; j <- (i + 1) until 5 }
        yield (i, j)).toDF("i", "j")
      val edges = spark.range(copies).crossJoin(pairs)
        .select((col("id") * 10 + col("i")).as("src"),
          (col("id") * 10 + col("j")).as("dst"),
          lit("E").as("relType"), lit("s").as("docnbr"),
          lit("b0").as("batch"),
          typedLit(Map.empty[String, String]).as("props")).as[EdgeRow]
      val nodes = spark.range(copies).crossJoin(
          spark.range(5).select(col("id").as("i")))
        .select((col("id") * 10 + col("i")).as("id"), lit("N").as("label"),
          (col("id") * 10 + col("i")).cast("string").as("name"),
          lit("").as("content"), lit("").as("docnbr"),
          lit("b0").as("batch"), typedLit(Seq.empty[Int]).as("path"))
        .as[NodeRow]
      GraphTables(nodes, edges)
    }
    val g1 = cliqueBank(2000)
    val g10 = cliqueBank(20000)
    GraphOps.louvain(spark, g1).count() // warm-up
    val t1 = timedMin2(GraphOps.louvain(spark, g1).count())
    val t10 = timedMin2(GraphOps.louvain(spark, g10).count())
    assertLinear("louvain(cliqueBank)", t1, t10)
  }

  test("louvain wall-time stays ~linear from 10x to 100x clique bank") {
    // round-12 directive 4: the third decade for the most expensive pure
    // kernel — 200k disjoint K5s = 1M nodes / 2M undirected edges. The
    // move-round count stays the constant of K5, so the reading isolates
    // the per-round join work at a graph 100x the 1x bank; a (node ×
    // community) all-pairs term would run ~100x the 10x reading. Same
    // runtime-budget protocol as the sampler third decade: single timed
    // 100x run against the min-of-2 10x baseline, graph-curve bound.
    def cliqueBank(copies: Int): GraphTables = {
      import spark.implicits._
      val pairs = (for { i <- 0 until 5; j <- (i + 1) until 5 }
        yield (i, j)).toDF("i", "j")
      val edges = spark.range(copies).crossJoin(pairs)
        .select((col("id") * 10 + col("i")).as("src"),
          (col("id") * 10 + col("j")).as("dst"),
          lit("E").as("relType"), lit("s").as("docnbr"),
          lit("b0").as("batch"),
          typedLit(Map.empty[String, String]).as("props")).as[EdgeRow]
      val nodes = spark.range(copies).crossJoin(
          spark.range(5).select(col("id").as("i")))
        .select((col("id") * 10 + col("i")).as("id"), lit("N").as("label"),
          (col("id") * 10 + col("i")).cast("string").as("name"),
          lit("").as("content"), lit("").as("docnbr"),
          lit("b0").as("batch"), typedLit(Seq.empty[Int]).as("path"))
        .as[NodeRow]
      GraphTables(nodes, edges)
    }
    val g10 = cliqueBank(20000)
    val g100 = cliqueBank(200000)
    GraphOps.louvain(spark, g10).count() // warm-up
    val t10 = timedMin2(GraphOps.louvain(spark, g10).count())
    val t100 = timed(GraphOps.louvain(spark, g100).count())
    assertLinear("louvain(cliqueBank 10x→100x)", t10, t100,
      MaxRatio100Graph)
  }

  test("kCore wall-time grows ~linearly on a 10x hub graph") {
    def hubGraph(mult: Int): GraphTables = {
      import spark.implicits._
      val hubEdges = 40000L * mult
      val bgEdges = 180000L * mult
      val hub = spark.range(1L, hubEdges + 1L)
        .select(lit(0L).as("src"), col("id").as("dst"))
      val bg = spark.range(bgEdges).select(
        (lit(1L) + pmod(hash(col("id")), lit(10000 * mult)).cast("long"))
          .as("src"),
        (lit(hubEdges + 1L) +
          pmod(hash(col("id") * 7L), lit(20000 * mult)).cast("long"))
          .as("dst"))
      val edges = hub.unionByName(bg)
        .select(col("src"), col("dst"), lit("HAS_CHILD").as("relType"),
          lit("s").as("docnbr"), lit("b0").as("batch"),
          typedLit(Map.empty[String, String]).as("props"))
        .as[EdgeRow]
      GraphTables(spark.emptyDataset[NodeRow], edges)
    }
    val g1 = hubGraph(1)
    val g10 = hubGraph(10)
    GraphOps.kCore(spark, g1, 2).count() // warm-up
    val t1 = timedMin2(GraphOps.kCore(spark, g1, 2).count())
    val t10 = timedMin2(GraphOps.kCore(spark, g10, 2).count())
    assertLinear("kCore(hub)", t1, t10)
  }

  test("randomWalks + sampleNeighborhood wall-time grows ~linearly on a " +
      "10x hub graph with 10x roots") {
    // the samplers' scale claims: adjacency ranking is one window over
    // the edges (linear), each walk step / SAGE layer is an equi-join
    // whose frontier scales with ROOTS, not degree — so a 10x graph with
    // 10x roots must cost ~10x. The hub (node 0, 40k·mult out-edges) is
    // in the root set both times: a hub root costs the same as a leaf
    // root or the claim is false.
    def samplerGraph(mult: Int): GraphTables = {
      import spark.implicits._
      val hubEdges = 40000L * mult
      val bgEdges = 180000L * mult
      val hub = spark.range(1L, hubEdges + 1L)
        .select(lit(0L).as("src"), col("id").as("dst"))
      val bg = spark.range(bgEdges).select(
        (lit(1L) + pmod(hash(col("id")), lit(10000 * mult)).cast("long"))
          .as("src"),
        (lit(hubEdges + 1L) +
          pmod(hash(col("id") * 7L), lit(20000 * mult)).cast("long"))
          .as("dst"))
      val edges = hub.unionByName(bg)
        .select(col("src"), col("dst"), lit("HAS_CHILD").as("relType"),
          lit("s").as("docnbr"), lit("b0").as("batch"),
          typedLit(Map.empty[String, String]).as("props"))
        .as[EdgeRow]
      GraphTables(spark.emptyDataset[NodeRow], edges)
    }
    def roots(mult: Int) = spark.range(0L, 1000L * mult + 1L)
      .select(col("id").as("root_id")) // 0 = the hub, 1.. = bg sources
    val g1 = samplerGraph(1)
    val g10 = samplerGraph(10)
    def runBoth(g: GraphTables, mult: Int): Unit = {
      GraphOps.randomWalks(spark, g, roots(mult), 2, 3).count()
      GraphOps.sampleNeighborhood(spark, g,
        roots(mult).withColumnRenamed("root_id", "id"), Seq(3, 2)).count()
    }
    runBoth(g1, 1) // warm-up
    val t1 = timedMin2(runBoth(g1, 1))
    val t10 = timedMin2(runBoth(g10, 10))
    assertLinear("samplers(hub)", t1, t10)
  }

  test("weighted and biased walks stay ~linear on the 10x hub graph — " +
      "including walks RESIDENT at the 400k-out-edge hub") {
    // the O(outdeg)-per-step samplers: a walk sitting at the hub pays a
    // per-walk cumulative-weight window over the hub's whole candidate
    // block (the cost alias tables amortize in single-node node2vec).
    // Root 0 IS the hub both times, so the curve proves that block scales
    // linearly rather than exploding with a hidden all-pairs or skew term.
    def hubGraph(mult: Int): GraphTables = {
      import spark.implicits._
      val hubEdges = 40000L * mult
      val hub = spark.range(1L, hubEdges + 1L)
        .select(lit(0L).as("src"), col("id").as("dst"))
      val bg = spark.range(180000L * mult).select(
        (lit(1L) + pmod(hash(col("id")), lit(10000 * mult)).cast("long"))
          .as("src"),
        (lit(hubEdges + 1L) +
          pmod(hash(col("id") * 7L), lit(20000 * mult)).cast("long"))
          .as("dst"))
      val edges = hub.unionByName(bg)
        .select(col("src"), col("dst"), lit("HAS_CHILD").as("relType"),
          lit("s").as("docnbr"), lit("b0").as("batch"),
          typedLit(Map.empty[String, String]).as("props"))
        .as[EdgeRow]
      GraphTables(spark.emptyDataset[NodeRow], edges)
    }
    def roots(mult: Int) = spark.range(0L, 1000L * mult + 1L)
      .select(col("id").as("root_id"))
    def runBoth(g: GraphTables, mult: Int): Unit = {
      GraphOps.weightedWalks(spark, g, roots(mult), 2, 3).count()
      GraphOps.biasedWalks(spark, g, roots(mult), 2, 3).count()
    }
    val g1 = hubGraph(1)
    val g10 = hubGraph(10)
    runBoth(g1, 1) // warm-up
    val t1 = timedMin2(runBoth(g1, 1))
    val t10 = timedMin2(runBoth(g10, 10))
    assertLinear("walks(weighted+biased, hub-resident)", t1, t10)
  }

  test("betweenness wall-time grows ~linearly: 10x cycle components, " +
    "one landmark each") {
    // landmark-sampled Brandes scales along BOTH axes at once in
    // production: more graph AND proportionally more sampled landmarks.
    // Fixture: disjoint directed 20-cycles (diameter fixed at 20, so the
    // ROUND COUNT is identical at 1x and 10x), one landmark per cycle —
    // per-round frontier rows and edge-join input both grow 10x, so a
    // linear plan grows ~10x and a super-linear sigma/dependency join
    // (e.g. one keyed only on node, not (source, node)) would blow past
    // the bound.
    def cycles(copies: Int): (GraphTables, Seq[Long]) = {
      import spark.implicits._
      val n = 20L
      val edges = spark.range(copies * n)
        .select((col("id") / n).cast("long").as("c"),
          pmod(col("id"), lit(n)).as("i"))
        .select((col("c") * 1000L + col("i")).as("src"),
          (col("c") * 1000L + pmod(col("i") + 1L, lit(n))).as("dst"),
          lit("HAS_CHILD").as("relType"), lit("s").as("docnbr"),
          lit("b0").as("batch"),
          typedLit(Map.empty[String, String]).as("props"))
        .as[EdgeRow]
      (GraphTables(spark.emptyDataset[NodeRow], edges),
        (0 until copies).map(_ * 1000L))
    }
    val (g1, lm1) = cycles(100)
    val (g10, lm10) = cycles(1000)
    GraphOps.betweenness(spark, g1, lm1).count() // warm-up
    val t1 = timedMin2(GraphOps.betweenness(spark, g1, lm1).count())
    val t10 = timedMin2(GraphOps.betweenness(spark, g10, lm10).count())
    assertLinear("betweenness(cycles)", t1, t10)
  }

  /** Disjoint triangles + hub star + bounded-degree random background —
    * wedge count and truss structure both grow linearly with `mult`.
    * Shared by the clusteringCoefficient and kTruss curves.
    */
  private def triGraph(mult: Int): GraphTables = {
      import spark.implicits._
      val tri = 20000L * mult
      val base = spark.range(tri)
      val triEdges = base
        .select((col("id") * 3L).as("a"), (col("id") * 3L + 1L).as("b"))
        .unionAll(base.select((col("id") * 3L + 1L).as("a"),
          (col("id") * 3L + 2L).as("b")))
        .unionAll(base.select((col("id") * 3L).as("a"),
          (col("id") * 3L + 2L).as("b")))
      val hub = 8_000_000_000L
      val star = spark.range(40000L * mult)
        .select(lit(hub).as("a"), (col("id") + 9_000_000_000L).as("b"))
      val bgN = 30000L * mult
      val bg = spark.range(90000L * mult).select(
        (lit(1_000_000_000L) + pmod(hash(col("id")), lit(bgN)).cast("long"))
          .as("a"),
        (lit(2_000_000_000L) +
          pmod(hash(col("id") * 7L), lit(bgN)).cast("long")).as("b"))
      val edges = triEdges.unionAll(star).unionAll(bg)
        .select(col("a").as("src"), col("b").as("dst"),
          lit("HAS_CHILD").as("relType"), lit("s").as("docnbr"),
          lit("b0").as("batch"),
          typedLit(Map.empty[String, String]).as("props"))
        .as[EdgeRow]
      GraphTables(spark.emptyDataset[NodeRow], edges)
  }

  test("clusteringCoefficient wall-time grows ~linearly on a 10x " +
    "triangle+star+background graph") {
    // single-pass kernel, so the curve measures the WEDGE bound directly:
    // disjoint triangles (1 wedge per corner), a hub star (0 wedges under
    // degree-ordered orientation, any mult), and bounded-degree random
    // background edges — total wedges grow linearly, so wall-time must
    // too. An id-ordered orientation would enumerate the star's C(d,2)
    // wedges and scale ~100x.
    val g1 = triGraph(1)
    val g10 = triGraph(10)
    GraphOps.clusteringCoefficient(spark, g1).count() // warm-up
    val t1 = timedMin2(GraphOps.clusteringCoefficient(spark, g1).count())
    val t10 = timedMin2(GraphOps.clusteringCoefficient(spark, g10).count())
    assertLinear("clusteringCoefficient(tri+star)", t1, t10)
  }

  test("kTruss wall-time grows ~linearly on the same 10x graph") {
    // the 3-truss of triGraph converges in a FIXED number of peeling
    // rounds at any mult (round 1 drops every star/background edge —
    // support 0 — round 2 confirms the fixpoint on the pure triangle
    // bank), so the curve isolates the per-round wedge/support cost,
    // which must scale with edges, not edge pairs
    val g1 = triGraph(1)
    val g10 = triGraph(10)
    GraphOps.kTruss(spark, g1, 3).count() // warm-up
    val t1 = timedMin2(GraphOps.kTruss(spark, g1, 3).count())
    val t10 = timedMin2(GraphOps.kTruss(spark, g10, 3).count())
    assertLinear("kTruss(tri+star)", t1, t10)
  }

  test("kCore wall-time stays ~linear from 10x to 100x hub graph") {
    // round-11 directive 5: the graph kernels get the same third order of
    // magnitude the dedup family has. The hub graph at mult=100 is ~22M
    // edges (4M-leaf hub); peeling depth is a constant of the degree
    // DISTRIBUTION, not the edge count, so rounds stay fixed while
    // per-round degree-aggregate + semi-join input grows 10× — a plan
    // with an O(m²) or O(m·deg_max) term would blow the one-step bound.
    def hubGraph(mult: Int): GraphTables = {
      import spark.implicits._
      val hubEdges = 40000L * mult
      val hub = spark.range(1L, hubEdges + 1L)
        .select(lit(0L).as("src"), col("id").as("dst"))
      val bg = spark.range(180000L * mult).select(
        (lit(1L) + pmod(hash(col("id")), lit(10000 * mult)).cast("long"))
          .as("src"),
        (lit(hubEdges + 1L) +
          pmod(hash(col("id") * 7L), lit(20000 * mult)).cast("long"))
          .as("dst"))
      val edges = hub.unionByName(bg)
        .select(col("src"), col("dst"), lit("HAS_CHILD").as("relType"),
          lit("s").as("docnbr"), lit("b0").as("batch"),
          typedLit(Map.empty[String, String]).as("props"))
        .as[EdgeRow]
      GraphTables(spark.emptyDataset[NodeRow], edges)
    }
    val g10 = hubGraph(10)
    val g100 = hubGraph(100)
    GraphOps.kCore(spark, g10, 2).count() // warm-up
    // round-13 directive 1: contention-immune pins. Wall-time ratios on a
    // loaded machine flaked this test twice (21.8 / 20.25 vs bound 20 with
    // idle readings ~12-16), so the ASSERTED quantities are now the ones
    // that cannot drift with CPU load: (a) the peel-round count — a
    // property of the degree distribution, identical at 10x and 100x by
    // construction (same distribution, scaled support); (b) total shuffle
    // bytes — a property of the plan and the data; the failure mode (a
    // per-round O(edges) rewrite, or an O(m²) term) multiplies bytes by
    // ~rounds× or ~100×, far over the linear bound. Wall-time is reported
    // as info() for the PLANS.md record, not asserted.
    import org.apache.spark.graft.TestMetrics
    var r10 = 0; var r100 = 0
    var t10 = 0.0; var t100 = 0.0
    val (read10, write10) = TestMetrics.shuffleBytes(spark.sparkContext) {
      t10 = timed { r10 = GraphOps.kCoreStats(spark, g10, 2)._2 }
    }
    val (read100, write100) = TestMetrics.shuffleBytes(spark.sparkContext) {
      t100 = timed { r100 = GraphOps.kCoreStats(spark, g100, 2)._2 }
    }
    info(f"kCore(hub 10x→100x): wall $t10%.2fs→$t100%.2fs " +
      f"(ratio ${t100 / math.max(t10, OverheadFloorSec)}%.1f, not " +
      "asserted); rounds " + s"$r10→$r100; shuffle read " +
      f"${read10}%,d→${read100}%,d B (${ratioOf(read100, read10)}%.1fx) " +
      f"write ${write10}%,d→${write100}%,d B " +
      f"(${ratioOf(write100, write10)}%.1fx)")
    assert(r100 == r10,
      s"peel-round count changed with scale: $r10 at 10x vs $r100 at " +
        "100x — peeling depth must be a degree-distribution property")
    assert(ratioOf(read100, read10) <= MaxRatio100Graph &&
      ratioOf(write100, write10) <= MaxRatio100Graph,
      f"kCore shuffled super-linearly: read " +
        f"${ratioOf(read100, read10)}%.1fx write " +
        f"${ratioOf(write100, write10)}%.1fx at a 10x input " +
        f"(bound $MaxRatio100Graph%.0f) — an O(edges)-per-round term is " +
        "hiding in the peel loop")
  }

  test("randomWalks + sampleNeighborhood wall-time stays ~linear from " +
      "10x to 100x hub graph with 10x-100x roots") {
    // third-decade point for the sampler family: at mult 100 the hub
    // carries 4M out-edges (the adjacency rank window and the SAGE
    // top-k window must stay one pass over it) and the walk/seed count
    // scales with the graph — ~2.2M edges vs ~22M, 10k vs 100k roots.
    def samplerGraph(mult: Int): GraphTables = {
      import spark.implicits._
      val hubEdges = 40000L * mult
      val bgEdges = 180000L * mult
      val hub = spark.range(1L, hubEdges + 1L)
        .select(lit(0L).as("src"), col("id").as("dst"))
      val bg = spark.range(bgEdges).select(
        (lit(1L) + pmod(hash(col("id")), lit(10000 * mult)).cast("long"))
          .as("src"),
        (lit(hubEdges + 1L) +
          pmod(hash(col("id") * 7L), lit(20000 * mult)).cast("long"))
          .as("dst"))
      val edges = hub.unionByName(bg)
        .select(col("src"), col("dst"), lit("HAS_CHILD").as("relType"),
          lit("s").as("docnbr"), lit("b0").as("batch"),
          typedLit(Map.empty[String, String]).as("props"))
        .as[EdgeRow]
      GraphTables(spark.emptyDataset[NodeRow], edges)
    }
    def roots(mult: Int) = spark.range(0L, 1000L * mult + 1L)
      .select(col("id").as("root_id"))
    def runBoth(g: GraphTables, mult: Int): Unit = {
      GraphOps.randomWalks(spark, g, roots(mult), 2, 3).count()
      GraphOps.sampleNeighborhood(spark, g,
        roots(mult).withColumnRenamed("root_id", "id"), Seq(3, 2)).count()
    }
    val g10 = samplerGraph(10)
    val g100 = samplerGraph(100)
    runBoth(g10, 10) // warm-up
    // round-14: same contention-immune treatment as the kCore and
    // clusteringCoefficient decades — the r14 close-out suite saw this
    // pin's WALL ratio read 24.4 under 70-suite contention and ~14
    // standalone, while the threat model (a frontier scaling with
    // DEGREE instead of roots — the hub would multiply every walk
    // step) moves shuffle BYTES by orders of magnitude whatever the
    // CPU load. Bytes are asserted; wall is info() only.
    import org.apache.spark.graft.TestMetrics
    var t10 = 0.0; var t100 = 0.0
    val (read10, write10) = TestMetrics.shuffleBytes(spark.sparkContext) {
      t10 = timed(runBoth(g10, 10))
    }
    val (read100, write100) =
      TestMetrics.shuffleBytes(spark.sparkContext) {
        t100 = timed(runBoth(g100, 100))
      }
    info(f"samplers(hub 10x→100x): wall $t10%.2fs→$t100%.2fs " +
      f"(ratio ${t100 / math.max(t10, OverheadFloorSec)}%.1f, not " +
      f"asserted); shuffle read ${read10}%,d→${read100}%,d B " +
      f"(${ratioOf(read100, read10)}%.1fx) write " +
      f"${write10}%,d→${write100}%,d B " +
      f"(${ratioOf(write100, write10)}%.1fx)")
    assert(ratioOf(read100, read10) <= MaxRatio100Graph &&
      ratioOf(write100, write10) <= MaxRatio100Graph,
      f"samplers shuffled super-linearly: read " +
        f"${ratioOf(read100, read10)}%.1fx write " +
        f"${ratioOf(write100, write10)}%.1fx at a 10x input (bound " +
        f"$MaxRatio100Graph%.0f) — a walk frontier is scaling with " +
        "degree instead of roots")
  }

  test("clusteringCoefficient wall-time stays ~linear from 10x to 100x") {
    // same third-decade discipline for the single-pass wedge kernel:
    // triangles, star leaves and background all ×100 (≈19M edges), total
    // wedge count still linear in mult — only the degree-ordered
    // orientation keeps the 4M-leaf star wedge-free at this scale (an
    // id-ordered plan would enumerate ~8×10¹² wedges and never finish,
    // let alone pass the bound).
    val g10 = triGraph(10)
    val g100 = triGraph(100)
    GraphOps.clusteringCoefficient(spark, g10).count() // warm-up
    // round-13 directive 1: same contention-immune treatment as the kCore
    // decade — the asserted quantity is total shuffle bytes, which the
    // threat model (an id-ordered orientation enumerating ~8×10¹² wedges
    // at this scale) multiplies by orders of magnitude whatever the CPU
    // load; wall-time is info() only.
    import org.apache.spark.graft.TestMetrics
    var t10 = 0.0; var t100 = 0.0
    val (read10, write10) = TestMetrics.shuffleBytes(spark.sparkContext) {
      t10 = timed(GraphOps.clusteringCoefficient(spark, g10).count())
    }
    val (read100, write100) = TestMetrics.shuffleBytes(spark.sparkContext) {
      t100 = timed(GraphOps.clusteringCoefficient(spark, g100).count())
    }
    info(f"clusteringCoefficient(10x→100x): wall $t10%.2fs→$t100%.2fs " +
      f"(ratio ${t100 / math.max(t10, OverheadFloorSec)}%.1f, not " +
      f"asserted); shuffle read ${read10}%,d→${read100}%,d B " +
      f"(${ratioOf(read100, read10)}%.1fx) write " +
      f"${write10}%,d→${write100}%,d B (${ratioOf(write100, write10)}%.1fx)")
    assert(ratioOf(read100, read10) <= MaxRatio100Graph &&
      ratioOf(write100, write10) <= MaxRatio100Graph,
      f"clusteringCoefficient shuffled super-linearly: read " +
        f"${ratioOf(read100, read10)}%.1fx write " +
        f"${ratioOf(write100, write10)}%.1fx at a 10x input (bound " +
        f"$MaxRatio100Graph%.0f) — the degree-ordered orientation is not " +
        "holding the wedge count linear")
  }

  /** Relational (TPC-H) curve corpora: FACTS (lineitem, orders) replicated
    * 10× with disjoint order keys, DIMS (customer/supplier/part/nation/
    * region) kept at 1× — exactly how a 100 TB corpus scales (facts grow,
    * dimensions don't). Per-copy order keys are disjoint, so any
    * order-keyed join's matches stay within a copy and the true output of
    * the counting queries grows exactly 10×.
    */
  private lazy val (tpch1x, tpch10x): (String, String) = {
    def replicate(copies: Int): String = {
      val out = java.nio.file.Files
        .createTempDirectory(s"scaletpch$copies").toString
      val li = spark.read.parquet(sf("sf0.01") + "/lineitem.parquet")
      val o = spark.read.parquet(sf("sf0.01") + "/orders.parquet")
      (0 until copies).map(k => li.withColumn("l_orderkey",
          col("l_orderkey") + lit(k.toLong * 1000000000L)))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
      (0 until copies).map(k => o.withColumn("o_orderkey",
          col("o_orderkey") + lit(k.toLong * 1000000000L)))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$out/orders.parquet")
      for (t <- Seq("customer", "supplier", "part", "nation", "region"))
        spark.read.parquet(sf("sf0.01") + s"/$t.parquet")
          .write.mode("overwrite").parquet(s"$out/$t.parquet")
      out
    }
    (replicate(1), replicate(10))
  }

  // q21 (late-supplier EXISTS/NOT-EXISTS): both the semi and anti joins
  // key on the order key, which the replicas keep disjoint per copy — the
  // join work is linear in copies. q18 (HAVING-gated semi join): the big-
  // order aggregate and the order-keyed joins scale the same way; its
  // LIMIT 100 re-ranks over the 10x pool but bounds the result.
  for (q <- Seq("tpch_q21", "tpch_q18")) {
    test(s"$q wall-time grows ~linearly with 10x facts over fixed dims") {
      val run = SparkEntry.queries(q)
      run(spark, tpch1x).count() // warm-up: JIT + codegen + footer caches
      val t1 = timedMin2(run(spark, tpch1x).count())
      val t10 = timedMin2(run(spark, tpch10x).count())
      assertLinear(q, t1, t10)
    }
  }

  test("10x facts preserve per-copy output: q4's per-priority order " +
      "counts are exactly 10x") {
    // the fairness precondition of the relational curve: disjoint order
    // keys must keep every correlated-EXISTS match inside its own copy
    val run = SparkEntry.queries("tpch_q4")
    val c1 = run(spark, tpch1x).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val c10 = run(spark, tpch10x).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(c1.nonEmpty && c10 == c1.map { case (k, v) => k -> v * 10 },
      s"1x=$c1 10x=$c10")
  }

  // round-12 directive 1: the incremental GraphStore chain — the repo's
  // one previously unmeasured scale claim (StreamingGraphIngest doc:
  // commits write O(batch) never O(graph); reads pay one listing per
  // chain member until MaxChain folds the store).
  test("incremental store: a delta commit writes O(batch) bytes " +
      "whatever the accumulated graph size; a replayed batch commits " +
      "an ~empty delta") {
    import spark.implicits._
    import graft.graph.{GraphStore, StreamingGraphIngest}
    def batchEnv(lo: Long, n: Long) =
      StreamingGraphIngest.toEnvelope(GraphTables(
        spark.range(lo, lo + n).select(col("id"), lit("N").as("label"),
            concat(lit("n"), col("id")).as("name"), lit("").as("content"),
            lit("").as("docnbr"), lit("b0").as("batch"),
            typedLit(Seq.empty[Int]).as("path")).as[NodeRow],
        spark.emptyDataset[EdgeRow])).localCheckpoint()
    def dirBytes(p: String): Long = {
      val root = java.nio.file.Paths.get(p)
      val s = java.nio.file.Files.walk(root)
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum
      finally s.close()
    }
    def newestVersionBytes(store: String): Long =
      dirBytes(s"$store/${GraphStore.versionList(store).head}")
    // small store: 1 batch of 500; big store: bulk 50,000 then the SAME
    // 500-row batch shape — the delta commit's payload must not grow
    // with the 100x store
    val small = java.nio.file.Files
      .createTempDirectory("chain_small").resolve("s").toString
    StreamingGraphIngest.ingestBatch(spark, batchEnv(0, 500), small)
    val smallCommit = newestVersionBytes(small)
    val big = java.nio.file.Files
      .createTempDirectory("chain_big").resolve("s").toString
    StreamingGraphIngest.ingestBatch(spark, batchEnv(0, 50000), big)
    StreamingGraphIngest.ingestBatch(spark, batchEnv(100000, 500), big)
    val bigDelta = newestVersionBytes(big)
    info(f"commit payload: 500-row full=$smallCommit%d B, " +
      f"500-row delta on a 100x store=$bigDelta%d B")
    assert(bigDelta <= 3 * smallCommit,
      s"delta commit scaled with the store, not the batch: " +
        s"$bigDelta B vs $smallCommit B for the same 500 rows")
    // replay of an applied batch: the anti-join leaves nothing — the
    // commit is schema + footer overhead only, far under one batch
    StreamingGraphIngest.ingestBatch(spark, batchEnv(100000, 500), big)
    val replay = newestVersionBytes(big)
    assert(replay < smallCommit / 2,
      s"a replayed batch must commit an ~empty delta, wrote $replay B")
  }

  test("incremental store: 10x->100x drain stays batch-linear (wall " +
      "reported; the deterministic pin is write amplification), chain " +
      "capped by auto-compaction") {
    import spark.implicits._
    import graft.graph.{GraphStore, StreamingGraphIngest}
    def writeEnvFiles(dir: String, n: Int, rowsPer: Int): Unit =
      (0 until n).foreach { k =>
        val lo = k.toLong * rowsPer
        StreamingGraphIngest.toEnvelope(GraphTables(
          spark.range(lo, lo + rowsPer).select(col("id"),
              lit("N").as("label"),
              concat(lit("n"), col("id")).as("name"), lit("").as("content"),
              lit("").as("docnbr"), lit(s"b$k").as("batch"),
              typedLit(Seq.empty[Int]).as("path")).as[NodeRow],
          spark.emptyDataset[EdgeRow]))
          .coalesce(1).write.parquet(s"$dir/f$k")
      }
    def drain(n: Int): (String, Double) = {
      val root = java.nio.file.Files
        .createTempDirectory(s"chain_drain$n").toString
      writeEnvFiles(s"$root/env", n, 200)
      val t = timed(StreamingGraphIngest.drainIngest(spark, s"$root/env",
        s"$root/store", s"$root/ckpt", maxFilesPerTrigger = Some(1)))
      (s"$root/store", t)
    }
    drain(3) // warm-up: streaming-query lifecycle JIT
    val (_, t10) = drain(10)
    val (store100, t100) = drain(100)
    // 100 one-file micro-batches = 100 O(batch) commits + ~3 amortized
    // compaction folds. Per-commit read cost carries one parquet
    // listing per LIVE CHAIN member by design, and the 10-batch run
    // never grows past chain 10 while the 100-batch run averages ~20
    // members between folds — a bounded (≤ MaxChain) constant-factor
    // ramp on top of the 10x batch count, the documented amortization
    // contract. The wall ratio is REPORTED, not asserted (r15: under
    // parallel-suite contention every micro-batch trigger waits on a
    // contended scheduler and the reading blew to 90x where the same
    // code reads 12.9x standalone — the same flake class as the r13/r14
    // wall→bytes conversions). The defect this curve exists to catch —
    // a per-batch store REWRITE — is pinned DETERMINISTICALLY by the
    // write-amplification test below (total bytes on disk, which no
    // contention can tip), plus the chain-cap and row-count asserts
    // here.
    info(f"graphstore-drain(10x→100x batches): 10x=$t10%.2fs " +
      f"100x=$t100%.2fs ratio=${t100 / math.max(t10, 0.2)}%.1f " +
      "(reported only — the deterministic pin is write amplification)")
    assert(GraphStore.chainLength(store100) <=
      StreamingGraphIngest.MaxChain + 1,
      "auto-compaction must cap the live chain")
    assert(GraphStore.load(spark, store100).nodes.count() == 100L * 200)
  }

  test("incremental store: write amplification over 100 commits stays " +
      "a small constant — deltas + amortized folds, never a rewrite " +
      "per batch") {
    // the DETERMINISTIC form of the amortization claim (timing-free, so
    // CPU contention cannot tip it): with every version retained, total
    // bytes on disk after N batches = N deltas + the ~N/MaxChain
    // compaction folds' snapshots. At 100 batches/MaxChain=32 the folds
    // rewrite ~33+66+99 batch-equivalents, so amplification ≈ 3x
    // arrived data; a per-batch rewrite is Σk ≈ 50x and a per-batch
    // fold ~N/2 x. Bound 6x.
    import spark.implicits._
    import graft.graph.{GraphStore, StreamingGraphIngest}
    def batchEnv(lo: Long, n: Long) =
      StreamingGraphIngest.toEnvelope(GraphTables(
        spark.range(lo, lo + n).select(col("id"), lit("N").as("label"),
            concat(lit("n"), col("id")).as("name"), lit("").as("content"),
            lit("").as("docnbr"), lit("b0").as("batch"),
            typedLit(Seq.empty[Int]).as("path")).as[NodeRow],
        spark.emptyDataset[EdgeRow])).localCheckpoint()
    def dirBytes(p: String): Long = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(p))
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum
      finally s.close()
    }
    val store = java.nio.file.Files
      .createTempDirectory("chain_amp").resolve("s").toString
    (0 until 100).foreach(k => StreamingGraphIngest.ingestBatch(spark,
      batchEnv(k * 200L, 200), store, keepVersions = 1000))
    val oneBatch = {
      val solo = java.nio.file.Files
        .createTempDirectory("chain_amp1").resolve("s").toString
      StreamingGraphIngest.ingestBatch(spark, batchEnv(0, 200), solo)
      dirBytes(solo)
    }
    val total = dirBytes(store)
    val amp = total.toDouble / (100.0 * oneBatch)
    info(f"write amplification over 100 commits: total=$total%d B, " +
      f"one batch=$oneBatch%d B, amp=$amp%.2fx (bound 6)")
    assert(amp <= 6.0,
      f"write amplification $amp%.2fx — the store is rewriting more " +
        "than the documented deltas + amortized folds")
    assert(GraphStore.chainLength(store) <=
      StreamingGraphIngest.MaxChain + 1)
    assert(GraphStore.load(spark, store).nodes.count() == 100L * 200)
  }

  test("incremental store: load cost grows with the chain only " +
      "linearly, and compaction folds it back to snapshot cost") {
    import spark.implicits._
    import graft.graph.{GraphStore, StreamingGraphIngest}
    def batchEnv(lo: Long, n: Long) =
      StreamingGraphIngest.toEnvelope(GraphTables(
        spark.range(lo, lo + n).select(col("id"), lit("N").as("label"),
            concat(lit("n"), col("id")).as("name"), lit("").as("content"),
            lit("").as("docnbr"), lit("b0").as("batch"),
            typedLit(Seq.empty[Int]).as("path")).as[NodeRow],
        spark.emptyDataset[EdgeRow])).localCheckpoint()
    // same 32k-row content, two layouts: one snapshot vs a 32-member
    // delta chain (maxChain high enough that no fold happens)
    val snap = java.nio.file.Files
      .createTempDirectory("chain_snap").resolve("s").toString
    StreamingGraphIngest.ingestBatch(spark, batchEnv(0, 32000), snap)
    val chained = java.nio.file.Files
      .createTempDirectory("chain_long").resolve("s").toString
    (0 until 32).foreach(k => StreamingGraphIngest.ingestBatch(spark,
      batchEnv(k * 1000L, 1000), chained, maxChain = 1000))
    assert(GraphStore.chainLength(chained) == 32)
    def loadCount(dir: String): Unit = {
      val g = GraphStore.load(spark, dir)
      assert(g.nodes.count() == 32000)
    }
    loadCount(snap); loadCount(chained) // warm-up
    val tSnap = timedMin2(loadCount(snap))
    val tChain = timedMin2(loadCount(chained))
    info(f"load: snapshot=${tSnap}%.2fs 32-chain=${tChain}%.2fs " +
      f"ratio=${tChain / math.max(tSnap, OverheadFloorSec)}%.1f")
    // one parquet listing + footer per member: 32 members may cost up
    // to ~32 listings' overhead but never superlinear blowup
    assertLinear("graphstore-load(1→32 chain)", tSnap, tChain,
      bound = 32.0)
    // compaction restores snapshot-shaped reads (content unchanged)
    GraphStore.compact(spark, chained)
    assert(GraphStore.chainLength(chained) == 1)
    val tAfter = timedMin2(loadCount(chained))
    info(f"load after compaction=${tAfter}%.2fs")
    assert(tAfter <= math.max(3 * tSnap, 3 * OverheadFloorSec),
      f"post-compaction load should read like a snapshot: " +
        f"$tAfter%.2fs vs $tSnap%.2fs")
  }

  test("path-quantified expansion scales linearly on a 10x disjoint-" +
      "chain bank: output rows exactly 10x, shuffle bytes bounded") {
    // the round-13 kernel's scale evidence, contention-immune from the
    // start: disjoint weighted 6-chains (every path stays inside its
    // chain, so the TRUE path bag grows exactly with the bank) — output
    // cardinality is asserted exactly and the work signal is shuffle
    // bytes, never wall-clock. The per-step frontier join's input grows
    // with the bank; a super-linear term (e.g. a cross-chain product)
    // would multiply both the row count and the bytes.
    import spark.implicits._
    import graft.graph.CypherLite
    def chainBank(copies: Int): GraphTables = {
      val nodes = spark.range(copies).crossJoin(
          spark.range(6).select(col("id").as("i")))
        .select((col("id") * 10 + col("i")).as("id"),
          when(col("i") === 0, lit("Root")).otherwise(lit("N"))
            .as("label"),
          (col("id") * 10 + col("i")).cast("string").as("name"),
          lit("").as("content"), lit("").as("docnbr"),
          lit("b0").as("batch"), typedLit(Seq.empty[Int]).as("path"))
        .as[NodeRow]
      val edges = spark.range(copies).crossJoin(
          spark.range(5).select(col("id").as("i")))
        .select((col("id") * 10 + col("i")).as("src"),
          (col("id") * 10 + col("i") + 1).as("dst"),
          lit("E").as("relType"), lit("").as("docnbr"),
          lit("b0").as("batch"),
          typedLit(Map("w" -> "2")).as("props")).as[EdgeRow]
      GraphTables(nodes, edges)
    }
    val q = "MATCH p = (a:Root)-[r:E*1..4]->(b:N) " +
      "WHERE ALL(x IN relationships(p) WHERE x.w > 1) " +
      "RETURN b.name, reduce(s = 0, x IN relationships(p) | s + x.w) " +
      "AS total"
    def run(g: GraphTables): Long =
      CypherLite.run(g, q).fold(e => fail(e), identity).count()
    // 20k vs 200k chains: both points are PAST the broadcast-join
    // regime (a 2k-chain bank shuffles ~nothing — AQE broadcasts every
    // frontier join — which would make a byte ratio meaningless)
    val g10 = chainBank(20000)
    val g100 = chainBank(200000)
    run(g10) // warm-up
    import org.apache.spark.graft.TestMetrics
    var n10 = 0L; var n100 = 0L
    val (read10, write10) = TestMetrics.shuffleBytes(spark.sparkContext) {
      n10 = run(g10)
    }
    val (read100, write100) =
      TestMetrics.shuffleBytes(spark.sparkContext) {
        n100 = run(g100)
      }
    info(f"pathQuant(chain bank 10x→100x): rows $n10%,d→$n100%,d; " +
      f"shuffle read $read10%,d→$read100%,d B " +
      f"(${ratioOf(read100, read10)}%.1fx) write " +
      f"$write10%,d→$write100%,d B (${ratioOf(write100, write10)}%.1fx)")
    // 4 paths per chain (len 1..4 from the root), all passing w>1
    assert(n10 == 4L * 20000 && n100 == 10L * n10,
      s"path bag must grow exactly with the bank: $n10 → $n100")
    assert(ratioOf(read100, read10) <= MaxRatio100Graph &&
      ratioOf(write100, write10) <= MaxRatio100Graph,
      f"quantified expansion shuffled super-linearly: read " +
        f"${ratioOf(read100, read10)}%.1fx write " +
        f"${ratioOf(write100, write10)}%.1fx at a 10x bank")
  }

  test("scc shuffle bytes stay ~linear from 10x to 100x cycle-chain " +
      "bank, peel count scale-invariant") {
    // round-16 directive 1: SCC joins louvain/kcore in the third decade.
    // Fixture: disjoint copies of a FIXED-depth motif — a 3-deep chain of
    // directed 3-cycles (condensation depth 3, diameter ~11) — so the
    // convergence-checked peel loop runs a CONSTANT number of peels and
    // supersteps at every scale (all copies peel their k-th cycle in the
    // same superstep wave), while per-superstep Pregel input grows 10×.
    // The old fixed-budget kernel could not be pinned this way: its cost
    // was 10 outer iterations regardless of convergence, and on deeper
    // condensations its OUTPUT was wrong. A super-linear term (a
    // peel-count dependence on copies, or an all-pairs color join) blows
    // the byte bound; wall-time is info()-only per the round-13 rule.
    def cycleBank(copies: Int): GraphTables = {
      import spark.implicits._
      val depth = 3L // cycles per copy, 3 nodes each, chained k -> k+1
      val n = 3L * depth // nodes per copy
      val intra = spark.range(copies * n)
        .select((col("id") / n).cast("long").as("c"),
          pmod(col("id"), lit(n)).as("i"))
        .select((col("c") * 100L + col("i")).as("src"),
          (col("c") * 100L +
            (col("i") - pmod(col("i"), lit(3L)) +
              pmod(col("i") + 1L, lit(3L)))).as("dst"))
      val links = spark.range(copies * (depth - 1))
        .select((col("id") / (depth - 1)).cast("long").as("c"),
          pmod(col("id"), lit(depth - 1)).as("k"))
        .select((col("c") * 100L + col("k") * 3L + 2L).as("src"),
          (col("c") * 100L + (col("k") + 1L) * 3L).as("dst"))
      val edges = intra.unionByName(links)
        .select(col("src"), col("dst"), lit("HAS_CHILD").as("relType"),
          lit("s").as("docnbr"), lit("b0").as("batch"),
          typedLit(Map.empty[String, String]).as("props"))
        .as[EdgeRow]
      // unlike the DataFrame kernels' pins, toGraphX takes vertices from
      // the node relation only (GraphX `Graph.apply` does NOT invent
      // edge-endpoint vertices), so the bank needs real node rows
      val nodes = spark.range(copies * n)
        .select((col("id") / n).cast("long").as("c"),
          pmod(col("id"), lit(n)).as("i"))
        .select((col("c") * 100L + col("i")).as("id"),
          lit("N").as("label"), lit("n").as("name"),
          lit("").as("content"), lit("").as("docnbr"),
          lit("b0").as("batch"),
          typedLit(Seq.empty[Int]).as("path"))
        .as[NodeRow]
      GraphTables(nodes, edges)
    }
    val g10 = cycleBank(10000)
    val g100 = cycleBank(100000)
    import org.apache.spark.graft.TestMetrics
    var p10 = 0; var p100 = 0
    var t10 = 0.0; var t100 = 0.0
    val (read10, write10) = TestMetrics.shuffleBytes(spark.sparkContext) {
      t10 = timed { p10 = GraphOps.sccStats(spark, g10)._2 }
    }
    val (read100, write100) = TestMetrics.shuffleBytes(spark.sparkContext) {
      t100 = timed { p100 = GraphOps.sccStats(spark, g100)._2 }
    }
    info(f"scc(cycleBank 10x→100x): wall $t10%.2fs→$t100%.2fs " +
      f"(ratio ${t100 / math.max(t10, OverheadFloorSec)}%.1f, not " +
      "asserted); peels " + s"$p10→$p100; shuffle read " +
      f"${read10}%,d→${read100}%,d B (${ratioOf(read100, read10)}%.1fx) " +
      f"write ${write10}%,d→${write100}%,d B " +
      f"(${ratioOf(write100, write10)}%.1fx)")
    assert(p100 == p10,
      s"peel count changed with scale: $p10 at 10x vs $p100 at 100x — " +
        "peels must be a condensation-depth property, not a size one")
    assert(ratioOf(read100, read10) <= MaxRatio100Graph &&
      ratioOf(write100, write10) <= MaxRatio100Graph,
      f"scc shuffled super-linearly: read " +
        f"${ratioOf(read100, read10)}%.1fx write " +
        f"${ratioOf(write100, write10)}%.1fx at a 10x input " +
        f"(bound $MaxRatio100Graph%.0f) — a per-peel O(copies) term or " +
        "an all-pairs color join is hiding in the loop")
  }

  test("10x replica preserves per-copy output: minhash pairs are exactly " +
      "10x the 1x pairs, none crossing copies") {
    // the fairness precondition of the curve: if token-salting leaked
    // cross-copy near-dups, the OUTPUT itself would grow quadratically
    // and the wall-time bound would be testing the wrong thing
    val run = SparkEntry.queries("l2_minhash_lsh")
    val p1 = run(spark, dir1x).count()
    val p10 = run(spark, dir10x)
    assert(p10.count() == 10L * p1,
      s"expected exactly 10x the pairs, got ${p10.count()} vs $p1")
    assert(p10.filter(
        col("doc_a").divide(1000000000L).cast("long") =!=
          col("doc_b").divide(1000000000L).cast("long")).count() == 0L,
      "cross-copy near-dup pairs leaked into the 10x corpus")
  }
}

object ScaleCurveSpec {
  /** Generous linear-growth bound for a 10× corpus (judge-prescribed ~15;
    * linear work + fixed overhead lands far below it, a quadratic term
    * lands far above).
    */
  val MaxRatio = 15.0

  /** Fixed per-query session overhead floor: 1× readings at this corpus
    * size are mostly planning/launch cost, so tiny denominators would
    * turn noise into a fake super-linear verdict.
    */
  val OverheadFloorSec = 0.4

  /** Bound for the GRAPH kernels' third decade (10×→100×): the 100×
    * fixtures (~20M edges) push the shared 8g test JVM's storage fraction
    * — other suites' cached fixtures and the serialized round state
    * coexist — so honest linear plans read ~12-13 with several seconds of
    * eviction/IO jitter on top. 20 keeps the verdict unambiguous: the
    * quadratic alternative reads ~100 (and an id-ordered wedge plan would
    * not finish at all).
    */
  val MaxRatio100Graph = 20.0
}
