package graft

import graft.graph._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Public facade — the one-stop API a user of the reference system
  * (`AshmitGupta/Graph-Database-Project`) programs against after switching:
  * XML→graph ingestion, the Cypher-subset/SQL query surface, k-hop
  * neighborhoods with nested shaping, MERGE/delete/link maintenance,
  * graph-at-rest storage, and the LLM-pipeline corpus ops.
  *
  * Every method delegates to the module that owns the logic; this object
  * adds no behavior, only a stable surface.
  */
object Graft {

  // ---------------------------------------------------------------- ingest
  /** Parse an XML corpus into graph relations (element mode; set
    * `titleMode` for the TITLE-section generation).
    */
  def ingestXml(spark: SparkSession, pathGlob: String, batch: String,
      titleMode: Boolean = false): GraphTables =
    XmlIngest.ingest(spark, pathGlob, batch, titleMode)

  // ----------------------------------------------------------------- query
  /** Cypher-subset execution (`MATCH …[-[*1..k]->…] RETURN …`,
    * `DETACH DELETE`).
    */
  def cypher(g: GraphTables, query: String): Either[String, DataFrame] =
    CypherLite.run(g, query)

  /** Register `nodes`/`edges` temp views and run arbitrary Spark SQL. */
  def sql(spark: SparkSession, g: GraphTables, query: String): DataFrame = {
    g.nodes.createOrReplaceTempView("nodes")
    g.edges.createOrReplaceTempView("edges")
    spark.sql(query)
  }

  /** Matched node + ≤k-hop downward neighborhood, nested by root name
    * (the reference's flagship read path).
    */
  def neighborhood(g: GraphTables, label: String, name: String,
      k: Int = 3): DataFrame =
    GraphOps.nestByRoot(GraphOps.neighborhood(g, label, name, k))

  // ----------------------------------------------------------- maintenance
  def upsert(existing: GraphTables, incoming: GraphTables): GraphTables =
    GraphOps.upsert(existing, incoming)

  def dropBatch(g: GraphTables, batch: String): GraphTables =
    GraphOps.dropBatch(g, batch)

  // ----------------------------------------------------------------- store
  def save(g: GraphTables, dir: String): Unit = GraphStore.save(g, dir)
  def load(spark: SparkSession, dir: String): GraphTables =
    GraphStore.load(spark, dir)
  def compact(spark: SparkSession, dir: String): Unit =
    GraphStore.compact(spark, dir)

  // ------------------------------------------------------------- analytics
  def pageRank(spark: SparkSession, g: GraphTables, iters: Int = 10)
      : DataFrame = GraphOps.pageRank(spark, g, iters)
  def connectedComponents(spark: SparkSession, g: GraphTables): DataFrame =
    GraphOps.connectedComponents(spark, g)
  def degrees(spark: SparkSession, g: GraphTables): DataFrame =
    GraphOps.degrees(spark, g)
  /** Min-sum weighted shortest distances from `rootIds`; `weight` is a
    * Column over the edge relation (src, dst, relType, …).
    */
  def weightedDistances(spark: SparkSession, g: GraphTables,
      rootIds: Set[Long], weight: org.apache.spark.sql.Column): DataFrame =
    GraphOps.weightedDistances(spark, g, rootIds, weight)
  /** Personalized PageRank from one source (the recommendation ranking). */
  def personalizedPageRank(spark: SparkSession, g: GraphTables, src: Long,
      iters: Int = 20): DataFrame =
    GraphOps.personalizedPageRank(spark, g, src, iters)
  /** HITS hubs & authorities (L1-normalized). */
  def hits(spark: SparkSession, g: GraphTables, iters: Int = 12): DataFrame =
    GraphOps.hits(spark, g, iters)
  /** Landmark-sampled harmonic centrality (Σ 1/d over the landmarks). */
  def harmonicCentrality(spark: SparkSession, g: GraphTables,
      landmarks: Seq[Long]): DataFrame =
    GraphOps.harmonicCentrality(spark, g, landmarks)
  /** Neighborhood-Jaccard node similarity (GDS nodeSimilarity shape). */
  def nodeSimilarity(spark: SparkSession, g: GraphTables,
      maxDegree: Int = 1000): DataFrame =
    GraphOps.nodeSimilarity(spark, g, maxDegree)
  /** k-core membership (bulk-synchronous peeling). */
  def kCore(spark: SparkSession, g: GraphTables, k: Int): DataFrame =
    GraphOps.kCore(spark, g, k)
  /** Adamic-Adar link prediction over common neighbors. */
  def linkPredict(spark: SparkSession, g: GraphTables,
      maxDegree: Int = 1000): DataFrame =
    GraphOps.adamicAdar(spark, g, maxDegree)
  /** Strongly connected components (directed mutual reachability).
    * Convergence-checked: runs to the empty-work-graph fixpoint;
    * `maxPeels` is a safety valve that throws rather than truncate. */
  def stronglyConnected(spark: SparkSession, g: GraphTables,
      maxPeels: Int = 1000): DataFrame =
    GraphOps.stronglyConnected(spark, g, maxPeels)
  /** Landmark-sampled Brandes betweenness centrality. */
  def betweenness(spark: SparkSession, g: GraphTables,
      landmarks: Seq[Long]): DataFrame =
    GraphOps.betweenness(spark, g, landmarks)
  /** Local clustering coefficient (2T(v) / deg(v)(deg(v)−1)). */
  def clusteringCoefficient(spark: SparkSession, g: GraphTables): DataFrame =
    GraphOps.clusteringCoefficient(spark, g)
  /** Louvain modularity communities (exact-integer accept-guard). */
  def louvain(spark: SparkSession, g: GraphTables): DataFrame =
    GraphOps.louvain(spark, g)
  /** k-truss edge subgraph (every edge in ≥ k−2 triangles). */
  def kTruss(spark: SparkSession, g: GraphTables, k: Int): DataFrame =
    GraphOps.kTruss(spark, g, k)
  /** Landmark-restricted closeness centrality. */
  def closenessCentrality(spark: SparkSession, g: GraphTables,
      landmarks: Seq[Long]): DataFrame =
    GraphOps.closenessCentrality(spark, g, landmarks)
  /** Weighted shortest distances reading a REAL edge property
    * (`EdgeRow.props(weightProp)`, absent/garbage values → `default`).
    */
  def shortestPathWeighted(spark: SparkSession, g: GraphTables,
      rootIds: Set[Long], weightProp: String = "weight",
      default: Double = 1.0): DataFrame =
    GraphOps.shortestPathWeighted(spark, g, rootIds, weightProp, default)

  // ------------------------------------------------------------ corpus ops
  /** Near-duplicate clusters of a documents table (doc_id, text, …):
    * minhash-LSH candidate pairs → connected components →
    * (doc_id, cluster_id, is_canonical).
    */
  def dupClusters(spark: SparkSession, sfDir: String): DataFrame =
    SparkEntry.queries("l2e_dup_clusters")(spark, sfDir)

  /** The deduplicated corpus slice counts (canonical docs only). */
  def dedupOutput(spark: SparkSession, sfDir: String): DataFrame =
    SparkEntry.queries("l2f_dedup_output")(spark, sfDir)

  /** SimHash near-duplicate pairs (Hamming ≤ 3) via the banded search and
    * the codegen'd `graft_hamming` verify.
    */
  def simhashNearDups(spark: SparkSession, sfDir: String): DataFrame =
    SparkEntry.queries("l2b2_simhash_neardup")(spark, sfDir)

  /** Train/eval contamination report (shared-shingle semi-join). */
  def contaminationCheck(spark: SparkSession, sfDir: String): DataFrame =
    SparkEntry.queries("l12_contamination_check")(spark, sfDir)

  /** Deterministic per-language token-budget mixture fill. */
  def tokenBudgetMix(spark: SparkSession, sfDir: String): DataFrame =
    SparkEntry.queries("l16_token_budget_mix")(spark, sfDir)

  /** Int8 symmetric quantization roundtrip report over the embeddings. */
  def quantizeEmbeddings(spark: SparkSession, sfDir: String): DataFrame =
    SparkEntry.queries("l17_embedding_quantize")(spark, sfDir)

  /** IVF-style approximate nearest neighbors over the embeddings table. */
  def ivfAnn(spark: SparkSession, sfDir: String): DataFrame =
    SparkEntry.queries("l18_ivf_ann")(spark, sfDir)

  /** Fixed-token-budget training-batch assignment per document. */
  def sequencePacking(spark: SparkSession, sfDir: String): DataFrame =
    SparkEntry.queries("l19_sequence_packing")(spark, sfDir)

  // ------------------------------------------------------------- streaming
  /** Incrementally-maintained per-user aggregate view (exactly-once via
    * replay-idempotent versioned merges); read it back with
    * [[streaming.StreamingOps.readAggState]].
    */
  def incrementalAgg(streaming: DataFrame, stateDir: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    graft.streaming.StreamingOps.incrementalAgg(streaming, stateDir,
      checkpoint)

  /** Continuous graph ingest (the reference's MERGE write path under
    * streaming arrival): an envelope stream of node/edge rows commits one
    * store version per micro-batch. See [[graph.StreamingGraphIngest]].
    */
  def streamIngest(envStream: DataFrame, storeDir: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    StreamingGraphIngest.ingest(envStream, storeDir, checkpoint)

  /** Scheduled-catch-up graph ingest: drain every envelope file this
    * checkpoint has not yet processed into the store, then return.
    */
  def drainGraphIngest(spark: SparkSession, envDir: String,
      storeDir: String, checkpoint: String): Unit =
    StreamingGraphIngest.drainIngest(spark, envDir, storeDir, checkpoint)
}
