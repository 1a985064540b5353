package graft.text

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Engine-portable 60-bit hash: the low 15 hex digits of md5, identical in
  * Spark and DuckDB, so hash-derived operators (minhash, simhash,
  * fingerprints) are oracle-checkable. xxhash64 would be faster but is
  * Spark-only; swap via this seam if an operator drops its oracle.
  */
object PortableHash {
  def spark(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")
  def duck(e: String): String =
    s"CAST(concat('0x', substring(md5($e), 1, 15)) AS BIGINT)"
}

/** LLM-training-data pipeline operators over `documents` and `embeddings`
  * (SURVEY.md §2.C L-ops + north star): exact/near dedup, similarity search,
  * text analysis. Each is written as the scalable form — inverted-index /
  * bucket joins instead of all-pairs cross joins wherever the semantics
  * allow — and mirrored in DuckDB SQL for the correctness oracle.
  */
/** Sizing knobs of the near-dup family. Every knob appears in BOTH the
  * Spark pipeline and its generated DuckDB oracle SQL, so oracle parity is
  * provable at any setting — `KnobMatrixSpec` and the `*_prod_knobs`
  * registry entries run the same comparisons at [[DedupKnobs.Production]]
  * that the regular entries run at [[DedupKnobs.Test]].
  */
final case class DedupKnobs(
    seeds: Int,        // minhash signature length
    bands: Int,        // minhash LSH bands (seeds/bands rows per band)
    simBits: Int,      // simhash fingerprint width
    jaccardDfCap: Int  // n-gram posting-list cap before the pair join
) {
  require(seeds % bands == 0, "seeds must divide evenly into bands")
  require(simBits % 4 == 0 && simBits <= 64, "simhash is 4 banded longs")
  /** SimHash band width. Band count is FIXED at 4: a pair within Hamming
    * distance 3 differs in ≤3 bit positions, so by pigeonhole at least one
    * of 4 bands matches exactly — full recall at the ≤3 threshold. Scaling
    * is done by widening the bands (8→16 bits = 256→65536 buckets/band),
    * never by adding bands, which would lower the distance guarantee.
    */
  def simBandBits: Int = simBits / 4
}

object DedupKnobs {
  /** Small values that exercise every mechanism (caps trip, bands collide)
    * at sf0.001-0.1 corpus scale.
    */
  val Test = DedupKnobs(seeds = 16, bands = 4, simBits = 32, jaccardDfCap = 5)
  /** Documented production defaults for a billion-doc corpus: 32 minhashes
    * in 8 bands (4-row bands ⇒ candidate threshold ≈ 0.56 Jaccard), 64-bit
    * simhash in 4×16-bit bands (65536 buckets/band keeps the band join
    * sub-quadratic), posting lists capped at DF 1000 (a small multiple of
    * the expected dup-cluster width).
    */
  val Production =
    DedupKnobs(seeds = 32, bands = 8, simBits = 64, jaccardDfCap = 1000)
}

object TextQueries {
  import DedupKnobs.{Test => TK}
  // universal hash family over one base md5 hash: h_k = (a_k·h + b_k) mod P.
  // One md5 per shingle instead of SEEDS md5s — 16× fewer digest calls on
  // the ingest-side hot path; P = 2^31-1 keeps a_k·h < 2^63.
  private val P = 2147483647L
  // contamination-check DF cap: shingles present in more documents than this
  // match essentially everything (stopword trigrams) and carry zero
  // decontamination signal, while making one semi-join key drag most of the
  // corpus through the shuffle. Dropped up front on BOTH engines; production
  // would size it as a small fraction of corpus size.
  private val ContamDfCap = 20
  // IVF coarse quantizer: K cells, NPROBE probed per query. Test-scale
  // values; production sizes K ≈ sqrt(N) and tunes NPROBE for recall.
  private val IvfK = 8
  private val IvfProbe = 2
  // L23 chunking: C-token chunks every S tokens (C−S tokens of overlap)
  private val ChunkSize = 32
  private val ChunkStride = 24
  // L24 PII patterns, restricted to the RE2 ∩ java.util.regex common
  // dialect (simple classes + bounded quantifiers; no lookaround, no
  // backrefs, no \b) so Spark and DuckDB match identically
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val Ipv4Re = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"
  private val PhoneRe = "\\+\\d{1,2}-\\d{3}-\\d{4}"
  // Per-seed multipliers must be WELL SPREAD over [1, P): the naive
  // a_k = 2k+1 family is lattice-correlated across seeds (order statistics
  // of a·x mod P barely change between small consecutive multipliers), and
  // DedupScaleSpec measured its pair-miss rate at ~8e-4 where independent
  // seeds give ~4e-10 — a real recall bug at corpus scale, invisible at
  // sf0.01. Knuth's multiplier spreads consecutive k to distant odd
  // multipliers; the DuckDB oracle SQL is generated from these same
  // functions, so parity is maintained by construction.
  private def hashA(k: Int): Long = (2654435761L * (2 * k + 1)) % P
  private def hashB(k: Int): Long = (1779033703L * (k + 1) + 12345L) % P

  /** Plain-Scala twin of the minhash band pipeline, for the STREAMING
    * ingest path ([[graft.streaming.StreamingDedup]]): a document's
    * signature is per-row state-free work, so a stream computes it inline
    * (no shuffle) and only the band-bucket membership is stateful. The
    * formula is definitionally identical to [[minhashPairs]] — same
    * tokenize/shingle front end, same md5-low-15-hex base hash, same
    * (a_k·h + b_k) mod P family, same md5 band key — so the streaming
    * candidate-pair set provably equals the batch kernel's on the same
    * documents (asserted end-to-end in StreamingDedupSpec).
    * Returns one (band, bandKey, signature) per band; empty for docs
    * under 3 tokens (which the batch kernel also drops).
    */
  private[graft] def minhashBands(text: String,
      kn: DedupKnobs = TK): Seq[(Int, String, Seq[Long])] = {
    val toks = text.split(" ", -1)
    if (toks.length < 3) return Seq.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String = {
      md.reset()
      md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
    }
    val hbs = toks.sliding(3).map(_.mkString(" ")).toArray.distinct
      .map(sh => java.lang.Long.parseLong(md5hex(sh).take(15), 16) % P)
    val sig = (0 until kn.seeds).map { k =>
      val (a, b) = (hashA(k), hashB(k))
      hbs.iterator.map(h => (a * h + b) % P).min
    }
    val rowsPerBand = kn.seeds / kn.bands
    (0 until kn.bands).map { b =>
      val key = md5hex((0 until rowsPerBand)
        .map(r => sig(b * rowsPerBand + r).toString).mkString("_"))
      (b, key, sig)
    }
  }

  /** doc → distinct word-3-shingle rows; the shared frontend of the
    * near-dup family. 0-based in Spark, mirrored 1-based in DuckDB.
    */
  private def shingles(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(toks) - 3)," +
          " i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))")).as("s"))
      .distinct()

  private val duckShingles: String =
    """SELECT DISTINCT doc_id, unnest(list_transform(
      |    generate_series(1, len(l) - 2),
      |    i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS s
      |FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
      |WHERE len(l) >= 3""".stripMargin

  /** The lowercased host of a URL with the `www.` alias stripped — the
    * host identity URL canonicalization dedups on (an `m.` or other
    * subdomain is a REAL distinct host and is never merged). Pure column
    * expressions: whole-stage codegen, no UDF.
    */
  def urlHost(url: Column): Column =
    regexp_replace(lower(coalesce(regexp_extract(
        regexp_replace(url, "#.*$", ""),
        "^[A-Za-z]+://([^/?#:]+)", 1), lit(""))),
      "^www\\.", "")

  /** Canonical form of a URL — the crawl-intake normalization every
    * web-corpus pipeline runs before URL-level dedup:
    * scheme and host case-fold, `www.` stripped, default ports (443/80)
    * dropped, the fragment removed, trailing path slashes trimmed (the
    * root path stays `/`), and tracking params (`utm_*`, `fbclid`,
    * `gclid`, `ref`) filtered out of the query string while REAL params
    * survive in their original order. Every rule is a plain string
    * expression (codegen'd) and has an exact DuckDB mirror in the
    * `l57_url_dedup` oracle, so the two engines' canonical forms agree
    * byte-for-byte.
    */
  def canonicalizeUrl(url: Column): Column = {
    val nf = regexp_replace(url, "#.*$", "")
    val scheme =
      lower(coalesce(regexp_extract(nf, "^([A-Za-z]+)://", 1), lit("")))
    val host = urlHost(url)
    val port = coalesce(
      regexp_extract(nf, "^[A-Za-z]+://[^/?#]*:([0-9]+)", 1), lit(""))
    val rawpath = coalesce(
      regexp_extract(nf, "^[A-Za-z]+://[^/?#]+(/[^?#]*)", 1), lit(""))
    val q = coalesce(regexp_extract(nf, "\\?(.*)$", 1), lit(""))
    // startsWith, not LIKE: '_' is a single-char LIKE wildcard in every
    // SQL engine, so 'utm_%' would also swallow the REAL param utm=1
    val keepq = coalesce(array_join(filter(split(q, "&"),
      p => p =!= "" && !(p.startsWith("utm_") || p.startsWith("fbclid=") ||
        p.startsWith("gclid=") || p.startsWith("ref="))), "&"), lit(""))
    val trimmed = regexp_replace(rawpath, "/+$", "")
    val path = when(trimmed === "", lit("/")).otherwise(trimmed)
    val portSfx = when(port === "" ||
        (scheme === "https" && port === "443") ||
        (scheme === "http" && port === "80"), lit(""))
      .otherwise(concat(lit(":"), port))
    concat(scheme, lit("://"), host, portSfx, path,
      when(keepq === "", lit("")).otherwise(concat(lit("?"), keepq)))
  }

  /** Registrable domain under the PUBLIC SUFFIX LIST algorithm, now
    * over the FULL bundled list ([[PslTable]], ~9.5k rules — round-14
    * directive 6, replacing the round-13 50-rule snapshot): probe the
    * host's trailing k labels for k = 1..max, prevail exception >
    * longest match > the implicit `*` default (ps = the last label),
    * and answer the public suffix plus ONE label. A host that IS a
    * public suffix (or a single label) has no registrable domain and
    * answers '' — such hosts group alone. Pure column expressions —
    * each probe is the native [[graft.functions.PslKind]] codegen
    * expression (an O(1) hash get against the table riding the plan
    * as a reference object; a 9.5k-entry literal map would be an
    * O(rules) linear probe per row, and a broadcast join would put 6
    * joins into a projection) — whole-stage codegen, no UDF, no join,
    * the l57 plan pin holds. The DuckDB mirror reads the SAME rules
    * ([[registrableDomainDuckCtes]] joins the CSV generated from
    * [[PslTable.rules]]) so the two engines cannot drift.
    */
  def registrableDomain(host: Column): Column = {
    // idempotent per-call registration, the graft_dot pattern — the
    // expression is invoked by name so this Column helper composes in
    // any query without threading the session through
    graft.functions.PslKind.register(
      org.apache.spark.sql.SparkSession.active)
    val labels = split(host, "\\.")
    val n = size(labels)
    def suf(k: Int) = array_join(slice(labels, lit(-k), lit(k)), ".")
    def kindAt(k: Int) =
      when(n >= k, call_function("graft_psl_kind", suf(k)))
    val exc = coalesce(
      (1 to (PslTable.maxLabels + 1)).map(k =>
        when(kindAt(k) === 3, lit(k - 1))) :+
        lit(null).cast("int"): _*)
    val norm = greatest(
      (1 to PslTable.maxLabels).flatMap(k => Seq(
        when(kindAt(k) === 1, lit(k)).otherwise(lit(0)),
        when(kindAt(k) === 2 && n >= k + 1, lit(k + 1))
          .otherwise(lit(0)))) :+ lit(1): _*)
    val ps = coalesce(exc, norm)
    when(n <= ps, lit(""))
      .otherwise(array_join(slice(labels, -(ps + lit(1)), ps + lit(1)),
        "."))
  }

  /** DuckDB CTE tail mirroring [[registrableDomain]]: given a relation
    * `<src>` carrying a `host` column, appends CTEs ending in
    * `psl.domain` as the registrable-domain column. The rule table is
    * [[PslTable.csvPath]] — the CSV generated from the SAME parsed
    * rules the Spark expression probes — joined once per candidate
    * suffix depth (maxLabels+1 left joins of a 9.5k-row table; DuckDB
    * hash-joins those in microseconds). One source of truth, so a
    * rule refresh cannot desynchronize the oracle.
    */
  private[text] def registrableDomainDuckCtes(src: String): String = {
    val max = PslTable.maxLabels
    val ks = 1 to (max + 1)
    val sufs = ks.map(k =>
      s"array_to_string(list_slice(hl, hn - ${k - 1}, hn), '.') AS s$k")
      .mkString(",\n    ")
    val joins = ks.map(k => s"LEFT JOIN psl_rules r$k ON r$k.rule = s$k")
      .mkString("\n  ")
    val kinds = ks.map(k => s"r$k.kind AS k$k").mkString(", ")
    // the hn >= k guards mirror the Spark side's `when(n >= k, …)`: a
    // too-short host's sX string is garbage (negative slice), but no
    // guarded CASE can consume it
    val excs = ks.map(k =>
      s"CASE WHEN hn >= $k AND k$k = 3 THEN ${k - 1} END")
    val norms = (1 to max).flatMap(k => Seq(
      s"CASE WHEN hn >= $k AND k$k = 1 THEN $k ELSE 0 END",
      s"CASE WHEN hn >= ${k + 1} AND k$k = 2 THEN ${k + 1} ELSE 0 END")) :+
      "1"
    s"""psl_rules AS (
       |  SELECT rule, kind FROM read_csv('${PslTable.csvPath}',
       |    header = true,
       |    columns = {'rule': 'VARCHAR', 'kind': 'INTEGER'})),
       |psl0 AS (
       |  SELECT *, string_split(host, '.') AS hl,
       |    len(string_split(host, '.')) AS hn
       |  FROM $src),
       |psl1 AS (
       |  SELECT *,
       |    $sufs
       |  FROM psl0),
       |psl2 AS (
       |  SELECT psl1.*, $kinds
       |  FROM psl1
       |  $joins),
       |psl3 AS (
       |  SELECT *, COALESCE(${excs.mkString(", ")},
       |    GREATEST(${norms.mkString(", ")})) AS ps
       |  FROM psl2),
       |psl AS (
       |  SELECT *, CASE WHEN hn <= ps THEN ''
       |    ELSE array_to_string(list_slice(hl, hn - ps, hn), '.') END
       |    AS domain
       |  FROM psl3)""".stripMargin
  }

  /** PII patterns for the l58 redaction kernel. Deliberately
    * conservative and RE2-compatible (no lookarounds, ASCII `\b` —
    * identical semantics under Java regex and DuckDB's RE2, which is
    * what lets the oracle grade the redaction byte-exact): an email
    * shape, a US-style separator phone (`555-123-4567` / `555.123.4567`
    * — bare 10-digit runs are NOT matched; too many false positives on
    * real corpora), and a dotted-quad IPv4 whose `\b` anchors reject
    * 4+-digit octets. Production swaps in a larger pattern bank the
    * same way — the kernel is one scan of codegen'd regexp expressions
    * per pattern, no UDF, no shuffle before the output sort.
    */
  private[text] val PiiEmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[text] val PiiPhoneRe = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
  private[text] val PiiIpRe =
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Redact all three PII classes, each to its typed placeholder.
    * Replacement order is safe by pattern shape: placeholders carry no
    * digits or `@`, phones have exactly two separators where IPv4 needs
    * three dots, and octets are ≤3 digits where phones end in 4 — so no
    * pass can create or destroy a later pass's match.
    */
  private[text] def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, PiiEmailRe, "<EMAIL>"),
        PiiPhoneRe, "<PHONE>"),
      PiiIpRe, "<IP>")

  val defs: Seq[QueryDef] = Seq(
    // ------------------------------------------------------- L1 exact dedup
    QueryDef.sql(
      "l1_exact_dedup",
      """SELECT lang, count(*) AS n_docs,
        |  count(DISTINCT md5(text)) AS n_uniq,
        |  count(*) - count(DISTINCT md5(text)) AS n_dups
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      // exact dedup = groupBy(content hash); reported as per-slice dup stats
      Tables.documents(s, d).groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(md5(col("text"))).as("n_uniq"),
          (count(lit(1)) - countDistinct(md5(col("text")))).as("n_dups"))
        .orderBy("lang")
    },
    // -------------------------------------------------- L2 MinHash+LSH dedup
    QueryDef.sql("l2_minhash_lsh", duckMinhashSql()) { (s, d) =>
      minhashPairs(s, d).orderBy("doc_a", "doc_b")
    },
    // ------------------- production-knob twins of the near-dup family:
    // identical pipelines at DedupKnobs.Production, run through the same
    // oracle harness — proving parity is knob-independent, not an artifact
    // of the small test constants (round-7 directive 3)
    QueryDef.sql("l2_prod_knobs", duckMinhashSql(DedupKnobs.Production)) {
      (s, d) =>
        minhashPairs(s, d, DedupKnobs.Production).orderBy("doc_a", "doc_b")
    },
    QueryDef.sql("l2b2_prod_knobs",
      duckSimhashPairsSql(DedupKnobs.Production)) { (s, d) =>
      simhashPairs(s, d, DedupKnobs.Production)
    },
    QueryDef.sql("l2c_prod_knobs",
      duckNgramJaccardSql(DedupKnobs.Production)) { (s, d) =>
      ngramJaccard(s, d, DedupKnobs.Production)
    },
    // ------------------------------------- L2e duplicate clustering (CC)
    QueryDef.sql("l2e_dup_clusters", duckDupClustersSql) { (s, d) =>
      // near-dup pairs form a graph; connected components assign each doc a
      // cluster id (the min doc_id in its component) — the keep-one-per-
      // cluster step an actual 100-TB dedup pipeline ends with
      import s.implicits._
      val vertices = Tables.documents(s, d).select("doc_id").as[Long]
        .rdd.map(id => (id, ()))
      val edges = minhashPairs(s, d).as[(Long, Long)]
        .rdd.map { case (a, b) => org.apache.spark.graphx.Edge(a, b, ()) }
      val cc = org.apache.spark.graphx.Graph(vertices, edges)
        .connectedComponents().vertices
      cc.toDF("doc_id", "cluster_id")
        .select(col("doc_id"), col("cluster_id"),
          (col("doc_id") === col("cluster_id")).as("is_canonical"))
        .orderBy("doc_id")
    },
    // ------------------------------------------------------------ L2b SimHash
    QueryDef.sql("l2b_simhash", duckSimhashSql) { (s, d) =>
      simhashDf(s, d).orderBy("doc_id")
    },
    // ------------------------------- L2b2 SimHash near-dup (banded verify)
    QueryDef.sql("l2b2_simhash_neardup", duckSimhashPairsSql()) { (s, d) =>
      simhashPairs(s, d, TK)
    },
    // ------------------------------------ L2f deduplicated corpus output
    QueryDef.sql("l2f_dedup_output", duckDedupOutputSql) { (s, d) =>
      // the actual cleaned-dataset step: keep one canonical doc per dup
      // cluster, report the surviving slice sizes
      import s.implicits._
      val vertices = Tables.documents(s, d).select("doc_id").as[Long]
        .rdd.map(id => (id, ()))
      val edges = minhashPairs(s, d).as[(Long, Long)]
        .rdd.map { case (a, b) => org.apache.spark.graphx.Edge(a, b, ()) }
      val canonical = org.apache.spark.graphx.Graph(vertices, edges)
        .connectedComponents().vertices
        .filter { case (id, comp) => id == comp }
        .map(_._1)
      val keep = canonical.toDF("doc_id")
      Tables.documents(s, d).join(keep, "doc_id")
        .groupBy("lang").agg(count(lit(1)).as("n_docs_kept"))
        .orderBy("lang")
    },
    // ------------------------------------------------- L2c n-gram Jaccard
    QueryDef.sql("l2c_ngram_jaccard", duckNgramJaccardSql()) { (s, d) =>
      ngramJaccard(s, d, TK)
    },
    // ------------------------------------ L2d embedding-cosine near-dup
    QueryDef.sql(
      "l2d_embedding_neardup",
      // vectors whose cosine similarity exceeds 0.9 are near-duplicates;
      // candidates meet only inside a sign-LSH bucket (first 8 dims), so
      // the pair search is a bucket join, not all-pairs
      """WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
        |    sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> x * x))) AS nrm,
        |    list_sum(list_transform(generate_series(1, 8),
        |      i -> CASE WHEN embedding[i] > 0 THEN 1 << (i - 1) ELSE 0 END))
        |      AS bucket
        |  FROM embeddings)
        |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  floor(list_sum(list_transform(generate_series(1, len(a.emb)),
        |    i -> a.emb[i] * b.emb[i])) / (a.nrm * b.nrm) * 1000000 + 0.5)
        |    / CAST(1000000 AS DOUBLE) AS sim
        |FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        |WHERE list_sum(list_transform(generate_series(1, len(a.emb)),
        |    i -> a.emb[i] * b.emb[i])) / (a.nrm * b.nrm) > 0.9
        |ORDER BY vec_a, vec_b""".stripMargin) { (s, d) =>
      graft.functions.DotProduct.register(s)
      val n = Tables.embeddings(s, d).select(col("vec_id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"),
          expr("aggregate(transform(sequence(1, 8)," +
            " i -> IF(element_at(embedding, i) > CAST(0.0 AS FLOAT)," +
            " shiftleft(1, i - 1), 0)), 0, (a, v) -> a + v)").as("bucket"))
        .withColumn("nrm", sqrt(expr("graft_dot(emb, emb)")))
      val a = n.select(col("vec_id").as("vec_a"), col("emb").as("ea"),
        col("nrm").as("na"), col("bucket"))
      val b = n.select(col("vec_id").as("vec_b"), col("emb").as("eb"),
        col("nrm").as("nb"), col("bucket").as("bucket_b"))
      val rawSim = expr("graft_dot(ea, eb)") / (col("na") * col("nb"))
      a.join(b, col("bucket") === col("bucket_b") &&
          col("vec_a") < col("vec_b"))
        .filter(rawSim > 0.9)
        .select(col("vec_a"), col("vec_b"),
          graft.Det.portableRound(rawSim, 6).as("sim"))
        .orderBy("vec_a", "vec_b")
    },
    // ---------------------------------------- L3 brute-force cosine top-k
    QueryDef.sql(
      "l3_cosine_topk",
      """WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
        |    sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> x * x))) AS nrm
        |  FROM embeddings),
        |q AS (SELECT vec_id AS q_id, emb AS qe, nrm AS qn FROM n
        |  WHERE vec_id < 5),
        |p AS (SELECT q_id, vec_id AS neighbor_id,
        |    floor(list_sum(list_transform(generate_series(1, len(qe)),
        |      i -> qe[i] * emb[i])) / (qn * nrm) * 1000000 + 0.5)
        |      / CAST(1000000 AS DOUBLE) AS sim
        |  FROM q, n WHERE vec_id <> q_id),
        |r AS (SELECT q_id, neighbor_id, sim, CAST(row_number() OVER
        |    (PARTITION BY q_id ORDER BY sim DESC, neighbor_id) AS INT) AS rn
        |  FROM p)
        |SELECT q_id, neighbor_id, sim, rn FROM r WHERE rn <= 5
        |ORDER BY q_id, rn""".stripMargin) { (s, d) =>
      // hot path uses the native codegen'd DotProduct expression — same
      // sequential fold as the oracle's list_sum, ~no per-element lambda cost
      graft.functions.DotProduct.register(s)
      val n = Tables.embeddings(s, d).select(col("vec_id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
        .withColumn("nrm", sqrt(expr("graft_dot(emb, emb)")))
      val q = n.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("emb").as("qe"),
          col("nrm").as("qn"))
      val sim = graft.Det.portableRound(
        expr("graft_dot(qe, emb)") / (col("qn") * col("nrm")), 6)
      val w = Window.partitionBy("q_id")
        .orderBy(col("sim").desc, col("neighbor_id"))
      n.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("neighbor_id"), sim.as("sim"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .orderBy("q_id", "rn")
    },
    // ------------------------------------- L4 LSH-bucketed ANN (scale path)
    QueryDef.sql(
      "l4_ann_bucketed",
      """WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
        |    sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> x * x))) AS nrm,
        |    list_sum(list_transform(generate_series(1, 8),
        |      i -> CASE WHEN embedding[i] > 0 THEN 1 << (i - 1) ELSE 0 END))
        |      AS bucket
        |  FROM embeddings),
        |q AS (SELECT vec_id AS q_id, emb AS qe, nrm AS qn, bucket FROM n
        |  WHERE vec_id < 20),
        |p AS (SELECT q_id, n.vec_id AS neighbor_id,
        |    floor(list_sum(list_transform(generate_series(1, len(qe)),
        |      i -> qe[i] * emb[i])) / (qn * nrm) * 1000000 + 0.5)
        |      / CAST(1000000 AS DOUBLE) AS sim
        |  FROM q JOIN n ON q.bucket = n.bucket AND n.vec_id <> q.q_id),
        |r AS (SELECT q_id, neighbor_id, sim, CAST(row_number() OVER
        |    (PARTITION BY q_id ORDER BY sim DESC, neighbor_id) AS INT) AS rn
        |  FROM p)
        |SELECT q_id, neighbor_id, sim, rn FROM r WHERE rn <= 3
        |ORDER BY q_id, rn""".stripMargin) { (s, d) =>
      // sign-of-first-8-dims bucket: candidates meet only within a bucket,
      // so the join shuffles by bucket key instead of cross-joining — the
      // same shape an IVF index gives at 100 TB.
      graft.functions.DotProduct.register(s)
      val n = Tables.embeddings(s, d).select(col("vec_id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"),
          expr("aggregate(transform(sequence(1, 8)," +
            " i -> IF(element_at(embedding, i) > CAST(0.0 AS FLOAT)," +
            " shiftleft(1, i - 1), 0)), 0, (a, v) -> a + v)").as("bucket"))
        .withColumn("nrm", sqrt(expr("graft_dot(emb, emb)")))
      val q = n.filter(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("emb").as("qe"),
          col("nrm").as("qn"), col("bucket").as("qbucket"))
      val sim = graft.Det.portableRound(
        expr("graft_dot(qe, emb)") / (col("qn") * col("nrm")),
        6)
      val w = Window.partitionBy("q_id")
        .orderBy(col("sim").desc, col("neighbor_id"))
      q.join(n, col("qbucket") === col("bucket") &&
          col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("neighbor_id"), sim.as("sim"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .orderBy("q_id", "rn")
    },
    // ------------------------------------------------------- L5 text stats
    QueryDef.sql(
      "l5_text_stats",
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
        |  CAST(length(text) AS INT) AS n_chars_m,
        |  CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS INT) AS n_punct,
        |  CAST(len(list_filter(string_split(text, ' '),
        |    t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS INT) AS n_stop,
        |  floor(CAST(length(replace(text, ' ', '')) AS DOUBLE) /
        |    CAST(len(string_split(text, ' ')) AS DOUBLE) * 1000000 + 0.5)
        |    / CAST(1000000 AS DOUBLE) AS avg_tok_len
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        size(split(col("text"), " ")).as("n_tokens"),
        length(col("text")).as("n_chars_m"),
        expr("size(regexp_extract_all(text, '[.,!?;:]', 0))").as("n_punct"),
        expr("size(filter(split(text, ' ')," +
          " t -> t IN ('the', 'a', 'of', 'and', 'to')))").as("n_stop"),
        graft.Det.portableRound(
          length(regexp_replace(col("text"), " ", "")).cast("double") /
            size(split(col("text"), " ")).cast("double"), 6)
          .as("avg_tok_len"))
        .orderBy("doc_id")
    },
    // --------------------------------------------- L5b BPE-ish token count
    QueryDef.sql(
      "l5b_bpe_tokens",
      // subword-ish tokenization by regex classes (letters / digits /
      // punctuation runs) — the cheap proxy for a BPE pre-tokenizer pass
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))
        |    AS INT) AS n_bpe_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-zA-Z]{1,4}')) AS INT)
        |    AS n_subwords
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        expr("size(regexp_extract_all(text," +
          " '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]', 0))").as("n_bpe_tokens"),
        expr("size(regexp_extract_all(text, '[a-zA-Z]{1,4}', 0))")
          .as("n_subwords"))
        .orderBy("doc_id")
    },
    // --------------------------------------------- L6 corpus slice analytics
    QueryDef.sql(
      "l6_slice_analytics",
      """SELECT lang, source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
        |  CAST(min(n_chars) AS BIGINT) AS min_chars,
        |  CAST(max(n_chars) AS BIGINT) AS max_chars
        |FROM documents GROUP BY lang, source
        |ORDER BY lang, source""".stripMargin) { (s, d) =>
      Tables.documents(s, d).groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          sum(size(split(col("text"), " ")).cast("long")).as("total_tokens"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"))
        .orderBy("lang", "source")
    },
    // -------------------------------------------- L7 language-ID heuristic
    QueryDef.sql("l7_langid", duckLangIdSql) { (s, d) =>
      val hits = LangId.stopwords.map { case (lang, words) =>
        expr(s"size(filter(split(text, ' '), t -> t IN (${words
          .map(w => s"'$w'").mkString(", ")})))").as(s"hits_$lang")
      }
      val pred = LangId.caseChain((l: String) => col(s"hits_$l"))
      Tables.documents(s, d)
        .select(Seq(col("doc_id"), col("lang")) ++ hits: _*)
        .select(col("doc_id"), pred.as("pred_lang"),
          (pred === col("lang")).as("is_correct"))
        .orderBy("doc_id")
    },
    // --------------------------------------------- L8 quality scoring
    QueryDef.sql(
      "l8_quality_score",
      s"""SELECT doc_id, $duckQualityExpr AS quality
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), qualityCol.as("quality"))
        .orderBy("doc_id")
    },
    // ------------------------------------------- L9 document fingerprinting
    QueryDef.sql(
      "l9_fingerprint",
      s"""SELECT doc_id,
         |  bit_xor(${PortableHash.duck("tok")}) AS fp,
         |  count(*) AS n_uniq_tokens
         |FROM (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
         |      FROM documents) t
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      // order-independent fingerprint: xor-fold of distinct token hashes
      Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .distinct()
        .groupBy("doc_id")
        .agg(expr(
          "bit_xor(CAST(conv(substring(md5(tok), 1, 15), 16, 10) AS BIGINT))")
          .as("fp"), count(lit(1)).as("n_uniq_tokens"))
        .orderBy("doc_id")
    },
    // ------------------------------------------------ L10 TF-IDF top terms
    QueryDef.sql(
      "l10_tfidf_topterms",
      // ln() is bit-identical between the JVM and DuckDB (verified over the
      // full df range), so log-idf scores hash-match after micro-rounding
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
         |  FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
         |       WHERE len(term) > 0 GROUP BY 1, 2),
         |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks
         |       WHERE len(term) > 0 GROUP BY 1),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |scored AS (
         |  SELECT doc_id, term,
         |    CAST(tf AS DOUBLE) *
         |      ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) AS tfidf
         |  FROM tf JOIN df USING (term) CROSS JOIN n),
         |ranked AS (
         |  SELECT doc_id, term, tfidf, row_number() OVER (
         |    PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rnk
         |  FROM scored)
         |SELECT doc_id, CAST(rnk AS INT) AS rnk, term,
         |  ${graft.Det.duckPortableRound("tfidf", 6)} AS tfidf
         |FROM ranked WHERE rnk <= 3
         |ORDER BY doc_id, rnk""".stripMargin) { (s, d) =>
      // keyword extraction / quality slicing primitive: top-3 terms per doc
      // by TF-IDF. All shuffles key on term or doc_id; the doc count joins
      // in as a broadcast scalar (no driver round-trip), and the ranking
      // window is PARTITIONED by doc — nothing global anywhere.
      // ONE pass over the corpus (r18, guide §2.3/§2.4): tf already holds
      // exactly one row per (doc, term), so the document frequency is a
      // count window over tf PARTITIONED BY term — the old second
      // scan+explode+distinct+aggregate branch and its join back on term
      // computed the identical number (df = |{doc : tf(doc,term)>0}| =
      // rows of tf for the term) at the price of re-reading the corpus
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .filter(length(col("term")) > 0)
      val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val nDocs = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("tfidf").desc, col("term"))
      tf.withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
        .crossJoin(broadcast(nDocs))
        .withColumn("tfidf", col("tf").cast("double") *
          log(col("n_docs").cast("double") / col("df").cast("double")))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("doc_id"), col("rnk"), col("term"),
          graft.Det.portableRound(col("tfidf"), 6).as("tfidf"))
        .orderBy("doc_id", "rnk")
    },
    // --------------------------------------- L11 stratified corpus sampling
    QueryDef.sql(
      "l11_stratified_sample",
      // per-language mixture weights via the content-addressed hash — the
      // deterministic form of sampleBy, reproducible across engines/runs
      s"""SELECT lang, CAST(count(*) AS BIGINT) AS n_total,
         |  CAST(count(*) FILTER (
         |    ${PortableHash.duck("CAST(doc_id AS VARCHAR)")} % 100 <
         |    CASE WHEN lang = 'en' THEN 50 ELSE 20 END) AS BIGINT)
         |    AS n_sampled
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      val keep = PortableHash.spark(col("doc_id").cast("string")) % 100 <
        when(col("lang") === "en", 50).otherwise(20)
      Tables.documents(s, d)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_total"),
          sum(when(keep, 1L).otherwise(0L)).as("n_sampled"))
        .orderBy("lang")
    },
    // ------------------------------------- L12 train/eval contamination
    QueryDef.sql(
      "l12_contamination_check",
      // eval docs sharing any 3-shingle with the train split — the leak
      // check a training pipeline runs before holding out an eval set
      s"""WITH sh0 AS ($duckShingles),
         |hot AS (SELECT s FROM sh0 GROUP BY s HAVING count(*) > $ContamDfCap),
         |sh AS (SELECT * FROM sh0 ANTI JOIN hot USING (s)),
         |sp AS (SELECT doc_id, lang,
         |  (${PortableHash.duck("CAST(doc_id AS VARCHAR)")} % 10 = 0)
         |    AS is_eval FROM documents),
         |contaminated AS (
         |  SELECT DISTINCT a.doc_id
         |  FROM sh a JOIN sp sa ON a.doc_id = sa.doc_id AND sa.is_eval
         |  WHERE EXISTS (
         |    SELECT 1 FROM sh b JOIN sp sb
         |      ON b.doc_id = sb.doc_id AND NOT sb.is_eval
         |    WHERE b.s = a.s))
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_eval,
         |  CAST(count(*) FILTER (doc_id IN
         |    (SELECT doc_id FROM contaminated)) AS BIGINT) AS n_contaminated
         |FROM sp WHERE is_eval GROUP BY lang
         |ORDER BY lang""".stripMargin) { (s, d) =>
      // semi-join on the shingle inverted index: output is bounded by the
      // eval side (never quadratic, unlike a pair join). High-DF stopword
      // shingles are dropped BEFORE the join (l2c's cap pattern, broadcast
      // anti-join) so no single key carries the corpus; residual skew is
      // AQE's skew-join case. The shingle frontend feeds the hot-set agg
      // and both split sides — materialized once (ngramJaccard's pattern)
      // instead of re-scanning the corpus per consumer.
      val sh0 = shingles(s, d).localCheckpoint()
      val hot = sh0.groupBy("s").agg(count(lit(1)).as("df"))
        .filter(col("df") > ContamDfCap).select("s")
      val sh = sh0.join(broadcast(hot), Seq("s"), "left_anti")
      val sp = Tables.documents(s, d).select(col("doc_id"), col("lang"),
        (PortableHash.spark(col("doc_id").cast("string")) % 10 === 0)
          .as("is_eval"))
      val evalSh = sh.join(sp.filter(col("is_eval")).select("doc_id"),
        "doc_id")
      val trainSh = sh.join(sp.filter(!col("is_eval")).select("doc_id"),
        "doc_id").select("s")
      val contaminated = evalSh.join(trainSh, Seq("s"), "left_semi")
        .select("doc_id").distinct().withColumn("c", lit(1L))
      sp.filter(col("is_eval"))
        .join(contaminated, Seq("doc_id"), "left_outer")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_eval"),
          sum(coalesce(col("c"), lit(0L))).as("n_contaminated"))
        .orderBy("lang")
    },
    // --------------------------------------- L13 n-gram heavy hitters
    QueryDef.sql(
      "l13_ngram_heavy_hitters",
      // corpus-level top-20 3-shingles by document frequency — the stat
      // behind stopword-shingle caps like l2c's
      s"""SELECT s AS shingle, CAST(count(*) AS BIGINT) AS df
         |FROM ($duckShingles) t
         |GROUP BY s ORDER BY df DESC, shingle LIMIT 20""".stripMargin) {
      (s, d) =>
        shingles(s, d).groupBy("s").agg(count(lit(1)).as("df"))
          .select(col("s").as("shingle"), col("df"))
          .orderBy(col("df").desc, col("shingle")).limit(20)
    },
    // --------------------------------------- L14 within-doc repetition ratio
    QueryDef.sql(
      "l14_repetition",
      // repeated-3-gram fraction per document — the degenerate-generation-
      // loop signal a training pipeline scores before filtering
      s"""WITH g AS (
         |  SELECT doc_id, list_transform(generate_series(1, len(l) - 2),
         |    i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]) AS grams
         |  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
         |  WHERE len(l) >= 3)
         |SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams,
         |  ${graft.Det.duckPortableRound(
           "CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE)" +
             " / CAST(len(grams) AS DOUBLE)", 6)} AS repetition
         |FROM g ORDER BY doc_id""".stripMargin) { (s, d) =>
      // pure per-row expressions — zero shuffles, the ideal 100-TB shape
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 3)
        .withColumn("grams", expr(
          "transform(sequence(0, size(toks) - 3)," +
            " i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))"))
        .select(col("doc_id"),
          size(col("grams")).cast("long").as("n_grams"),
          graft.Det.portableRound(
            (size(col("grams")) - size(array_distinct(col("grams"))))
              .cast("double") / size(col("grams")).cast("double"), 6)
            .as("repetition"))
        .orderBy("doc_id")
    },
    // ------------------------------------------- L15 denylist term scrub
    QueryDef.sql(
      "l15_denylist_scrub",
      // blocked-term removal with an audit count — the filtering pass a
      // pipeline runs for safety/compliance term lists; the cleaned text is
      // checksummed so the oracle verifies the rewrite, not just the count
      """SELECT doc_id,
        |  CAST(len(list_filter(l, t -> t IN ('customer', 'spark')))
        |    AS BIGINT) AS n_blocked,
        |  md5(array_to_string(
        |    list_filter(l, t -> t NOT IN ('customer', 'spark')), ' '))
        |    AS clean_md5
        |FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"),
          expr("CAST(size(filter(toks, t -> t IN ('customer', 'spark')))" +
            " AS BIGINT)").as("n_blocked"),
          md5(expr(
            "array_join(filter(toks, t -> t NOT IN ('customer', 'spark'))," +
              " ' ')")).as("clean_md5"))
        .orderBy("doc_id")
    },
    // ------------------------------------- L16 token-budget mixture sample
    QueryDef.sql(
      "l16_token_budget_mix",
      // mixture construction: fill a fixed per-language token budget with a
      // content-addressed (hash-ordered) prefix of each language's docs —
      // deterministic and partition-layout-independent, the property that
      // makes the sample reproducible across cluster sizes
      s"""WITH t AS (
         |  SELECT lang, doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
         |    ${PortableHash.duck("CAST(doc_id AS VARCHAR)")} AS h
         |  FROM documents),
         |c AS (
         |  SELECT lang, n_toks, sum(n_toks)
         |    OVER (PARTITION BY lang ORDER BY h, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM t)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_toks) AS BIGINT) AS n_tokens
         |FROM c WHERE cum <= 2000 GROUP BY lang ORDER BY lang""".stripMargin) {
      (s, d) =>
        // window is PARTITIONED by lang — parallel across languages, no
        // global sort; budget fill is an exact integer cumulative sum
        val w = Window.partitionBy("lang").orderBy("h", "doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.documents(s, d)
          .select(col("lang"), col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("n_toks"),
            PortableHash.spark(col("doc_id").cast("string")).as("h"))
          .withColumn("cum", sum("n_toks").over(w))
          .filter(col("cum") <= 2000)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("n_tokens"))
          .orderBy("lang")
    },
    // ------------------------------------------- L22 incremental-ingest dedup
    QueryDef.sql(
      "l22_incremental_dedup",
      // dedup a NEW batch against the existing corpus — the shape every
      // incremental crawl ingest runs: content-hash anti-join, new side
      // small, corpus side huge. The corpus side reduces to distinct hashes
      // before the join (one column through the shuffle, never the texts);
      // at 100 TB the hash set is also the natural bloom/bucket candidate.
      s"""WITH sp AS (SELECT doc_id, lang, md5(text) AS h,
         |    (${PortableHash.duck("CAST(doc_id AS VARCHAR)")} % 5 = 0)
         |      AS is_new FROM documents),
         |corpus AS (SELECT DISTINCT h FROM sp WHERE NOT is_new)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_new,
         |  CAST(count(*) FILTER (h IN (SELECT h FROM corpus)) AS BIGINT)
         |    AS n_dropped,
         |  CAST(count(*) FILTER (h NOT IN (SELECT h FROM corpus)) AS BIGINT)
         |    AS n_ingested
         |FROM sp WHERE is_new GROUP BY lang ORDER BY lang""".stripMargin) {
      (s, d) =>
        val sp = Tables.documents(s, d).select(col("doc_id"), col("lang"),
          md5(col("text")).as("h"),
          (PortableHash.spark(col("doc_id").cast("string")) % 5 === 0)
            .as("is_new"))
        val corpus = sp.filter(!col("is_new")).select("h").distinct()
          .withColumn("seen", lit(1L))
        sp.filter(col("is_new"))
          .join(corpus, Seq("h"), "left_outer")
          .groupBy("lang")
          .agg(count(lit(1)).as("n_new"),
            sum(coalesce(col("seen"), lit(0L))).as("n_dropped"),
            sum(when(col("seen").isNull, 1L).otherwise(0L)).as("n_ingested"))
          .orderBy("lang")
    },
    // ------------------------------------------- L19 sequence batch packing
    QueryDef.sql(
      "l19_sequence_packing",
      // pack documents into fixed token-budget training batches: within each
      // language, documents fill batches in content-hash order and a doc's
      // batch index is its preceding cumulative token count divided by the
      // budget. The deterministic distributed form of sequence packing — no
      // sequential first-fit state, just a per-lang window — so batch
      // assignment is reproducible across runs and partition layouts.
      s"""WITH t AS (SELECT doc_id, lang,
         |    len(string_split(text, ' ')) AS n_toks,
         |    ${PortableHash.duck("CAST(doc_id AS VARCHAR)")} AS h
         |  FROM documents),
         |c AS (SELECT doc_id, lang, n_toks,
         |    coalesce(sum(n_toks) OVER (PARTITION BY lang ORDER BY h, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
         |  FROM t)
         |SELECT doc_id, lang, CAST(n_toks AS BIGINT) AS n_toks,
         |  CAST(floor(before / 512) AS BIGINT) AS batch_idx
         |FROM c ORDER BY doc_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("lang").orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).cast("long").as("n_toks"),
          PortableHash.spark(col("doc_id").cast("string")).as("h"))
        .withColumn("before", coalesce(sum("n_toks").over(w), lit(0L)))
        .select(col("doc_id"), col("lang"), col("n_toks"),
          floor(col("before") / 512).cast("long").as("batch_idx"))
        .orderBy("doc_id")
    },
    // --------------------------------------- L17 int8 embedding quantization
    QueryDef.sql(
      "l17_embedding_quantize",
      // symmetric per-vector int8 quantization roundtrip: checksum of the
      // quantized codes (exact integer) + max reconstruction error. Both
      // engines evaluate the identical IEEE-double element formula, so even
      // the error agrees bit-for-bit before rounding; floor(x+0.5) is the
      // portable half-up round (plain round() disagrees between engines).
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings),
         |s AS (SELECT vec_id, v,
         |  list_max(list_transform(v, x -> abs(x))) / CAST(127 AS DOUBLE)
         |    AS scale FROM e)
         |SELECT vec_id,
         |  CAST(CASE WHEN scale = 0 THEN 0 ELSE
         |    list_sum(list_transform(v,
         |      x -> CAST(floor(x / scale + 0.5) AS BIGINT))) END
         |    AS BIGINT) AS q_sum,
         |  ${graft.Det.duckPortableRound(
           "CASE WHEN scale = 0 THEN CAST(0 AS DOUBLE) ELSE " +
             "list_max(list_transform(v, " +
             "x -> abs(x - floor(x / scale + 0.5) * scale))) END", 6)}
         |    AS max_abs_err
         |FROM s ORDER BY vec_id""".stripMargin) { (s, d) =>
      Tables.embeddings(s, d)
        .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
        .withColumn("scale",
          expr("array_max(transform(v, x -> abs(x))) / CAST(127 AS DOUBLE)"))
        .select(col("vec_id"),
          expr("CAST(CASE WHEN scale = 0 THEN 0 ELSE " +
            "aggregate(transform(v, x -> CAST(floor(x / scale + 0.5) AS BIGINT))," +
            " CAST(0 AS BIGINT), (a, b) -> a + b) END AS BIGINT)").as("q_sum"),
          graft.Det.portableRound(
            expr("CASE WHEN scale = 0 THEN CAST(0 AS DOUBLE) ELSE " +
              "array_max(transform(v, x -> abs(x - floor(x / scale + 0.5) * scale))) END"),
            6).as("max_abs_err"))
        .orderBy("vec_id")
    },
    // ----------------------------------------------- L18 IVF-style ANN index
    QueryDef.sql(
      "l18_ivf_ann",
      // IVF-flat over the embedding table: K coarse centroids (chosen
      // deterministically by content hash — the seed step of k-means), every
      // vector assigned to its nearest centroid, queries probe the NPROBE
      // nearest cells and rank candidates only inside them. Similarities are
      // portably rounded BEFORE every argmax/window so tie-breaks (then by
      // id) agree across engines.
      s"""WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
         |    sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
         |      x -> x * x))) AS nrm
         |  FROM embeddings),
         |c AS (SELECT vec_id AS cent_id, emb AS ce, nrm AS cn FROM n
         |  ORDER BY ${PortableHash.duck("CAST(vec_id AS VARCHAR)")}, vec_id
         |  LIMIT $IvfK),
         |a0 AS (SELECT n.vec_id, c.cent_id, n.emb, n.nrm,
         |    ${graft.Det.duckPortableRound(
             "list_sum(list_transform(generate_series(1, len(n.emb))," +
               " i -> n.emb[i] * c.ce[i])) / (n.nrm * c.cn)", 6)} AS csim
         |  FROM n, c),
         |asg AS (SELECT vec_id, cent_id, emb, nrm FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY csim DESC, cent_id) AS arn FROM a0) WHERE arn = 1),
         |q AS (SELECT vec_id AS q_id, emb AS qe, nrm AS qn FROM n
         |  WHERE vec_id < 10),
         |p0 AS (SELECT q.q_id, c.cent_id, q.qe, q.qn,
         |    ${graft.Det.duckPortableRound(
             "list_sum(list_transform(generate_series(1, len(q.qe))," +
               " i -> q.qe[i] * c.ce[i])) / (q.qn * c.cn)", 6)} AS psim
         |  FROM q, c),
         |probe AS (SELECT q_id, cent_id, qe, qn FROM (
         |    SELECT *, row_number() OVER (PARTITION BY q_id
         |      ORDER BY psim DESC, cent_id) AS prn FROM p0)
         |  WHERE prn <= $IvfProbe),
         |s0 AS (SELECT pr.q_id, a.vec_id AS neighbor_id,
         |    ${graft.Det.duckPortableRound(
             "list_sum(list_transform(generate_series(1, len(pr.qe))," +
               " i -> pr.qe[i] * a.emb[i])) / (pr.qn * a.nrm)", 6)} AS sim
         |  FROM probe pr JOIN asg a
         |    ON pr.cent_id = a.cent_id AND a.vec_id <> pr.q_id),
         |r AS (SELECT q_id, neighbor_id, sim, CAST(row_number() OVER
         |    (PARTITION BY q_id ORDER BY sim DESC, neighbor_id) AS INT) AS rn
         |  FROM s0)
         |SELECT q_id, neighbor_id, sim, rn FROM r WHERE rn <= 3
         |ORDER BY q_id, rn""".stripMargin) { (s, d) =>
      // 100-TB shape: centroids are O(K) → broadcast to both the assignment
      // and probe cross joins (no shuffle); the only big shuffle is the
      // candidate equi-join on cent_id — i.e. the corpus is re-partitioned
      // by IVF cell exactly once, and each query touches NPROBE cells
      // instead of the whole corpus (l3's brute force is the recall=1.0
      // twin, l4 the hash-bucket variant; this is the trained-index shape).
      graft.functions.DotProduct.register(s)
      val n = Tables.embeddings(s, d).select(col("vec_id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
        .withColumn("nrm", sqrt(expr("graft_dot(emb, emb)")))
      val cents = n
        .withColumn("h", PortableHash.spark(col("vec_id").cast("string")))
        .orderBy("h", "vec_id").limit(IvfK)
        .select(col("vec_id").as("cent_id"), col("emb").as("ce"),
          col("nrm").as("cn"))
      val csim = graft.Det.portableRound(
        expr("graft_dot(emb, ce)") / (col("nrm") * col("cn")), 6)
      val aw = Window.partitionBy("vec_id")
        .orderBy(col("csim").desc, col("cent_id"))
      val asg = n.crossJoin(broadcast(cents))
        .withColumn("csim", csim)
        .withColumn("arn", row_number().over(aw))
        .filter(col("arn") === 1)
        .select("vec_id", "cent_id", "emb", "nrm")
      val q = n.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("emb").as("qe"),
          col("nrm").as("qn"))
      val psim = graft.Det.portableRound(
        expr("graft_dot(qe, ce)") / (col("qn") * col("cn")), 6)
      val pw = Window.partitionBy("q_id")
        .orderBy(col("psim").desc, col("cent_id"))
      val probe = q.crossJoin(broadcast(cents))
        .withColumn("psim", psim)
        .withColumn("prn", row_number().over(pw))
        .filter(col("prn") <= IvfProbe)
        .select("q_id", "cent_id", "qe", "qn")
      val sim = graft.Det.portableRound(
        expr("graft_dot(qe, emb)") / (col("qn") * col("nrm")), 6)
      val rw = Window.partitionBy("q_id")
        .orderBy(col("sim").desc, col("neighbor_id"))
      probe.join(asg, Seq("cent_id"))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("neighbor_id"), sim.as("sim"))
        .withColumn("rn", row_number().over(rw))
        .filter(col("rn") <= 3)
        .orderBy("q_id", "rn")
    },
    // ------------------------------------------- L20 per-doc token entropy
    QueryDef.sql(
      "l20_word_entropy",
      // Shannon entropy of the word distribution per document — the
      // gibberish/boilerplate signal (low entropy = repetitive template,
      // high = diverse text). H = log2(T) − (Σ c·log2(c))/T computed from
      // ONE group-by; the inner Σ is floored to integer micro-units per
      // term and summed as BIGINT, so it is order-independent on both
      // engines (double addition order is not).
      s"""WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
         |  FROM documents),
         |cnt AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY doc_id, w),
         |agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS t,
         |    CAST(sum(CAST(floor(CAST(c AS DOUBLE) *
         |      log2(CAST(c AS DOUBLE)) * 1000000 + 0.5) AS BIGINT))
         |      AS BIGINT) AS s_us
         |  FROM cnt GROUP BY doc_id)
         |SELECT doc_id, t AS n_tokens,
         |  ${graft.Det.duckPortableRound(
             "log2(CAST(t AS DOUBLE)) - (CAST(s_us AS DOUBLE) / 1000000)" +
               " / CAST(t AS DOUBLE)", 6)} AS entropy
         |FROM agg ORDER BY doc_id""".stripMargin) { (s, d) =>
      // two shuffles, both keyed by doc_id (+word) — fully parallel, no
      // global state; the entropy identity avoids a per-doc total join
      Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum("c").as("t"),
          sum(floor(col("c").cast("double") *
              log2(col("c").cast("double")) * 1000000 + 0.5).cast("long"))
            .as("s_us"))
        .select(col("doc_id"), col("t").as("n_tokens"),
          graft.Det.portableRound(
            log2(col("t").cast("double")) -
              (col("s_us").cast("double") / 1000000) / col("t").cast("double"),
            6).as("entropy"))
        .orderBy("doc_id")
    },
    // --------------------------------------- L21 bloom-filter decontamination
    QueryDef.sql(
      "l21_bloom_decontam",
      // same leak semantics as l12 (eval doc sharing any 3-shingle with the
      // train split) but reported as the contaminated doc ids; the oracle is
      // the EXACT semi-join — the engine's bloom prefilter only prunes
      // candidates and can never change the answer (a false positive is
      // re-checked by the exact join; a true negative matches nothing).
      s"""WITH sh AS ($duckShingles),
         |sp AS (SELECT doc_id,
         |  (${PortableHash.duck("CAST(doc_id AS VARCHAR)")} % 10 = 0)
         |    AS is_eval FROM documents),
         |tr AS (SELECT DISTINCT s FROM sh a JOIN sp b
         |  ON a.doc_id = b.doc_id AND NOT b.is_eval)
         |SELECT DISTINCT a.doc_id AS doc_id FROM sh a JOIN sp b
         |  ON a.doc_id = b.doc_id AND b.is_eval
         |WHERE EXISTS (SELECT 1 FROM tr WHERE tr.s = a.s)
         |ORDER BY a.doc_id""".stripMargin) { (s, d) =>
      // 100-TB shape: the eval split is the small bounded side → its shingle
      // set compresses into a driver-built bloom filter that ships with the
      // task closure and prefilters the HUGE train side map-side, before any
      // shuffle. OSS Spark has no codegen bloom-membership function, so this
      // one filter is a closure udf — acceptable because it guards the
      // shuffle, not the hot inner loop, and the exact semi-join after it
      // keeps the result oracle-exact.
      // deliberately NOT checkpointed (r18, measured): the shingle
      // frontend appears in three subtrees (bloom build, both semi-join
      // sides), but each replay is pruned to ONE split before the heavy
      // work; materializing the full-corpus shingle relation once costs
      // more than the pruned replays (1.06 s → 1.40 s warm, shuffle
      // +1 MB at sf0.1)
      val sh = shingles(s, d)
      val sp = Tables.documents(s, d).select(col("doc_id"),
        (PortableHash.spark(col("doc_id").cast("string")) % 10 === 0)
          .as("is_eval"))
      val evalSh = sh.join(sp.filter(col("is_eval")).select("doc_id"),
        "doc_id")
      val bf = evalSh.select("s").distinct()
        .stat.bloomFilter("s", 10000L, 0.03)
      val mightMatch = udf((x: String) => x != null && bf.mightContain(x))
      val candTrain = sh
        .join(sp.filter(!col("is_eval")).select("doc_id"), "doc_id")
        .filter(mightMatch(col("s")))
        .select("s")
      evalSh.join(candTrain, Seq("s"), "left_semi")
        .select("doc_id").distinct()
        .orderBy("doc_id")
    },

    // ------------------------------------------- L23 chunking with overlap
    // Fixed-size token chunks with stride < size (the training-example
    // packing front end: each chunk overlaps the previous by C−S tokens so
    // no context is lost at boundaries). Pure per-row explode — fan-out is
    // bounded by ~n_tokens/S, no shuffle except the presentation sort, so
    // it streams at any corpus size.
    QueryDef.sql(
      "l23_chunk_overlap",
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS l
         |  FROM documents),
         |c AS (SELECT doc_id, l,
         |    unnest(generate_series(1, len(l), $ChunkStride)) AS st
         |  FROM t)
         |SELECT doc_id, CAST((st - 1) / $ChunkStride AS INT) AS chunk_idx,
         |  CAST(len(list_slice(l, st, st + ${ChunkSize - 1})) AS INT)
         |    AS n_toks,
         |  ${PortableHash.duck(
             s"array_to_string(list_slice(l, st, st + ${ChunkSize - 1}), ' ')")}
         |    AS chunk_hash
         |FROM c ORDER BY doc_id, chunk_idx""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"),
          posexplode(sequence(lit(0), size(col("toks")) - 1,
            lit(ChunkStride))), col("toks"))
        .select(col("doc_id"), col("pos").as("chunk_idx"),
          slice(col("toks"), col("col") + 1, lit(ChunkSize)).as("chunk"))
        .select(col("doc_id"), col("chunk_idx"),
          size(col("chunk")).as("n_toks"),
          PortableHash.spark(array_join(col("chunk"), " ")).as("chunk_hash"))
        .orderBy("doc_id", "chunk_idx")
    },

    // ------------------------------------------------------ L24 PII scrub
    // Regex masking of emails / IPv4s / phone numbers with an audit count
    // per class — the redaction pass every published training corpus needs.
    // The synthetic docs carry no PII, so both engines append the SAME
    // deterministic contact tail per row first; the scrub then operates on
    // genuine matches and the oracle hashes the scrubbed text. Patterns
    // stay in the RE2 ∩ java.util.regex common dialect (no lookaround, no
    // backrefs) so both engines replace identically; per-row work only —
    // zero shuffle beyond the presentation sort.
    QueryDef.sql(
      "l24_pii_scrub",
      s"""WITH aug AS (SELECT doc_id,
         |    text || ' contact user' || CAST(doc_id AS VARCHAR) ||
         |    '@mail.example.com or user' || CAST(doc_id AS VARCHAR) ||
         |    '@backup.org from 10.' || CAST(doc_id % 200 AS VARCHAR) ||
         |    '.0.7 call +1-555-' ||
         |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(t, '$EmailRe')) AS BIGINT) AS n_email,
         |  CAST(len(regexp_extract_all(t, '$Ipv4Re')) AS BIGINT) AS n_ip,
         |  CAST(len(regexp_extract_all(t, '$PhoneRe')) AS BIGINT) AS n_phone,
         |  ${PortableHash.duck(
             s"regexp_replace(regexp_replace(regexp_replace(t, '$EmailRe'," +
               s" '<EMAIL>', 'g'), '$PhoneRe', '<PHONE>', 'g'), '$Ipv4Re'," +
               s" '<IP>', 'g')")} AS scrub_hash
         |FROM aug ORDER BY doc_id""".stripMargin) { (s, d) =>
      val aug = Tables.documents(s, d).select(col("doc_id"),
        concat(col("text"), lit(" contact user"),
          col("doc_id").cast("string"), lit("@mail.example.com or user"),
          col("doc_id").cast("string"), lit("@backup.org from 10."),
          (col("doc_id") % 200).cast("string"), lit(".0.7 call +1-555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")).as("t"))
      aug.select(col("doc_id"),
        regexp_count(col("t"), lit(EmailRe)).cast("long").as("n_email"),
        regexp_count(col("t"), lit(Ipv4Re)).cast("long").as("n_ip"),
        regexp_count(col("t"), lit(PhoneRe)).cast("long").as("n_phone"),
        PortableHash.spark(
          regexp_replace(regexp_replace(regexp_replace(col("t"),
            EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>"), Ipv4Re, "<IP>"))
          .as("scrub_hash"))
        .orderBy("doc_id")
    },

    // ------------------------------------------- L25 text normalization
    // Unicode NFC (via the native `graft_nfc` codegen expression — Spark
    // has no built-in; DuckDB's `nfc_normalize` is the oracle) + lowercase
    // + whitespace collapse + trim. Both engines first append the SAME
    // messy tail (upper-cased echo, tabs, a combining-accent sequence) so
    // every cleanup step, including the NFC fold of `e`+U+0301 → `é`,
    // operates on rows where it genuinely fires; the codepoint-length
    // column proves the fold happened (2 codepoints → 1). Per-row
    // expressions inside whole-stage codegen — zero shuffle.
    QueryDef.sql(
      "l25_normalize_text",
      s"""WITH aug AS (SELECT doc_id,
         |    '  ' || upper(substr(text, 1, 40)) || chr(9) || text ||
         |    ' cafe' || chr(769) || '  ' AS t
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(length(trim(regexp_replace(lower(nfc_normalize(t)),
         |    '\\s+', ' ', 'g'))) AS BIGINT) AS n_chars_norm,
         |  ${PortableHash.duck(
             "trim(regexp_replace(lower(nfc_normalize(t)), '\\s+', ' '," +
               " 'g'))")} AS norm_hash
         |FROM aug ORDER BY doc_id""".stripMargin) { (s, d) =>
      graft.functions.NfcNormalize.register(s)
      Tables.documents(s, d)
        .select(col("doc_id"),
          concat(lit("  "), upper(substring(col("text"), 1, 40)), lit("\t"),
            col("text"), lit(" café  ")).as("t"))
        .select(col("doc_id"),
          trim(regexp_replace(lower(expr("graft_nfc(t)")), "\\s+", " "))
            .as("norm"))
        .select(col("doc_id"),
          length(col("norm")).cast("long").as("n_chars_norm"),
          PortableHash.spark(col("norm")).as("norm_hash"))
        .orderBy("doc_id")
    },

    // ------------------------------------------ L26 train/val/test split
    // Content-addressed split assignment: bucket = portable_hash(doc_id)
    // mod 100 → 90/5/5. The assignment is a pure function of the row, so
    // it is identical across engines, runs, partition layouts, and
    // cluster sizes — re-shuffling the corpus can never move a document
    // between splits (the property that keeps eval sets stable as the
    // corpus grows). One hash + one group-by; no global state.
    QueryDef.sql(
      "l26_split_assign",
      s"""SELECT CASE
         |    WHEN ${PortableHash.duck("CAST(doc_id AS VARCHAR)")} % 100 < 90
         |      THEN 'train'
         |    WHEN ${PortableHash.duck("CAST(doc_id AS VARCHAR)")} % 100 < 95
         |      THEN 'val'
         |    ELSE 'test' END AS split,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
         |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
         |FROM documents GROUP BY split ORDER BY split""".stripMargin) {
      (s, d) =>
        val bucket = PortableHash.spark(col("doc_id").cast("string")) % 100
        Tables.documents(s, d)
          .select(when(bucket < 90, "train").when(bucket < 95, "val")
            .otherwise("test").as("split"), col("n_chars"), col("lang"))
          .groupBy("split")
          .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars"),
            countDistinct("lang").as("n_langs"))
          .orderBy("split")
    },

    // ------------------------------------ L27 cross-slice n-gram overlap
    // Between-source leakage diagnostic: shared distinct shingles per
    // source pair. The key move is deduplicating to (source, shingle)
    // BEFORE the self-join — posting lists are bounded by the number of
    // sources, not documents, so a universal shingle costs sources² join
    // rows, not docs². At a corpus with thousands of sources the same DF
    // cap as l2c applies; with the test corpus's 20 sources it is not
    // needed.
    QueryDef.sql(
      "l27_source_overlap",
      s"""WITH sh AS ($duckShingles),
         |ss AS (SELECT DISTINCT d.source, sh.s
         |       FROM sh JOIN documents d USING (doc_id))
         |SELECT a.source AS src_a, b.source AS src_b,
         |  CAST(count(*) AS BIGINT) AS n_shared
         |FROM ss a JOIN ss b ON a.s = b.s AND a.source < b.source
         |GROUP BY src_a, src_b HAVING count(*) >= 5
         |ORDER BY src_a, src_b""".stripMargin) { (s, d) =>
      // materialized once: both sides of the pair join read this relation,
      // and the subtrees don't canonicalize to a ReusedExchange.
      // materialized once: both sides of the pair join read this relation,
      // and the subtrees don't canonicalize to a ReusedExchange.
      // Deliberately NOT pre-partitioned by the join key (r18, measured):
      // pinning HashPartitioning(s) into the checkpoint does delete both
      // SortMergeJoin exchanges (shuffle read 19.0 → 14.8 MB at sf0.1)
      // but costs +50% wall, because the pinned 32-partition layout
      // defeats AQE's post-shuffle coalescing everywhere downstream — at
      // this scale the coalescing is worth more than the exchange
      val ss = shingles(s, d)
        .join(Tables.documents(s, d).select("doc_id", "source"), "doc_id")
        .select(col("source"), col("s")).distinct().localCheckpoint()
      ss.select(col("source").as("src_a"), col("s"))
        .join(ss.select(col("source").as("src_b"), col("s")), "s")
        .filter(col("src_a") < col("src_b"))
        .groupBy("src_a", "src_b").agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 5)
        .orderBy("src_a", "src_b")
    },

    // -------------------------------------- L28 nearest-centroid assign
    // Label-centroid assignment (the IVF training step made first-class,
    // and the standard embedding-space confusion diagnostic): per-label
    // centroids from fixed-point-quantized embeddings, each vector
    // assigned to the max-inner-product centroid, reported as a
    // (label, assigned) confusion matrix. All cross-row aggregation is
    // over exact integers (milli-unit quantization), so the result is
    // order-independent and hash-checkable — the one double division per
    // (vector, centroid) happens on exact inputs in both engines. Scale
    // shape: the centroid table is K×D rows (broadcast); the score join
    // fans each vector row out only K ways.
    QueryDef.sql(
      "l28_centroid_assign",
      """WITH q AS (
        |  SELECT vec_id, label, i,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000 + 0.5)
        |      AS BIGINT) AS q
        |  FROM embeddings, generate_series(1, 64) t(i)),
        |c AS (SELECT label AS clabel, i, CAST(sum(q) AS BIGINT) AS cq
        |      FROM q GROUP BY clabel, i),
        |cn AS (SELECT label AS clabel, count(*) AS nl
        |       FROM embeddings GROUP BY clabel),
        |sc AS (
        |  SELECT q.vec_id, q.label, c.clabel,
        |    CAST(sum(q.q * c.cq) AS DOUBLE) / max(cn.nl) AS score
        |  FROM q JOIN c USING (i) JOIN cn ON c.clabel = cn.clabel
        |  GROUP BY q.vec_id, q.label, c.clabel),
        |r AS (SELECT label, clabel,
        |    row_number() OVER (PARTITION BY vec_id
        |      ORDER BY score DESC, clabel) AS rn
        |  FROM sc)
        |SELECT label, clabel AS assigned, CAST(count(*) AS BIGINT) AS n
        |FROM r WHERE rn = 1
        |GROUP BY label, assigned ORDER BY label, assigned""".stripMargin) {
      (s, d) =>
        val q = Tables.embeddings(s, d)
          .select(col("vec_id"), col("label"),
            posexplode(col("embedding")))
          .select(col("vec_id"), col("label"), col("pos").as("i"),
            floor(col("col").cast("double") * 1000 + 0.5).cast("long")
              .as("q"))
        val c = q.groupBy(col("label").as("clabel"), col("i"))
          .agg(sum("q").as("cq"))
        val cn = Tables.embeddings(s, d)
          .groupBy(col("label").as("clabel"))
          .agg(count(lit(1)).as("nl"))
        val sc = q.join(broadcast(c), "i")
          .join(broadcast(cn), "clabel")
          .groupBy("vec_id", "label", "clabel")
          .agg((sum(col("q") * col("cq")).cast("double") / max("nl"))
            .as("score"))
        val w = Window.partitionBy("vec_id")
          .orderBy(col("score").desc, col("clabel"))
        sc.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .groupBy(col("label"), col("clabel").as("assigned"))
          .agg(count(lit(1)).as("n"))
          .orderBy("label", "assigned")
    },

    // --------------------------------------- L29 shingle novelty vs ref
    // Novelty of each slice against a reference corpus (source 'src0'):
    // the fraction of a slice's shingle occurrences unseen in the
    // reference — the standard freshness/diversity check before mixing a
    // new source into training data. The reference set is deduplicated
    // before the join, and the ratio is one division over exact integer
    // sums, so the double is engine-identical.
    QueryDef.sql(
      "l29_shingle_novelty",
      s"""WITH sh AS ($duckShingles),
         |ws AS (SELECT d.source, sh.s
         |       FROM sh JOIN documents d USING (doc_id)),
         |ref AS (SELECT DISTINCT s FROM ws WHERE source = 'src0')
         |SELECT ws.source, CAST(count(*) AS BIGINT) AS n_shingles,
         |  CAST(sum(CASE WHEN r.s IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_novel,
         |  ${graft.Det.duckPortableRound(
          "CAST(sum(CASE WHEN r.s IS NULL THEN 1 ELSE 0 END) AS DOUBLE)" +
            " / CAST(count(*) AS DOUBLE)", 6)} AS novelty
         |FROM ws LEFT JOIN ref r ON ws.s = r.s
         |GROUP BY ws.source ORDER BY ws.source""".stripMargin) { (s, d) =>
      // materialized once: the reference set and the slice totals both
      // consume this relation
      val ws = shingles(s, d)
        .join(Tables.documents(s, d).select("doc_id", "source"), "doc_id")
        .select(col("source"), col("s")).localCheckpoint()
      val ref = ws.filter(col("source") === "src0")
        .select(col("s")).distinct().withColumn("in_ref", lit(1))
      ws.join(ref, Seq("s"), "left_outer")
        .groupBy("source")
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("in_ref").isNull, 1L).otherwise(0L)).as("n_novel"))
        .select(col("source"), col("n_shingles"), col("n_novel"),
          graft.Det.portableRound(
            col("n_novel").cast("double") / col("n_shingles").cast("double"),
            6).as("novelty"))
        .orderBy("source")
    },

    // ------------------------------- L30 cross-doc duplicated-span fraction
    // Substring-dedup signal (Lee et al. 2022, "Deduplicating Training
    // Data Makes Language Models Better"): the fraction of a document's
    // 8-token windows that also occur verbatim in ANOTHER document —
    // positional (every window counts, unlike the distinct shingle
    // frontend), so a doc that is 80% boilerplate scores 0.8 even when
    // the repeated span is one long run. Windows travel as 60-bit hashes:
    // the DF aggregate and the join back shuffle a long key, never the
    // window text — the 100 TB shape of suffix-style dedup.
    QueryDef.sql(
      "l30_dup_spans",
      s"""WITH ws AS (
         |  SELECT doc_id, ${PortableHash.duck("w")} AS wh
         |  FROM (SELECT doc_id, unnest(list_transform(
         |      generate_series(1, len(l) - 7),
         |      i -> array_to_string(l[i:i+7], ' '))) AS w
         |    FROM (SELECT doc_id, string_split(text, ' ') AS l
         |          FROM documents)
         |    WHERE len(l) >= 8) t),
         |df AS (SELECT wh, count(DISTINCT doc_id) AS df FROM ws GROUP BY wh)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows,
         |  CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_dup_windows,
         |  ${graft.Det.duckPortableRound(
          "CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)" +
            " / CAST(count(*) AS DOUBLE)", 6)} AS dup_frac
         |FROM ws JOIN df USING (wh)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      // window relation feeds the DF aggregate and the join back — same
      // multi-consumer materialization policy as minhashPairs/ngramJaccard
      val ws = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 8)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(toks) - 8)," +
            " i -> array_join(slice(toks, i + 1, 8), ' '))")).as("w"))
        .select(col("doc_id"), PortableHash.spark(col("w")).as("wh"))
        .localCheckpoint()
      val df = ws.groupBy("wh").agg(countDistinct(col("doc_id")).as("df"))
      ws.join(df, "wh")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_windows"),
          sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_dup_windows"))
        .select(col("doc_id"), col("n_windows"), col("n_dup_windows"),
          graft.Det.portableRound(col("n_dup_windows").cast("double") /
            col("n_windows").cast("double"), 6).as("dup_frac"))
        .orderBy("doc_id")
    },

    // --------------------------------- L56 cross-doc duplicated-span REMOVAL
    // The rewrite half of substring dedup (Lee et al. 2022 §4 "ExactSubstr":
    // delete, from every document, each span that also occurs verbatim in
    // another document). l30 measures the signal; this op actually produces
    // the cleaned corpus: a token position is covered when any of the
    // 8-token windows containing it appears in ≥2 distinct docs, and the
    // cleaned text is the uncovered tokens rejoined in order. Scale shape:
    // windows travel as 60-bit hashes (the text never shuffles with them);
    // covered positions are (doc_id, int) pairs — ≤8× the dup-window count,
    // linear in corpus size; the one text-bearing join is keyed by doc_id.
    // Production would interval-merge window starts per doc instead of
    // exploding the 8 member positions — same output, ~8× fewer rows in the
    // coverage shuffle.
    QueryDef.sql(
      "l56_dup_span_removal",
      s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS l
         |           FROM documents),
         |ws AS (SELECT doc_id, u['i'] AS i, ${PortableHash.duck("u['w']")}
         |    AS wh
         |  FROM (SELECT doc_id, unnest(list_transform(
         |      generate_series(1, len(l) - 7),
         |      i -> {'i': i, 'w': array_to_string(l[i:i+7], ' ')})) AS u
         |    FROM tk WHERE len(l) >= 8) t),
         |df AS (SELECT wh, count(DISTINCT doc_id) AS df FROM ws GROUP BY wh),
         |cov AS (SELECT DISTINCT doc_id, p FROM (
         |  SELECT doc_id, unnest(generate_series(i, i + 7)) AS p
         |  FROM ws JOIN df USING (wh) WHERE df >= 2)),
         |ca AS (SELECT doc_id, list(DISTINCT p) AS cv FROM cov
         |       GROUP BY doc_id)
         |SELECT tk.doc_id, CAST(len(l) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(len(cv), 0) AS BIGINT) AS n_removed,
         |  CASE WHEN cv IS NULL THEN array_to_string(l, ' ')
         |       ELSE coalesce(array_to_string(list_transform(list_filter(
         |         generate_series(1, len(l)), i -> NOT list_contains(cv, i)),
         |         i -> l[i]), ' '), '') END AS cleaned_text
         |FROM tk LEFT JOIN ca USING (doc_id)
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      // window relation feeds the DF aggregate and the coverage join — the
      // l30 multi-consumer materialization policy, now carrying the window
      // START so coverage can be reconstructed without re-hashing
      val tk = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
      val ws = tk.filter(size(col("toks")) >= 8)
        .select(col("doc_id"), posexplode(expr(
          "transform(sequence(0, size(toks) - 8)," +
            " i -> array_join(slice(toks, i + 1, 8), ' '))")))
        .select(col("doc_id"), col("pos").as("i"),
          PortableHash.spark(col("col")).as("wh"))
        .localCheckpoint()
      val df = ws.groupBy("wh").agg(countDistinct(col("doc_id")).as("df"))
      val cov = ws.join(df.filter(col("df") >= 2), "wh")
        .select(col("doc_id"),
          explode(expr("sequence(i, i + 7)")).as("p"))
        .groupBy("doc_id").agg(collect_set(col("p")).as("cv"))
      tk.join(cov, Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          size(col("toks")).cast("long").as("n_tokens"),
          coalesce(size(col("cv")), lit(0)).cast("long").as("n_removed"),
          when(col("cv").isNull, array_join(col("toks"), " "))
            .otherwise(array_join(expr(
              "filter(toks, (t, i) -> NOT array_contains(cv, i))"), " "))
            .as("cleaned_text"))
        .orderBy("doc_id")
    },

    // ---------------------------------- L57 URL canonicalization + dedup
    // The web-corpus intake step every crawl-derived training set runs
    // BEFORE content dedup: canonicalize each document's URL (case-fold
    // scheme/host, strip the www. alias, default ports, fragments,
    // trailing slashes, and tracking params — keeping real params) and
    // dedup per canonical URL with registrable-domain grouping. URLs are
    // synthesized deterministically from row data — four messy VARIANTS
    // of the same underlying page per quadruple of docs (upper-cased
    // scheme/host + :443, fragment + trailing slash, an m. subdomain,
    // utm_/fbclid/gclid/ref noise) — so the canonicalizer must collapse
    // exactly 4 raw → 2 canonical per page (m. is a REAL distinct host,
    // never merged). The oracle mirrors every canonicalization rule in
    // DuckDB, so a divergence in any rule hash-misses. Scale shape: pure
    // per-row string expressions (whole-stage codegen, no UDF) + one
    // grouped aggregate keyed by registrable domain — the same
    // partial+final shape as any census; at 100 TB the domain key is
    // low-cardinality and heavy hitters are exactly what AQE skew
    // handling exists for.
    QueryDef.sql(
      "l57_url_dedup",
      s"""WITH u AS (
         |  SELECT doc_id, doc_id // 4 AS page, doc_id % 4 AS v,
         |    'site' || CAST((doc_id // 4) % 7 AS VARCHAR) ||
         |      '.ex' || CAST((doc_id // 4) % 3 AS VARCHAR) ||
         |      (CASE (doc_id // 4) % 4 WHEN 0 THEN '.com'
         |        WHEN 1 THEN '.co.uk' WHEN 2 THEN '.github.io'
         |        ELSE '.ck' END) AS hbase
         |  FROM documents),
         |raw AS (
         |  SELECT doc_id, CASE v
         |    WHEN 0 THEN 'https://www.' || hbase || '/p/'
         |      || CAST(page AS VARCHAR) || '?utm_source=feed'
         |    WHEN 1 THEN 'HTTPS://WWW.' || upper(hbase) || ':443/p/'
         |      || CAST(page AS VARCHAR) || '?fbclid=x&utm_campaign=y'
         |    WHEN 2 THEN 'https://' || hbase || '/p/'
         |      || CAST(page AS VARCHAR) || '/#top'
         |    ELSE 'https://m.' || hbase || '/p/'
         |      || CAST(page AS VARCHAR) || '?ref=tw' END AS url
         |  FROM u),
         |c AS (SELECT doc_id, regexp_replace(url, '#.*$$', '') AS nf
         |      FROM raw),
         |parts AS (
         |  SELECT doc_id,
         |    lower(coalesce(regexp_extract(nf, '^([A-Za-z]+)://', 1), ''))
         |      AS scheme,
         |    regexp_replace(lower(coalesce(
         |      regexp_extract(nf, '^[A-Za-z]+://([^/?#:]+)', 1), '')),
         |      '^www\\.', '') AS host,
         |    coalesce(regexp_extract(nf,
         |      '^[A-Za-z]+://[^/?#]*:([0-9]+)', 1), '') AS port,
         |    coalesce(regexp_extract(nf,
         |      '^[A-Za-z]+://[^/?#]+(/[^?#]*)', 1), '') AS rawpath,
         |    coalesce(regexp_extract(nf, '\\?(.*)$$', 1), '') AS q
         |  FROM c),
         |surv AS (
         |  SELECT *, coalesce(array_to_string(list_filter(
         |      string_split(q, '&'),
         |      x -> x <> '' AND NOT (starts_with(x, 'utm_')
         |        OR starts_with(x, 'fbclid=') OR starts_with(x, 'gclid=')
         |        OR starts_with(x, 'ref='))), '&'), '')
         |    AS keepq
         |  FROM parts),
         |canon AS (
         |  SELECT doc_id, host,
         |    scheme || '://' || host ||
         |    (CASE WHEN port = '' OR (scheme = 'https' AND port = '443')
         |       OR (scheme = 'http' AND port = '80') THEN ''
         |       ELSE ':' || port END) ||
         |    (CASE WHEN regexp_replace(rawpath, '/+$$', '') = '' THEN '/'
         |       ELSE regexp_replace(rawpath, '/+$$', '') END) ||
         |    (CASE WHEN keepq = '' THEN '' ELSE '?' || keepq END) AS canon
         |  FROM surv),
         |${registrableDomainDuckCtes("canon")}
         |SELECT domain,
         |  CAST(count(*) AS BIGINT) AS n_raw,
         |  CAST(count(DISTINCT canon) AS BIGINT) AS n_canonical,
         |  CAST(count(DISTINCT host) AS BIGINT) AS n_hosts
         |FROM psl GROUP BY 1 ORDER BY domain""".stripMargin) { (s, d) =>
      val page = expr("doc_id DIV 4")
      val v = col("doc_id") % 4
      // the TLD rotates through PSL rule KINDS per page — a plain TLD
      // (.com, registrable = last two labels), a second-level rule
      // (.co.uk), a private-section rule (.github.io), and the wildcard
      // (*.ck, where the registrable domain keeps THREE labels) — so the
      // oracle grades the whole public-suffix algorithm, not just the
      // last-two default
      val tld = when(page % 4 === 0, lit(".com"))
        .when(page % 4 === 1, lit(".co.uk"))
        .when(page % 4 === 2, lit(".github.io"))
        .otherwise(lit(".ck"))
      val hbase = concat(lit("site"), (page % 7).cast("string"),
        lit(".ex"), (page % 3).cast("string"), tld)
      val url = when(v === 0, concat(lit("https://www."), hbase,
          lit("/p/"), page.cast("string"), lit("?utm_source=feed")))
        .when(v === 1, concat(lit("HTTPS://WWW."), upper(hbase),
          lit(":443/p/"), page.cast("string"),
          lit("?fbclid=x&utm_campaign=y")))
        .when(v === 2, concat(lit("https://"), hbase, lit("/p/"),
          page.cast("string"), lit("/#top")))
        .otherwise(concat(lit("https://m."), hbase, lit("/p/"),
          page.cast("string"), lit("?ref=tw")))
      val withCanon = Tables.documents(s, d)
        .select(col("doc_id"), url.as("url"))
        .select(col("doc_id"),
          urlHost(col("url")).as("host"),
          canonicalizeUrl(col("url")).as("canon"))
      withCanon.groupBy(registrableDomain(col("host")).as("domain"))
        .agg(count(lit(1)).as("n_raw"),
          countDistinct(col("canon")).as("n_canonical"),
          countDistinct(col("host")).as("n_hosts"))
        .orderBy("domain")
    },

    // ----------------------------------------------- L58 PII redaction
    // The compliance pass every training-data pipeline runs before
    // release: find-and-redact emails / separator phones / IPv4s, with
    // per-doc counts for the audit trail. The fixture INJECTS
    // deterministic PII into the real document text (doc_id-keyed, so
    // both engines build the identical augmented corpus — the same
    // trick as l57's URL fixture), and the oracle grades the redacted
    // output BYTE-EXACT via md5 — a pattern-semantics drift between
    // the engines (greediness, `\b`, octet bounds), a wrong replacement
    // order, or a replace-first-only bug all hash-miss. One scan, all
    // codegen regexp expressions (PiiRedactSpec pins no UDF), no
    // shuffle before the output sort.
    QueryDef.sql(
      "l58_pii_redact",
      s"""WITH aug AS (
         |  SELECT doc_id,
         |    text ||
         |    (CASE WHEN doc_id % 3 = 0 THEN ' Contact user' ||
         |      CAST(doc_id AS VARCHAR) || '@mail.example.com now.'
         |      ELSE '' END) ||
         |    (CASE WHEN doc_id % 5 = 0
         |      THEN ' Call 555-123-4567 or 555.987.6543.' ELSE '' END) ||
         |    (CASE WHEN doc_id % 7 = 0 THEN ' Host 10.0.' ||
         |      CAST(doc_id % 256 AS VARCHAR) || '.' ||
         |      CAST((doc_id * 7) % 256 AS VARCHAR) || ' up.'
         |      ELSE '' END) AS t
         |  FROM documents),
         |red AS (
         |  SELECT doc_id,
         |    CAST(len(regexp_extract_all(t, '$PiiEmailRe')) AS INT)
         |      AS n_emails,
         |    CAST(len(regexp_extract_all(t, '$PiiPhoneRe')) AS INT)
         |      AS n_phones,
         |    CAST(len(regexp_extract_all(t, '$PiiIpRe')) AS INT) AS n_ips,
         |    regexp_replace(regexp_replace(regexp_replace(t,
         |      '$PiiEmailRe', '<EMAIL>', 'g'),
         |      '$PiiPhoneRe', '<PHONE>', 'g'),
         |      '$PiiIpRe', '<IP>', 'g') AS r
         |  FROM aug)
         |SELECT doc_id, n_emails, n_phones, n_ips,
         |  md5(r) AS red_md5, CAST(length(r) AS INT) AS red_len
         |FROM red ORDER BY doc_id""".stripMargin) { (s, d) =>
      val t = concat(col("text"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" Contact user"), col("doc_id").cast("string"),
            lit("@mail.example.com now."))).otherwise(lit("")),
        when(col("doc_id") % 5 === 0,
          lit(" Call 555-123-4567 or 555.987.6543.")).otherwise(lit("")),
        when(col("doc_id") % 7 === 0,
          concat(lit(" Host 10.0."), (col("doc_id") % 256).cast("string"),
            lit("."), ((col("doc_id") * 7) % 256).cast("string"),
            lit(" up."))).otherwise(lit("")))
      Tables.documents(s, d)
        .select(col("doc_id"), t.as("t"))
        .select(col("doc_id"),
          size(regexp_extract_all(col("t"), lit(PiiEmailRe), lit(0)))
            .as("n_emails"),
          size(regexp_extract_all(col("t"), lit(PiiPhoneRe), lit(0)))
            .as("n_phones"),
          size(regexp_extract_all(col("t"), lit(PiiIpRe), lit(0)))
            .as("n_ips"),
          md5(redactPii(col("t"))).as("red_md5"),
          length(redactPii(col("t"))).as("red_len"))
        .orderBy("doc_id")
    },

    // ------------------------------------------- L31 ANN recall@k vs exact
    // Index-quality gate for the ANN scale path: recall@3 of the
    // sign-LSH-bucketed search (the l4 plan) against the exact brute-force
    // top-3 — the metric that decides whether the bucketing is good
    // enough to replace the exact join at 100 TB. The exact side
    // broadcasts the bounded query set (20 rows); the ANN side meets
    // candidates only inside a bucket. Both sides and the intersection
    // are derived identically in DuckDB.
    QueryDef.sql(
      "l31_ann_recall",
      """WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
        |    sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> x * x))) AS nrm,
        |    list_sum(list_transform(generate_series(1, 8),
        |      i -> CASE WHEN embedding[i] > 0 THEN 1 << (i - 1) ELSE 0 END))
        |      AS bucket
        |  FROM embeddings),
        |q AS (SELECT vec_id AS q_id, emb AS qe, nrm AS qn, bucket FROM n
        |  WHERE vec_id < 20),
        |ex AS (SELECT q_id, neighbor_id FROM (
        |  SELECT q_id, n.vec_id AS neighbor_id, row_number() OVER
        |      (PARTITION BY q_id ORDER BY
        |        floor(list_sum(list_transform(generate_series(1, len(qe)),
        |          i -> qe[i] * emb[i])) / (qn * nrm) * 1000000 + 0.5)
        |        / CAST(1000000 AS DOUBLE) DESC, n.vec_id) AS rn
        |  FROM q JOIN n ON n.vec_id <> q.q_id) WHERE rn <= 3),
        |ann AS (SELECT q_id, neighbor_id FROM (
        |  SELECT q_id, n.vec_id AS neighbor_id, row_number() OVER
        |      (PARTITION BY q_id ORDER BY
        |        floor(list_sum(list_transform(generate_series(1, len(qe)),
        |          i -> qe[i] * emb[i])) / (qn * nrm) * 1000000 + 0.5)
        |        / CAST(1000000 AS DOUBLE) DESC, n.vec_id) AS rn
        |  FROM q JOIN n ON q.bucket = n.bucket AND n.vec_id <> q.q_id)
        |  WHERE rn <= 3)
        |SELECT ex.q_id, CAST(count(*) AS BIGINT) AS n_exact,
        |  CAST(count(ann.neighbor_id) AS BIGINT) AS n_hit,
        |  floor(CAST(count(ann.neighbor_id) AS DOUBLE) /
        |    CAST(count(*) AS DOUBLE) * 1000000 + 0.5)
        |    / CAST(1000000 AS DOUBLE) AS recall
        |FROM ex LEFT JOIN ann USING (q_id, neighbor_id)
        |GROUP BY ex.q_id ORDER BY q_id""".stripMargin) { (s, d) =>
      graft.functions.DotProduct.register(s)
      val n = Tables.embeddings(s, d).select(col("vec_id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"),
          expr("aggregate(transform(sequence(1, 8)," +
            " i -> IF(element_at(embedding, i) > CAST(0.0 AS FLOAT)," +
            " shiftleft(1, i - 1), 0)), 0, (a, v) -> a + v)").as("bucket"))
        .withColumn("nrm", sqrt(expr("graft_dot(emb, emb)")))
        .localCheckpoint()
      val q = n.filter(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("emb").as("qe"),
          col("nrm").as("qn"), col("bucket").as("qbucket"))
      val sim = graft.Det.portableRound(
        expr("graft_dot(qe, emb)") / (col("qn") * col("nrm")),
        6)
      val w = Window.partitionBy("q_id")
        .orderBy(col("sim").desc, col("neighbor_id"))
      def top3(joined: DataFrame): DataFrame = joined
        .select(col("q_id"), col("vec_id").as("neighbor_id"), sim.as("sim"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("q_id", "neighbor_id")
      val ex = top3(broadcast(q).join(n, col("vec_id") =!= col("q_id")))
      val ann = top3(q.join(n, col("qbucket") === col("bucket") &&
          col("vec_id") =!= col("q_id")))
        .withColumn("hit", lit(1))
      ex.join(ann, Seq("q_id", "neighbor_id"), "left_outer")
        .groupBy("q_id")
        .agg(count(lit(1)).as("n_exact"), count(col("hit")).as("n_hit"))
        .select(col("q_id"), col("n_exact"), col("n_hit"),
          graft.Det.portableRound(col("n_hit").cast("double") /
            col("n_exact").cast("double"), 6).as("recall"))
        .orderBy("q_id")
    },

    // ------------------------------------------------ L32 Gopher rule gate
    // Rule-based quality filter in the Gopher/MassiveText style (Rae et
    // al. 2021 §A1.1): per-document structural rules, each surfaced as its
    // own flag so downstream slicing can ask WHY a doc was dropped, plus
    // the conjunctive keep decision. Pure per-row expressions — zero
    // shuffle, embarrassingly parallel at any scale. Thresholds are the
    // test-corpus values; production tunes per source (COVERAGE.md
    // "Scale knobs").
    QueryDef.sql(
      "l32_gopher_rules",
      """SELECT doc_id,
        |  (len(string_split(text, ' ')) BETWEEN 10 AND 300) AS ok_len,
        |  (CAST(length(replace(text, ' ', '')) AS DOUBLE) /
        |     CAST(len(string_split(text, ' ')) AS DOUBLE)
        |     BETWEEN 3.0 AND 10.0) AS ok_word_len,
        |  (len(list_filter(string_split(text, ' '),
        |     t -> t IN ('the', 'a', 'of', 'and', 'to'))) >= 2) AS ok_stop,
        |  (CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS DOUBLE) <=
        |     0.1 * CAST(length(text) AS DOUBLE)) AS ok_symbol,
        |  ((len(string_split(text, ' ')) BETWEEN 10 AND 300) AND
        |   (CAST(length(replace(text, ' ', '')) AS DOUBLE) /
        |      CAST(len(string_split(text, ' ')) AS DOUBLE)
        |      BETWEEN 3.0 AND 10.0) AND
        |   (len(list_filter(string_split(text, ' '),
        |      t -> t IN ('the', 'a', 'of', 'and', 'to'))) >= 2) AND
        |   (CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS DOUBLE) <=
        |      0.1 * CAST(length(text) AS DOUBLE))) AS keep
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      val nWords = size(split(col("text"), " "))
      val meanWordLen =
        length(regexp_replace(col("text"), " ", "")).cast("double") /
          nWords.cast("double")
      val stopHits = expr("size(filter(split(text, ' ')," +
        " t -> t IN ('the', 'a', 'of', 'and', 'to')))")
      val symbolOk =
        expr("size(regexp_extract_all(text, '[^a-zA-Z0-9 ]', 0))")
          .cast("double") <= lit(0.1) * length(col("text")).cast("double")
      val okLen = nWords.between(10, 300)
      val okWordLen = meanWordLen.between(3.0, 10.0)
      val okStop = stopHits >= 2
      Tables.documents(s, d).select(col("doc_id"),
          okLen.as("ok_len"), okWordLen.as("ok_word_len"),
          okStop.as("ok_stop"), symbolOk.as("ok_symbol"),
          (okLen && okWordLen && okStop && symbolOk).as("keep"))
        .orderBy("doc_id")
    },

    // ----------------------------------------- L33 Zipf slope per source
    // Corpus-health diagnostic: the log-log slope of the ranked token
    // frequency curve per source (natural text ≈ −1; synthetic/templated
    // text flattens toward 0). Frequencies rank per source (the window is
    // PARTITIONED — nothing global), and the least-squares fit runs over
    // micro-unit-quantized ln values so every cross-row sum is an exact
    // integer — the regression is engine- and partitioning-independent.
    QueryDef.sql(
      "l33_zipf_slope",
      """WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |f AS (SELECT source, tok, count(*) AS freq FROM t GROUP BY 1, 2),
        |r AS (SELECT source, freq, row_number() OVER (PARTITION BY source
        |    ORDER BY freq DESC, tok) AS rnk FROM f),
        |q AS (SELECT source,
        |    CAST(floor(ln(CAST(rnk AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
        |      AS xq,
        |    CAST(floor(ln(CAST(freq AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
        |      AS yq
        |  FROM r WHERE rnk <= 20),
        |a AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(xq) AS BIGINT) AS sx, CAST(sum(yq) AS BIGINT) AS sy,
        |    CAST(sum(xq * yq) AS BIGINT) AS sxy,
        |    CAST(sum(xq * xq) AS BIGINT) AS sxx
        |  FROM q GROUP BY source)
        |SELECT source, n AS n_terms,
        |  floor(CAST(n * sxy - sx * sy AS DOUBLE) /
        |      CAST(n * sxx - sx * sx AS DOUBLE) * 1000000 + 0.5)
        |    / CAST(1000000 AS DOUBLE) AS zipf_slope
        |FROM a ORDER BY source""".stripMargin) { (s, d) =>
      val toks = Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      val f = toks.groupBy("source", "tok").agg(count(lit(1)).as("freq"))
      val w = Window.partitionBy("source")
        .orderBy(col("freq").desc, col("tok"))
      def q(c: Column): Column =
        floor(log(c.cast("double")) * lit(1000000.0) + lit(0.5)).cast("long")
      val a = f.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 20)
        .select(col("source"), q(col("rnk")).as("xq"), q(col("freq")).as("yq"))
        .groupBy("source")
        .agg(count(lit(1)).as("n"), sum("xq").as("sx"), sum("yq").as("sy"),
          sum(col("xq") * col("yq")).as("sxy"),
          sum(col("xq") * col("xq")).as("sxx"))
      a.select(col("source"), col("n").as("n_terms"),
          graft.Det.portableRound(
            (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
              (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"),
            6).as("zipf_slope"))
        .orderBy("source")
    },

    // -------------------------------- L34 LSH candidates + exact verify
    // The COMPLETE production near-dup pipeline in one operator: MinHash
    // LSH proposes candidates (recall side, sub-quadratic band join — the
    // l2 plan), then an exact Jaccard over the full shingle sets filters
    // them (precision side) — only candidate pairs ever reach the verify
    // join, so the expensive exact comparison runs on O(candidates), not
    // O(n²). This candidates→verify shape is what ships at 100 TB.
    QueryDef.sql(
      "l34_verified_neardup",
      s"""WITH ${duckPairsCtes()},
         |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |shared AS (
         |  SELECT p.doc_a, p.doc_b, count(*) AS shared
         |  FROM pairs p
         |  JOIN sh a ON a.doc_id = p.doc_a
         |  JOIN sh b ON b.doc_id = p.doc_b AND b.s = a.s
         |  GROUP BY p.doc_a, p.doc_b)
         |SELECT doc_a, doc_b,
         |  ${graft.Det.duckPortableRound(
          "CAST(shared AS DOUBLE) / CAST(sa.n + sb.n - shared AS DOUBLE)",
          6)} AS jaccard
         |FROM shared JOIN sz sa ON doc_a = sa.doc_id
         |            JOIN sz sb ON doc_b = sb.doc_id
         |WHERE CAST(shared AS DOUBLE) / CAST(sa.n + sb.n - shared AS DOUBLE)
         |      >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
      val sh = shingles(s, d).localCheckpoint()
      val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val pairs = minhashPairs(s, d, preShingled = Some(sh))
      val shared = pairs
        .join(sh.select(col("doc_id").as("doc_a"), col("s")), Seq("doc_a"))
        .join(sh.select(col("doc_id").as("doc_b"), col("s")),
          Seq("doc_b", "s"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared"))
      val jac = col("shared").cast("double") /
        (col("na") + col("nb") - col("shared")).cast("double")
      shared
        .join(sz.select(col("doc_id").as("doc_a"), col("n").as("na")),
          Seq("doc_a"))
        .join(sz.select(col("doc_id").as("doc_b"), col("n").as("nb")),
          Seq("doc_b"))
        .filter(jac >= 0.5)
        .select(col("doc_a"), col("doc_b"),
          graft.Det.portableRound(jac, 6).as("jaccard"))
        .orderBy("doc_a", "doc_b")
    },

    // -------------------------------- L35 weighted curriculum interleave
    // Deterministic training-batch ordering: weighted round-robin across
    // sources — item k of a weight-w source is emitted at virtual time
    // k/w, so a weight-3 source appears 3× as often, evenly spread, and
    // the schedule is identical on every run/engine (content-addressed
    // within-source order, integer-exact virtual times via the micro-unit
    // trick). The global sort is bounded by LIMIT → TakeOrderedAndProject,
    // never a full-corpus sort at scale.
    QueryDef.sql(
      "l35_curriculum_interleave",
      s"""WITH w AS (SELECT doc_id, source,
         |    CAST(substring(source, 4) AS INT) % 3 + 1 AS wt,
         |    row_number() OVER (PARTITION BY source ORDER BY
         |      ${PortableHash.duck("CAST(doc_id AS VARCHAR)")}, doc_id)
         |      AS r
         |  FROM documents)
         |SELECT CAST((r * 1000000) // wt AS BIGINT) AS vtime,
         |  source, doc_id, CAST(r AS BIGINT) AS r
         |FROM w ORDER BY vtime, source, r LIMIT 100""".stripMargin) {
      (s, d) =>
        val w = Window.partitionBy("source")
          .orderBy(PortableHash.spark(col("doc_id").cast("string")),
            col("doc_id"))
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            (substring(col("source"), 4, 10).cast("int") % 3 + 1).as("wt"))
          .withColumn("r", row_number().over(w).cast("long"))
          // `div`, not `/`: both engines' `/` would go through DOUBLE
          .select(expr("r * 1000000 div wt").as("vtime"),
            col("source"), col("doc_id"), col("r"))
          .orderBy("vtime", "source", "r")
          .limit(100)
    },

    // ---------------------------------------- L37 composed corpus pipeline
    // The L-ops as ONE pipeline — quality gate (l32's rules) → exact dedup
    // (canonical = min doc_id per content hash) → split assignment (l26's
    // content-addressed buckets) → per-(lang, split) corpus stats. This is
    // the actual shape of a training-data build: each stage is a
    // relational transform, so Catalyst fuses the gate into the scan,
    // the dedup is one hash shuffle, and the split adds zero shuffles
    // (per-row hash). One oracle checks the whole composition.
    QueryDef.sql(
      "l37_corpus_pipeline",
      s"""WITH kept AS (
         |  SELECT doc_id, text, lang FROM documents
         |  WHERE (len(string_split(text, ' ')) BETWEEN 10 AND 300)
         |    AND (CAST(length(replace(text, ' ', '')) AS DOUBLE) /
         |         CAST(len(string_split(text, ' ')) AS DOUBLE)
         |         BETWEEN 3.0 AND 10.0)),
         |canon AS (
         |  SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5(text)),
         |assigned AS (
         |  SELECT lang, CASE
         |      WHEN ${PortableHash.duck("CAST(k.doc_id AS VARCHAR)")} % 100
         |        < 90 THEN 'train'
         |      WHEN ${PortableHash.duck("CAST(k.doc_id AS VARCHAR)")} % 100
         |        < 95 THEN 'val'
         |      ELSE 'test' END AS split,
         |    len(string_split(text, ' ')) AS n_toks
         |  FROM kept k JOIN canon USING (doc_id))
         |SELECT lang, split, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_toks) AS BIGINT) AS n_tokens
         |FROM assigned GROUP BY lang, split ORDER BY lang, split""".stripMargin) {
      (s, d) =>
        val nWords = size(split(col("text"), " "))
        val meanWordLen =
          length(regexp_replace(col("text"), " ", "")).cast("double") /
            nWords.cast("double")
        val kept = Tables.documents(s, d)
          .filter(nWords.between(10, 300) && meanWordLen.between(3.0, 10.0))
          .select(col("doc_id"), col("text"), col("lang"))
        val canon = kept.groupBy(md5(col("text")))
          .agg(min(col("doc_id")).as("doc_id"))
          .select("doc_id")
        val bucket = PortableHash.spark(col("doc_id").cast("string")) % 100
        kept.join(canon, "doc_id")
          .select(col("lang"),
            when(bucket < 90, "train").when(bucket < 95, "val")
              .otherwise("test").as("split"),
            size(split(col("text"), " ")).as("n_toks"))
          .groupBy("lang", "split")
          .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("n_tokens"))
          .orderBy("lang", "split")
    },

    // ------------------------------------ L36 cosine similarity histogram
    // Embedding-space health diagnostic: the distribution of pairwise
    // cosine similarities from a bounded probe set (50 rows, broadcast)
    // against the full collection, bucketed to one decile. A collapsed
    // space piles into the top buckets; a healthy one spreads — the cheap
    // check run before trusting ANN recall numbers. Probe side is
    // broadcast; the full side streams — no shuffle of the big relation.
    QueryDef.sql(
      "l36_cosine_histogram",
      """WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
        |    sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> x * x))) AS nrm
        |  FROM embeddings),
        |q AS (SELECT vec_id AS q_id, emb AS qe, nrm AS qn FROM n
        |  WHERE vec_id < 50),
        |s AS (SELECT CAST(floor((floor(list_sum(list_transform(
        |      generate_series(1, len(qe)), i -> qe[i] * emb[i]))
        |      / (qn * nrm) * 1000000 + 0.5) / CAST(1000000 AS DOUBLE))
        |      * 10) AS INT) AS bucket
        |  FROM q JOIN n ON n.vec_id <> q.q_id)
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n_pairs
        |FROM s GROUP BY bucket ORDER BY bucket""".stripMargin) { (s, d) =>
      graft.functions.DotProduct.register(s)
      val n = Tables.embeddings(s, d).select(col("vec_id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
        .withColumn("nrm", sqrt(expr("graft_dot(emb, emb)")))
      val q = n.filter(col("vec_id") < 50)
        .select(col("vec_id").as("q_id"), col("emb").as("qe"),
          col("nrm").as("qn"))
      val sim = graft.Det.portableRound(
        expr("graft_dot(qe, emb)") / (col("qn") * col("nrm")),
        6)
      broadcast(q).join(n, col("vec_id") =!= col("q_id"))
        .select(floor(sim * 10).cast("int").as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n_pairs"))
        .orderBy("bucket")
    },

    // ------------------------------------- L38 bigram-LM perplexity score
    // CCNet-style quality filter: train a word-bigram LM with add-one
    // smoothing ON the corpus itself, score each doc by its average
    // negative log-likelihood (low = fluent/common, high = garbled/rare —
    // the standard perplexity-filter signal). Two count aggregations
    // (bigram, context) + one count-keyed join back to the doc bigrams —
    // every shuffle keys on a word or word-pair, never on a doc pair, and
    // the vocabulary scalar joins in as a broadcast single row. Each
    // per-bigram NLL term is quantized to integer micro-units BEFORE the
    // per-doc sum (the l33 discipline): integer sums are order-independent
    // where a double sum would drift across partitionings and engines.
    QueryDef.sql(
      "l38_lm_perplexity",
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |bg AS (
        |  SELECT doc_id, l[i] AS w1, l[i + 1] AS w2
        |  FROM (SELECT doc_id, l, unnest(generate_series(1, len(l) - 1)) AS i
        |        FROM toks WHERE len(l) >= 2) t),
        |cbg AS (SELECT w1, w2, count(*) AS c_bg FROM bg GROUP BY 1, 2),
        |cug AS (SELECT w1, count(*) AS c_ug FROM bg GROUP BY 1),
        |v AS (SELECT count(DISTINCT w1) AS v FROM bg),
        |scored AS (
        |  SELECT bg.doc_id,
        |    CAST(floor(ln(CAST(c_ug + v AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
        |    - CAST(floor(ln(CAST(c_bg + 1 AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
        |      AS nll_micro
        |  FROM bg JOIN cbg USING (w1, w2) JOIN cug USING (w1) CROSS JOIN v)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  floor(CAST(sum(nll_micro) AS DOUBLE) / count(*) + 0.5)
        |    / CAST(1000000 AS DOUBLE) AS avg_nll
        |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("l"))
        .filter(size(col("l")) >= 2)
      // four consumers (bigram counts, context counts, vocabulary, the
      // scoring join) — materialize the tokenized relation ONCE instead
      // of re-running the scan+split+explode per consumer (the l30
      // shared-relation discipline; at scale this persists to local disk)
      val bg = toks.select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(l) - 2)," +
            " i -> struct(l[i] AS w1, l[i + 1] AS w2))")).as("p"))
        .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
        .localCheckpoint()
      val cbg = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c_bg"))
      val cug = bg.groupBy("w1").agg(count(lit(1)).as("c_ug"))
      val v = bg.agg(countDistinct(col("w1")).as("v"))
      def q6(c: Column): Column =
        floor(log(c.cast("double")) * lit(1000000.0) + lit(0.5)).cast("long")
      // add-one smoothing: P(w2|w1) = (c_bg + 1) / (c_ug + V); every
      // observed bigram is in the training counts, so c_bg ≥ 1 always
      bg.join(cbg, Seq("w1", "w2")).join(cug, Seq("w1"))
        .crossJoin(broadcast(v))
        .select(col("doc_id"),
          (q6(col("c_ug") + col("v")) - q6(col("c_bg") + lit(1)))
            .as("nll_micro"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"), sum("nll_micro").as("sm"))
        .select(col("doc_id"), col("n_bigrams"),
          (floor(col("sm").cast("double") / col("n_bigrams") + lit(0.5)) /
            lit(1000000.0)).as("avg_nll"))
        .orderBy("doc_id")
    },

    // ----------------------------------------- L39 per-domain document cap
    // Domain balancing (the Dolma/FineWeb "cap each source" step): rank
    // each source's documents by a quality key (length desc, id tiebreak)
    // and cap the source at 5 — reported as per-source kept/dropped
    // counts plus the admission threshold. The ranking window PARTITIONS
    // by source, so no global sort exists anywhere; at 100 TB the shuffle
    // is one hash exchange on the (bounded-cardinality) domain key.
    QueryDef.sql(
      "l39_domain_cap",
      """WITH ranked AS (
        |  SELECT source, n_chars, row_number() OVER (
        |    PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rnk
        |  FROM documents)
        |SELECT source,
        |  CAST(count(*) FILTER (WHERE rnk <= 5) AS BIGINT) AS n_kept,
        |  CAST(count(*) FILTER (WHERE rnk > 5) AS BIGINT) AS n_dropped,
        |  CAST(min(n_chars) FILTER (WHERE rnk <= 5) AS BIGINT)
        |    AS min_kept_chars
        |FROM ranked GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("source")
        .orderBy(col("n_chars").desc, col("doc_id"))
      Tables.documents(s, d)
        .select(col("source"), col("n_chars"), col("doc_id"))
        .withColumn("rnk", row_number().over(w))
        .groupBy("source")
        .agg(sum(when(col("rnk") <= 5, 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("rnk") > 5, 1L).otherwise(0L)).as("n_dropped"),
          min(when(col("rnk") <= 5, col("n_chars"))).as("min_kept_chars"))
        .orderBy("source")
    },

    // -------------------------------------- L40 slice distribution drift
    // Per-source KL divergence of the unigram distribution against the
    // whole corpus — the drift monitor a pipeline runs when a new crawl
    // slice lands (a spiked KL means the slice's vocabulary departs from
    // the mix the model was tuned on). KL(p_src ‖ p_corpus) decomposes
    // over integer counts: Σ c_sw·(q(ln c_sw) − q(ln c_w)) + N_s·(q(ln N)
    // − q(ln N_s)), every log micro-quantized (q) so the sums are
    // integers — order-independent and engine-portable; the only division
    // happens once per source at the end. Shuffles key on token then
    // source; corpus totals join as a broadcast single row.
    QueryDef.sql(
      "l40_slice_drift",
      """WITH toks AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |sc AS (SELECT source, tok, count(*) AS c_sw FROM toks GROUP BY 1, 2),
        |gc AS (SELECT tok, CAST(sum(c_sw) AS BIGINT) AS c_w
        |       FROM sc GROUP BY 1),
        |ns AS (SELECT source, CAST(sum(c_sw) AS BIGINT) AS n_s
        |       FROM sc GROUP BY 1),
        |n AS (SELECT CAST(sum(c_sw) AS BIGINT) AS n FROM sc),
        |agg AS (
        |  SELECT sc.source, CAST(sum(c_sw *
        |    (CAST(floor(ln(CAST(c_sw AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
        |     - CAST(floor(ln(CAST(c_w AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)))
        |    AS BIGINT) AS st
        |  FROM sc JOIN gc USING (tok) GROUP BY sc.source)
        |SELECT agg.source, n_s AS n_tokens,
        |  floor((CAST(st AS DOUBLE) + CAST(n_s AS DOUBLE) *
        |    (CAST(floor(ln(CAST(n AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
        |     - CAST(floor(ln(CAST(n_s AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)))
        |    / CAST(n_s AS DOUBLE) + 0.5) / CAST(1000000 AS DOUBLE) AS kl
        |FROM agg JOIN ns USING (source) CROSS JOIN n
        |ORDER BY agg.source""".stripMargin) { (s, d) =>
      def q6(c: Column): Column =
        floor(log(c.cast("double")) * lit(1000000.0) + lit(0.5)).cast("long")
      val toks = Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      // (source, token) counts feed four consumers (global counts, source
      // totals, corpus total, the KL join) — materialize once; this is
      // also the relation every later shuffle keys off
      val sc = toks.groupBy("source", "tok").agg(count(lit(1)).as("c_sw"))
        .localCheckpoint()
      val gc = sc.groupBy("tok").agg(sum("c_sw").as("c_w"))
      val ns = sc.groupBy("source").agg(sum("c_sw").as("n_s"))
      val n = sc.agg(sum("c_sw").as("n"))
      val agg = sc.join(gc, "tok")
        .select(col("source"),
          (col("c_sw") * (q6(col("c_sw")) - q6(col("c_w")))).as("t"))
        .groupBy("source").agg(sum("t").as("st"))
      agg.join(ns, "source").crossJoin(broadcast(n))
        .select(col("source"), col("n_s").as("n_tokens"),
          (floor((col("st").cast("double") + col("n_s").cast("double") *
            (q6(col("n")) - q6(col("n_s")))) / col("n_s").cast("double") +
            lit(0.5)) / lit(1000000.0)).as("kl"))
        .orderBy("source")
    },

    // ---------------------------------------- L41 semantic dedup (SemDeDup)
    // The cluster-then-prune semantic dedup of Abbas et al. 2023
    // (arXiv:2303.09540): assign every vector to its nearest centroid
    // (the l28 integer-quantized argmax — K×D centroid table BROADCASTS),
    // then compare pairs ONLY within a cluster and drop every vector with
    // a higher-similarity-than-τ neighbor of smaller vec_id (the min-id
    // representative rule: deterministic in one pass, where the paper's
    // greedy sweep is sequential). Reported as per-cluster total/dropped/
    // kept counts. Shuffles key on the cluster id alone; the quadratic
    // pair search is bounded by cluster size — the SemDeDup contract is
    // that k grows with N to keep clusters bounded (and a skewed cluster
    // is exactly what the AQE skew split handles). τ = 0.4 sits 6e-4 from
    // the nearest pair similarity at sf0.01 (1.1e-4 at sf0.1), and both
    // engines fold the dot sequentially, so the double compare is stable.
    QueryDef.sql(
      "l41_semdedup",
      """WITH q AS (
        |  SELECT vec_id, label, i,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000 + 0.5)
        |      AS BIGINT) AS q
        |  FROM embeddings, generate_series(1, 64) t(i)),
        |c AS (SELECT label AS clabel, i, CAST(sum(q) AS BIGINT) AS cq
        |      FROM q GROUP BY clabel, i),
        |cn AS (SELECT label AS clabel, count(*) AS nl
        |       FROM embeddings GROUP BY clabel),
        |sc AS (
        |  SELECT q.vec_id, c.clabel,
        |    CAST(sum(q.q * c.cq) AS DOUBLE) / max(cn.nl) AS score
        |  FROM q JOIN c USING (i) JOIN cn ON c.clabel = cn.clabel
        |  GROUP BY q.vec_id, c.clabel),
        |r AS (SELECT vec_id, clabel, row_number() OVER (PARTITION BY vec_id
        |    ORDER BY score DESC, clabel) AS rn FROM sc),
        |asg AS (SELECT vec_id, clabel AS assigned FROM r WHERE rn = 1),
        |n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
        |  sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
        |    x -> x * x))) AS nrm FROM embeddings),
        |dropped AS (
        |  SELECT DISTINCT y.vec_id
        |  FROM asg x JOIN asg y
        |    ON x.assigned = y.assigned AND x.vec_id < y.vec_id
        |  JOIN n a ON a.vec_id = x.vec_id
        |  JOIN n b ON b.vec_id = y.vec_id
        |  WHERE list_sum(list_transform(generate_series(1, len(a.emb)),
        |      i -> a.emb[i] * b.emb[i])) / (a.nrm * b.nrm) > 0.4)
        |SELECT assigned, CAST(count(*) AS BIGINT) AS n_total,
        |  CAST(count(d.vec_id) AS BIGINT) AS n_dropped,
        |  CAST(count(*) - count(d.vec_id) AS BIGINT) AS n_kept
        |FROM asg LEFT JOIN dropped d ON d.vec_id = asg.vec_id
        |GROUP BY assigned ORDER BY assigned""".stripMargin) { (s, d) =>
      graft.functions.DotProduct.register(s)
      val emb = Tables.embeddings(s, d)
      val q = emb.select(col("vec_id"), col("label"),
          posexplode(col("embedding")))
        .select(col("vec_id"), col("label"), col("pos").as("i"),
          floor(col("col").cast("double") * 1000 + 0.5).cast("long")
            .as("q"))
      val cdf = q.groupBy(col("label").as("clabel"), col("i"))
        .agg(sum("q").as("cq"))
      val cn = emb.groupBy(col("label").as("clabel"))
        .agg(count(lit(1)).as("nl"))
      val scored = q.join(broadcast(cdf), "i").join(broadcast(cn), "clabel")
        .groupBy("vec_id", "clabel")
        .agg((sum(col("q") * col("cq")).cast("double") / max("nl"))
          .as("score"))
      val w = Window.partitionBy("vec_id")
        .orderBy(col("score").desc, col("clabel"))
      // three consumers (both pair sides + the final census) of a
      // window-over-fanout relation — materialize the assignment once
      val asg = scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("clabel").as("assigned"))
        .localCheckpoint()
      val n = emb.select(col("vec_id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
        .withColumn("nrm", sqrt(expr("graft_dot(emb, emb)")))
      val withVec = asg.join(n, "vec_id")
      val lhs = withVec.select(col("assigned"), col("vec_id").as("va"),
        col("emb").as("ea"), col("nrm").as("na"))
      val rhs = withVec.select(col("assigned").as("assigned_b"),
        col("vec_id").as("vb"), col("emb").as("eb"), col("nrm").as("nb"))
      val dropped = lhs.join(rhs,
          col("assigned") === col("assigned_b") && col("va") < col("vb"))
        .filter(expr("graft_dot(ea, eb)") / (col("na") * col("nb")) > 0.4)
        .select(col("vb").as("vec_id")).distinct()
      asg.join(dropped.withColumn("hit", lit(1)), Seq("vec_id"), "left")
        .groupBy("assigned")
        .agg(count(lit(1)).as("n_total"),
          count(col("hit")).as("n_dropped"),
          (count(lit(1)) - count(col("hit"))).as("n_kept"))
        .orderBy("assigned")
    },

    // --------------------------- L42 temperature-resampled language mix
    // The α-temperature resampling of multilingual pretraining (mC4 /
    // XLM-R, α = 0.3): sampling probability p_l ∝ share_l^α flattens the
    // head languages and boosts the tail. Reports, per language: raw doc
    // count, corpus share, resampled probability, the integer document
    // target for a 1000-doc budget, and the boost factor p_l/share_l. The
    // whole computation is one partial+final count per language followed
    // by arithmetic over a ≤|languages|-row relation — at 100 TB only the
    // count scan grows; everything after it is constant-size (the
    // language census broadcasts). Doubles are safe here: the cross-row
    // sum spans ≤|languages| pow() values (no volume summation), far
    // inside the oracle's 1e-9 rounding; the integer target is pinned
    // exactly via floor(x + 0.5) on both engines.
    QueryDef.sql(
      "l42_temperature_mix",
      """WITH c AS (SELECT lang, count(*) AS n_docs FROM documents
        |           GROUP BY lang),
        |t AS (SELECT CAST(sum(n_docs) AS DOUBLE) AS n FROM c),
        |w AS (SELECT lang, n_docs,
        |        CAST(n_docs AS DOUBLE) / n AS share,
        |        pow(CAST(n_docs AS DOUBLE) / n, 0.3) AS wt
        |      FROM c CROSS JOIN t),
        |z AS (SELECT CAST(sum(wt) AS DOUBLE) AS zz FROM w)
        |SELECT lang, CAST(n_docs AS BIGINT) AS n_docs, share,
        |  wt / zz AS p_sample,
        |  CAST(floor(1000 * wt / zz + 0.5) AS BIGINT) AS target_docs,
        |  (wt / zz) / share AS boost
        |FROM w CROSS JOIN z ORDER BY lang""".stripMargin) { (s, d) =>
      val c = Tables.documents(s, d).groupBy("lang")
        .agg(count(lit(1)).as("n_docs"))
      val t = c.agg(sum("n_docs").cast("double").as("n"))
      val w = c.crossJoin(broadcast(t))
        .withColumn("share", col("n_docs").cast("double") / col("n"))
        .withColumn("wt", pow(col("share"), lit(0.3)))
      val z = w.agg(sum("wt").as("zz"))
      w.crossJoin(broadcast(z))
        .select(col("lang"), col("n_docs"), col("share"),
          (col("wt") / col("zz")).as("p_sample"),
          floor(lit(1000) * col("wt") / col("zz") + lit(0.5)).cast("long")
            .as("target_docs"),
          (col("wt") / col("zz") / col("share")).as("boost"))
        .orderBy("lang")
    },

    // ------------------------------ L43 BPE first-merge pair frequencies
    // The inner loop of BPE vocabulary induction: adjacent character-pair
    // frequencies weighted by word frequency — the top pair IS the first
    // merge the tokenizer learns. The scale trick is the real one from
    // the BPE literature: aggregate the corpus to DISTINCT words first
    // (a relation orders of magnitude smaller than the token stream),
    // then fan out each word's length-1 adjacent pairs weighted by its
    // count. Overlapping occurrences count per position ('aaa' → 'aa'
    // twice), exactly as the merge step would. One shuffle to the word
    // census, one to the pair totals; top-20 via TakeOrdered with the
    // pair string as the deterministic tiebreak.
    QueryDef.sql(
      "l43_bpe_pair_merge",
      """WITH wds AS (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents),
        |wf AS (SELECT word, count(*) AS f FROM wds
        |       WHERE length(word) >= 2 GROUP BY word),
        |p AS (SELECT unnest(list_transform(range(1, length(word)),
        |        i -> substr(word, CAST(i AS INT), 2))) AS pair, f
        |      FROM wf)
        |SELECT pair, CAST(sum(f) AS BIGINT) AS freq
        |FROM p GROUP BY pair
        |ORDER BY freq DESC, pair LIMIT 20""".stripMargin) { (s, d) =>
      val wf = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) >= 2)
        .groupBy("word").agg(count(lit(1)).as("f"))
      wf.select(explode(expr(
          "transform(sequence(1, length(word) - 1)," +
            " i -> substring(word, i, 2))")).as("pair"), col("f"))
        .groupBy("pair").agg(sum("f").as("freq"))
        .orderBy(col("freq").desc, col("pair")).limit(20)
    },

    // ------------------------------------- L44 hard-negative mining (new r8)
    // Contrastive-training prep: for each probe vector, the top-3 most
    // cosine-similar vectors carrying a DIFFERENT label — the "hard
    // negatives" a contrastive or reranker trainer pairs with each anchor.
    // Same brute-force shape as l3 (bounded probe set BROADCASTS, the
    // collection streams — one pass, no shuffle of the big side); at
    // 100 TB the probe set is the training batch and the collection-side
    // scan parallelizes per partition. The label inequality is applied
    // BEFORE the top-k window, so negatives never crowd out of the frame.
    // sim rounds through the portable 6-dp lens; the dot is the native
    // codegen'd graft_dot fold, sequentially identical to DuckDB's
    // list_sum fold.
    QueryDef.sql(
      "l44_hard_negatives",
      """WITH n AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb,
        |    sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> x * x))) AS nrm
        |  FROM embeddings),
        |q AS (SELECT vec_id AS q_id, label AS q_label, emb AS qe, nrm AS qn
        |  FROM n WHERE vec_id < 10),
        |p AS (SELECT q_id, q_label, vec_id AS neighbor_id, label AS n_label,
        |    floor(list_sum(list_transform(generate_series(1, len(qe)),
        |      i -> qe[i] * emb[i])) / (qn * nrm) * 1000000 + 0.5)
        |      / CAST(1000000 AS DOUBLE) AS sim
        |  FROM q, n WHERE label <> q_label),
        |r AS (SELECT q_id, q_label, neighbor_id, n_label, sim,
        |    CAST(row_number() OVER (PARTITION BY q_id
        |      ORDER BY sim DESC, neighbor_id) AS INT) AS rn
        |  FROM p)
        |SELECT q_id, q_label, neighbor_id, n_label, sim, rn FROM r
        |WHERE rn <= 3 ORDER BY q_id, rn""".stripMargin) { (s, d) =>
      graft.functions.DotProduct.register(s)
      val n = Tables.embeddings(s, d).select(col("vec_id"), col("label"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
        .withColumn("nrm", sqrt(expr("graft_dot(emb, emb)")))
      val q = n.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("label").as("q_label"),
          col("emb").as("qe"), col("nrm").as("qn"))
      val sim = graft.Det.portableRound(
        expr("graft_dot(qe, emb)") / (col("qn") * col("nrm")), 6)
      val w = Window.partitionBy("q_id")
        .orderBy(col("sim").desc, col("neighbor_id"))
      n.crossJoin(broadcast(q))
        .filter(col("label") =!= col("q_label"))
        .select(col("q_id"), col("q_label"), col("vec_id").as("neighbor_id"),
          col("label").as("n_label"), sim.as("sim"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .orderBy("q_id", "rn")
    },

    // ------------------------------------------ L45 head coverage (new r8)
    // Tokenizer/vocabulary sizing evidence per slice: how much of each
    // source's token mass the 10 most frequent word types cover, plus the
    // type inventory size. A high head-coverage slice is repetitive
    // boilerplate; a low one is lexically diverse — the standard signal
    // for vocabulary sizing and slice weighting. One explode + one
    // (source, type) count + one per-source window; the rank window
    // partitions by source so no single reducer sees the whole vocab.
    // Ties at the rank-10 boundary break on the type string in BOTH
    // engines, so the cut is deterministic.
    QueryDef.sql(
      "l45_head_coverage",
      """WITH toks AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |tc AS (SELECT source, tok, count(*) AS c FROM toks GROUP BY 1, 2),
        |r AS (SELECT source, tok, c, row_number() OVER
        |    (PARTITION BY source ORDER BY c DESC, tok) AS rn
        |  FROM tc),
        |t AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
        |    CAST(count(*) AS BIGINT) AS n_types,
        |    CAST(sum(CASE WHEN rn <= 10 THEN c ELSE 0 END) AS BIGINT)
        |      AS head
        |  FROM r GROUP BY source)
        |SELECT source, n_tokens, n_types,
        |  floor(CAST(head AS DOUBLE) / n_tokens * 1000000 + 0.5)
        |    / CAST(1000000 AS DOUBLE) AS head_coverage
        |FROM t ORDER BY source""".stripMargin) { (s, d) =>
      val tc = Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("source", "tok").agg(count(lit(1)).as("c"))
      val w = Window.partitionBy("source")
        .orderBy(col("c").desc, col("tok"))
      tc.withColumn("rn", row_number().over(w))
        .groupBy("source")
        .agg(sum("c").as("n_tokens"), count(lit(1)).as("n_types"),
          sum(when(col("rn") <= 10, col("c")).otherwise(lit(0L)))
            .as("head"))
        .select(col("source"), col("n_tokens"), col("n_types"),
          graft.Det.portableRound(
            col("head").cast("double") / col("n_tokens"), 6)
            .as("head_coverage"))
        .orderBy("source")
    },

    // ------------------------------- L46 embedding dispersion (new r8)
    // Cluster-cohesion audit of the embedding space WITHOUT a pairwise
    // join: for each label, the mean squared distance over all unordered
    // vector pairs via the moment identity
    //   Σ_{i<j} ||xi−xj||² = (n·Σ||xi||² − ||Σxi||²) / 1
    // computed on 1e3-quantized integer components, so every partial sum
    // is exact BIGINT and map-side combinable — O(n·D) total where the
    // naive form is O(n²·D). This is the scale-correct way to score
    // cluster tightness (SemDeDup/k-means QA) on a 100 TB embedding
    // table: one groupBy(label) pass, no self-join, no broadcast.
    QueryDef.sql(
      "l46_embedding_dispersion",
      """WITH q AS (SELECT vec_id, label, i,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000 + 0.5)
        |      AS BIGINT) AS q
        |  FROM embeddings, generate_series(1, 64) t(i)),
        |a AS (SELECT label, CAST(count(DISTINCT vec_id) AS BIGINT) AS n,
        |    CAST(sum(q * q) AS BIGINT) AS s2
        |  FROM q GROUP BY label),
        |td AS (SELECT label, i, CAST(sum(q) AS BIGINT) AS td
        |  FROM q GROUP BY label, i),
        |b AS (SELECT label, CAST(sum(td * td) AS BIGINT) AS tt
        |  FROM td GROUP BY label)
        |SELECT label, n,
        |  floor((CAST(n AS DOUBLE) * s2 - tt)
        |      / (CAST(n AS DOUBLE) * (n - 1) / 2) / 1000000.0
        |      * 1000000 + 0.5) / CAST(1000000 AS DOUBLE)
        |    AS mean_pair_sqdist
        |FROM a JOIN b USING (label) ORDER BY label""".stripMargin) {
      (s, d) =>
        val q = Tables.embeddings(s, d)
          .select(col("vec_id"), col("label"), posexplode(col("embedding")))
          .select(col("vec_id"), col("label"),
            col("pos").as("i"),
            floor(col("col").cast("double") * 1000 + 0.5).cast("long")
              .as("q"))
        val a = q.groupBy("label")
          .agg(countDistinct("vec_id").as("n"), sum(col("q") * col("q"))
            .as("s2"))
        val b = q.groupBy("label", "i").agg(sum("q").as("td"))
          .groupBy("label").agg(sum(col("td") * col("td")).as("tt"))
        a.join(b, "label")
          .select(col("label"), col("n"),
            graft.Det.portableRound(
              (col("n").cast("double") * col("s2") - col("tt")) /
                (col("n").cast("double") * (col("n") - 1) / 2) /
                lit(1000000.0), 6).as("mean_pair_sqdist"))
          .orderBy("label")
    },

    // ------------------------ L47 quality-ranked canonical per dup cluster
    // The production refinement of l2f: a real pipeline keeps the BEST
    // member of each near-dup cluster (highest quality score), not the
    // lowest-id one. Clusters from the same MinHash-LSH pairs + GraphX CC
    // substrate as l2e/l2f; the per-cluster argmax is ONE partial+final
    // hash aggregate over a lexicographic struct max — (quality, −doc_id),
    // so ties on the micro-quantized quality break to the LOWEST id — with
    // no per-cluster sort and no window shuffle, the shape that holds when
    // clusters hold millions of members at 100 TB.
    QueryDef.sql("l47_best_of_cluster", duckBestOfClusterSql) { (s, d) =>
      import s.implicits._
      val vertices = Tables.documents(s, d).select("doc_id").as[Long]
        .rdd.map(id => (id, ()))
      val edges = minhashPairs(s, d).as[(Long, Long)]
        .rdd.map { case (a, b) => org.apache.spark.graphx.Edge(a, b, ()) }
      val clusters = org.apache.spark.graphx.Graph(vertices, edges)
        .connectedComponents().vertices.toDF("doc_id", "cluster_id")
      val scored = Tables.documents(s, d)
        .select(col("doc_id"), qualityCol.as("quality"))
        .join(clusters, "doc_id")
      scored
        .groupBy("cluster_id")
        .agg(max(struct(col("quality"), (-col("doc_id")).as("neg_id"),
          col("doc_id").as("kept"))).as("best"))
        .select(col("cluster_id"), col("best.kept").as("doc_id"),
          col("best.quality").as("quality"))
        .orderBy("cluster_id")
    },
    // ------------------------------- L48 shingle containment (asymmetric)
    // Jaccard misses the quote/subset relationship: a short doc fully
    // quoted inside a long one shares all ITS shingles but few of the
    // long doc's, so |∩|/|∪| stays small while |∩|/min(|A|,|B|) → 1.
    // Same DF-capped shingle substrate as l2c (posting-list pair join,
    // never all-pairs; hot shingles broadcast-anti-joined away), one
    // extra broadcast-sized size lookup per side — identical scale shape.
    QueryDef.sql(
      "l48_containment",
      s"""WITH sh0 AS ($duckShingles),
         |hot AS (SELECT s FROM sh0 GROUP BY s HAVING count(*) > 1000),
         |sh AS (SELECT * FROM sh0 ANTI JOIN hot USING (s)),
         |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id)
         |SELECT doc_a, doc_b,
         |  ${graft.Det.duckPortableRound(
            "CAST(shared AS DOUBLE) / CAST(least(sa.n, sb.n) AS DOUBLE)",
            6)} AS containment,
         |  CASE WHEN sa.n <= sb.n THEN doc_a ELSE doc_b END AS contained_doc
         |FROM pairs JOIN sz sa ON doc_a = sa.doc_id
         |           JOIN sz sb ON doc_b = sb.doc_id
         |WHERE CAST(shared AS DOUBLE) / CAST(least(sa.n, sb.n) AS DOUBLE)
         |      >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
      val sh0 = shingles(s, d).localCheckpoint()
      val hot = sh0.groupBy("s").agg(count(lit(1)).as("df"))
        .filter(col("df") > 1000).select("s")
      // NOT checkpointed (measured r18): AQE's ReusedExchange already
      // dedups the four consumers' replays — see ngramJaccard
      val sh = sh0.join(broadcast(hot), Seq("s"), "left_anti")
      val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val pairs = sh.select(col("doc_id").as("doc_a"), col("s"))
        .join(sh.select(col("doc_id").as("doc_b"), col("s")), "s")
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared"))
      val cont = col("shared").cast("double") /
        least(col("na"), col("nb")).cast("double")
      pairs
        .join(sz.select(col("doc_id"), col("n").as("na")),
          col("doc_a") === col("doc_id")).drop("doc_id")
        .join(sz.select(col("doc_id"), col("n").as("nb")),
          col("doc_b") === col("doc_id")).drop("doc_id")
        .filter(cont >= 0.5)
        .select(col("doc_a"), col("doc_b"),
          graft.Det.portableRound(cont, 6).as("containment"),
          when(col("na") <= col("nb"), col("doc_a"))
            .otherwise(col("doc_b")).as("contained_doc"))
        .orderBy("doc_a", "doc_b")
    },

    // ------------------------------------------- L49 DSIR importance (r9)
    // Data Selection via Importance Resampling (Xie et al. 2023, public):
    // score every document by how much more likely its hashed-unigram
    // features are under a TARGET slice's distribution than under the raw
    // corpus, then keep the top fifth by weight. log w(d) =
    // Σ_b c_d(b)·[ln p_tgt(b) − ln p_raw(b)] with add-one smoothing over
    // B=256 hash buckets. Every ln is of an exact integer count and is
    // quantized to micro-units BEFORE summing (the l38 discipline), so the
    // per-doc weight is an exact integer in both engines. Scale: the
    // bucket-weight table is ≤B rows → broadcast; per-doc scoring is one
    // doc-keyed aggregate; the top-20% selection uses the w5b substrate
    // (range-repartitioned sort + zipWithIndex), never a single-partition
    // window. The target slice here is source='src0'; production swaps in
    // the curated target corpus.
    dsirDef("l49_dsir_importance", buckets = 256, bigrams = false),

    // l49 at production knobs (the KnobMatrix discipline: the SAME oracle
    // comparison runs at the values a billion-doc corpus would use):
    // 4096 hash buckets and BIGRAM features — DSIR's published setting
    // uses hashed n-grams, and the wider weight table stays a broadcast
    // (≤4096 rows). Feature sparsity changes the smoothing balance, so
    // this is a genuinely different numeric path through the same kernel.
    dsirDef("l49_prod_knobs", buckets = 4096, bigrams = true),

    // ---------------------------------------- L50 CCNet buckets (new r9)
    // CCNet-style (Wenzek et al. 2020, public) perplexity bucketing: score
    // every document with the corpus-trained bigram LM (the l38 kernel,
    // same integer-micro nll discipline), then split EACH LANGUAGE into
    // head/middle/tail terciles by average nll — the standard
    // quality-stratification step before sampling pretraining data.
    // ntile(3) is rank-based with a (nll, doc_id) total order → the
    // bucket boundary is deterministic in both engines. Scale: the window
    // partitions by lang over the per-DOC score table (one row per doc,
    // not per token); CCNet itself shards per language the same way —
    // per-language data volume is the natural parallelism unit here.
    QueryDef.sql(
      "l50_ccnet_buckets",
      """WITH toks AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS l
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id, lang, l[i] AS w1, l[i + 1] AS w2
        |  FROM (SELECT doc_id, lang, l,
        |          unnest(generate_series(1, len(l) - 1)) AS i
        |        FROM toks WHERE len(l) >= 2) t),
        |cbg AS (SELECT w1, w2, count(*) AS c_bg FROM bg GROUP BY 1, 2),
        |cug AS (SELECT w1, count(*) AS c_ug FROM bg GROUP BY 1),
        |v AS (SELECT count(DISTINCT w1) AS v FROM bg),
        |scored AS (
        |  SELECT bg.doc_id, bg.lang,
        |    CAST(floor(ln(CAST(c_ug + v AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
        |    - CAST(floor(ln(CAST(c_bg + 1 AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
        |      AS nll
        |  FROM bg JOIN cbg USING (w1, w2) JOIN cug USING (w1) CROSS JOIN v),
        |per AS (SELECT doc_id, lang,
        |    CAST(floor(CAST(sum(nll) AS DOUBLE) / count(*) + 0.5) AS BIGINT)
        |      AS nllq
        |  FROM scored GROUP BY doc_id, lang),
        |bk AS (SELECT doc_id, lang, nllq,
        |    ntile(3) OVER (PARTITION BY lang ORDER BY nllq, doc_id) AS t
        |  FROM per)
        |SELECT doc_id, lang,
        |  CASE t WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
        |    ELSE 'tail' END AS bucket
        |FROM bk ORDER BY doc_id""".stripMargin) { (s, d) =>
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), split(col("text"), " ").as("l"))
        .filter(size(col("l")) >= 2)
      val bg = toks.select(col("doc_id"), col("lang"), explode(expr(
          "transform(sequence(0, size(l) - 2)," +
            " i -> struct(l[i] AS w1, l[i + 1] AS w2))")).as("p"))
        .select(col("doc_id"), col("lang"),
          col("p.w1").as("w1"), col("p.w2").as("w2"))
        .localCheckpoint() // bigram counts, context counts, vocab, scoring
      val cbg = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c_bg"))
      val cug = bg.groupBy("w1").agg(count(lit(1)).as("c_ug"))
      val v = bg.agg(countDistinct(col("w1")).as("v"))
      def q6(c: Column): Column =
        floor(log(c.cast("double")) * lit(1000000.0) + lit(0.5)).cast("long")
      val per = bg.join(cbg, Seq("w1", "w2")).join(cug, Seq("w1"))
        .crossJoin(broadcast(v))
        .select(col("doc_id"), col("lang"),
          (q6(col("c_ug") + col("v")) - q6(col("c_bg") + lit(1)))
            .as("nll"))
        .groupBy("doc_id", "lang")
        .agg(floor(sum("nll").cast("double") / count(lit(1)) + lit(0.5))
          .cast("long").as("nllq"))
      val w = Window.partitionBy("lang").orderBy("nllq", "doc_id")
      per.withColumn("t", ntile(3).over(w))
        .select(col("doc_id"), col("lang"),
          when(col("t") === 1, "head").when(col("t") === 2, "middle")
            .otherwise("tail").as("bucket"))
        .orderBy("doc_id")
    },
    // ------------------------------------------- L55 Heaps-law vocab growth
    // The companion diagnostic to l33's Zipf slope: Heaps' law says
    // vocabulary grows as D ≈ k·N^β (β ~ 0.4-0.8 for natural text);
    // a β collapsing toward 0 flags template/duplicated content, β near 1
    // flags noise — the corpus-health dashboard pair. Per source, walk
    // docs in doc_id order, accumulate total tokens N and first-occurrence
    // vocabulary D at each doc boundary, and fit ln D ~ ln N with the l33
    // integer-quantized regression (exact-long sums, order-free).
    // Scale: first-occurrence = min(doc_id) per (source, token) — one
    // token-keyed shuffle; the cumulative walk windows over |docs| rows
    // per source, never tokens.
    QueryDef.sql(
      "l55_heaps_slope",
      """WITH t AS (SELECT source, doc_id,
        |    unnest(string_split(text, ' ')) AS tok FROM documents),
        |fo AS (SELECT source, tok, min(doc_id) AS doc_id
        |       FROM t GROUP BY 1, 2),
        |nd AS (SELECT source, doc_id, count(*) AS n_new
        |       FROM fo GROUP BY 1, 2),
        |pd AS (SELECT source, doc_id, count(*) AS n_toks
        |       FROM t GROUP BY 1, 2),
        |c AS (SELECT pd.source, pd.doc_id,
        |    CAST(sum(pd.n_toks) OVER (PARTITION BY pd.source
        |      ORDER BY pd.doc_id) AS BIGINT) AS cum_n,
        |    CAST(sum(coalesce(nd.n_new, 0)) OVER (PARTITION BY pd.source
        |      ORDER BY pd.doc_id) AS BIGINT) AS cum_d
        |  FROM pd LEFT JOIN nd
        |    ON pd.source = nd.source AND pd.doc_id = nd.doc_id),
        |q AS (SELECT source,
        |    CAST(floor(ln(CAST(cum_n AS DOUBLE)) * 1000000 + 0.5)
        |      AS BIGINT) AS xq,
        |    CAST(floor(ln(CAST(cum_d AS DOUBLE)) * 1000000 + 0.5)
        |      AS BIGINT) AS yq
        |  FROM c),
        |a AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(xq) AS BIGINT) AS sx, CAST(sum(yq) AS BIGINT) AS sy,
        |    CAST(sum(xq * yq) AS BIGINT) AS sxy,
        |    CAST(sum(xq * xq) AS BIGINT) AS sxx
        |  FROM q GROUP BY source)
        |SELECT source, n AS n_points,
        |  floor(CAST(n * sxy - sx * sy AS DOUBLE) /
        |      CAST(n * sxx - sx * sx AS DOUBLE) * 1000000 + 0.5)
        |    / CAST(1000000 AS DOUBLE) AS heaps_slope
        |FROM a ORDER BY source""".stripMargin) { (s, d) =>
      val t = Tables.documents(s, d)
        .select(col("source"), col("doc_id"),
          explode(split(col("text"), " ")).as("tok"))
        .localCheckpoint() // two consumers: first-occurrence + per-doc
      val nd = t.groupBy("source", "tok")
        .agg(min("doc_id").as("doc_id"))
        .groupBy("source", "doc_id").agg(count(lit(1)).as("n_new"))
      val pd = t.groupBy("source", "doc_id").agg(count(lit(1)).as("n_toks"))
      val w = Window.partitionBy("source").orderBy("doc_id")
      def q(c: Column): Column =
        floor(log(c.cast("double")) * lit(1000000.0) + lit(0.5)).cast("long")
      val a = pd.join(nd, Seq("source", "doc_id"), "left_outer")
        .select(col("source"), col("doc_id"), col("n_toks"),
          coalesce(col("n_new"), lit(0L)).as("n_new"))
        .select(col("source"),
          sum("n_toks").over(w).as("cum_n"),
          sum("n_new").over(w).as("cum_d"))
        .select(col("source"), q(col("cum_n")).as("xq"),
          q(col("cum_d")).as("yq"))
        .groupBy("source")
        .agg(count(lit(1)).as("n"), sum("xq").as("sx"), sum("yq").as("sy"),
          sum(col("xq") * col("yq")).as("sxy"),
          sum(col("xq") * col("xq")).as("sxx"))
      a.select(col("source"), col("n").as("n_points"),
          graft.Det.portableRound(
            (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
              (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"),
            6).as("heaps_slope"))
        .orderBy("source")
    },
    // --------------------------------------------- L51 BM25 retrieval score
    // Okapi BM25 (Robertson/Spärck Jones; the default lexical ranker of
    // Lucene/Elasticsearch) over the corpus for a fixed query-term set —
    // the retrieval half of a RAG pipeline. Scale discipline: an INVERTED
    // INDEX shape — only documents containing a query term are ever
    // scored (the tf relation is pre-filtered to the query terms before
    // any join), the ≤|query| df table broadcasts, corpus-level constants
    // (N, avgdl) ride in as a broadcast scalar. Per-(doc, term) scores are
    // quantized to integer micro-units BEFORE the per-doc sum (the l38 ln
    // discipline) so the fold is exact-integer and order-independent; the
    // final top-10 is a TakeOrderedAndProject, never a global sort.
    // Determinism note: both engines build idf and the tf normalizer from
    // exact integers plus ONE shared double (avgdl = exact long sum /
    // count), with identical association order, so the doubles are
    // bit-identical before quantization.
    QueryDef.sql(
      "l51_bm25",
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
         |  FROM documents),
         |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks
         |       WHERE len(term) > 0 GROUP BY 1),
         |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(CAST(sum(dl) AS BIGINT) AS DOUBLE) / count(*) AS avgdl
         |  FROM dl),
         |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
         |  FROM toks WHERE term IN ('hash', 'join', 'merge') GROUP BY 1, 2),
         |df AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
         |  FROM toks WHERE term IN ('hash', 'join', 'merge') GROUP BY 1),
         |sc AS (SELECT tf.doc_id,
         |    CAST(sum(CAST(floor(
         |      ln(1 + (n_docs - df + 0.5) / (df + 0.5)) *
         |      ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))) *
         |      1000000 + 0.5) AS BIGINT)) AS BIGINT) AS score_micro,
         |    CAST(count(*) AS BIGINT) AS n_terms_hit
         |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
         |  CROSS JOIN stats GROUP BY 1)
         |SELECT doc_id,
         |  score_micro / CAST(1000000 AS DOUBLE) AS score, n_terms_hit
         |FROM sc ORDER BY score_micro DESC, doc_id LIMIT 10""".stripMargin) {
      (s, d) =>
        // three consumers of the token relation (dl, tf, df) — materialize
        // once (the l30/l38 shared-relation discipline)
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
          .localCheckpoint()
        val qTerms = Seq("hash", "join", "merge")
        val dl = toks.filter(length(col("term")) > 0)
          .groupBy("doc_id").agg(count(lit(1)).as("dl"))
        val stats = dl.agg(count(lit(1)).as("n_docs"),
          (sum("dl").cast("double") / count(lit(1))).as("avgdl"))
        val tf = toks.filter(col("term").isin(qTerms: _*))
          .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        val df = toks.filter(col("term").isin(qTerms: _*))
          .select("doc_id", "term").distinct()
          .groupBy("term").agg(count(lit(1)).as("df"))
        // identical association order to the oracle SQL: (idf * tfn) * 1e6
        val idf = log(lit(1.0) +
          (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
        val tfn = (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) *
            (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))
        tf.join(broadcast(df), "term").join(dl, "doc_id")
          .crossJoin(broadcast(stats))
          .select(col("doc_id"),
            floor(idf * tfn * lit(1000000.0) + lit(0.5)).cast("long")
              .as("sm"))
          .groupBy("doc_id")
          .agg(sum("sm").as("score_micro"),
            count(lit(1)).as("n_terms_hit"))
          .orderBy(col("score_micro").desc, col("doc_id"))
          .select(col("doc_id"),
            (col("score_micro") / lit(1000000.0)).as("score"),
            col("n_terms_hit"))
          .limit(10)
    },
    // -------------------------------------- L52 SemDeDup dedup OUTPUT
    // The per-document output form of l41_semdedup (which reports the
    // per-cluster census): same SemDeDup kernel (Abbas et al. 2023,
    // arXiv:2303.09540 — l28 nearest-centroid clusters, near-dedup ONLY
    // within clusters), but materializing the actionable relation a
    // pipeline writes back: one (vec_id, cluster, removed) row per doc at
    // τ = 0.3, removed iff a LOWER-vec_id member of the same cluster sits
    // at/above τ (keep-first-seen stated non-iteratively so it is
    // engine-portable; the l2-pairs vs l2f-dedup-output precedent — the
    // transitive grouping form lives in l2e_dup_clusters). Scale: the
    // only quadratic term is WITHIN a cluster — K is chosen so clusters
    // stay bounded (the paper runs K ≈ √N); the pair join keys on cluster
    // id, a skewed giant cluster is AQE's skew-join case, and the cosine
    // hot loop is the codegen'd graft_dot.
    QueryDef.sql(
      "l52_semdedup",
      """WITH q AS (
        |  SELECT vec_id, label, i,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000 + 0.5)
        |      AS BIGINT) AS q
        |  FROM embeddings, generate_series(1, 64) t(i)),
        |c AS (SELECT label AS clabel, i, CAST(sum(q) AS BIGINT) AS cq
        |      FROM q GROUP BY 1, 2),
        |cn AS (SELECT label AS clabel, count(*) AS nl
        |       FROM embeddings GROUP BY 1),
        |sc AS (SELECT q.vec_id, c.clabel,
        |    CAST(sum(q.q * c.cq) AS DOUBLE) / max(cn.nl) AS score
        |  FROM q JOIN c USING (i) JOIN cn ON c.clabel = cn.clabel
        |  GROUP BY 1, 2),
        |asg AS (SELECT vec_id, cluster FROM (
        |    SELECT vec_id, clabel AS cluster, row_number() OVER (
        |      PARTITION BY vec_id ORDER BY score DESC, clabel) AS rn
        |    FROM sc) WHERE rn = 1),
        |n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
        |    sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> x * x))) AS nrm
        |  FROM embeddings),
        |rm AS (SELECT DISTINCT cb.vec_id
        |  FROM asg ca JOIN asg cb
        |    ON ca.cluster = cb.cluster AND ca.vec_id < cb.vec_id
        |  JOIN n a ON a.vec_id = ca.vec_id
        |  JOIN n b ON b.vec_id = cb.vec_id
        |  WHERE floor(list_sum(list_transform(generate_series(1, 64),
        |      i -> a.emb[i] * b.emb[i])) / (a.nrm * b.nrm)
        |      * 1000000 + 0.5) / CAST(1000000 AS DOUBLE) >= 0.3)
        |SELECT asg.vec_id, cluster,
        |  asg.vec_id IN (SELECT vec_id FROM rm) AS removed
        |FROM asg ORDER BY vec_id""".stripMargin) { (s, d) =>
      graft.functions.DotProduct.register(s)
      val emb = Tables.embeddings(s, d)
      val q = emb
        .select(col("vec_id"), col("label"), posexplode(col("embedding")))
        .select(col("vec_id"), col("label"), col("pos").as("i"),
          floor(col("col").cast("double") * 1000 + 0.5).cast("long")
            .as("q"))
      val c = q.groupBy(col("label").as("clabel"), col("i"))
        .agg(sum("q").as("cq"))
      val cn = emb.groupBy(col("label").as("clabel"))
        .agg(count(lit(1)).as("nl"))
      val w = Window.partitionBy("vec_id")
        .orderBy(col("score").desc, col("clabel"))
      val asg = q.join(broadcast(c), "i").join(broadcast(cn), "clabel")
        .groupBy("vec_id", "clabel")
        .agg((sum(col("q") * col("cq")).cast("double") / max("nl"))
          .as("score"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("vec_id"), col("clabel").as("cluster"))
      val n = emb.select(col("vec_id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
        .withColumn("nrm", sqrt(expr("graft_dot(emb, emb)")))
      // two pair-join consumers of the assigned+normalized relation —
      // materialize once
      val m = asg.join(n, "vec_id").localCheckpoint()
      val a = m.select(col("cluster"), col("vec_id").as("a_id"),
        col("emb").as("a_emb"), col("nrm").as("a_nrm"))
      val b = m.select(col("cluster"), col("vec_id").as("b_id"),
        col("emb").as("b_emb"), col("nrm").as("b_nrm"))
      val sim = graft.Det.portableRound(
        expr("graft_dot(a_emb, b_emb)") / (col("a_nrm") * col("b_nrm")), 6)
      val rm = a.join(b, "cluster").filter(col("a_id") < col("b_id"))
        .filter(sim >= 0.3)
        .select(col("b_id").as("vec_id")).distinct()
        .withColumn("removed", lit(true))
      asg.join(rm, Seq("vec_id"), "left")
        .select(col("vec_id"), col("cluster"),
          coalesce(col("removed"), lit(false)).as("removed"))
        .orderBy("vec_id")
    },
    // ------------------------------------ L53 hashed linear text classifier
    // fastText-style linear scoring (Joulin et al. 2016) — the shape every
    // learned quality/toxicity/domain filter takes at corpus scale: hash
    // tokens into B feature buckets, join a broadcast B-row weight table,
    // sum weights per doc, threshold the logit. The weight table here is
    // hash-derived (a stand-in for trained weights — the engine's job is
    // the scoring plumbing, not training) in integer micro-units, so the
    // per-doc fold is exact and order-independent. Scale: featurize is
    // map-side, weights broadcast (B rows regardless of corpus size), one
    // doc-keyed aggregation — same cost envelope as l49 scoring.
    QueryDef.sql(
      "l53_linear_classifier",
      s"""WITH tk AS (
         |  SELECT doc_id, ${PortableHash.duck("w")} % 512 AS b
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
         |        FROM documents) t WHERE len(w) > 0),
         |wt AS (SELECT i AS b,
         |    ${PortableHash.duck("'w:' || CAST(i AS VARCHAR)")} % 2001
         |      - 1000 AS wm
         |  FROM generate_series(0, 511) t(i)),
         |sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |    CAST(sum(wm) AS BIGINT) AS logit_micro
         |  FROM tk JOIN wt USING (b) GROUP BY 1)
         |SELECT doc_id, n_tokens, logit_micro,
         |  logit_micro > 0 AS accepted
         |FROM sc ORDER BY doc_id""".stripMargin) { (s, d) =>
      val tk = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 0)
        .select(col("doc_id"),
          pmod(PortableHash.spark(col("w")), lit(512L)).as("b"))
      val wt = s.range(0, 512).select(col("id").as("b"),
        (pmod(PortableHash.spark(
          concat(lit("w:"), col("id").cast("string"))), lit(2001L))
          - lit(1000L)).as("wm"))
      tk.join(broadcast(wt), "b")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"), sum("wm").as("logit_micro"))
        .select(col("doc_id"), col("n_tokens"), col("logit_micro"),
          (col("logit_micro") > 0).as("accepted"))
        .orderBy("doc_id")
    },
    // ------------------------------- L54 random sign projection (JL / RP)
    // Johnson–Lindenstrauss dimensionality reduction with an Achlioptas
    // ±1 sign matrix (Achlioptas 2001) — the cheap first stage of
    // embedding pipelines (pre-LSH, pre-clustering). The projection
    // matrix is NEVER materialized: sign(i, j) is hash parity computed
    // inside the per-row lambda, the input coordinates are quantized to
    // exact integers, and the whole projection is a zero-shuffle map over
    // the corpus (SQL higher-order functions, inside codegen) — the only
    // exchange in the plan is the presentation sort. At 100 TB this is
    // the ideal operator: embarrassingly parallel, no state, no join.
    QueryDef.sql(
      "l54_random_projection",
      s"""WITH pr AS (
         |  SELECT vec_id,
         |    list_transform(generate_series(0, 7), j ->
         |      list_sum(list_transform(generate_series(0, 63), i ->
         |        CAST(floor(CAST(embedding[i + 1] AS DOUBLE) * 1000 + 0.5)
         |          AS BIGINT) *
         |        (CASE WHEN ${PortableHash.duck(
                   "'r:' || CAST(i AS VARCHAR) || ':' || CAST(j AS VARCHAR)")}
         |           % 2 = 0 THEN 1 ELSE -1 END)))) AS p
         |  FROM embeddings)
         |SELECT vec_id, CAST(j - 1 AS INT) AS dim, CAST(p[j] AS BIGINT) AS v
         |FROM pr, generate_series(1, 8) t(j)
         |ORDER BY vec_id, dim""".stripMargin) { (s, d) =>
      // the sign matrix is ROW-INVARIANT: fold it once, driver-side, into
      // the expression as a 512-entry literal (the identical md5-parity
      // formula the oracle computes in SQL) instead of re-hashing 512×
      // per row — same values, the per-row work drops to 512 multiply-adds
      // inside codegen. Still never shuffled, joined, or materialized as
      // a relation.
      val md = java.security.MessageDigest.getInstance("MD5")
      def sign(i: Int, j: Int): Long = {
        val hex = md.digest(s"r:$i:$j".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(15)
        if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1L else -1L
      }
      val signs = typedLit(
        (0 until 8).flatMap(j => (0 until 64).map(i => sign(i, j))))
      val lam =
        "transform(sequence(0, 7), j -> " +
          "aggregate(sequence(0, size(embedding) - 1), 0L, (acc, i) -> " +
          "acc + CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000 + 0.5) " +
          "AS BIGINT) * element_at(S, j * 64 + i + 1)))"
      Tables.embeddings(s, d)
        .withColumn("S", signs)
        .select(col("vec_id"), posexplode(expr(lam)))
        .select(col("vec_id"), col("pos").cast("int").as("dim"),
          col("col").as("v"))
        .orderBy("vec_id", "dim")
    }
  )

  /** Shared builder for the l49 DSIR family — one knob set per registry
    * entry, the SAME parameterization emitted into BOTH the Spark pipeline
    * and its DuckDB oracle (the DedupKnobs discipline). `bigrams` switches
    * the feature space from hashed unigrams to hashed adjacent bigrams
    * (DSIR's published hashed-n-gram features); `buckets` is the feature
    * hash width B. The weight table is ≤B rows → broadcast at any knob.
    */
  private def dsirDef(name: String, buckets: Int,
      bigrams: Boolean): QueryDef = {
    val duckFeatures =
      if (!bigrams)
        """SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
          |  FROM documents""".stripMargin
      else
        """SELECT doc_id, source, l[i] || ' ' || l[i + 1] AS w
          |  FROM (SELECT doc_id, source, string_split(text, ' ') AS l,
          |          unnest(generate_series(1,
          |            len(string_split(text, ' ')) - 1)) AS i
          |        FROM documents
          |        WHERE len(string_split(text, ' ')) >= 2) t""".stripMargin
    QueryDef.sql(
      name,
      s"""WITH w AS ($duckFeatures),
         |tk AS (SELECT doc_id, source,
         |    ${PortableHash.duck("w")} % $buckets AS b FROM w),
         |cdb AS (SELECT doc_id, b, count(*) AS c FROM tk GROUP BY 1, 2),
         |cr AS (SELECT b, count(*) AS c_r FROM tk GROUP BY 1),
         |ct AS (SELECT b, count(*) AS c_t FROM tk
         |       WHERE source = 'src0' GROUP BY 1),
         |tot AS (SELECT count(*) AS t_r,
         |    CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS t_t FROM tk),
         |wt AS (SELECT cr.b,
         |    CAST(floor(ln(CAST(coalesce(c_t, 0) + 1 AS DOUBLE))
         |      * 1000000 + 0.5) AS BIGINT)
         |  - CAST(floor(ln(CAST(t_t + $buckets AS DOUBLE))
         |      * 1000000 + 0.5) AS BIGINT)
         |  - CAST(floor(ln(CAST(c_r + 1 AS DOUBLE))
         |      * 1000000 + 0.5) AS BIGINT)
         |  + CAST(floor(ln(CAST(t_r + $buckets AS DOUBLE))
         |      * 1000000 + 0.5) AS BIGINT) AS wm
         |  FROM cr LEFT JOIN ct USING (b) CROSS JOIN tot),
         |sc AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         |    CAST(sum(c * wm) AS BIGINT) AS logw_micro
         |  FROM cdb JOIN wt USING (b) GROUP BY doc_id),
         |rk AS (SELECT *, row_number()
         |    OVER (ORDER BY logw_micro DESC, doc_id) AS rn,
         |    count(*) OVER () AS nn FROM sc)
         |SELECT doc_id, n_tokens, logw_micro, rn * 5 <= nn AS selected
         |FROM rk ORDER BY doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val feats =
        if (!bigrams)
          Tables.documents(s, d)
            .select(col("doc_id"), col("source"),
              explode(split(col("text"), " ")).as("w"))
        else
          Tables.documents(s, d)
            .select(col("doc_id"), col("source"),
              split(col("text"), " ").as("l"))
            .filter(size(col("l")) >= 2)
            .select(col("doc_id"), col("source"), explode(expr(
              "transform(sequence(0, size(l) - 2)," +
                " i -> concat(l[i], ' ', l[i + 1]))")).as("w"))
      val tk = feats
        .select(col("doc_id"), col("source"),
          pmod(PortableHash.spark(col("w")), lit(buckets.toLong)).as("b"))
        .localCheckpoint() // 4 consumers of the featurized relation
      val cdb = tk.groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
      val cr = tk.groupBy("b").agg(count(lit(1)).as("c_r"))
      val ct = tk.filter(col("source") === "src0")
        .groupBy("b").agg(count(lit(1)).as("c_t"))
      val tot = tk.agg(count(lit(1)).as("t_r"),
        sum(when(col("source") === "src0", 1L).otherwise(0L)).as("t_t"))
      def q6(c: Column): Column =
        floor(log(c.cast("double")) * lit(1000000.0) + lit(0.5)).cast("long")
      val wt = cr.join(ct, Seq("b"), "left_outer")
        .crossJoin(broadcast(tot))
        .select(col("b"),
          (q6(coalesce(col("c_t"), lit(0L)) + lit(1)) -
            q6(col("t_t") + lit(buckets)) -
            q6(col("c_r") + lit(1)) +
            q6(col("t_r") + lit(buckets))).as("wm"))
      val sc = cdb.join(broadcast(wt), "b")
        .groupBy("doc_id")
        .agg(sum("c").as("n_tokens"),
          sum(col("c") * col("wm")).as("logw_micro"))
        .localCheckpoint() // reused by the rank pass and the final join
      val n = sc.count()
      val ranked = sc
        .repartitionByRange(col("logw_micro").desc, col("doc_id"))
        .sortWithinPartitions(col("logw_micro").desc, col("doc_id"))
        .select("doc_id")
        .rdd.zipWithIndex()
        .map { case (r, i) => (r.getLong(0), i + 1) }
        .toDF("doc_id", "rn")
      sc.join(ranked, "doc_id")
        .select(col("doc_id"), col("n_tokens"), col("logw_micro"),
          (col("rn") * 5 <= lit(n)).as("selected"))
        .orderBy("doc_id")
    }
  }

  /** DuckDB mirror of quality-ranked canonical selection: cluster via the
    * recursive-CTE closure (as duckDedupOutputSql), then the per-cluster
    * pick by (quality DESC, doc_id ASC) — the same total order the Spark
    * side's lexicographic struct max (quality, −doc_id) induces.
    */
  private lazy val duckBestOfClusterSql: String =
    s"""WITH RECURSIVE ${duckPairsCtes()},
       |bi AS (SELECT doc_a AS s, doc_b AS t FROM pairs
       |       UNION ALL SELECT doc_b, doc_a FROM pairs),
       |reach(start, node) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT r.start, e.t FROM reach r JOIN bi e ON r.node = e.s),
       |cl AS (SELECT start AS doc_id, min(node) AS cluster_id
       |       FROM reach GROUP BY start),
       |q AS (SELECT doc_id, $duckQualityExpr AS quality FROM documents),
       |ranked AS (SELECT cl.cluster_id, cl.doc_id, q.quality,
       |    row_number() OVER (PARTITION BY cl.cluster_id
       |      ORDER BY q.quality DESC, cl.doc_id) AS rn
       |  FROM cl JOIN q USING (doc_id))
       |SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
       |  CAST(doc_id AS BIGINT) AS doc_id, quality
       |FROM ranked WHERE rn = 1 ORDER BY cluster_id""".stripMargin

  /** DuckDB mirror of [[qualityCol]] (shared by l8 and l47). */
  private lazy val duckQualityExpr: String =
    """floor((
      |  least(CAST(1.0 AS DOUBLE), CAST(len(string_split(text, ' ')) AS DOUBLE)
      |    / CAST(200 AS DOUBLE)) * CAST(0.5 AS DOUBLE)
      |  + (CAST(len(list_filter(string_split(text, ' '),
      |      t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
      |     / CAST(len(string_split(text, ' ')) AS DOUBLE)) * CAST(3.0 AS DOUBLE)
      |  + (CAST(1.0 AS DOUBLE) - least(CAST(1.0 AS DOUBLE),
      |      CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE) * CAST(10.0 AS DOUBLE)
      |        / CAST(length(text) AS DOUBLE))) * CAST(0.2 AS DOUBLE)
      |  ) * 1000000 + 0.5) / CAST(1000000 AS DOUBLE)""".stripMargin

  /** The l8 quality score as a reusable column (exact micro-quantized
    * combination of length, stopword-ratio, and punctuation terms).
    */
  private def qualityCol: org.apache.spark.sql.Column = {
    val nTok = size(split(col("text"), " ")).cast("double")
    val nStop = expr("size(filter(split(text, ' ')," +
      " t -> t IN ('the', 'a', 'of', 'and', 'to')))").cast("double")
    val nPunct = expr("size(regexp_extract_all(text, '[.,!?;:]', 0))")
      .cast("double")
    graft.Det.portableRound(
      least(lit(1.0), nTok / lit(200.0)) * lit(0.5) +
        (nStop / nTok) * lit(3.0) +
        (lit(1.0) - least(lit(1.0),
          nPunct * lit(10.0) / length(col("text")).cast("double"))) *
          lit(0.2), 6)
  }

  /** Spark side of the MinHash+LSH candidate-pair pipeline (shared by the
    * pair query and duplicate clustering).
    */
  /** `preShingled`: a caller that already materialized the shingle
    * relation (l34's verify path needs it for the exact-Jaccard joins)
    * passes it in, so the scan+explode+distinct frontend runs once per
    * query instead of once per consumer.
    */
  private def minhashPairs(s: SparkSession, d: String,
      kn: DedupKnobs = TK, preShingled: Option[DataFrame] = None)
      : DataFrame = {
    val sh = preShingled.getOrElse(shingles(s, d))
      .select(col("doc_id"), (PortableHash.spark(col("s")) % P).as("hb"))
    val minCols = (0 until kn.seeds).map(k =>
      min((lit(hashA(k)) * col("hb") + hashB(k)) % P).as(s"h$k"))
    val sig = sh.groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
    val rowsPerBand = kn.seeds / kn.bands
    // one band-key array + posexplode, NOT a union of per-band selects: a
    // union re-runs the whole scan+hash+aggregate pipeline per band
    val bandKeys = array((0 until kn.bands).map { b =>
      md5(concat_ws("_", (0 until rowsPerBand).map(r =>
        col(s"h${b * rowsPerBand + r}").cast("string")): _*))
    }: _*)
    // bands are tiny (BANDS rows/doc of 32-char keys) — materialize once
    // so the self-join below doesn't re-run the scan+hash pipeline per side
    val bands = sig.select(col("doc_id"), posexplode(bandKeys))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("bkey"))
      .localCheckpoint()
    // bucket join: only docs agreeing on a full band ever meet — this is
    // the 100-TB path (shuffle by (band, bkey), no all-pairs compare)
    val a = bands.select(col("band"), col("bkey"), col("doc_id").as("doc_a"))
    val b = bands.select(col("band").as("band_b"), col("bkey").as("bkey_b"),
      col("doc_id").as("doc_b"))
    a.join(b, col("band") === col("band_b") && col("bkey") === col("bkey_b") &&
        col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** Shared DuckDB CTE chain ending in a `pairs(doc_a, doc_b)` relation. */
  private def duckPairsCtes(kn: DedupKnobs = TK): String = {
    val mins = (0 until kn.seeds).map(k =>
      s"min((${hashA(k)} * hb + ${hashB(k)}) % $P) AS h$k").mkString(",\n  ")
    val rowsPerBand = kn.seeds / kn.bands
    val bands = (0 until kn.bands).map { b =>
      val key = (0 until rowsPerBand)
        .map(r => s"CAST(h${b * rowsPerBand + r} AS VARCHAR)")
        .mkString("concat_ws('_', ", ", ", ")")
      s"SELECT doc_id, $b AS band, md5($key) AS bkey FROM sig"
    }.mkString("\n  UNION ALL\n  ")
    s"""sh AS ($duckShingles),
       |hs AS (SELECT doc_id, ${PortableHash.duck("s")} % $P AS hb FROM sh),
       |sig AS (SELECT doc_id,
       |  $mins
       |FROM hs GROUP BY doc_id),
       |bands AS (
       |  $bands),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id)""".stripMargin
  }

  /** DuckDB mirror of the MinHash+LSH pipeline, generated from the same
    * SEEDS/BANDS constants as the Spark side.
    */
  private def duckMinhashSql(kn: DedupKnobs = TK): String =
    s"""WITH ${duckPairsCtes(kn)}
       |SELECT doc_a, doc_b FROM pairs ORDER BY doc_a, doc_b""".stripMargin

  /** DuckDB mirror of the dedup output: canonical docs joined back to the
    * corpus, grouped by language.
    */
  private lazy val duckDedupOutputSql: String =
    s"""WITH RECURSIVE ${duckPairsCtes()},
       |bi AS (SELECT doc_a AS s, doc_b AS t FROM pairs
       |       UNION ALL SELECT doc_b, doc_a FROM pairs),
       |reach(start, node) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT r.start, e.t FROM reach r JOIN bi e ON r.node = e.s),
       |canon AS (SELECT start AS doc_id FROM reach
       |          GROUP BY start HAVING start = min(node))
       |SELECT lang, count(*) AS n_docs_kept
       |FROM documents JOIN canon USING (doc_id)
       |GROUP BY lang ORDER BY lang""".stripMargin

  /** DuckDB mirror of duplicate clustering: transitive closure over the
    * candidate pairs via a recursive CTE, cluster id = min reachable doc.
    */
  private lazy val duckDupClustersSql: String =
    s"""WITH RECURSIVE ${duckPairsCtes()},
       |bi AS (SELECT doc_a AS s, doc_b AS t FROM pairs
       |       UNION ALL SELECT doc_b, doc_a FROM pairs),
       |reach(start, node) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT r.start, e.t FROM reach r JOIN bi e ON r.node = e.s)
       |SELECT start AS doc_id, CAST(min(node) AS BIGINT) AS cluster_id,
       |  (start = min(node)) AS is_canonical
       |FROM reach GROUP BY start ORDER BY doc_id""".stripMargin

  /** DuckDB mirror of the 32-bit SimHash. */
  /** (doc_id, 32-bit simhash) — shared by the fingerprint query and the
    * banded near-dup pair search.
    */
  private def simhashDf(s: SparkSession, d: String,
      kn: DedupKnobs = TK): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .withColumn("h", PortableHash.spark(col("tok")))
    val sumCols = (0 until kn.simBits).map(j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"s$j"))
    val sums = toks.groupBy("doc_id").agg(sumCols.head, sumCols.tail: _*)
    // the bit terms are summed low-to-high, so every partial sum fits in a
    // long even at simBits=64 (positives total ≤ 2^63-1 before the final
    // sign-bit term, which is Long.MinValue) — no ANSI overflow
    val fp = (0 until kn.simBits).map(j =>
      when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _)
    sums.select(col("doc_id"), fp.as("simhash"))
  }

  private def duckSimhashCore(kn: DedupKnobs = TK): String = {
    val h = PortableHash.duck("tok")
    val sums = (0 until kn.simBits).map(j =>
      s"sum(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS s$j")
      .mkString(",\n  ")
    // left-assoc addition in the same low-to-high order as the Spark side:
    // partial sums never exceed BIGINT range even with the 2^63 sign term
    // (interpolated as the negative literal -9223372036854775808)
    val fp = (0 until kn.simBits).map(j =>
      s"(CASE WHEN s$j > 0 THEN CAST(${1L << j} AS BIGINT) ELSE 0 END)")
      .mkString(" + ")
    s"""WITH toks AS (SELECT doc_id, $h AS h
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
       |        FROM documents) t),
       |sums AS (SELECT doc_id,
       |  $sums
       |FROM toks GROUP BY doc_id)
       |SELECT doc_id, CAST($fp AS BIGINT) AS simhash
       |FROM sums""".stripMargin
  }

  private lazy val duckSimhashSql: String =
    duckSimhashCore() + "\nORDER BY doc_id"

  /** SimHash near-dup pairs at Hamming ≤ 3, banded candidate search.
    *
    * 4 bands of `simBandBits` bits each: a pair within Hamming distance 3
    * differs in ≤3 bit positions, so by pigeonhole at least one band
    * matches exactly — the band equi-join has FULL recall at this
    * threshold and never goes all-pairs. The verify step is the codegen'd
    * `graft_hamming` (popcount-of-xor) native expression. Production
    * sizing: 8-bit bands give only 256 buckets per band, so a billion-doc
    * corpus would pack ~4M docs per bucket and the bucket join degrades
    * toward quadratic; [[DedupKnobs.Production]] widens the fingerprint to
    * 64 bits and bands to 16 bits (65536 buckets/band), keeping the
    * pigeonhole guarantee at the same threshold. The band key masks with
    * `& (2^W - 1)` rather than `%` so the sign bit of a 64-bit fingerprint
    * can't produce negative band values.
    */
  private def simhashPairs(s: SparkSession, d: String,
      kn: DedupKnobs): DataFrame = {
    graft.functions.HammingDistance.register(s)
    val w = kn.simBandBits
    val mask = (1L << w) - 1L
    val fps = simhashDf(s, d, kn)
    def banded(idCol: String, fpCol: String): DataFrame =
      fps.select(col("doc_id").as(idCol), col("simhash").as(fpCol))
        .withColumn("band", explode(expr(
          s"transform(sequence(0, 3)," +
            s" b -> concat(b, ':', shiftright($fpCol, b * $w) & $mask))")))
    banded("doc_a", "fp_a").join(banded("doc_b", "fp_b"), Seq("band"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "fp_a", "doc_b", "fp_b").distinct()
      .withColumn("hamming", expr("graft_hamming(fp_a, fp_b)"))
      .filter(col("hamming") <= 3)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }

  /** Oracle for [[simhashPairs]]: near-dup pairs at Hamming ≤ 3 derived by
    * brute force over all pairs (the engine only meets candidates inside a
    * band bucket — same result set, sub-quadratic plan).
    */
  private def duckSimhashPairsSql(kn: DedupKnobs = TK): String =
    s"""WITH fp AS (${duckSimhashCore(kn)}),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    bit_count(xor(a.simhash, b.simhash)) AS hamming
       |  FROM fp a JOIN fp b ON a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, CAST(hamming AS INT) AS hamming
       |FROM pairs WHERE hamming <= 3
       |ORDER BY doc_a, doc_b""".stripMargin

  /** N-gram Jaccard similarity over an inverted-index join on shared
    * shingles — never all-pairs. A stopword shingle shared by k docs
    * contributes k² join rows, so without a DF cap one common trigram
    * turns the self-join quadratic at corpus scale; posting lists are
    * capped first (the standard near-dup-pipeline guard), and Jaccard is
    * computed over the capped shingle space on both engines. The hot set
    * is tiny by construction (only shingles with DF > cap) — broadcast
    * anti-join, no extra shuffle of the full shingle stream.
    */
  private def ngramJaccard(s: SparkSession, d: String,
      kn: DedupKnobs): DataFrame = {
    // the shingle relation feeds the hot-set aggregate, the per-doc size
    // aggregate, and BOTH sides of the pair join; those consumers'
    // exchanges don't canonicalize equal, so without materialization the
    // scan+split+explode+distinct frontend re-executes up to 8× (measured:
    // 8 parquet scans in one executed plan, 7.4s cold at sf0.1 → 2.9s
    // with the checkpoint). Same move as minhashPairs' bands.
    val sh0 = shingles(s, d).localCheckpoint()
    val hot = sh0.groupBy("s").agg(count(lit(1)).as("df"))
      .filter(col("df") > kn.jaccardDfCap).select("s")
    // NOT checkpointed (measured r18): the four consumers' replays of
    // this anti-join already collapse into runtime ReusedExchange under
    // AQE — shuffle bytes are identical with and without a checkpoint
    // here, and a second O(corpus) checkpoint would pin executor memory
    // at scale for nothing
    val sh = sh0.join(broadcast(hot), Seq("s"), "left_anti")
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val pairs = sh.select(col("doc_id").as("doc_a"), col("s"))
      .join(sh.select(col("doc_id").as("doc_b"), col("s")), "s")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared"))
    val jac = col("shared").cast("double") /
      (col("na") + col("nb") - col("shared")).cast("double")
    pairs
      .join(sz.select(col("doc_id"), col("n").as("na")),
        col("doc_a") === col("doc_id")).drop("doc_id")
      .join(sz.select(col("doc_id"), col("n").as("nb")),
        col("doc_b") === col("doc_id")).drop("doc_id")
      .filter(jac >= 0.1)
      .select(col("doc_a"), col("doc_b"),
        graft.Det.portableRound(jac, 6).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  private def duckNgramJaccardSql(kn: DedupKnobs = TK): String =
    s"""WITH sh0 AS ($duckShingles),
       |hot AS (SELECT s FROM sh0 GROUP BY s
       |        HAVING count(*) > ${kn.jaccardDfCap}),
       |sh AS (SELECT * FROM sh0 ANTI JOIN hot USING (s)),
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id)
       |SELECT doc_a, doc_b,
       |  ${graft.Det.duckPortableRound(
          "CAST(shared AS DOUBLE) / CAST(sa.n + sb.n - shared AS DOUBLE)",
          6)} AS jaccard
       |FROM pairs JOIN sz sa ON doc_a = sa.doc_id
       |           JOIN sz sb ON doc_b = sb.doc_id
       |WHERE CAST(shared AS DOUBLE) / CAST(sa.n + sb.n - shared AS DOUBLE)
       |      >= 0.1
       |ORDER BY doc_a, doc_b""".stripMargin

  private lazy val duckLangIdSql: String = {
    val hitCols = LangId.stopwords.map { case (lang, words) =>
      s"len(list_filter(string_split(text, ' '), t -> t IN (${words
        .map(w => s"'$w'").mkString(", ")}))) AS hits_$lang"
    }.mkString(",\n  ")
    val pred = LangId.caseChainSql(l => s"hits_$l")
    s"""WITH h AS (SELECT doc_id, lang,
       |  $hitCols
       |FROM documents)
       |SELECT doc_id, $pred AS pred_lang,
       |  ($pred = lang) AS is_correct
       |FROM h ORDER BY doc_id""".stripMargin
  }
}

/** Tiny n-gram/stopword language-ID heuristic shared by the Spark query and
  * its DuckDB oracle. Priority order resolves ties deterministically.
  */
object LangId {
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a"),
    "de" -> Seq("der", "und", "die", "das", "ist"),
    "es" -> Seq("el", "la", "de", "y", "que"),
    "fr" -> Seq("le", "et", "les", "des", "une"),
    "zh" -> Seq("的", "是", "不", "了", "在"))

  private val langs = stopwords.map(_._1)

  /** first lang (in priority order) whose hit count ties-or-beats the rest */
  def caseChain(hits: String => Column): Column =
    langs.init.reverse.foldLeft(lit(langs.last)) { (elseCol, l) =>
      val ge = langs.filterNot(_ == l)
        .map(o => hits(l) >= hits(o)).reduce(_ && _)
      when(ge, lit(l)).otherwise(elseCol)
    }

  def caseChainSql(hits: String => String): String = {
    val whens = langs.init.map { l =>
      val ge = langs.filterNot(_ == l)
        .map(o => s"${hits(l)} >= ${hits(o)}").mkString(" AND ")
      s"WHEN $ge THEN '$l'"
    }.mkString(" ")
    s"(CASE $whens ELSE '${langs.last}' END)"
  }
}
