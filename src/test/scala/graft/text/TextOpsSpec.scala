package graft.text

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.functions._

/** Behavioral checks for the LLM-pipeline operators beyond the oracle
  * hash-compare: the dedup family must actually FIND planted duplicates.
  */
class TextOpsSpec extends SparkSpec {

  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))

  private def withDocs(df: org.apache.spark.sql.DataFrame)(
      body: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("textops").toString
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // satisfy loaders that touch other tables
    spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    body(dir)
  }

  test("minhash LSH finds a near-duplicate pair, skips unrelated docs") {
    // inputs chosen so the near-dup pair shares a full LSH band under the
    // fixed md5 seed family (verified against the oracle-side simulation)
    val base = ("alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra tango " +
      "uniform victor whiskey xray yankee zulu one two three four five six " +
      "seven eight nine ten eleven twelve thirteen fourteen")
    val nearDup = base + " fifteen"
    val other = "completely different content about spark engines " +
      "and distributed query processing with columnar storage formats " +
      "arranged for scale"
    withDocs(docs(1L -> base, 2L -> nearDup, 3L -> other)) { dir =>
      val pairs = SparkEntry.queries("l2_minhash_lsh")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((1L, 2L)), s"missing near-dup pair: $pairs")
      assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    }
  }

  test("ngram jaccard scores the planted pair high") {
    val base = ("alpha beta gamma delta epsilon zeta eta theta " * 4).trim
    withDocs(docs(1L -> base, 2L -> (base + " iota"),
      3L -> "unrelated words entirely disjoint vocabulary here now")) { dir =>
      val rows = SparkEntry.queries("l2c_ngram_jaccard")(spark, dir).collect()
      val planted = rows.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
      assert(planted.isDefined)
      assert(planted.get.getAs[Double]("jaccard") > 0.8)
    }
  }

  test("exact dedup counts duplicates") {
    withDocs(docs(1L -> "same text", 2L -> "same text", 3L -> "different")) {
      dir =>
        val r = SparkEntry.queries("l1_exact_dedup")(spark, dir).collect()
        assert(r.head.getAs[Long]("n_docs") == 3)
        assert(r.head.getAs[Long]("n_uniq") == 2)
        assert(r.head.getAs[Long]("n_dups") == 1)
    }
  }

  test("simhash: identical docs share fingerprints, disjoint docs differ") {
    withDocs(docs(1L -> "alpha beta gamma", 2L -> "alpha beta gamma",
      3L -> "totally disjoint vocabulary set")) { dir =>
      val fp = SparkEntry.queries("l2b_simhash")(spark, dir)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fp(1L) == fp(2L))
      assert(fp(1L) != fp(3L))
    }
  }

  test("cosine top-k ranks an identical vector first") {
    val dir = java.nio.file.Files.createTempDirectory("vec").toString
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (5L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0), // identical to query 0
      (6L, Array(0.9f, 0.1f, 0.0f, 0.0f), 0),
      (7L, Array(0.0f, 1.0f, 0.0f, 0.0f), 1))
      .toDF("vec_id", "embedding", "label")
    emb.coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val top = SparkEntry.queries("l3_cosine_topk")(spark, dir)
      .filter(col("q_id") === 0 && col("rn") === 1).collect().head
    assert(top.getAs[Long]("neighbor_id") == 5L)
    assert(math.abs(top.getAs[Double]("sim") - 1.0) < 1e-6)
  }

  test("IVF ANN: exact sims, full result set, recall@3 beats random probing") {
    val dir = sf("sf0.01")
    val ivf = SparkEntry.queries("l18_ivf_ann")(spark, dir).collect()
    // brute-force ground truth over the same 10 queries
    val bf = SparkEntry.queries("l3_cosine_topk")(spark, dir)
      .filter(col("q_id") < 10 && col("rn") <= 3).collect()
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))
    val bfSims = bf.map(r => key(r) -> r.getAs[Double]("sim")).toMap
    // 3 candidates for every query (probed cells never run dry here)
    assert(ivf.length == 30)
    // an IVF hit is a real vector scored exactly — where a reported pair is
    // also in the exact top-3, the similarity must agree to the rounding
    ivf.foreach { r =>
      bfSims.get(key(r)).foreach { s =>
        assert(math.abs(s - r.getAs[Double]("sim")) < 1e-9)
      }
    }
    // recall: probing 2 of 8 cells blindly would find ~25% of true
    // neighbors; the coarse quantizer must do better than chance
    val recall = ivf.map(key).count(bfSims.contains).toDouble / bf.length
    assert(recall >= 0.3, s"recall@3 $recall below 0.3")
  }

  test("langid heuristic picks the language with most stopword hits") {
    withDocs(docs(1L -> "the cat and the dog of the town",
      2L -> "der hund und die katze ist hier")) { dir =>
      val got = SparkEntry.queries("l7_langid")(spark, dir)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got(1L) == "en")
      assert(got(2L) == "de")
    }
  }

  test("LM perplexity scores common-bigram docs below rare-bigram docs") {
    // doc 1 cycles one bigram pair (high training counts → low NLL);
    // doc 2 is all first-occurrence bigrams (count 1 → high NLL)
    withDocs(docs(
      1L -> "x y x y x y x y x y x y x y x y",
      2L -> "q w e r t z u i o p a s d f g h")) { dir =>
      val got = SparkEntry.queries("l38_lm_perplexity")(spark, dir)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      assert(got(1L) < got(2L),
        s"common-bigram doc must score lower NLL: $got")
      assert(got.values.forall(_ > 0.0)) // smoothed probs are < 1
    }
  }

  test("domain cap keeps exactly 5 per source at the length threshold") {
    // 7 docs, lengths strictly decreasing with doc_id — the 5 longest are
    // kept and the admission threshold is the 5th length
    val rows = (1L to 7L).map(i => i -> ("w " * (20 - i.toInt)).trim)
    withDocs(docs(rows: _*)) { dir =>
      val r = SparkEntry.queries("l39_domain_cap")(spark, dir)
        .collect().head
      assert(r.getAs[Long]("n_kept") == 5L)
      assert(r.getAs[Long]("n_dropped") == 2L)
      val fifthLen = ("w " * 15).trim.length.toLong
      assert(r.getAs[Long]("min_kept_chars") == fifthLen)
    }
  }

  test("slice drift: a source matching the corpus mix scores ~0, a " +
      "disjoint-vocabulary slice scores high") {
    import spark.implicits._
    def srcDocs(rows: (Long, String, String)*) =
      rows.toDF("doc_id", "text", "source")
        .withColumn("lang", lit("en"))
        .withColumn("n_chars", length(col("text")).cast("long"))
    // two sources with IDENTICAL distributions: each IS the corpus mix,
    // so KL must vanish up to micro-quantization noise
    withDocs(srcDocs((1L, "a a b c", "sA"), (2L, "a a b c", "sB"))) { dir =>
      val kl = SparkEntry.queries("l40_slice_drift")(spark, dir)
        .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
      assert(math.abs(kl("sA")) < 1e-4 && math.abs(kl("sB")) < 1e-4,
        kl.toString)
    }
    // a small slice whose vocabulary the corpus has never seen: its
    // tokens are corpus-rare, so KL(slice ‖ corpus) ≈ ln(N/(2·c_w)) ≫ 0
    // while the dominant slice stays near the mix it defines
    val dominant = ("a b " * 8).trim
    withDocs(srcDocs((1L, dominant, "sA"), (2L, "qq ww", "sC"))) { dir =>
      val kl = SparkEntry.queries("l40_slice_drift")(spark, dir)
        .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
      assert(kl("sC") > 1.0, kl.toString)
      assert(kl("sA") < 0.2, kl.toString)
      assert(kl("sC") > kl("sA") + 0.8, kl.toString)
    }
  }

  test("temperature mix flattens the head language and boosts the tail") {
    import spark.implicits._
    val rows = (1L to 9L).map(i => (i, "hello world", "en")) :+
      ((10L, "bonjour monde", "fr"))
    val df = rows.toDF("doc_id", "text", "lang")
      .withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    withDocs(df) { dir =>
      val got = SparkEntry.queries("l42_temperature_mix")(spark, dir)
        .collect().map(r => r.getString(0) -> r).toMap
      // α < 1 moves both languages toward uniform: en sampled below its
      // 90% share, fr above its 10%
      assert(got("en").getAs[Double]("boost") < 1.0)
      assert(got("fr").getAs[Double]("boost") > 1.0)
      val pSum = got.values.map(_.getAs[Double]("p_sample")).sum
      assert(math.abs(pSum - 1.0) < 1e-9)
      val targets = got.values.map(_.getAs[Long]("target_docs")).sum
      assert(math.abs(targets - 1000L) <= 1) // floor(+0.5) per language
    }
  }

  test("bpe pair merge counts overlapping pairs weighted by word frequency") {
    withDocs(docs(1L -> "low low lower", 2L -> "aaa")) { dir =>
      val got = SparkEntry.queries("l43_bpe_pair_merge")(spark, dir)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // low×2 + lower×1 → lo/ow = 3; lower alone → we/er = 1;
      // 'aaa' → the overlapping 'aa' pair counts per POSITION (2)
      assert(got("lo") == 3L && got("ow") == 3L, got.toString)
      assert(got("we") == 1L && got("er") == 1L)
      assert(got("aa") == 2L)
    }
  }

  test("semdedup keeps the min-id representative per similarity group " +
      "and never compares across clusters") {
    val dir = java.nio.file.Files.createTempDirectory("semdedup").toString
    // cluster 0: v1 == v2 (cos 1), v3 near v1 (cos ≈ .99) — both drop to
    // the min-id representative v1. cluster 1: two ORTHOGONAL vectors —
    // same cluster, similarity 0, both kept (the threshold does the
    // pruning, not the clustering). v4/v5 are also dissimilar to v1-v3,
    // so any cross-cluster comparison would change nothing here — the
    // cluster isolation is what keeps the pair search sub-quadratic, and
    // the within-cluster zero-similarity pair proves pruning ≠ bucketing.
    val emb = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (2L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (3L, Array(0.9f, 0.1f, 0.0f, 0.0f), 0),
      (4L, Array(0.0f, 1.0f, 0.0f, 0.0f), 1),
      (5L, Array(0.0f, 0.0f, 1.0f, 0.0f), 1))
      .toDF("vec_id", "embedding", "label")
    emb.coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val got = SparkEntry.queries("l41_semdedup")(spark, dir)
      .collect().map(r => r.getInt(0) ->
        (r.getAs[Long]("n_total"), r.getAs[Long]("n_dropped"),
          r.getAs[Long]("n_kept"))).toMap
    assert(got(0) == ((3L, 2L, 1L)), got.toString)
    assert(got(1) == ((2L, 0L, 2L)), got.toString)
  }

  test("hard negatives exclude same-label vectors and rank by similarity") {
    val dir = java.nio.file.Files.createTempDirectory("hneg").toString
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0), // the probe
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0), // identical but SAME label
      (2L, Array(0.9f, 0.1f, 0.0f, 0.0f), 1), // hardest negative
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f), 1), // orthogonal
      (4L, Array(0.5f, 0.5f, 0.0f, 0.0f), 2)) // middle
      .toDF("vec_id", "embedding", "label")
    emb.coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val got = SparkEntry.queries("l44_hard_negatives")(spark, dir)
      .filter(col("q_id") === 0).orderBy("rn").collect()
      .map(r => (r.getAs[Int]("rn"), r.getAs[Long]("neighbor_id")))
    // the same-label twin (vec 1) must never appear; order = sim desc
    assert(got.toSeq == Seq((1, 2L), (2, 4L), (3, 3L)), got.mkString(","))
  }

  test("head coverage: hand-computed type census and top-10 mass") {
    val dir = java.nio.file.Files.createTempDirectory("headcov").toString
    // source B: type 'z' ×5 + 12 singleton types → 17 tokens, 13 types,
    // top-10 = z(5) + 9 singletons = 14 → 14/17 = 0.823529
    val singles = ('a' to 'l').mkString(" ")
    Seq((1L, "z z z z z " + singles, "en", "B", 0L),
      (2L, "a a a b", "en", "A", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("l45_head_coverage")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_types"),
          r.getAs[Double]("head_coverage"))).toMap
    assert(got("A") == ((4L, 2L, 1.0)), got.toString)
    assert(got("B") == ((17L, 13L, 0.823529)), got.toString)
  }

  test("embedding dispersion matches the naive pairwise computation") {
    val dir = java.nio.file.Files.createTempDirectory("disp").toString
    // label 0: (1,0),(0,1),(1,1) → pair sq dists 2, 1, 1 → mean 4/3
    // label 1: two identical vectors → 0
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(0.0f, 1.0f), 0),
      (2L, Array(1.0f, 1.0f), 0),
      (3L, Array(0.25f, 0.75f), 1),
      (4L, Array(0.25f, 0.75f), 1))
      .toDF("vec_id", "embedding", "label")
    emb.coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val got = SparkEntry.queries("l46_embedding_dispersion")(spark, dir)
      .collect().map(r => r.getInt(0) ->
        (r.getAs[Long]("n"), r.getAs[Double]("mean_pair_sqdist"))).toMap
    assert(got(0) == ((3L, 1.333333)), got.toString)
    assert(got(1) == ((2L, 0.0)), got.toString)
  }

  test("dup-span removal excises exactly the cross-doc shared span") {
    // docs 1 and 2 share one 8-token span at different offsets; doc 3 is
    // unique; doc 4 is shorter than a window and must pass through whole
    val span = "s1 s2 s3 s4 s5 s6 s7 s8"
    withDocs(docs(
      1L -> s"$span x y z",
      2L -> s"p q $span r",
      3L -> "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10",
      4L -> "tiny doc here")) { dir =>
      val got = SparkEntry.queries("l56_dup_span_removal")(spark, dir)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      assert(got(1L) == ((11L, 8L, "x y z")), got.toString)
      assert(got(2L) == ((11L, 8L, "p q r")), got.toString)
      assert(got(3L) == ((10L, 0L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10")),
        got.toString)
      assert(got(4L) == ((3L, 0L, "tiny doc here")), got.toString)
    }
  }

  test("dup-span removal empties a document that is one shared span") {
    // doc 1 IS the shared window — every position covered, cleaned = ""
    val span = "c1 c2 c3 c4 c5 c6 c7 c8"
    withDocs(docs(1L -> span, 2L -> s"lead $span tail")) { dir =>
      val got = SparkEntry.queries("l56_dup_span_removal")(spark, dir)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      assert(got(1L) == ((8L, 8L, "")), got.toString)
      assert(got(2L) == ((10L, 8L, "lead tail")), got.toString)
    }
  }
}
