package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.{RollingMinHash, Text}

/** Semantic verification for the hash-family operators that have no DuckDB
  * oracle (engine-specific hash functions): planted ground truth + recall
  * against the exact methods. */
class DedupSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "the quick brown fox jumps over the lazy dog again and again tonight"), // near-dup of 1
    (3L, "THE  quick brown fox jumps over the lazy dog again and again today"), // exact-dup of 1 mod case/ws
    (4L, "completely different content about spark catalyst optimizer rules"),
    (5L, "completely different content about spark catalyst optimizer rules"), // exact dup of 4
    (6L, "unrelated text with nothing shared at all zebra xylophone quartz")
  ).toDF("doc_id", "text")

  test("exact dedup collapses case/whitespace variants via fingerprint") {
    val r = Dedup.exact(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    // 1≡3 and 4≡5 collapse: 4 distinct fingerprints, reps are min ids
    assert(r.length == 4)
    val byId = r.map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(byId(1L) == 2 && byId(4L) == 2 && byId(2L) == 1 && byId(6L) == 1)
  }

  test("ngram jaccard finds the near-dup pair with high score") {
    val r = Dedup.ngramJaccard(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
    val pairs = r.map(p => (p._1, p._2)).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)) &&
      pairs.contains((4L, 5L)))
    assert(!pairs.exists(p => p._1 == 6L || p._2 == 6L))
    assert(r.find(p => p._1 == 4L && p._2 == 5L).get._3 == 1.0) // identical
  }

  test("prefix filtering is lossless: equals the naive all-pairs join") {
    import org.apache.spark.sql.functions._
    // naive quadratic-candidate version (the pre-optimization semantics)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val sh = docs
      .select(col("doc_id").as("id"),
        array_distinct(graft.functions.Text.shingles(col("text"), 3))
          .as("shs"))
      .select(col("id"), size(col("shs")).as("n_sh"),
        explode(col("shs")).as("sh0"))
      .select(col("id"), col("n_sh"), xxhash64(col("sh0")).as("sh"))
    val joined = sh.as("a").join(sh.as("b"),
      col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
    val naive = joined
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.n_sh").as("na"), col("b.n_sh").as("nb"))
      .agg(count(lit(1)).as("inter"))
      .filter(col("inter").cast("double") /
        (col("na") + col("nb") - col("inter")).cast("double") >= 0.5)
      .select(col("id_a"), col("id_b"))
    val filtered = Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.5)
      .select(col("id_a"), col("id_b"))
    assert(filtered.exceptAll(naive).isEmpty &&
      naive.exceptAll(filtered).isEmpty,
      "prefix filter must drop only sub-threshold pairs")
  }

  test("minhash LSH recovers what exact jaccard finds (on planted dups)") {
    val exact = Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLsh(docs, "doc_id", "text", 3, 32, 8, 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // candidates are verified with exact jaccard, so LSH ⊆ exact …
    assert(lsh.subsetOf(exact))
    // … and at these signature sizes the planted near-dups all survive
    assert(lsh == exact)
  }

  test("minhash LSH at corpus scale: subset of exact with high recall") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val exact = Dedup.ngramJaccard(d, "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLsh(d, "doc_id", "text", 3, 32, 8, 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact))
    assert(exact.isEmpty || lsh.size.toDouble / exact.size >= 0.8,
      s"LSH recall ${lsh.size}/${exact.size}")
  }

  test("simhash: exact dups at hamming 0, near-dups close, unrelated far") {
    val sig = Dedup.simhashSignatures(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(4L) == sig(5L)) // identical text → identical simhash
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sig(1L), sig(2L)) <= 6)  // near-dup
    assert(ham(sig(1L), sig(6L)) > 10)  // unrelated
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((4L, 5L)))
    assert(!pairs.exists(p => p._1 == 6L || p._2 == 6L))
  }

  test("ANN LSH top-k recall vs brute force at sf0.001") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 10)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5))
    val ann = pairs(Similarity.lshTopK(emb, q, "vec_id", "embedding", 64, 5,
      nPlanes = 6, nTables = 4))
    val recall = (exact & ann).size.toDouble / exact.size
    assert(recall >= 0.5, s"ANN recall $recall too low") // bucketed search trade
    assert(ann.size == exact.size)                       // still returns k per query
  }

  test("embedding cosine pairs: LSH subset of brute-force pairs") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet").limit(200)
    val lsh = Dedup.embeddingCosinePairs(emb, "vec_id", "embedding", 64,
      threshold = 0.3, nPlanes = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // verify every reported pair really has cosine >= threshold
    val all = Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", 200)
      .filter(col("cosine") >= 0.3)
      .select("query_id", "cand_id").collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)))).toSet
    assert(lsh.subsetOf(all))
  }

  test("exact cosine pairs equal brute-force-derived ground truth") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet").limit(120)
    val exact = Dedup.embeddingCosineExact(emb, "vec_id", "embedding",
        threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", 120)
      .filter(col("cosine") >= 0.3)
      .select("query_id", "cand_id").collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)))).toSet
    assert(exact == truth)
    // and the LSH path can never exceed its exact twin
    val lsh = Dedup.embeddingCosinePairs(emb, "vec_id", "embedding", 64,
        threshold = 0.3, nPlanes = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact))
  }

  test("rolling min-hash: deterministic, equal for equal, content-sensitive") {
    val r = docs.select(col("doc_id"),
      RollingMinHash.rollingMinHash(col("text"), 8).as("h"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(4L) == r(5L))            // identical strings
    assert(r(1L) != r(6L))            // different content
    assert(RollingMinHash.compute("hello world hello", 8) ==
      RollingMinHash.compute("hello world hello", 8))
    // min-hash over shared windows: a superstring shares the min window
    val base = RollingMinHash.compute("abcdefghij", 4)
    val sup = RollingMinHash.compute("XXabcdefghijYY", 4)
    assert(sup <= base) // superstring's min is over a superset of windows
    // codepoint semantics: equals a direct per-codepoint polynomial min,
    // including non-ASCII (what an ord(substr(...)) SQL oracle computes)
    def refMin(s: String, k: Int): Long = {
      val cps = s.codePoints().toArray
      cps.sliding(k).map(_.foldLeft(0L)((h, c) =>
        (RollingMinHash.mulmod(h, 1000003L) + c) % RollingMinHash.M)).min
    }
    for (s <- Seq("héllo wörld héllo", "日本語のテキストです abc"))
      assert(RollingMinHash.compute(s, 4) == refMin(s, 4))
  }

  test("text functions: tokens, ratios, langid markers") {
    val df = Seq(
      (1L, "el perro la casa de que en los pueblos"),
      (2L, "the cat and the dog of the house"),
      (3L, "der hund und die katze ist nicht hier"),
      (4L, "zzz qqq xxx")).toDF("id", "t")
    val r = df.select(col("id"), Text.langId(col("t")).as("lang"),
      Text.tokenCount(col("t")).as("n")).collect()
      .map(x => x.getLong(0) -> (x.getString(1), x.getInt(2))).toMap
    assert(r(1L)._1 == "es" && r(2L)._1 == "en" && r(3L)._1 == "de")
    assert(r(4L)._1 == "und")
    assert(r(2L)._2 == 8)
    val sw = df.filter(col("id") === 2)
      .select(Text.stopwordRatio(col("t"), Text.defaultStopwords))
      .collect()(0).getDouble(0)
    assert(math.abs(sw - 5.0 / 8.0) < 1e-9) // the, and, the, of, the
  }

  test("multimodal stub: schema, determinism, frame sampling") {
    val df = Seq((1L, "hello world", "s1"), (2L, "other doc", "s2"))
      .toDF("doc_id", "text", "source")
    val withP = Multimodal.attachFakePayload(df, "text")
    assert(withP.schema("payload").dataType.typeName == "binary")
    val mediaFields = withP.schema("media").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fields.map(f => (f.name, f.dataType)).toSeq
    assert(mediaFields ==
      Multimodal.metaSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    val f1 = Multimodal.decodeFeaturesStub(withP, 8)
    assert(f1.schema("features").dataType.typeName == "array")
    val a = f1.orderBy("doc_id").select("features").collect()
      .map(_.getSeq[Float](0))
    val b = Multimodal.decodeFeaturesStub(withP, 8).orderBy("doc_id")
      .select("features").collect().map(_.getSeq[Float](0))
    assert(a.toSeq == b.toSeq) // deterministic
    assert(a(0).length == 8)
    val frames = Multimodal.sampleFrameIndexes(
      Seq((1L, 10)).toDF("id", "n_frames"), "n_frames", 3)
      .select("frame_idx").collect()(0).getSeq[Int](0)
    assert(frames == Seq(0, 3, 6, 9))
  }
}
