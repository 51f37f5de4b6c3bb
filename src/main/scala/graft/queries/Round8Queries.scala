package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.operators.Dedup

/** Eighth batch — the persisted-artifact paths (the "at 100 TB you'd
  * persist the index" half of the scale story, now real code):
  *
  *  - s7: ANN served from a prebuilt cell-partitioned IVF index — the
  *    probe list prunes partitions instead of training at query time;
  *  - d14: incremental cross-corpus dedup against a persisted shingle-set
  *    artifact — the batch run never re-tokenizes the corpus;
  *  - d13b: the *capped* winnowing configuration (the boilerplate guard
  *    that matters at corpus scale) behind the hash gate, cap modeled in
  *    the oracle;
  *  - q75: directed PageRank with dangling-mass redistribution — the
  *    fiddly part of web-graph ranking the undirected q74 sidesteps;
  *  - p21/p22: CSV parity edge cases (RFC-4180 quoted fields with
  *    embedded delimiters/newlines; alternate separator + ISO-8859-1
  *    encoding — reference tools.py:257-258 exposes both knobs).
  *
  * The index artifacts build once per process per sf directory
  * (deterministic content — rebuilds reproduce them bit-for-bit), so the
  * bench's second pass measures pure query cost, which is the deployed
  * shape: build amortizes across every query the artifact serves.
  *
  * Reference scope: LLM-pipeline extensions beyond the reference
  * surface, reachable through its open transform dialect
  * (/root/reference/tools.py:58-65); the CSV knobs mirror the
  * reference's to_csv sep/encoding surface (tools.py:257-258).
  */
object Round8Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def dec(c: org.apache.spark.sql.Column, scale: Int = 4) =
    c.cast(DecimalType(18, scale))
  private def dsum(c: org.apache.spark.sql.Column, scale: Int = 4) =
    sum(dec(c, scale)).cast(DoubleType)

  private def sanitize(dir: String): String =
    dir.replaceAll("[^A-Za-z0-9.]", "_")

  // ── s7: ANN top-k from the PERSISTED IVF index. Identical semantics and
  //        oracle to s3 (same deterministic quantizer, nprobe = nCells on
  //        this isotropic corpus), but the Lloyd iterations run once in
  //        the artifact build, not per query, and the probed-cell list
  //        reaches the scan as a PartitionFilter (PlanAuditSpec pins it) —
  //        at 100 TB, unprobed cells' files are never opened. ───────────
  private val ivfBuilt =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def ivfIndexDir(s: SparkSession, dir: String): String =
    ivfBuilt.computeIfAbsent(dir, _ => {
      val out = graft.Scratch.dir(s"s7_ivf_${sanitize(dir)}")
      graft.operators.IvfIndex.build(t(s, dir, "embeddings"),
        "vec_id", "embedding", nCells = 16, iters = 3, out)
      out
    })

  def s7_ann_ivf_persisted(s: SparkSession, dir: String): DataFrame = {
    val idx = ivfIndexDir(s, dir)
    graft.operators.IvfIndex.topK(s, idx,
        t(s, dir, "embeddings").filter(col("vec_id") < 5),
        "vec_id", "embedding", k = 5, nprobe = 16)
      .orderBy(col("query_id"), col("rk"))
  }

  // ── d14: incremental ingest against the PERSISTED posting artifact —
  //        d9's semantics (odd ids = incoming batch, even ids = corpus)
  //        with the corpus side read back from the shingle-set parquet
  //        instead of re-tokenized: the batch run tokenizes only the
  //        batch. Shares d9's oracle; PlanAuditSpec pins that documents
  //        .parquet is scanned exactly once. ─────────────────────────────
  private val postingsBuilt =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def corpusSetsDir(s: SparkSession, dir: String): String =
    postingsBuilt.computeIfAbsent(dir, _ => {
      val out = graft.Scratch.dir(s"d14_corpus_sets_${sanitize(dir)}")
      graft.sinks.ParquetSink.write(
        Dedup.shingleSets(
          t(s, dir, "documents").filter(col("doc_id") % 2 === 0),
          "doc_id", "text", n = 3),
        out)
      out
    })

  // ── d15: incremental MinHash+LSH against the persisted index — the
  //        band table finds candidates (one (band, bh) equi-join against
  //        the artifact), the persisted shingle sets verify them exactly;
  //        corpus text touches nothing. Recall is complete on this corpus
  //        (the same bands make d3 ≡ d2), and exact verification filters
  //        any false candidate, so the result coincides with d9's oracle:
  //        the LSH index changes COST, never the answer. ────────────────
  private val bandsBuilt =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def corpusBandsDir(s: SparkSession, dir: String): String =
    bandsBuilt.computeIfAbsent(dir, _ => {
      val out = graft.Scratch.dir(s"d15_corpus_bands_${sanitize(dir)}")
      graft.sinks.ParquetSink.write(
        Dedup.minhashBands(
          t(s, dir, "documents").filter(col("doc_id") % 2 === 0),
          "doc_id", "text", shingleN = 3, numHashes = 32, bands = 8),
        out)
      out
    })

  def d15_lsh_incremental(s: SparkSession, dir: String): DataFrame = {
    val corpusBands = s.read.parquet(corpusBandsDir(s, dir))
    val corpusSets = s.read.parquet(corpusSetsDir(s, dir))
    val batch = t(s, dir, "documents").filter(col("doc_id") % 2 === 1)
    val best = Dedup.crossMinhashLsh(batch, corpusBands, corpusSets,
        "doc_id", "text", shingleN = 3, numHashes = 32, bands = 8,
        threshold = 0.5)
      .groupBy(col("id_a").as("doc_id"))
      .agg(min(col("id_b")).as("dup_of"))
    batch.select(col("doc_id")).join(best, Seq("doc_id"), "left")
      .select(col("doc_id"), col("dup_of"), col("dup_of").isNull.as("kept"))
      .orderBy(col("doc_id"))
  }

  // ── e14: ingest-time dedup as a STREAM — the incoming batch arrives
  //        through readStream, shingles into a stream-static join against
  //        the persisted posting artifact (STATELESS: no streaming
  //        aggregation, no state store), and each microbatch's dedup
  //        verdict is reduced inside foreachBatch — a plain distributed
  //        batch aggregation with spill support — appending only the
  //        tiny (doc_id, dup_of) result to parquet. Hash-matching d9's
  //        oracle proves the streaming ingest path computes exactly the
  //        batch answer. Round-13 re-design (r12 verdict ask #5): the
  //        old complete-mode memory sink held the corpus-sized
  //        (id_a, id_b, inter) aggregate ON THE DRIVER — 48 GB of heap
  //        at sf1; state now stays on executors and the driver only
  //        ever sees the per-ingest-batch verdict rows. Semantics: each
  //        arriving ingest batch is deduped against the persisted
  //        corpus artifact — the reduction is per-microbatch by design
  //        (the file source delivers the fixture in one batch; a
  //        multi-batch ingest deduping each batch on arrival is the
  //        operator's production contract). ──────────────────────────
  def e14_stream_ingest_dedup(s: SparkSession, dir: String): DataFrame =
    streamIngestDedup(s, dir, col("doc_id") % 2 === 1)

  // ── e44: e14's CONSTANT-DELTA production twin (round-14, r13 verdict
  //        ask #4): the ingest is a FIXED ~200-doc batch (odd doc_id
  //        < 400 — the same row count at every scale factor) deduped
  //        against the FULL corpus-sized posting artifact. The gate's
  //        cost is therefore linear in the delta plus the postings it
  //        actually probes — the production shape of streaming ingest —
  //        while e14's whole-corpus replay stays as the batch/stream
  //        parity proof (its ~n² total microbatch work is inherent to
  //        replaying the corpus against itself, adjudicated r13). ──────
  def e44_stream_delta_dedup(s: SparkSession, dir: String): DataFrame =
    streamIngestDedup(s, dir,
      col("doc_id") % 2 === 1 && col("doc_id") < 400)

  private def streamIngestDedup(s: SparkSession, dir: String,
      deltaFilter: Column): DataFrame = {
    val schema = t(s, dir, "documents").schema
    val outDir = graft.Scratch.dir(
      s"e14_verdicts_${streamSeq.incrementAndGet()}")
    val corpusPostings =
      Dedup.postingList(s.read.parquet(corpusSetsDir(s, dir)))
    val stream = s.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
      .filter(deltaFilter)
      // per-batch repartition before the heavy per-row shingle pass
      // (round 14 — see e36's note)
      .repartition(s.sparkContext.defaultParallelism)
    val batchSh = Dedup.postingList(
      Dedup.shingleSets(stream, "doc_id", "text", n = 3))
    val joined = batchSh.as("a")
      .join(corpusPostings.as("b"), col("a.sh") === col("b.sh"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.n_sh").as("na"), col("b.n_sh").as("nb"))
    withStreamShuffle(s, 4) {
      val q = joined.writeStream.outputMode("append")
        .foreachBatch { (mb: org.apache.spark.sql.Dataset[
            org.apache.spark.sql.Row], _: Long) =>
          val inter = mb.groupBy(col("id_a"), col("id_b"),
              col("na"), col("nb"))
            .agg(count(lit(1)).as("inter"))
          val jac = col("inter").cast(DoubleType) /
            (col("na") + col("nb") - col("inter")).cast(DoubleType)
          inter.filter(jac >= 0.5)
            .groupBy(col("id_a").as("doc_id"))
            .agg(min(col("id_b")).as("dup_of"))
            .write.mode("append").parquet(outDir)
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    // read the landed verdicts with an explicit schema: a batch with no
    // candidate pairs writes no part files
    val best = s.read.schema("doc_id BIGINT, dup_of BIGINT").parquet(outDir)
    t(s, dir, "documents").filter(deltaFilter)
      .select(col("doc_id")).join(best, Seq("doc_id"), "left")
      .select(col("doc_id"), col("dup_of"), col("dup_of").isNull.as("kept"))
      .orderBy(col("doc_id"))
  }

  private val streamSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  private def withStreamShuffle[T](s: SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, n.toString)
    try body finally s.conf.set(key, prev)
  }

  def d14_incremental_dedup(s: SparkSession, dir: String): DataFrame = {
    val corpusSets = s.read.parquet(corpusSetsDir(s, dir))
    val batch = t(s, dir, "documents").filter(col("doc_id") % 2 === 1)
    val best = Dedup.crossNgramJaccardAgainstSets(batch, corpusSets,
        "doc_id", "text", n = 3, threshold = 0.5)
      .groupBy(col("id_a").as("doc_id"))
      .agg(min(col("id_b")).as("dup_of"))
    batch.select(col("doc_id")).join(best, Seq("doc_id"), "left")
      .select(col("doc_id"), col("dup_of"), col("dup_of").isNull.as("kept"))
      .orderBy(col("doc_id"))
  }

  // ── d16: artifact MAINTENANCE — the write-back step that closes the
  //        incremental loop: dedup the batch against the persisted sets
  //        (d14's decision), merge the surviving docs' shingle sets into
  //        the artifact, land it, and report the post-merge index stats.
  //        The oracle recomputes the same stats from raw text (string
  //        shingles vs 64-bit hashes — collision-free at these scales, as
  //        every d-family hash match already witnesses), so the whole
  //        ingest → dedup → index-update cycle is behind the gate. ──────
  def d16_artifact_update(s: SparkSession, dir: String): DataFrame = {
    val corpusSets = s.read.parquet(corpusSetsDir(s, dir))
    val batch = t(s, dir, "documents").filter(col("doc_id") % 2 === 1)
    // Round 14: tokenize the batch ONCE — the dedup probe and the kept-set
    // merge both read the same checkpointed shingle-set table (the old
    // shape re-shingled the kept docs a second time).
    val batchSets = Dedup.shingleSets(batch, "doc_id", "text", n = 3)
      .localCheckpoint()
    val dupIds = Dedup.crossJaccardFromSets(batchSets, corpusSets,
        threshold = 0.5)
      .select(col("id_a").as("id")).distinct()
    val keptSets = batchSets.join(dupIds, Seq("id"), "left_anti")
    val out = graft.Scratch.dir(s"d16_merged_${sanitize(dir)}")
    graft.sinks.ParquetSink.write(corpusSets.unionByName(keptSets), out)
    val merged = s.read.parquet(out)
    merged
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_sh")).cast(LongType).as("n_postings"))
      .crossJoin(Dedup.postingList(merged)
        .agg(count_distinct(col("sh")).as("n_distinct_shingles")))
  }

  // ── d13b: d13's winnowing overlap with the boilerplate cap ENGAGED
  //        (maxDf = 5 — at sf0.01 this drops 22 fingerprints, including a
  //        df=34 template string) and modeled in the oracle: postings
  //        longer than the cap never reach the pair join, while the
  //        overlap denominator stays the uncapped fingerprint count. The
  //        scale knob itself is what hash-matches here. ─────────────────
  def d13b_winnow_capped(s: SparkSession, dir: String): DataFrame =
    Dedup.winnowOverlap(t(s, dir, "documents"), "doc_id", "text",
        k = 16, w = 16, minShared = 5, maxDf = Some(5L))
      .orderBy(col("id_a"), col("id_b"))

  // ── q75: directed PageRank with dangling-mass redistribution
  //        (Graph.pageRankDirected) on the co-purchase edges read as
  //        directed low→high arcs — every locally-maximal part is a sink,
  //        so the dangling term is genuinely exercised. Same unrolled
  //        DECIMAL-rounded oracle discipline as q74. ────────────────────
  def q75_pagerank_directed(s: SparkSession, dir: String): DataFrame =
    graft.operators.Graph.pageRankDirected(
        Round6Queries.copurchaseEdges(s, dir), "u", "v",
        iters = 3, damping = 0.85)
      .select(col("node"), round(col("r"), 6).as("pagerank"))
      .orderBy(col("node"))

  // ── p21: RFC-4180 round-trip — fields with embedded delimiters, quotes
  //        and NEWLINES survive the sink (escape=" → doubled quotes) and
  //        the multiline reader; the oracle aggregates the same
  //        construction straight from parquet, so a hash match proves the
  //        quoting round-trip loses nothing. ───────────────────────────
  def p21_csv_quoted_multiline(s: SparkSession, dir: String): DataFrame = {
    val sample = t(s, dir, "customer")
      .filter(col("c_custkey") % 50 === 0)
      .select(col("c_custkey"),
        concat(col("c_name"), lit(",\"\n"), col("c_mktsegment")).as("tricky"),
        col("c_acctbal"))
    val out = graft.Scratch.dir("p21_quoted.csv")
    graft.sinks.CsvSink.writeSingleFile(sample, out,
      options = Map("escape" -> "\""))
    graft.sources.Sources.loadCsv(s, out, maxBytes = Long.MaxValue,
        multiline = true)
      .agg(count(lit(1)).as("n"),
        sum(length(col("tricky"))).cast(LongType).as("total_len"),
        dsum(col("c_acctbal")).as("sum_bal"))
  }

  // ── p22: alternate separator + legacy encoding round-trip — pipe-
  //        separated ISO-8859-1 with non-ASCII (but Latin-1-encodable)
  //        characters through both the sink and the reference-compat
  //        reader's (delimiter, encoding) knobs. ───────────────────────
  def p22_csv_sep_encoding(s: SparkSession, dir: String): DataFrame = {
    val sample = t(s, dir, "nation")
      .select(col("n_nationkey"),
        concat(lit("café » "), col("n_name")).as("label"),
        col("n_regionkey"))
    val out = graft.Scratch.dir("p22_latin1.csv")
    graft.sinks.CsvSink.writeSingleFile(sample, out,
      options = Map("sep" -> "|", "encoding" -> "ISO-8859-1"))
    graft.sources.Sources.loadCsv(s, out, maxBytes = Long.MaxValue,
        delimiter = "|", encoding = "ISO-8859-1")
      .agg(count(lit(1)).as("n"),
        sum(length(col("label"))).cast(LongType).as("total_len"),
        sum(col("n_regionkey")).cast(LongType).as("sum_region"))
  }

  /** Build the persisted artifacts (IVF index, corpus shingle sets) ahead
    * of time — idempotent per process. The bench calls this in its warmup
    * and reports the elapsed build time as its own JSON field: artifacts
    * build once per deployment, so charging the build to whichever query
    * happens to run first would measure neither the build (truncated by
    * min-of-two) nor the serving cost (inflated). Returns seconds. */
  def prebuildArtifacts(s: SparkSession, dir: String): Double = {
    val t0 = System.nanoTime()
    ivfIndexDir(s, dir)
    corpusSetsDir(s, dir)
    corpusBandsDir(s, dir)
    Round4Queries.p18Tables(s, dir) // bucketed layout is an artifact too
    Round26Queries.cmsArtifactDir(s, dir) // a12's dyadic CM rollup
    Round63Queries.exactPairsDir(s, dir) // d33/d34/d35's pair table
    (System.nanoTime() - t0) / 1e9
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s7_ann_ivf_persisted"    -> (s7_ann_ivf_persisted _),
    "d14_incremental_dedup"   -> (d14_incremental_dedup _),
    "d15_lsh_incremental"     -> (d15_lsh_incremental _),
    "d16_artifact_update"     -> (d16_artifact_update _),
    "e14_stream_ingest_dedup" -> (e14_stream_ingest_dedup _),
    "e44_stream_delta_dedup" -> (e44_stream_delta_dedup _),
    "d13b_winnow_capped"      -> (d13b_winnow_capped _),
    "q75_pagerank_directed"   -> (q75_pagerank_directed _),
    "p21_csv_quoted_multiline" -> (p21_csv_quoted_multiline _),
    "p22_csv_sep_encoding"    -> (p22_csv_sep_encoding _))

  /** B^(15-j) mod 2^61-1 for j=0..15 (B=1000003) — same Karp-Rabin window
    * hash family as d13's oracle. */
  private val winnowPowers: String = {
    val M = BigInt(graft.functions.RollingMinHash.M)
    (0 to 15).map(j => s"($j, ${BigInt(1000003).modPow(BigInt(15 - j), M)})")
      .mkString(", ")
  }

  /** q75's unrolled oracle: one damped iteration with the dangling term.
    * Arithmetic forced to DOUBLE exactly as the operator computes it
    * (base, then + 0.85·dangling/n, then + contribution sum — left
    * associative), contributions and the dangling mass in DECIMAL(28,12)
    * so sums are order-independent. */
  private def prIter(prev: String, curr: String): String =
    s"""dang_$curr AS (
       |  SELECT CAST(COALESCE(SUM(CAST($prev.r AS DECIMAL(28,12))),
       |    CAST(0 AS DECIMAL(28,12))) AS DOUBLE) AS dang
       |  FROM $prev LEFT JOIN od ON od.u = $prev.node
       |  WHERE od.u IS NULL),
       |c_$curr AS (
       |  SELECT e.v AS node,
       |    CAST(SUM(CAST(ROUND($prev.r / od.deg * CAST(0.85 AS DOUBLE), 12)
       |      AS DECIMAL(28,12))) AS DOUBLE) AS s
       |  FROM e JOIN $prev ON $prev.node = e.u
       |  JOIN od ON od.u = e.u
       |  GROUP BY e.v),
       |$curr AS (
       |  SELECT nd.node,
       |    ROUND((CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE))
       |        / (SELECT n FROM nn)
       |      + CAST(0.85 AS DOUBLE) * (SELECT dang FROM dang_$curr)
       |        / (SELECT n FROM nn)
       |      + COALESCE(c.s, CAST(0 AS DOUBLE)), 12) AS r
       |  FROM nodes nd LEFT JOIN c_$curr c ON c.node = nd.node)""".stripMargin

  private val edgesSql =
    """pl AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
      |       FROM lineitem WHERE l_partkey % 10 = 0),
      |e AS (SELECT DISTINCT x.pk AS u, y.pk AS v
      |      FROM pl x JOIN pl y ON x.ok = y.ok AND x.pk < y.pk)""".stripMargin

  val oracles: Map[String, String] = Map(
    // identical result contract to the transient-index path
    "s7_ann_ivf_persisted" -> ExtensionQueries.oracles("s3_ann_ivf_topk"),
    // identical semantics to d9 — only the corpus side's physical source
    // differs (persisted artifact vs re-tokenization)
    "d14_incremental_dedup" -> ExtensionQueries.oracles("d9_cross_corpus_dedup"),
    // LSH candidates + exact verify coincide with the exhaustive answer
    // (complete recall on this corpus, like d3 ≡ d2) — same oracle again
    "d15_lsh_incremental" -> ExtensionQueries.oracles("d9_cross_corpus_dedup"),
    // the streaming ingest path must reproduce the batch answer exactly
    "e14_stream_ingest_dedup" -> ExtensionQueries.oracles("d9_cross_corpus_dedup"),
    // d9's oracle with the constant-delta restriction on the ingest side
    "e44_stream_delta_dedup" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w,
        |         generate_subscripts(string_split_regex(trim(text), '\s+'), 1) AS pos
        |  FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id, w || ' ' || w2 || ' ' || w3 AS shingle FROM (
        |    SELECT doc_id, w,
        |           lead(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2,
        |           lead(w, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS w3
        |    FROM tok) WHERE w2 IS NOT NULL AND w3 IS NOT NULL
        |), sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle
        |    AND a.doc_id % 2 = 1 AND a.doc_id < 400 AND b.doc_id % 2 = 0
        |  GROUP BY 1, 2),
        |best AS (
        |  SELECT id_a AS doc_id, MIN(id_b) AS dup_of
        |  FROM inter JOIN sizes sa ON sa.doc_id = id_a
        |  JOIN sizes sb ON sb.doc_id = id_b
        |  WHERE CAST(inter AS DOUBLE)/(sa.n + sb.n - inter) >= 0.5
        |  GROUP BY 1)
        |SELECT d.doc_id, b.dup_of, (b.dup_of IS NULL) AS kept
        |FROM documents d LEFT JOIN best b USING (doc_id)
        |WHERE d.doc_id % 2 = 1 AND d.doc_id < 400
        |ORDER BY doc_id""".stripMargin,
    // post-merge index stats recomputed from raw text: the dedup decision
    // (d9's), the kept-doc union, and the merged posting counts
    "d16_artifact_update" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w,
        |         generate_subscripts(string_split_regex(trim(text), '\s+'), 1) AS pos
        |  FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id, w || ' ' || w2 || ' ' || w3 AS shingle FROM (
        |    SELECT doc_id, w,
        |           lead(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2,
        |           lead(w, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS w3
        |    FROM tok) WHERE w2 IS NOT NULL AND w3 IS NOT NULL
        |), sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle
        |    AND a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
        |  GROUP BY 1, 2),
        |dup AS (
        |  SELECT DISTINCT id_a AS doc_id
        |  FROM inter JOIN sizes sa ON sa.doc_id = id_a
        |  JOIN sizes sb ON sb.doc_id = id_b
        |  WHERE CAST(inter AS DOUBLE)/(sa.n + sb.n - inter) >= 0.5),
        |kept AS (
        |  SELECT doc_id FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL
        |  SELECT d.doc_id FROM documents d LEFT JOIN dup USING (doc_id)
        |  WHERE d.doc_id % 2 = 1 AND dup.doc_id IS NULL),
        |msh AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN kept USING (doc_id))
        |SELECT (SELECT COUNT(*) FROM kept) AS n_docs,
        |  CAST(COUNT(*) AS BIGINT) AS n_postings,
        |  CAST(COUNT(DISTINCT shingle) AS BIGINT) AS n_distinct_shingles
        |FROM msh""".stripMargin,
    "d13b_winnow_capped" ->
      s"""WITH pw(j, p) AS (VALUES $winnowPowers),
        |d AS (SELECT doc_id, text, length(text) AS n FROM documents
        |      WHERE length(text) >= 16),
        |win AS (SELECT doc_id, text, unnest(range(1, n - 14)) AS i FROM d),
        |h AS (
        |  SELECT w.doc_id, w.i,
        |         SUM(CAST(ord(substr(w.text, CAST(w.i + pw.j AS INT), 1)) AS HUGEINT)
        |             * CAST(pw.p AS HUGEINT)) % 2305843009213693951 AS hv
        |  FROM win w CROSS JOIN pw
        |  GROUP BY 1, 2),
        |g AS (SELECT doc_id, i, hv,
        |        COUNT(*) OVER (PARTITION BY doc_id) AS ng FROM h),
        |m AS (
        |  SELECT doc_id, i, ng,
        |    MIN(hv) OVER (PARTITION BY doc_id ORDER BY i
        |      ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS fp
        |  FROM g),
        |sel AS (SELECT DISTINCT doc_id, fp FROM m
        |        WHERE i <= GREATEST(ng - 15, 1)),
        |dfc AS (SELECT fp, COUNT(*) AS df0 FROM sel GROUP BY 1),
        |posted AS (SELECT sel.doc_id, sel.fp FROM sel
        |           JOIN dfc ON dfc.fp = sel.fp WHERE dfc.df0 <= 5),
        |sized AS (SELECT doc_id, COUNT(*) AS nfp FROM sel GROUP BY 1),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
        |  FROM posted a JOIN posted b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 5)
        |SELECT id_a, id_b, shared,
        |  ROUND(CAST(shared AS DOUBLE) /
        |    CAST(LEAST(sa.nfp, sb.nfp) AS DOUBLE), 6) AS overlap
        |FROM pairs JOIN sized sa ON sa.doc_id = id_a
        |JOIN sized sb ON sb.doc_id = id_b
        |ORDER BY id_a, id_b""".stripMargin,
    "q75_pagerank_directed" ->
      s"""WITH $edgesSql,
        |nodes AS (SELECT u AS node FROM e UNION SELECT v FROM e),
        |od AS (SELECT u, COUNT(*) AS deg FROM e GROUP BY 1),
        |nn AS (SELECT COUNT(*) AS n FROM nodes),
        |r0 AS (
        |  SELECT node,
        |    ROUND(CAST(1 AS DOUBLE) / (SELECT n FROM nn), 12) AS r
        |  FROM nodes),
        |${prIter("r0", "r1")},
        |${prIter("r1", "r2")},
        |${prIter("r2", "r3")}
        |SELECT node, ROUND(r, 6) AS pagerank FROM r3
        |ORDER BY node""".stripMargin,
    "p21_csv_quoted_multiline" ->
      """WITH s AS (
        |  SELECT c_custkey,
        |    c_name || ',"' || chr(10) || c_mktsegment AS tricky,
        |    c_acctbal
        |  FROM customer WHERE c_custkey % 50 = 0)
        |SELECT COUNT(*) AS n,
        |  CAST(SUM(length(tricky)) AS BIGINT) AS total_len,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal
        |FROM s""".stripMargin,
    "p22_csv_sep_encoding" ->
      """WITH s AS (
        |  SELECT n_nationkey, 'café » ' || n_name AS label, n_regionkey
        |  FROM nation)
        |SELECT COUNT(*) AS n,
        |  CAST(SUM(length(label)) AS BIGINT) AS total_len,
        |  CAST(SUM(n_regionkey) AS BIGINT) AS sum_region
        |FROM s""".stripMargin)
}
