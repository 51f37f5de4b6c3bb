package graft

import org.apache.spark.sql.execution.FormattedMode

/** Physical-plan regressions guard: the scale properties SCALE.md claims
  * (scan pushdown, column pruning, broadcast strategy, codegen coverage)
  * are asserted here so a refactor that silently loses them fails CI, not
  * a cluster bill.
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.explainString(FormattedMode)
  }

  test("q2 filter predicates are pushed into the parquet scan") {
    val p = plan("q2_filter")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      "range predicates must reach the scan")
  }

  test("dedup reads only the columns it needs") {
    val p = plan("d1_dedup_exact")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "5-column table must prune to the 2 used columns")
  }

  test("star join broadcasts the small dimensions, never the fact side") {
    val p = plan("q33_star_join")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  /** AQE only materializes codegen spans in the *executed* plan. */
  private def executedPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("aggregates are partial+final hash aggregates inside codegen") {
    val p = executedPlan("q1_agg")
    assert(p.contains("HashAggregate"))
    // "*(n)" prefixes mark whole-stage-codegen stages in simpleString
    assert(p.contains("*("))
  }

  test("native hash expressions stay inside whole-stage codegen") {
    val p = executedPlan("t3_fingerprint_rolling")
    assert(p.contains("rolling_min_hash"))
    assert(p.contains("*("))
  }

  test("range join plans as an equi-join on buckets, not a nested loop") {
    val p = plan("q36_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("partitioned layout prunes to the one matching partition directory") {
    val p = plan("p8_partition_prune")
    assert(p.contains("PartitionFilters") && p.contains("o_orderstatus"),
      "the status predicate must prune partitions, not filter rows")
    // the pruned partition column never appears as a data filter
    assert(!p.contains("PushedFilters: [IsNotNull(o_orderstatus)"),
      "partition predicate must not degrade to a row-level scan filter")
  }

  test("SCD2 history builds in one hash shuffle (windows reuse it)") {
    // AQE's string repeats the plan under "== Initial Plan ==" — count
    // exchanges only in the final plan above it
    val p = executedPlan("p7_scd2").split("== Initial Plan ==")(0)
    val hashExchanges =
      "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges == 1,
      s"lag/run-sum/group/lead all share (o_custkey) partitioning; got " +
        s"$hashExchanges hash exchanges:\n$p")
  }

  test("tf-idf broadcasts the term-frequency dictionary and corpus count") {
    val p = executedPlan("t7_tfidf")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("prefix-filtered jaccard joins stay equi-joins end to end") {
    val p = executedPlan("d2_ngram_jaccard")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      "candidate generation and verification must both join on keys")
  }

  test("CDC apply collapses state in one key shuffle plus the final agg") {
    val p = executedPlan("p17_cdc_apply").split("== Initial Plan ==")(0)
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges == 2,
      s"one (o_custkey) window shuffle + one tiny priority agg; got " +
        s"$hashExchanges hash exchanges:\n$p")
  }

  test("incremental aggregate merge pushes partial aggregation map-side") {
    val p = executedPlan("p14_incremental_agg")
    assert(p.contains("HashAggregate"))
    assert(!p.contains("CartesianProduct"))
  }

  test("heavy-hitter recount keeps the one-row total out of a shuffle") {
    val p = executedPlan("a2_heavy_hitters")
    // the catch-all-bucket recount must stay a single aggregation tree —
    // no join back for the total, no nested loop
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"))
  }

  test("trigram LM dictionaries join by n-gram key, never pairwise") {
    val p = executedPlan("t9_trigram_lm")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"))
  }

  test("funnel broadcasts the per-user stage frames onto raw events") {
    val p = executedPlan("q65_funnel")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"),
      "stage gating must never self-join raw events")
  }

  test("semdedup compares within clusters via an equi-join, never corpus-wide") {
    val p = executedPlan("d12_semdedup")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      "the cluster key must drive a hash join — pairwise only inside buckets")
  }

  test("interval window needs exactly one user_id hash shuffle") {
    val p = executedPlan("q67_interval_window").split("== Initial Plan ==")(0)
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges == 1,
      s"count+sum share the (user_id, ts) window sort; got $hashExchanges:\n$p")
  }

  test("content-defined chunk boundaries stay inside whole-stage codegen") {
    val p = executedPlan("m4_cdc_chunks")
    assert(p.contains("cdc_cuts"))
    assert(p.contains("*("))
  }

  test("triangle wedge join is hash-partitioned, never a nested loop") {
    val p = executedPlan("q70_triangles").split("== Initial Plan ==")(0)
    // exactly the two 1-row count crossJoins may plan as nested loops; a
    // third would mean the wedge or closing join degenerated to pairwise
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).length
    assert(bnlj <= 2, s"wedge/closing joins must be equi-joins; got $bnlj " +
      s"nested-loop joins:\n$p")
    // and the closing semi-join itself is a hash/sort-merge equi-join
    assert("(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin).*LeftSemi".r
      .findFirstIn(p).isDefined, s"closing join must be an equi-semi-join:\n$p")
  }

  test("corpus rankings never funnel through a single-partition window") {
    // t13 (vocabulary rank) and q72 (decile rank) rank via a distributed
    // range-sort + zipWithIndex (graft.operators.Rank); a global
    // row_number window would reappear in the plan as a Window node
    Seq("t13_zipf", "q72_decile").foreach { n =>
      val p = plan(n)
      assert(!p.contains("Window"),
        s"$n must rank via Rank.globalRank, not a global window:\n$p")
    }
    // t14/q68 top-k: orderBy().limit() = TakeOrderedAndProject, the
    // distributed per-partition top-k merge
    Seq("t14_pmi", "q68_event_path").foreach { n =>
      val p = plan(n)
      assert(p.contains("TakeOrderedAndProject"),
        s"$n top-k must plan as TakeOrderedAndProject:\n$p")
    }
  }


  test("mips scan broadcasts the query side and prunes to (id, vec)") {
    val p = plan("s6_mips_topk")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"),
      "the tiny query set must broadcast; the corpus must stream")
    assert(p.contains("ReadSchema: struct<vec_id:bigint,embedding:array<float>>"),
      "the label column must be pruned out of the scan")
  }

  test("markov transitions reuse the user_id sort for the lead window") {
    val p = executedPlan("q69_markov").split("== Initial Plan ==")(0)
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    // one shuffle for the user window, one for the (from, to) aggregate,
    // one for the tiny normalizing window — never more
    assert(hashExchanges <= 3, s"got $hashExchanges hash exchanges:\n$p")
  }

  test("winnow overlap joins only through the fingerprint posting list") {
    val p = executedPlan("d13_winnow_overlap")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      "candidate pairs must meet via the fp equi-join, never pairwise")
  }

  test("persisted IVF probe pushes the cell list as a partition filter") {
    val p = plan("s7_ann_ivf_persisted")
    assert(p.contains("PartitionFilters") && p.contains("cell"),
      "the probed-cell predicate must prune index partitions")
    assert(!p.contains("PushedFilters: [IsNotNull(cell)"),
      "the cell predicate must not degrade to a row-level scan filter")
  }

  test("incremental dedup reads the corpus from the artifact, not the text") {
    val p14 = plan("d14_incremental_dedup")
    val p9 = plan("d9_cross_corpus_dedup")
    assert(p14.contains("d14_corpus_sets"),
      "the corpus side must scan the persisted shingle-set parquet")
    def shingleOps(p: String) =
      "token_shingles".r.findAllIn(p).length
    assert(shingleOps(p14) < shingleOps(p9) && shingleOps(p14) >= 1,
      "only the incoming batch may tokenize — the corpus side must not " +
        s"(d14: ${shingleOps(p14)} shingle ops, d9: ${shingleOps(p9)})")
  }

  test("LSH incremental dedup joins both persisted artifacts, tokenizes only the batch") {
    val p = plan("d15_lsh_incremental")
    assert(p.contains("d15_corpus_bands") && p.contains("d14_corpus_sets"),
      "candidates must come from the band artifact, verification from " +
        "the shingle-set artifact")
    // batch-side only: the signature path, the verify-set projection, and
    // that projection's pushed-down not-null condition (d9's full
    // recompute shows 8 — both sides, both paths)
    val shingleOps = "token_shingles".r.findAllIn(p).length
    assert(shingleOps >= 1 && shingleOps <= 3,
      s"only the batch may shingle (signature + verify + pushed filter); " +
        s"got $shingleOps token_shingles expressions")
  }

  test("sequence packing's prefix sum never funnels through one partition") {
    val p = plan("p23_sequence_pack")
    assert(!p.contains("Exchange SinglePartition"),
      "the cumulative token count must run as partial sums + offsets, " +
        s"not a global window:\n$p")
  }

  test("decontamination broadcasts the eval grams; coverage windows stay doc-partitioned") {
    val p = plan("d17_decontaminate")
    assert(p.contains("BroadcastHashJoin"),
      "the eval n-gram probe must be a broadcast (map-side) join — at " +
        "100 TB the train side streams, the benchmark side fits in memory")
    assert(!p.contains("Exchange SinglePartition"),
      s"the islands windows must partition by doc_id, never globally:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("LOO LM joins by n-gram key; the vocab scalar broadcasts") {
    val p = plan("t18_loo_lm")
    assert(!p.contains("CartesianProduct"),
      "the |V| scalar must reach rows via a broadcast, not a cartesian")
    // three dictionary joins (tri, (doc,bi), bi) — all hash equi-joins
    assert("SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r
      .findFirstIn(p).isDefined)
  }

  test("profile runs as one scan: no join, no self-union of the table") {
    val p = plan("p20_profile")
    assert(!p.contains("Union"),
      "per-column stats must come from a single aggregate pass, not " +
        "one scan per column")
  }

  test("k-means assignment broadcasts the centroids; no shuffled cartesian") {
    val p = plan("s8_kmeans")
    // the N×k distance evaluation must ride a broadcast of the k-row
    // centroid table — the corpus side never shuffles for assignment
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"),
      s"centroids must broadcast to the corpus:\n$p")
    assert(!p.contains("CartesianProduct"),
      "a shuffled cartesian over the corpus would be quadratic I/O")
  }

  test("semdedup pair search is keyed by cluster id, never unbounded") {
    val p = plan("d18_semdedup_kmeans")
    assert(!p.contains("CartesianProduct"),
      "the within-cluster pair join must be an equi-join on cluster, " +
        "not an all-pairs cartesian")
  }

  test("epoch shuffle ranks without a single-partition window") {
    val p = plan("p24_epoch_shuffle")
    assert(!p.contains("Exchange SinglePartition"),
      s"the global position must come from the two-level rank:\n$p")
  }

  test("OOV report broadcasts the vocabulary to the token stream") {
    val p = plan("t21_oov_rate")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("grouped HLL registers build in keyed hash aggregates, no pairwise") {
    val p = plan("a8_hll_grouped")
    assert(p.contains("HashAggregate"))
    assert(!p.contains("CartesianProduct"),
      "register build must be (event_type, bkt)-keyed; the power-of-two " +
        "rank dictionary must broadcast")
  }

  test("quantile refinement windows partition by bin, never one global sort") {
    val p = plan("a9_quantile_hist")
    // the rank-recovery window must hash-partition the data by bin; a
    // partition-less window over the cents table would single-thread it
    assert(p.contains("hashpartitioning(bin"),
      s"rankedInBin's window must key by bin:\n$p")
  }

  test("SQ8 candidate scan joins dims via broadcast stats, pairs via equi-keys") {
    val p = plan("s12_sq8_rerank")
    assert(p.contains("BroadcastHashJoin"),
      "per-dimension grid stats must broadcast onto the flat corpus")
    assert(!p.contains("CartesianProduct"))
  }

  test("span removal meets pairs only through the gram equi-join") {
    val p = plan("d22_span_removal")
    assert(!p.contains("CartesianProduct"),
      "coverage and rebuild must never go all-pairs")
  }

  test("dyadic range sketch is one aggregate plus tiny probe joins") {
    val p = plan("a10_cms_range")
    assert(p.contains("HashAggregate"))
    assert(!p.contains("SortMergeJoin"),
      "the cover probe (≤ 2·log₂ rows) must broadcast against the cells")
  }

  test("k-means distances run as the native l2sq expression in codegen") {
    val p = executedPlan("s8_kmeans")
    assert(p.contains("l2sq_long"),
      "assignment must use the codegen'd integer distance, not " +
        "interpreted zip_with/aggregate lambdas")
  }

  test("PQ-ADC scans codes via broadcast lookup tables, never raw pairs") {
    val p = plan("s9_pq_adc")
    assert(p.contains("BroadcastHashJoin"),
      "the (subspace, code) distance-table join must be a broadcast " +
        "equi-join — the corpus is scanned once in the compressed domain")
    assert(!p.contains("CartesianProduct"))
  }

  test("HITS passes are keyed joins + aggregates, nothing global") {
    val p = plan("q77_hits")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("Exchange SinglePartition"),
      s"score passes must shuffle on node keys only:\n$p")
  }

  test("substring runs meet through the gram join; islands stay pair-keyed") {
    val p = plan("d19_substring_runs")
    assert(!p.contains("CartesianProduct"),
      "pairs must meet only via the positional-gram equi-join")
    assert(!p.contains("Exchange SinglePartition"),
      s"the run windows must partition by (pair, diagonal):\n$p")
  }

  test("IVFADC prunes by probed cell and scans compressed codes only") {
    val p = plan("s10_ivfadc")
    // centroids/codebook/probe tables broadcast; the corpus-sized sides
    // (codes, cells) meet only through keyed equi-joins
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"),
      "no all-pairs path may survive the cell pruning")
  }

  test("NB scoring is a dictionary join; the model side broadcasts") {
    val p = plan("t20_nb_langid")
    assert(p.contains("BroadcastHashJoin"),
      "per-class token log-likelihoods are vocabulary-sized — they must " +
        "reach the corpus as a broadcast (or keyed shuffle), never pairwise")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("Exchange SinglePartition"),
      s"the per-doc argmax must stay doc-partitioned:\n$p")
  }

  test("q83 attribution meets clicks on (user, time-bucket), never user alone") {
    val p = plan("q83_position_attribution")
    assert(p.contains("__bucket"),
      s"the purchases×clicks join must run through the bucketized " +
        s"interval shape (skew guard):\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
  }

  test("d24 entity resolution joins on the balance BAND key, not block alone") {
    // round-8 lesson: (nation, segment) blocking alone ran |block|²
    // levenshteins (5.4 s at sf0.1); the $1 tolerance must be part of
    // the equi-join key (width-100 band, probe exploded to {b, b+1})
    val p = queries.Round31Queries.d24Edges(spark, dir)
      .queryExecution.explainString(FormattedMode)
    assert(p.contains("band"),
      s"the match join must carry the band equi-key:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"banded blocking must stay an equi-join:\n$p")
  }

  test("a9 refinement semi-joins the located bins BELOW the per-bin window") {
    // r7 verdict ask #3: the pre-fix plan ran row_number over every bin
    // (a full table shuffle+sort to extract three rows). The located-bin
    // semi-join must broadcast and sit under the window's exchange so only
    // the ≤3 target bins' rows shuffle.
    val p = executedPlan("a9_quantile_hist").split("== Initial Plan ==")(0)
    assert(p.contains("LeftSemi"),
      s"cents must be pruned to the located bins via a semi-join:\n$p")
    val win = p.indexOf("Window")
    val semi = p.indexOf("LeftSemi")
    assert(win >= 0 && semi > win,
      s"the semi-join must be a descendant of the window (filter before " +
        s"shuffle), not above it:\n$p")
  }

  // FormattedMode prints each node once in the tree and once as a detail
  // block — count the numbered detail headers so one Exchange counts once
  private def nExchanges(p: String): Int =
    """\(\d+\) Exchange""".r.findAllIn(p).length

  test("t34 chunking is expression-only — the final sort is its only shuffle") {
    val p = plan("t34_chunk_windows")
    assert(nExchanges(p) === 1 && p.contains("rangepartitioning"),
      s"tokenize→sequence→posexplode→slice must not shuffle; only the " +
        s"presentation orderBy may:\n$p")
  }

  test("m16 patchify keeps the decode inside codegen, no shuffle to patch") {
    val p = plan("m16_image_patches")
    assert(p.contains("decode_pixels"), "native decode expression expected")
    assert(nExchanges(p) === 1, s"decode+explode+element_at is map-side:\n$p")
  }

  test("q105 link prediction never goes quadratic in nodes") {
    val p = plan("q105_link_prediction")
    assert(!p.contains("CartesianProduct"),
      s"candidates come from the wedge equi-join, never all pairs:\n$p")
  }

  test("t36 BM25 broadcasts probes and corpus stats, not the tf table") {
    val p = plan("t36_bm25")
    assert(p.contains("BroadcastHashJoin"),
      s"the 5-term probe dictionary must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"stats row must broadcast:\n$p")
  }

  test("d41 Jaro-Winkler scores distinct name pairs and broadcasts them " +
      "back onto the record expansion") {
    val p = plan("d41_jaro_winkler")
    assert(p.contains("BroadcastHashJoin"),
      s"the vocabulary-bounded scored-pair table must broadcast:\n$p")
    assert(p.contains("jaro_winkler"),
      s"the comparator must appear (over the distinct-name join):\n$p")
    assert(!p.contains("CartesianProduct"), s"no all-pairs fallback:\n$p")
    // the comparator runs on the distinct-name side only: every join in
    // the plan is an equi-join (brand / brand+name keys), so record
    // pairs are never enumerated for scoring
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"record pairs must come from hash equi-joins:\n$p")
  }

  test("q127 spatial cell join broadcasts the exploded small side") {
    val p = plan("q127_spatial_cell_join")
    assert(p.contains("BroadcastHashJoin"),
      s"the 3x3-exploded supplier side must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"cell blocking lost:\n$p")
  }

  test("q141 FIFO allocation joins flows on the part key, never all pairs") {
    val p = plan("q141_fifo_allocation")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"the cumulative-range overlap must ride the pk equi-join:\n$p")
  }

  test("q144 runs the NW DP expression inside whole-stage codegen") {
    val p = executedPlan("q144_needleman_wunsch")
    assert(p.contains("nw_align"), s"expression missing from plan:\n$p")
    assert(p.contains("*("), s"codegen stages missing:\n$p")
  }
}
