package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Fourth batch: the incremental-maintenance / storage-layout operators a
  * warehouse engine runs continuously at scale — MERGE upsert, partial-
  * aggregate merge (incremental view maintenance), small-file compaction,
  * bloom-filter join pruning, Z-order clustering — plus the remaining
  * analytic-dialect corners (linear interpolation, fixed-width histograms,
  * gaps-and-islands, deterministic mode).
  *
  * Reference scope: the engine surface is `transform.sql`'s open DuckDB
  * dialect (see /root/reference/tools.py:58-65); these queries extend the
  * §2B dialect coverage plus the storage-maintenance operations the
  * reference delegates to pandas/DuckDB in-memory (templates.py:79-108)
  * but a 100 TB deployment must run as distributed jobs.
  */
object Round4Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def dec(c: Column, scale: Int = 4) = c.cast(DecimalType(18, scale))
  private def dsum(c: Column, scale: Int = 4) =
    sum(dec(c, scale)).cast(DoubleType)

  private def scratch(name: String): String = graft.Scratch.dir(name)

  // ── p12: small-file compaction — the maintenance job every streaming
  //        ingest needs: N tiny files → ceil(bytes/target) right-sized
  //        files. Correctness = content identity (oracle on the source
  //        predicate); the file-count contract is pinned in
  //        Round4QueriesSpec. At 100 TB the same job runs per partition
  //        with `maxPartitionBytes`-sized tasks; nothing is collected. ───
  def p12_compaction(s: SparkSession, dir: String): DataFrame = {
    val smallDir = scratch("p12_small")
    val compactDir = scratch("p12_compact")
    val src = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= "1995-01-01" &&
        col("l_shipdate") < "1996-01-01")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    // simulate the small-file problem a micro-batch ingest leaves behind
    src.repartition(64).write.mode("overwrite").parquet(smallDir)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      s.sparkContext.hadoopConfiguration)
    val bytes = fs.listStatus(new org.apache.hadoop.fs.Path(smallDir))
      .filter(_.getPath.getName.startsWith("part-")).map(_.getLen).sum
    val target = 32L * 1024 * 1024
    val nFiles = math.max(1, ((bytes + target - 1) / target).toInt)
    s.read.parquet(smallDir)
      .repartition(nFiles)
      .write.mode("overwrite").parquet(compactDir)
    s.read.parquet(compactDir)
      .agg(
        count(lit(1)).as("n"),
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"))
  }

  // ── p13: MERGE-style SCD Type-1 upsert — updates win over base rows by
  //        key, unmatched updates insert. Expressed as one left-anti join
  //        + union (a single shuffle pair on the merge key); the same plan
  //        Delta/Iceberg MERGE compiles to for whole-partition rewrites.
  //        Decimal price math keeps both engines bit-identical. ──────────
  def p13_merge_upsert(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
    val price24 = (c: Column) => c.cast(DecimalType(24, 4))
    val base = ord.filter(col("o_orderkey") % 3 =!= 0)
      .select(col("o_orderkey"), col("o_orderstatus"),
        price24(dec(col("o_totalprice"), 2)).as("price"))
    val upd = ord.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
        price24(dec(col("o_totalprice"), 2) *
          lit(BigDecimal("1.05")).cast(DecimalType(4, 2))).as("price"))
    val merged = upd.unionByName(
      base.join(upd.select("o_orderkey"), Seq("o_orderkey"), "left_anti"))
    merged.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("price")).cast(DoubleType).as("total"))
      .orderBy(col("o_orderstatus"))
  }

  // ── p14: incremental aggregate maintenance — merge yesterday's partial
  //        aggregates with today's delta instead of recomputing history.
  //        Decimal partials are associative, so merged == full recompute
  //        exactly (the oracle IS the full recompute). At 100 TB this is
  //        the difference between scanning one day and scanning years. ───
  def p14_incremental_agg(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select(
      date_trunc("month", col("o_orderdate")).cast(DateType).as("month"),
      col("o_orderdate"), col("o_totalprice"))
    val cutoff = "1999-01-01"
    def part(df: DataFrame) = df.groupBy(col("month"))
      .agg(sum(dec(col("o_totalprice"), 2)).as("s"),
        count(lit(1)).as("c"))
    val history = part(o.filter(col("o_orderdate") < cutoff))
    val delta = part(o.filter(col("o_orderdate") >= cutoff))
    history.unionByName(delta)
      .groupBy(col("month"))
      .agg(sum(col("s")).cast(DoubleType).as("total"),
        sum(col("c")).cast(LongType).as("n"))
      .orderBy(col("month"))
  }

  // ── p15: bloom-filter join pruning — build a bloom filter over the dim
  //        keys, prune the fact scan before the exact semi join. The bloom
  //        pass cuts the shuffled fact volume by ~(1 - selectivity); the
  //        exact join only sees survivors, so the result is exact (false
  //        positives are re-filtered). This is runtime filtering made
  //        explicit — on a cluster the filter ships as a broadcast var,
  //        never the dim rows themselves. ─────────────────────────────────
  def p15_bloom_prune(s: SparkSession, dir: String): DataFrame = {
    val keys = t(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    // sized by a generous constant bound rather than a counting pass: the
    // exact semi join re-filters false positives, so over-sizing only
    // lowers the FP rate while saving one full scan of the dim side
    val bloom = keys.stat.bloomFilter("o_orderkey", 1L << 20, 0.01)
    val bc = s.sparkContext.broadcast(bloom)
    val mightContain = udf((k: Long) => bc.value.mightContainLong(k))
    t(s, dir, "lineitem")
      .filter(mightContain(col("l_orderkey")))
      .join(broadcast(keys), col("l_orderkey") === col("o_orderkey"),
        "left_semi")
      .agg(count(lit(1)).as("n"),
        dsum(col("l_extendedprice")).as("rev"))
  }

  // ── q60: linear interpolation over a sparse daily series — gap-fill
  //        with value estimates, not just carried-forward rows (q43 covers
  //        step-fill). One calendar explode + one global-ordered window
  //        over 365 rows (windowing happens AFTER aggregation, so the
  //        single-partition sort is over days, never raw rows). ──────────
  def q60_interpolate(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .filter(col("o_custkey") % 100 === 7 &&
        col("o_orderdate") >= "1995-01-01" &&
        col("o_orderdate") < "1996-01-01")
      .groupBy(col("o_orderdate").cast(DateType).as("d"))
      .agg(dsum(col("o_totalprice"), 2).as("r"))
    val calendar = s.range(0, 365)
      .select(date_add(to_date(lit("1995-01-01")), col("id").cast(IntegerType))
        .as("d"))
    val series = calendar.join(daily, Seq("d"), "left")
    val before = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val after = Window.orderBy(col("d"))
      .rowsBetween(1, Window.unboundedFollowing)
    val pv = last(col("r"), ignoreNulls = true).over(before)
    val pd = last(when(col("r").isNotNull, col("d")), ignoreNulls = true)
      .over(before)
    val nv = first(col("r"), ignoreNulls = true).over(after)
    val nd = first(when(col("r").isNotNull, col("d")), ignoreNulls = true)
      .over(after)
    series
      .withColumn("val",
        when(col("r").isNotNull, round(col("r"), 6))
          .otherwise(round(
            pv + (nv - pv) *
              (datediff(col("d"), pd).cast(DoubleType) /
                datediff(nd, pd).cast(DoubleType)), 6)))
      .withColumn("actual", col("r").isNotNull)
      .filter(col("val").isNotNull)
      .select(col("d"), col("val"), col("actual"))
      .orderBy(col("d"))
  }

  // ── q61: fixed-width histogram — arithmetic binning (DuckDB has no
  //        width_bucket; floor division is the portable spelling). One
  //        map-side-combined aggregate; bucket count is constant, so the
  //        reduce side is O(buckets) regardless of input size. ───────────
  def q61_histogram(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(least(floor(col("l_extendedprice") / 10000), lit(9))
        .cast(IntegerType).as("bucket"))
      .agg(count(lit(1)).as("n"),
        dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("bucket"))

  // ── q62: gaps-and-islands — maximal runs of consecutive urgent-order
  //        days. The row_number subtraction trick groups consecutive dates
  //        into islands; the global window runs over ≤2.4k distinct days
  //        (post-distinct), not raw orders, so the single-partition sort
  //        is bounded by the date range, not the data volume. ────────────
  def q62_islands(s: SparkSession, dir: String): DataFrame = {
    val days = t(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderdate").cast(DateType).as("d"))
      .distinct()
    val rn = row_number().over(Window.orderBy(col("d")))
    days
      .withColumn("grp", date_sub(col("d"), rn))
      .groupBy(col("grp"))
      .agg(min(col("d")).as("island_start"),
        max(col("d")).as("island_end"),
        count(lit(1)).as("len"))
      .drop("grp")
      .orderBy(col("island_start"))
  }

  // ── q63: deterministic mode — most frequent event_type per hour-of-day
  //        with an explicit lexicographic tie-break (bare `mode()` is
  //        engine-dependent on ties; argmax over (count, key) is total). ──
  def q63_mode(s: SparkSession, dir: String): DataFrame = {
    val raw = t(s, dir, "events")
    val ev = raw.withColumn("ts_us", graft.Tables.tsMicros(raw))
    val counts = ev
      .groupBy(hour(col("ts_us")).as("hr"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("hr"))
      .orderBy(col("cnt").desc, col("event_type").asc)
    counts
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("hr").cast(IntegerType).as("hr"),
        col("event_type").as("mode_type"), col("cnt"))
      .orderBy(col("hr"))
  }

  /** Bit-interleave two 8-bit coordinates into a Morton (Z-order) code —
    * the clustering key for multi-dimensional data layout: sorting by it
    * keeps rows close in BOTH dimensions close on disk, so 2-D range
    * predicates prune file-level min/max zones. Built from shiftleft/and
    * primitives (codegen'd); the oracle recomputes the identical
    * arithmetic. */
  private[queries] def morton8(x: Column, y: Column): Column =
    (0 until 8).map { b =>
      shiftleft(shiftright(x, b).bitwiseAND(lit(1L)), 2 * b)
        .bitwiseOR(
          shiftleft(shiftright(y, b).bitwiseAND(lit(1L)), 2 * b + 1))
    }.reduce(_ bitwiseOR _)

  // ── q64: Z-order clustering preview — the 20 lexically-first parts in
  //        Morton space over (partkey mod 256, size). At 100 TB the same
  //        expression is the `sortWithinPartitions` key of a clustered
  //        write, turning 2-D filters into zone-map prunes. ──────────────
  def q64_zorder(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(col("p_partkey"), col("p_size"),
        morton8(col("p_partkey") % 256, col("p_size").cast(LongType))
          .as("z"))
      .orderBy(col("z"), col("p_partkey"))
      .limit(20)

  // ── t9: trigram language-model scoring — per-document average log
  //        P(w3 | w1 w2) under the corpus's own trigram statistics, the
  //        perplexity-style fluency signal training-data pipelines use to
  //        rank text. Two count dictionaries (trigram, bigram-prefix) built
  //        in one pass over the native codegen'd shingle expression; the
  //        dictionaries join back on hashed keys, so at 100 TB both sides
  //        shuffle-partition by n-gram and nothing is collected. ─────────
  def t9_trigram_lm(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Text
    val withSh = t(s, dir, "documents").select(
      col("doc_id"),
      Text.shingles(col("text"), 3).as("t3"),
      Text.shingles(col("text"), 2).as("t2"))
    val pairs = withSh
      .select(col("doc_id"), col("t3"),
        slice(col("t2"), lit(1), size(col("t3"))).as("pfx"))
      .select(col("doc_id"), explode(arrays_zip(col("t3"), col("pfx"))).as("p"))
      .select(col("doc_id"), col("p.t3").as("tri"), col("p.pfx").as("bi"))
    val c3 = pairs.groupBy(col("tri")).agg(count(lit(1)).as("cnt3"))
    val c2 = withSh.select(explode(col("t2")).as("bi"))
      .groupBy(col("bi")).agg(count(lit(1)).as("cnt2"))
    pairs.join(c3, "tri").join(c2, "bi")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tri"),
        round(avg(log(col("cnt3").cast(DoubleType) /
          col("cnt2").cast(DoubleType))), 6).as("lm_score"))
      .orderBy(col("doc_id"))
  }

  // ── t10: lexical diversity — type/token ratio + hapax legomena count,
  //        the vocabulary-richness quality signal. One shuffle on
  //        (doc_id, word), partial counts map-side combined. ─────────────
  def t10_ttr(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Text
    t(s, dir, "documents")
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("w"))
      .groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("cnt")).cast(LongType).as("n_tokens"),
        count(lit(1)).as("n_types"),
        count(when(col("cnt") === 1, 1)).as("n_hapax"),
        round(count(lit(1)).cast(DoubleType) /
          sum(col("cnt")).cast(DoubleType), 6).as("ttr"))
      .orderBy(col("doc_id"))
  }

  // ── d10: passage-level dedup — per-document share of 8-word shingles
  //        that also occur in ANOTHER document (the RefinedWeb-style
  //        "duplicated passage" signal; doc-level dedup d1-d9 misses
  //        partial copies). Distinct shingles per doc, then one shuffle
  //        keyed by shingle: each bucket's size IS the doc frequency —
  //        no pairwise comparison, so cost is O(total shingles), not
  //        O(docs²). ───────────────────────────────────────────────────
  def d10_passage_dedup(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Text
    val sh = t(s, dir, "documents")
      .select(col("doc_id"),
        explode(array_distinct(Text.shingles(col("text"), 8))).as("sh"))
    val docFreq = sh.groupBy(col("sh")).agg(count(lit(1)).as("ndocs"))
    sh.join(docFreq, "sh")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        count(when(col("ndocs") >= 2, 1)).as("n_shared"),
        round(count(when(col("ndocs") >= 2, 1)).cast(DoubleType) /
          count(lit(1)).cast(DoubleType), 6).as("shared_ratio"))
      .orderBy(col("doc_id"))
  }

  // ── p16: Z-order clustered layout — write the table range-partitioned
  //        and sorted by the Morton key, then answer a 2-D box predicate
  //        from the clustered copy. Because Z-order keeps both coordinates
  //        locally bounded within every file/row-group, the box predicate
  //        prunes at the parquet-statistics level (PushedFilters row-group
  //        skipping; Round4QueriesSpec reads the footers and proves most
  //        zones cannot match). This is the layout maintenance job that
  //        turns 2-D scans into zone reads at 100 TB. ────────────────────
  def p16_zorder_layout(s: SparkSession, dir: String): DataFrame = {
    val out = scratch("p16_zsorted")
    t(s, dir, "part")
      .select(col("p_partkey"), col("p_size"), col("p_retailprice"),
        (col("p_partkey") % 256).as("x"),
        morton8(col("p_partkey") % 256, col("p_size").cast(LongType))
          .as("z"))
      .repartitionByRange(4, col("z"))
      .sortWithinPartitions(col("z"))
      .write.mode("overwrite").parquet(out)
    s.read.parquet(out)
      .filter(col("x").between(32, 63) && col("p_size").between(10, 20))
      .agg(count(lit(1)).as("n"),
        dsum(col("p_retailprice"), 2).as("sum_price"))
  }

  // ── d11: directional containment dedup — near-superset pairs the
  //        symmetric Jaccard (d2) under-scores when document sizes differ.
  //        Candidate prefix filter applies to the contained side only
  //        (the overlap bound ⌈t·|a|⌉ never depends on |b|). ─────────────
  def d11_containment(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.ngramContainment(
        t(s, dir, "documents"), "doc_id", "text", n = 3, threshold = 0.8)
      .orderBy(col("id_a"), col("id_b"))

  // ── p17: CDC apply — collapse a keyed change stream (latest-wins with
  //        delete tombstones) into current state, then account for it.
  //        One window shuffle on the key; at 100 TB the same plan applies
  //        a day's change log to a snapshot without touching history. ────
  def p17_cdc_apply(s: SparkSession, dir: String): DataFrame = {
    val ops = t(s, dir, "orders").select(
      col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
      col("o_totalprice"), col("o_orderpriority"),
      when(col("o_orderkey") % 10 === 0, "D").otherwise("U").as("op"))
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    ops.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1 && col("op") =!= "D")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_live"),
        dsum(col("o_totalprice"), 2).as("total"))
      .orderBy(col("o_orderpriority"))
  }

  // ── p18: bucketed co-located join — write both sides bucketed+sorted on
  //        the join key, then join the bucketed tables. On matched
  //        bucketing the join needs NO exchange (BucketingSpec pins the
  //        zero-Exchange plan under a disabled broadcast threshold); this
  //        query runs the same layout through the oracle gate. At 100 TB
  //        this is the difference between shuffling the fact table on
  //        every join and shuffling it once at write time. ───────────────
  // the bucketed layout is a write-once artifact (that's its entire
  // point: shuffle at write time, join shuffle-free forever after) —
  // build it once per process per sf dir, like Round8's index artifacts
  private val p18Layout =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[queries] def p18Tables(s: SparkSession, dir: String): (String, String) = {
    val key = p18Layout.computeIfAbsent(dir, _ => {
      val k = dir.replaceAll("[^A-Za-z0-9]", "_")
      // project to the join/agg columns before the bucketed write: the
      // layout job shuffles and stores only what the downstream joins
      // read (a bucketed table is a materialized artifact — width is
      // cost)
      t(s, dir, "lineitem").select("l_orderkey", "l_extendedprice")
        .write.mode("overwrite")
        .option("path", scratch(s"p18_li_$k"))
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(s"p18_li_bucketed_$k")
      t(s, dir, "orders")
        .select("o_orderkey", "o_orderpriority", "o_orderstatus")
        .write.mode("overwrite")
        .option("path", scratch(s"p18_o_$k"))
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(s"p18_o_bucketed_$k")
      k
    })
    (s"p18_li_bucketed_$key", s"p18_o_bucketed_$key")
  }

  def p18_bucketed_join(s: SparkSession, dir: String): DataFrame = {
    val (li, o) = p18Tables(s, dir)
    s.table(li)
      .join(s.table(o), col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_orderpriority") === "1-URGENT")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        dsum(col("l_extendedprice")).as("rev"))
      .orderBy(col("o_orderstatus"))
  }

  // ── a2: exact heavy hitters in two bounded-memory passes — a mergeable
  //        Misra-Gries sketch (capacity 64) yields a provable candidate
  //        superset of every key above n/16, then an exact recount over
  //        candidates only. The corpus's natural keys are uniform by
  //        construction, so the demo derives a geometric-frequency key
  //        (lowest set bit of orderkey mod 4096: P(2^j) = 2^-(j+1));
  //        the operator itself is key-agnostic. Unlike a plain groupBy,
  //        state never exceeds the sketch capacity regardless of the
  //        key domain's cardinality. ─────────────────────────────────────
  def a2_heavy_hitters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val keyed = t(s, dir, "lineitem")
      .withColumn("x", col("l_orderkey") % 4096 + 1)
      .select(col("x").bitwiseAND(-col("x")).as("key"))
    val candidates: Seq[Long] = keyed.as[Long]
      .select(new graft.functions.MisraGriesAgg(64).toColumn).head()
    // candidates is ≤ capacity longs — a legitimate driver-side scalar.
    // The recount pass folds non-candidates into one catch-all bucket
    // (-1: keys are powers of two, so it cannot collide), so the same
    // single scan yields both the candidate counts and the grand total —
    // two passes over the data in total, exactly as advertised.
    val masked = keyed
      .groupBy(when(col("key").isin(candidates: _*), col("key"))
        .otherwise(lit(-1L)).as("key"))
      .agg(count(lit(1)).as("cnt"))
    masked
      .withColumn("tot",
        sum(col("cnt")).over(Window.partitionBy())) // ≤ capacity+1 rows
      .filter(col("key") =!= -1L && col("cnt") * 16 > col("tot"))
      .select(col("key"), col("cnt"))
      .orderBy(col("key"))
  }

  // ── s4: quantized ANN with exact re-rank — int8-quantize each vector
  //        (scale = 127/max|x|), rank candidates by the cheap integer dot
  //        (¼ the memory traffic of float32), keep the top-40, then
  //        exact-cosine re-rank the survivors to top-5. The 8× over-fetch
  //        absorbs quantization error, so the result coincides with the
  //        exact s1 answer and shares its oracle — the standard
  //        memory-bandwidth/recall trade of billion-vector search. ───────
  def s4_ann_rerank(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Vectors
    val prepped = t(s, dir, "embeddings").select(
      col("vec_id"), col("embedding"),
      expr("""transform(embedding, v -> float(round(v * (127.0D /
             |  greatest(array_max(transform(embedding, x -> abs(x))),
             |           float(1e-30))))))""".stripMargin).as("qv"),
      (lit(127.0) / greatest(
        expr("array_max(transform(embedding, x -> abs(x)))"),
        lit(1e-30f))).as("scale"),
      Vectors.norm(col("embedding")).as("nrm"))
    val q = broadcast(prepped.filter(col("vec_id") < 5).select(
      col("vec_id").as("query_id"), col("qv").as("q_qv"),
      col("scale").as("q_scale"), col("nrm").as("q_nrm"),
      col("embedding").as("q_emb")))
    val approx = prepped.crossJoin(q)
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("cand_id"),
        col("embedding").as("c_emb"), col("q_emb"),
        (Vectors.dotProduct(col("q_qv"), col("qv")) /
          (col("q_scale") * col("q_nrm") * col("scale") * col("nrm")))
          .as("approx_cos"))
    val wApprox = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_cos").desc, col("cand_id"))
    val wExact = Window.partitionBy(col("query_id"))
      .orderBy(col("cosv").desc, col("cand_id"))
    approx
      .withColumn("crk", row_number().over(wApprox))
      .filter(col("crk") <= 40)
      .select(col("query_id"), col("cand_id"),
        Vectors.cosine(col("q_emb"), col("c_emb")).as("cosv"))
      .withColumn("rk", row_number().over(wExact).cast(LongType))
      .filter(col("rk") <= 5)
      .select(col("query_id"), col("cand_id"),
        round(col("cosv"), 6).as("cosine"), col("rk"))
      .orderBy(col("query_id"), col("rk"))
  }

  private val streamRunSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  private def withStreamShuffle[T](s: SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, n.toString)
    try body finally s.conf.set(key, prev)
  }

  // ── e11: streaming data-quality monitor — the continuous twin of the
  //        batch DQ gate (p4): per-hour row volume, value totals and
  //        envelope, and out-of-range counts over the live stream. The
  //        alerting rule a production pipeline attaches to this output is
  //        exactly the reference's dq_check thresholds, evaluated per
  //        window instead of per batch. ───────────────────────────────────
  def e11_stream_dq(s: SparkSession, dir: String): DataFrame = {
    val schema = t(s, dir, "events").schema
    val name = s"stream_dq_${streamRunSeq.incrementAndGet()}"
    val raw = s.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    val stream = raw.withColumn("ts_us", graft.Tables.tsMicros(raw))
    val agg = stream
      .groupBy(window(col("ts_us"), "1 hour"))
      .agg(
        count(lit(1)).as("n"),
        sum(dec(col("value"))).cast(DoubleType).as("total_value"),
        min(dec(col("value"), 6)).cast(DoubleType).as("min_value"),
        max(dec(col("value"), 6)).cast(DoubleType).as("max_value"),
        count(when(col("value") > 400, 1)).as("n_outliers"))
    withStreamShuffle(s, 4) {
      val q = agg.writeStream.outputMode("complete")
        .format("memory").queryName(name).start()
      try q.processAllAvailable() finally q.stop()
    }
    s.table(name)
      .select(col("window.start").as("hour"), col("n"),
        col("total_value"), col("min_value"), col("max_value"),
        col("n_outliers"))
      .orderBy(col("hour"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p12_compaction"      -> (p12_compaction _),
    "p13_merge_upsert"    -> (p13_merge_upsert _),
    "p14_incremental_agg" -> (p14_incremental_agg _),
    "p15_bloom_prune"     -> (p15_bloom_prune _),
    "q60_interpolate"     -> (q60_interpolate _),
    "q61_histogram"       -> (q61_histogram _),
    "q62_islands"         -> (q62_islands _),
    "q63_mode"            -> (q63_mode _),
    "q64_zorder"          -> (q64_zorder _),
    "t9_trigram_lm"       -> (t9_trigram_lm _),
    "t10_ttr"             -> (t10_ttr _),
    "d10_passage_dedup"   -> (d10_passage_dedup _),
    "p16_zorder_layout"   -> (p16_zorder_layout _),
    "p17_cdc_apply"       -> (p17_cdc_apply _),
    "p18_bucketed_join"   -> (p18_bucketed_join _),
    "d11_containment"     -> (d11_containment _),
    "a2_heavy_hitters"    -> (a2_heavy_hitters _),
    "s4_ann_rerank"       -> (s4_ann_rerank _),
    "e11_stream_dq"       -> (e11_stream_dq _))

  private val mortonSql: String = (0 until 8).map { b =>
    s"((((x >> $b) & 1) << ${2 * b}) | (((y >> $b) & 1) << ${2 * b + 1}))"
  }.mkString(" | ")

  val oracles: Map[String, String] = Map(
    "p12_compaction" ->
      """SELECT COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM lineitem
        |WHERE l_shipdate >= '1995-01-01' AND l_shipdate < '1996-01-01'""".stripMargin,
    "p13_merge_upsert" ->
      """WITH upd AS (
        |  SELECT o_orderkey, 'U' AS o_orderstatus,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.05 AS DECIMAL(4,2))
        |         AS DECIMAL(24,4)) AS price
        |  FROM orders WHERE o_orderkey % 2 = 0),
        |base AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(24,4)) AS price
        |  FROM orders WHERE o_orderkey % 3 <> 0),
        |merged AS (
        |  SELECT * FROM upd
        |  UNION ALL
        |  SELECT * FROM base
        |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd))
        |SELECT o_orderstatus, COUNT(*) AS n, CAST(SUM(price) AS DOUBLE) AS total
        |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin,
    "p14_incremental_agg" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  COUNT(*) AS n
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "p15_bloom_prune" ->
      """SELECT COUNT(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS rev
        |FROM lineitem
        |WHERE l_orderkey IN
        |  (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')""".stripMargin,
    "q60_interpolate" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS r
        |  FROM orders
        |  WHERE o_custkey % 100 = 7
        |    AND o_orderdate >= '1995-01-01' AND o_orderdate < '1996-01-01'
        |  GROUP BY 1),
        |calendar AS (
        |  SELECT DATE '1995-01-01' + CAST(i AS INTEGER) AS d
        |  FROM range(0, 365) t(i)),
        |series AS (
        |  SELECT c.d, daily.r FROM calendar c LEFT JOIN daily ON c.d = daily.d),
        |win AS (
        |  SELECT d, r,
        |    last_value(r IGNORE NULLS) OVER
        |      (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
        |    last_value(CASE WHEN r IS NOT NULL THEN d END IGNORE NULLS) OVER
        |      (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pd,
        |    first_value(r IGNORE NULLS) OVER
        |      (ORDER BY d ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
        |    first_value(CASE WHEN r IS NOT NULL THEN d END IGNORE NULLS) OVER
        |      (ORDER BY d ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nd
        |  FROM series)
        |SELECT d,
        |  CASE WHEN r IS NOT NULL THEN ROUND(r, 6)
        |       ELSE ROUND(pv + (nv - pv) *
        |         (CAST(d - pd AS DOUBLE) / CAST(nd - pd AS DOUBLE)), 6) END AS val,
        |  r IS NOT NULL AS actual
        |FROM win
        |WHERE (CASE WHEN r IS NOT NULL THEN ROUND(r, 6)
        |       ELSE ROUND(pv + (nv - pv) *
        |         (CAST(d - pd AS DOUBLE) / CAST(nd - pd AS DOUBLE)), 6) END)
        |      IS NOT NULL
        |ORDER BY d""".stripMargin,
    "q61_histogram" ->
      """SELECT CAST(LEAST(FLOOR(l_extendedprice / 10000), 9) AS INTEGER) AS bucket,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q62_islands" ->
      """WITH days AS (
        |  SELECT DISTINCT CAST(o_orderdate AS DATE) AS d
        |  FROM orders WHERE o_orderpriority = '1-URGENT'),
        |numbered AS (
        |  SELECT d, d - CAST(ROW_NUMBER() OVER (ORDER BY d) AS INTEGER) AS grp
        |  FROM days)
        |SELECT MIN(d) AS island_start, MAX(d) AS island_end, COUNT(*) AS len
        |FROM numbered GROUP BY grp ORDER BY island_start""".stripMargin,
    "q63_mode" ->
      """WITH counts AS (
        |  SELECT CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hr, event_type,
        |    COUNT(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |ranked AS (
        |  SELECT hr, event_type, cnt,
        |    ROW_NUMBER() OVER (PARTITION BY hr ORDER BY cnt DESC, event_type ASC) AS rk
        |  FROM counts)
        |SELECT hr, event_type AS mode_type, cnt
        |FROM ranked WHERE rk = 1 ORDER BY hr""".stripMargin,
    "q64_zorder" ->
      s"""WITH xy AS (
         |  SELECT p_partkey, p_size,
         |    p_partkey % 256 AS x, CAST(p_size AS BIGINT) AS y
         |  FROM part)
         |SELECT p_partkey, p_size, ($mortonSql) AS z
         |FROM xy ORDER BY z, p_partkey LIMIT 20""".stripMargin,
    "t9_trigram_lm" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w,
        |         generate_subscripts(string_split_regex(trim(text), '\s+'), 1) AS pos
        |  FROM documents),
        |seq AS (
        |  SELECT doc_id, pos, w,
        |    lead(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2,
        |    lead(w, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS w3
        |  FROM tok),
        |tri AS (
        |  SELECT doc_id, w || ' ' || w2 || ' ' || w3 AS tri, w || ' ' || w2 AS bi
        |  FROM seq WHERE w3 IS NOT NULL),
        |big AS (SELECT w || ' ' || w2 AS bi FROM seq WHERE w2 IS NOT NULL),
        |c3 AS (SELECT tri, COUNT(*) AS cnt3 FROM tri GROUP BY 1),
        |c2 AS (SELECT bi, COUNT(*) AS cnt2 FROM big GROUP BY 1)
        |SELECT t.doc_id, COUNT(*) AS n_tri,
        |  ROUND(AVG(ln(CAST(cnt3 AS DOUBLE) / CAST(cnt2 AS DOUBLE))), 6) AS lm_score
        |FROM tri t JOIN c3 ON t.tri = c3.tri JOIN c2 ON t.bi = c2.bi
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,
    "t10_ttr" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
        |  FROM documents),
        |per_word AS (
        |  SELECT doc_id, w, COUNT(*) AS cnt FROM tok GROUP BY 1, 2)
        |SELECT doc_id,
        |  CAST(SUM(cnt) AS BIGINT) AS n_tokens,
        |  COUNT(*) AS n_types,
        |  COUNT(CASE WHEN cnt = 1 THEN 1 END) AS n_hapax,
        |  ROUND(CAST(COUNT(*) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE), 6) AS ttr
        |FROM per_word GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "d10_passage_dedup" ->
      """WITH base AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS L
        |  FROM documents),
        |idx AS (
        |  SELECT doc_id, L, unnest(range(1, len(L) - 6)) AS i
        |  FROM base WHERE len(L) >= 8),
        |sh AS (
        |  SELECT DISTINCT doc_id, array_to_string(L[i:i+7], ' ') AS sh
        |  FROM idx),
        |df AS (SELECT sh, COUNT(*) AS ndocs FROM sh GROUP BY 1)
        |SELECT s.doc_id,
        |  COUNT(*) AS n_shingles,
        |  COUNT(CASE WHEN ndocs >= 2 THEN 1 END) AS n_shared,
        |  ROUND(CAST(COUNT(CASE WHEN ndocs >= 2 THEN 1 END) AS DOUBLE) /
        |        CAST(COUNT(*) AS DOUBLE), 6) AS shared_ratio
        |FROM sh s JOIN df ON s.sh = df.sh
        |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,
    "p16_zorder_layout" ->
      """SELECT COUNT(*) AS n,
        |  CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM part
        |WHERE (p_partkey % 256) BETWEEN 32 AND 63
        |  AND p_size BETWEEN 10 AND 20""".stripMargin,
    "d11_containment" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w,
        |         generate_subscripts(string_split_regex(trim(text), '\s+'), 1) AS pos
        |  FROM documents),
        |seq AS (
        |  SELECT doc_id, pos, w,
        |    lead(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2,
        |    lead(w, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS w3
        |  FROM tok),
        |sh AS (
        |  SELECT DISTINCT doc_id, w || ' ' || w2 || ' ' || w3 AS s
        |  FROM seq WHERE w3 IS NOT NULL),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS o
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |  ROUND(CAST(o AS DOUBLE) / CAST(na.n AS DOUBLE), 6) AS containment
        |FROM inter JOIN sizes na ON na.doc_id = id_a
        |WHERE CAST(o AS DOUBLE) / CAST(na.n AS DOUBLE) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,
    "p17_cdc_apply" ->
      """WITH ops AS (
        |  SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
        |    o_orderpriority,
        |    CASE WHEN o_orderkey % 10 = 0 THEN 'D' ELSE 'U' END AS op
        |  FROM orders),
        |latest AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rk
        |  FROM ops)
        |SELECT o_orderpriority, COUNT(*) AS n_live,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM latest WHERE rk = 1 AND op <> 'D'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "p18_bucketed_join" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS rev
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "a2_heavy_hitters" ->
      """WITH keyed AS (
        |  SELECT (l_orderkey % 4096 + 1) & (-(l_orderkey % 4096 + 1)) AS key
        |  FROM lineitem)
        |SELECT key, COUNT(*) AS cnt FROM keyed
        |GROUP BY 1
        |HAVING COUNT(*) * 16 > (SELECT COUNT(*) FROM keyed)
        |ORDER BY 1""".stripMargin,
    "s4_ann_rerank" -> ExtensionQueries.cosineTopkSql,
    "e11_stream_dq" ->
      """SELECT date_trunc('hour', ts) AS hour,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
        |  CAST(MIN(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS min_value,
        |  CAST(MAX(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS max_value,
        |  COUNT(CASE WHEN value > 400 THEN 1 END) AS n_outliers
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)
}
