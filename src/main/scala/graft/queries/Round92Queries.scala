package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{AudioExprs, ImageExprs}

/** Ninety-second batch — clustering-quality auditing, a second custom
  * optimizer rule, and integer spectral analysis:
  *
  *  - d43: adjusted Rand index (Hubert & Arabie 1985) between the
  *    coarse 12-bit top-left-quadrant Haar signature clustering and
  *    exact-raster equality — the standard external clustering-quality
  *    measure, all pair counting in exact integers with the expectation
  *    correction cross-multiplied (no rational arithmetic): ARI ≈ 0.12
  *    at sf0.01, the honest read that a quadrant signature over-merges.
  *  - d44: d41's Jaro-Winkler blocked-ER query executed with
  *    [[graft.plans.JwPrefilterRule]] installed — the rule injects the
  *    length-ratio bound implied by `jw ≥ 0.88` (min/max ≥ 3·(t′−0.4)/
  *    0.6 − 2) in front of the expensive similarity inside the join
  *    condition. The oracle is d41's oracle verbatim: the hash gate IS
  *    the soundness proof that the rewrite changes no row.
  *  - m29: 8-point Walsh–Hadamard sequency energies over decoded PCM
  *    frames — the integer-exact stand-in for spectral analysis (WHT
  *    twiddles are ±1, so unlike a DFT every coefficient is a BIGINT
  *    both engines compute identically). Parseval (Σ_k E_k = 8·Σ s²)
  *    holds exactly and is spec-pinned.
  *
  * Scale: d43 reduces both labelings to a contingency table before any
  * arithmetic; d44's bound prunes before the O(len·window) comparator
  * inside the join; m29 is per-row decode + two narrow aggregations.
  *
  * Reference scope: beyond-reference LLM-pipeline surface (the
  * reference's transform dialect is open, /root/reference/tools.py:58-65).
  */
object Round92Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ── d43: adjusted Rand index of signature vs exact clusterings ────────

  def d43_adjusted_rand(s: SparkSession, dir: String): DataFrame = {
    val px = t(s, dir, "documents").select(col("doc_id"),
        ImageExprs.decodePixels(
          ImageExprs.encodeImageFromText(col("text"), "pgm", 8, 8)).as("px"))
      .select(col("doc_id"), posexplode(col("px")).as(Seq("i", "v")))
      .select(col("doc_id"), col("v").cast("long").as("v"), col("i"),
        expr("i % 8").as("x"), expr("i div 8").as("y"))
      .localCheckpoint(true)
    val blocks = px
      .groupBy(col("doc_id"), expr("(y div 2) * 4 + (x div 2)").as("blk"))
      .agg(
        sum(col("v") * expr("CASE WHEN x % 2 = 0 THEN 1 ELSE -1 END"))
          .as("lh"),
        sum(col("v") * expr("CASE WHEN y % 2 = 0 THEN 1 ELSE -1 END"))
          .as("hl"),
        sum(col("v") * expr("CASE WHEN (x + y) % 2 = 0 THEN 1 ELSE -1 END"))
          .as("hh"))
    val sigs = blocks.groupBy(col("doc_id"))
      .agg(sum(expr(
        """CASE WHEN lh > 0 THEN shiftleft(1L, CAST(3 * blk AS INT))
          |  ELSE 0L END
          |+ CASE WHEN hl > 0 THEN shiftleft(1L, CAST(3 * blk + 1 AS INT))
          |  ELSE 0L END
          |+ CASE WHEN hh > 0 THEN shiftleft(1L, CAST(3 * blk + 2 AS INT))
          |  ELSE 0L END""".stripMargin)).as("sig"))
    val raster = px.groupBy(col("doc_id"))
      .agg(expr("array_join(transform(array_sort(collect_list(" +
        "struct(i, v))), p -> CAST(p.v AS STRING)), ',')").as("lb"))
    val labels = sigs.join(raster, "doc_id")
      .select(expr("sig & 4095").as("la"), col("lb"))
    val cont = labels.groupBy(col("la"), col("lb"))
      .agg(count(lit(1)).as("nij")).localCheckpoint(true)
    val parts = cont.agg(
      sum(expr("nij * (nij - 1) div 2")).as("idx"),
      sum(col("nij")).as("n"))
    val sa = cont.groupBy(col("la")).agg(sum(col("nij")).as("ai"))
      .agg(sum(expr("ai * (ai - 1) div 2")).as("sa"))
    val sb = cont.groupBy(col("lb")).agg(sum(col("nij")).as("bj"))
      .agg(sum(expr("bj * (bj - 1) div 2")).as("sb"))
    parts.crossJoin(broadcast(sa)).crossJoin(broadcast(sb))
      .select(col("n"), col("idx").as("index_pairs"), col("sa").as("sum_a"),
        col("sb").as("sum_b"),
        round(
          (lit(2L) * expr("n * (n - 1) div 2") * col("idx") -
            lit(2L) * col("sa") * col("sb")).cast("double") /
          (expr("n * (n - 1) div 2").cast("double") *
            (col("sa") + col("sb")) - lit(2.0) * col("sa") * col("sb")), 6)
          .as("ari"))
  }

  // ── d44: d41 under the Jaro-Winkler length-prune optimizer rule ───────

  /** Record-level brand-blocked all-pairs — deliberately the UNPRUNED
    * candidate-set shape (the exact Join-with-jw-in-condition plan
    * [[graft.plans.JwPrefilterRule]] targets) — executed with the rule
    * installed; the oracle computes the same result rule-free, so the
    * hash gate IS the soundness proof that the rewrite drops no pair.
    * Round 12: pinned to the p_partkey < 2000 fixture (the full `part`
    * table at sf0.01, a fixed 2 000-row slice at every larger SF), so
    * the verification stays bounded while d41's corpus path moved to
    * vocabulary-bounded distinct-name scoring (which no longer carries
    * the record-level join shape this rule-proof needs). */
  def d44_jw_pruned(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.JaroWinklerSim
    graft.plans.JwPrefilter.install(s)
    val p = t(s, dir, "part")
      .filter(col("p_partkey") < 2000)
      .select(col("p_partkey"), col("p_name"), col("p_brand"))
    p.as("a").join(p.as("b"),
        col("a.p_brand") === col("b.p_brand") &&
          col("a.p_partkey") < col("b.p_partkey"))
      .select(col("a.p_partkey").as("pa"), col("b.p_partkey").as("pb"),
        col("a.p_brand").as("brand"),
        JaroWinklerSim
          .jaroWinklerRounded(col("a.p_name"), col("b.p_name"), 6).as("jw"))
      .filter(col("jw") >= 0.88)
      .orderBy(col("pa"), col("pb"))
  }

  // ── m29: Walsh–Hadamard sequency energies over PCM frames ─────────────

  def m29_wht_audio(s: SparkSession, dir: String): DataFrame = {
    val smp = t(s, dir, "documents").select(col("doc_id"),
        AudioExprs.decodeSamples(
          AudioExprs.encodeWavFromText(col("text"), 16000, 64)).as("sm"))
      .select(col("doc_id"), posexplode(col("sm")).as(Seq("i", "v")))
      .select(col("doc_id"), col("v").cast("long").as("v"),
        expr("i div 8").as("f"), expr("i % 8").as("j"))
    val coef = smp
      .select(col("doc_id"), col("v"), col("f"), col("j"),
        explode(expr("sequence(0L, 7L)")).as("k"))
      .groupBy(col("doc_id"), col("f"), col("k"))
      .agg(sum(col("v") * expr(
        "CASE WHEN bit_count(j & k) % 2 = 0 THEN 1 ELSE -1 END")).as("c"))
    coef.groupBy(col("doc_id"), col("k"))
      .agg(sum(col("c") * col("c")).as("energy"))
      .orderBy(col("doc_id"), col("k"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d43_adjusted_rand" -> (d43_adjusted_rand _),
    "d44_jw_pruned"     -> (d44_jw_pruned _),
    "m29_wht_audio"     -> (m29_wht_audio _))

  val oracles: Map[String, String] = Map(
    "d43_adjusted_rand" ->
      """WITH px AS (
        |  SELECT doc_id,
        |    ord(substr(text, CAST(((i - 1) % length(text)) + 1 AS INT), 1))
        |      % 256 AS v,
        |    (i - 1) % 8 AS x, (i - 1) // 8 AS y, i
        |  FROM documents CROSS JOIN (SELECT unnest(range(1, 65)) AS i)),
        |blocks AS (
        |  SELECT doc_id, (y // 2) * 4 + (x // 2) AS blk,
        |    CAST(SUM(v * (CASE WHEN x % 2 = 0 THEN 1 ELSE -1 END))
        |      AS BIGINT) AS lh,
        |    CAST(SUM(v * (CASE WHEN y % 2 = 0 THEN 1 ELSE -1 END))
        |      AS BIGINT) AS hl,
        |    CAST(SUM(v * (CASE WHEN (x + y) % 2 = 0 THEN 1 ELSE -1 END))
        |      AS BIGINT) AS hh
        |  FROM px GROUP BY 1, 2),
        |sigs AS (
        |  SELECT b.doc_id,
        |    CAST(SUM((CASE WHEN lh > 0 THEN 1 ELSE 0 END)
        |        * (1::BIGINT << (3*blk))
        |      + (CASE WHEN hl > 0 THEN 1 ELSE 0 END)
        |        * (1::BIGINT << (3*blk+1))
        |      + (CASE WHEN hh > 0 THEN 1 ELSE 0 END)
        |        * (1::BIGINT << (3*blk+2))) AS BIGINT) AS sig,
        |    r.lb
        |  FROM blocks b JOIN (
        |    SELECT doc_id, string_agg(CAST(v AS VARCHAR), ',' ORDER BY i)
        |      AS lb
        |    FROM px GROUP BY doc_id) r ON b.doc_id = r.doc_id
        |  GROUP BY b.doc_id, r.lb),
        |labels AS (SELECT doc_id, sig & 4095 AS la, lb FROM sigs),
        |cont AS (
        |  SELECT la, lb, CAST(COUNT(*) AS BIGINT) AS nij
        |  FROM labels GROUP BY 1, 2),
        |am AS (SELECT la, CAST(SUM(nij) AS BIGINT) AS ai FROM cont
        |  GROUP BY 1),
        |bm AS (SELECT lb, CAST(SUM(nij) AS BIGINT) AS bj FROM cont
        |  GROUP BY 1),
        |sums AS (
        |  SELECT
        |    (SELECT CAST(SUM(nij * (nij - 1) // 2) AS BIGINT) FROM cont)
        |      AS idx,
        |    (SELECT CAST(SUM(ai * (ai - 1) // 2) AS BIGINT) FROM am) AS sa,
        |    (SELECT CAST(SUM(bj * (bj - 1) // 2) AS BIGINT) FROM bm) AS sb,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM labels) AS n)
        |SELECT n, idx AS index_pairs, sa AS sum_a, sb AS sum_b,
        |  ROUND(CAST(2 * (n*(n-1)//2) * idx - 2 * sa * sb AS DOUBLE)
        |    / (CAST((n*(n-1)//2) AS DOUBLE) * (sa + sb) - 2.0 * sa * sb), 6)
        |    AS ari
        |FROM sums""".stripMargin,
    "d44_jw_pruned" ->
      """SELECT a.p_partkey AS pa, b.p_partkey AS pb, a.p_brand AS brand,
        |  ROUND(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS jw
        |FROM part a JOIN part b
        |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        |WHERE a.p_partkey < 2000 AND b.p_partkey < 2000
        |  AND ROUND(jaro_winkler_similarity(a.p_name, b.p_name), 6) >= 0.88
        |ORDER BY pa, pb""".stripMargin,
    "m29_wht_audio" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    (((ord(substr(text, CAST((i % length(text)) + 1 AS INT), 1))
        |      * 257) % 65536) - 32768) AS v,
        |    i // 8 AS f, i % 8 AS j
        |  FROM documents CROSS JOIN (SELECT unnest(range(0, 64)) AS i)),
        |coef AS (
        |  SELECT s.doc_id, s.f, k.k,
        |    CAST(SUM(s.v * (CASE WHEN bit_count(s.j & k.k) % 2 = 0
        |      THEN 1 ELSE -1 END)) AS BIGINT) AS c
        |  FROM s CROSS JOIN (SELECT unnest(range(0, 8)) AS k) k
        |  GROUP BY 1, 2, 3)
        |SELECT doc_id, k, CAST(SUM(c * c) AS BIGINT) AS energy
        |FROM coef GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
