package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-quantization ANN (Jégou, Douze, Schmid, "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011) — THE memory
  * move for 100 TB vector search: each d-dim float vector compresses to
  * m small codes (here 4 codes over 16-dim subspaces), and queries scan
  * codes with per-subspace lookup tables instead of raw floats.
  *
  * Scale shape (the asymmetric-distance-computation scan):
  *  - the CODEBOOK is m·k subvectors — broadcast everywhere, trained
  *    once (a production build trains per-subspace centroids with
  *    [[Kmeans.lloyd]]; here the codebook is the k lowest-id vectors'
  *    subslices so the oracle can replay encoding exactly);
  *  - ENCODING is one narrow pass over the corpus (argmin against k
  *    broadcast centroids per subspace) producing an m-codes-per-vector
  *    table — the artifact you persist: 64 floats become m small ints;
  *  - the QUERY path precomputes a (query × subspace × centroid)
  *    distance table — |Q|·m·k rows, broadcast — and the corpus scan
  *    is ONE dictionary join over (subspace, code) + one sum: no
  *    floats touched, no pairwise explosion, exactly the IVF-ADC plan
  *    minus the cell pruning (compose with [[Ivf]] for both).
  *
  * Determinism: the d5/s8 quantization convention (`round(x·10⁶)`
  * longs), exact BIGINT squared distances, argmin ties toward the
  * smaller centroid / candidate id via struct-min / rank order.
  *
  * Reference scope: extension beyond the reference surface
  * (/root/reference/tools.py:58-65 leaves the transform dialect open).
  */
object Pq {

  private def dist2(a: Column, b: Column): Column =
    graft.functions.NativeExprs.l2sqLong(a, b)

  /** Explode quantized vectors (id, v) into m subvectors: (id, j, sv). */
  private def subRows(q: DataFrame, m: Int, sub: Int): DataFrame =
    q.withColumn("j", explode(sequence(lit(0), lit(m - 1))))
      .select(col("id"), col("j"),
        slice(col("v"), col("j") * lit(sub) + lit(1), lit(sub)).as("sv"))

  /** The m·k-subvector codebook over a quantized corpus (id, v): the k
    * lowest-id vectors' subslices — (c, j, cv), broadcast-sized. */
  def codebook(q: DataFrame, m: Int, sub: Int, kCent: Int): DataFrame =
    subRows(q.where(col("id") < kCent), m, sub)
      .select(col("id").as("c"), col("j"), col("sv").as("cv"))

  /** PQ encoding: per (vector, subspace), the nearest codebook entry —
    * (id, j, c), the persisted compressed artifact. `q` may be a
    * STREAMING frame: the codebook joins as a broadcast and encoding is
    * stateless (e17 ingests new vectors this way). */
  def encode(q: DataFrame, cb: DataFrame, m: Int, sub: Int): DataFrame =
    subRows(q, m, sub).join(broadcast(cb), "j")
      .select(col("id"), col("j"), col("c"),
        dist2(col("sv"), col("cv")).as("d2"))
      .groupBy(col("id"), col("j"))
      .agg(min(struct(col("d2"), col("c"))).as("best"))
      .select(col("id"), col("j"), col("best.c").as("c"))

  /** Query-side ADC lookup tables: (qid, j, c, d2) — |Q|·m·k rows. */
  def distTables(queries: DataFrame, cb: DataFrame, m: Int,
      sub: Int): DataFrame =
    subRows(queries, m, sub)
      .select(col("id").as("qid"), col("j"), col("sv").as("qv"))
      .join(broadcast(cb), "j")
      .select(col("qid"), col("j"), col("c"),
        dist2(col("qv"), col("cv")).as("d2"))

  /** Top-`topK` per query with (dist, id) tie-break over summed rows
    * (qid, id, d2-parts already joined). */
  private def rankTail(adc: DataFrame, topK: Int): DataFrame = {
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("dadc"), col("id"))
    adc.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= topK)
      .select(col("qid").as("query_id"), col("id").as("cand_id"),
        col("dadc").as("dist_adc"), col("rk"))
  }

  /** Rank every corpus code row against every query table: the plain
    * (exhaustive-candidate) ADC scan. */
  def adcRank(codes: DataFrame, dtab: DataFrame, topK: Int): DataFrame =
    rankTail(
      codes.join(broadcast(dtab), Seq("j", "c"))
        .where(col("id") =!= col("qid"))
        .groupBy(col("qid"), col("id"))
        .agg(sum(col("d2")).as("dadc")),
      topK)

  /** IVFADC ranking: only candidates in `cand` (qid, id — the probed
    * cells' members per query) are scored, and each against its own
    * query's table. The Jégou et al. IVFADC composition: cell pruning
    * bounds the scan, ADC keeps it compressed. */
  def ivfadcRank(codes: DataFrame, cand: DataFrame, dtab: DataFrame,
      topK: Int): DataFrame =
    rankTail(
      codes.join(cand, "id")
        .join(broadcast(dtab), Seq("qid", "j", "c"))
        .where(col("id") =!= col("qid"))
        .groupBy(col("qid"), col("id"))
        .agg(sum(col("d2")).as("dadc")),
      topK)

  /** Stateless per-row PQ encoding against a DRIVER-LOCAL codebook
    * (`cbLocal(j)(c)` = quantized subvector): codes come from a pure
    * projection — `least` over (distance, code) structs per subspace —
    * so a STREAMING frame encodes in append mode with zero state (e17's
    * ingest path; [[encode]] is the distributed-codebook batch twin —
    * same argmin, same tie-break, spec-pinned equal). */
  def encodeMapped(q: DataFrame, cbLocal: Array[Array[Array[Long]]],
      m: Int, sub: Int): DataFrame = {
    import graft.functions.NativeExprs
    val codeArr = array((0 until m).map { j =>
      val subv = slice(col("v"), j * sub + 1, sub)
      least((cbLocal(j).indices).map { c =>
        struct(
          NativeExprs.l2sqLong(subv, typedLit(cbLocal(j)(c).toSeq)).as("d"),
          lit(c.toLong).as("c"))
      }: _*).getField("c")
    }: _*)
    q.select(col("id"), posexplode(codeArr).as(Seq("j", "code")))
      .select(col("id"), col("j").cast("int").as("j"), col("code"))
  }

  /** ADC top-k: for each query (id % queryMod == 0), the k nearest
    * corpus vectors by summed per-subspace distances to the query's
    * lookup table. Output: (query_id, cand_id, dist_adc, rk). */
  def adcTopK(emb: DataFrame, idCol: String, vecCol: String,
      m: Int, sub: Int, kCent: Int, queryMod: Int,
      topK: Int): DataFrame = {
    val q = Kmeans.quantized(emb, idCol, vecCol).localCheckpoint()
    val cb = codebook(q, m, sub, kCent).localCheckpoint()
    val codes = encode(q, cb, m, sub)
    val dtab = distTables(q.where(col("id") % queryMod === 0), cb, m, sub)
    adcRank(codes, dtab, topK)
  }
}
