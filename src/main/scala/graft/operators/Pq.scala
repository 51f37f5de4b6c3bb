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

  /** ADC top-k: for each query (id % queryMod == 0), the k nearest
    * corpus vectors by summed per-subspace distances to the query's
    * lookup table. Output: (query_id, cand_id, dist_adc, rk). */
  def adcTopK(emb: DataFrame, idCol: String, vecCol: String,
      m: Int, sub: Int, kCent: Int, queryMod: Int,
      topK: Int): DataFrame = {
    val q = Kmeans.quantized(emb, idCol, vecCol).localCheckpoint()
    val subs = subRows(q, m, sub)
    val cb = broadcast(subs.where(col("id") < kCent)
      .select(col("id").as("c"), col("j"), col("sv").as("cv")))

    // encode: per (vector, subspace), the nearest codebook entry
    val codes = subs.join(cb, "j")
      .select(col("id"), col("j"), col("c"), dist2(col("sv"), col("cv")).as("d2"))
      .groupBy(col("id"), col("j"))
      .agg(min(struct(col("d2"), col("c"))).as("best"))
      .select(col("id"), col("j"), col("best.c").as("c"))

    // query-side distance tables: |Q|·m·k rows, broadcast
    val dtab = broadcast(subs.where(col("id") % queryMod === 0)
      .select(col("id").as("qid"), col("j"), col("sv").as("qv"))
      .join(cb, "j")
      .select(col("qid"), col("j"), col("c"),
        dist2(col("qv"), col("cv")).as("d2")))

    val adc = codes.join(dtab, Seq("j", "c"))
      .where(col("id") =!= col("qid"))
      .groupBy(col("qid"), col("id"))
      .agg(sum(col("d2")).as("dadc"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("dadc"), col("id"))
    adc.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= topK)
      .select(col("qid").as("query_id"), col("id").as("cand_id"),
        col("dadc").as("dist_adc"), col("rk"))
  }
}
