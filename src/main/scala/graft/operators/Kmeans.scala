package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed Lloyd's k-means over an embedding column, in exact
  * integer arithmetic so a SQL oracle can replay every iteration
  * bit-for-bit.
  *
  * This is the clustering half of SemDeDup-style corpus curation
  * (Abbas et al. '23: cluster embeddings, then dedup within clusters —
  * d12 does the within-cluster half) and of IVF index training
  * ([[Ivf]] trains its cells the same way conceptually): k-means is the
  * step a 100 TB pipeline runs to shard an embedding corpus into
  * semantically-coherent partitions.
  *
  * Scale shape (the classic one):
  *  - centroids are k·d values — they ride to every executor as a
  *    BROADCAST; the corpus is never shuffled for assignment (one
  *    narrow map: N×k distance evaluations via codegen'd
  *    `zip_with`/`aggregate`, no explode);
  *  - the centroid update is ONE shuffle of (cluster, dim) partial
  *    sums — map-side combined, k·d reduce groups regardless of N;
  *  - per-iteration lineage is truncated by `localCheckpoint` on the
  *    k-row centroid table (on a cluster: a persisted table per
  *    iteration), so the plan does not grow with iteration count.
  *
  * Determinism: embeddings quantize to `round(x·10⁶)` longs (the d5
  * convention, Dedup.scala); distances are exact BIGINT sums of squares
  * (≤ 4·10¹²·d, far under 2⁶³); the centroid mean is the exact floored
  * integer average `(s - pmod(s, n)) div n` (= floor(s/n) for any sign,
  * identical to DuckDB's `(s - ((s % n + n) % n)) // n`); argmin breaks
  * ties toward the smaller centroid id via lexicographic struct-min.
  * Empty clusters simply drop out of the update (both engines agree).
  *
  * Reference scope: extension beyond the reference surface (its
  * transform dialect is open, /root/reference/tools.py:58-65).
  */
object Kmeans {

  /** (id, v): the id column plus the embedding quantized to longs. */
  def quantized(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol).cast(LongType).as("id"),
      transform(col(vecCol),
        x => round(x.cast(DoubleType) * lit(1e6)).cast(LongType)).as("v"))

  /** Exact squared L2 distance between two quantized vectors — a native
    * codegen'd expression (one tight long loop per row; see
    * [[graft.functions.NativeExprs.l2sqLong]]), no explode. */
  private def dist2(a: Column, b: Column): Column =
    graft.functions.NativeExprs.l2sqLong(a, b)

  /** Nearest-centroid assignment: (id, c, d2). `cent` (k rows of
    * (c, cv)) broadcasts; ties go to the smallest centroid id. */
  def assign(q: DataFrame, cent: DataFrame): DataFrame =
    q.crossJoin(broadcast(cent))
      .select(col("id"), col("c"), dist2(col("v"), col("cv")).as("d2"))
      .groupBy(col("id"))
      .agg(min(struct(col("d2"), col("c"))).as("best"))
      .select(col("id"), col("best.c").as("c"), col("best.d2").as("d2"))

  /** One Lloyd update: exact floored-integer-mean centroids of the
    * current assignment. One shuffle, k·d reduce groups. */
  private def update(q: DataFrame, cent: DataFrame): DataFrame =
    assign(q, cent).join(q, "id")
      .select(col("c"), posexplode(col("v")).as(Seq("i", "x")))
      .groupBy(col("c"), col("i"))
      .agg(sum(col("x")).as("sv"), count(lit(1)).as("cnt"))
      .withColumn("cx", expr("(sv - pmod(sv, cnt)) div cnt"))
      .groupBy(col("c"))
      .agg(transform(array_sort(collect_list(struct(col("i"), col("cx")))),
        e => e.getField("cx")).as("cv"))

  /** Centroids after `iters` updates over an already-quantized corpus. */
  private def centroidsOf(q: DataFrame, k: Int, iters: Int): DataFrame = {
    var cent = q.where(col("id") < k)
      .select(col("id").as("c"), col("v").as("cv"))
    for (_ <- 1 to iters)
      // lazy: truncates lineage identically, but the k-row materialization
      // folds into the next iteration's broadcast build instead of paying
      // a separate driver-scheduled job per update (Graph.scala discipline)
      cent = update(q, cent).localCheckpoint(false)
    cent
  }

  /** The centroid table after `iters` Lloyd updates from the k
    * lowest-id seeds: (c, cv) — the artifact an IVF/PQ build persists. */
  def centroids(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame =
    centroidsOf(quantized(emb, idCol, vecCol).localCheckpoint(), k, iters)

  /** `iters` Lloyd updates from the k lowest-id vectors, then the final
    * assignment: (id, c, d2) — cluster id = the seed vector's id. */
  def lloyd(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    val q = quantized(emb, idCol, vecCol).localCheckpoint()
    assign(q, centroidsOf(q, k, iters))
  }
}
