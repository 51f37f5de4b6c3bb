package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.NativeExprs

/** IVF (inverted-file) approximate-nearest-neighbor search: a spherical
  * k-means coarse quantizer assigns every vector to its nearest centroid
  * cell; queries probe only the `nprobe` nearest cells and rank that
  * candidate subset exactly. The complement of the LSH path in
  * [[Similarity]] — IVF adapts to the data distribution where LSH is
  * data-oblivious.
  *
  * Deterministic by construction (so the result is oracle-checkable):
  *  - init = k vectors evenly spaced through the id order;
  *  - per-dimension centroid means accumulate in DECIMAL (order-independent
  *    across partitions — a double sum would drift with partitioning and
  *    could flip assignments between runs);
  *  - assignment ties keep the lowest centroid index.
  *
  * Scale: each Lloyd iteration is one aggregate job over the corpus; the
  * centroid matrix (k×dim doubles) is the only driver-side state and rides
  * into executors as a codegen reference object. The cell index is a plain
  * int column — at 100 TB you'd persist it (partitioned/bucketed by cell)
  * so queries touch only probed cells' files.
  */
object Ivf {

  private def l2normalize(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n == 0.0) v else v.map(_ / n)
  }

  /** Deterministic spherical k-means over an embedding column. Returns
    * unit-norm centroids, `k × dim`.
    *
    * The (id, vec) projection is localCheckpoint'ed up front: Lloyd runs
    * `iters` full-corpus aggregates plus the init scan, and without the
    * checkpoint every one of them re-reads and re-decodes the source scan.
    * One materialization feeds them all (at cluster scale, persist the
    * projection to storage instead and train once — see the object doc). */
  def trainCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): Array[Array[Double]] =
    trainOnProjection(corpus.select(col(idCol), col(vecCol)).localCheckpoint(),
      idCol, vecCol, k, iters)

  /** Training core over an already-materialized (id, vec) projection —
    * lets [[topK]] share one checkpoint between training and the final
    * cell assignment instead of scanning the source twice (and lets
    * [[IvfIndex.build]] reuse the exact same deterministic training). */
  private[operators] def trainOnProjection(proj: DataFrame, idCol: String,
      vecCol: String, k: Int, iters: Int): Array[Array[Double]] = {
    val toDouble = (r: org.apache.spark.sql.Row) =>
      r.getSeq[Any](0).map {
        case f: Float => f.toDouble
        case d: Double => d
      }.toArray

    // init: k vectors evenly spaced through the id order (the k lowest ids
    // would all come from one region when ids correlate with content).
    // zipWithIndex over the range-sorted rows stays distributed — a global
    // row_number() window would funnel the whole corpus through one
    // partition, which cannot survive a large corpus.
    val n = proj.count()
    val step = math.max(1L, n / k)
    var centroids: Array[Array[Double]] = proj
      .select(col(vecCol), col(idCol)).orderBy(col(idCol))
      .rdd.zipWithIndex()
      .filter(_._2 % step == 0)
      .map(_._1)
      .take(k)
      .map(toDouble).map(l2normalize)

    for (_ <- 0 until iters) {
      val assigned = proj.select(
        NativeExprs.nearestCentroid(col(vecCol), centroids).as("cell"),
        posexplode(col(vecCol)).as(Seq("pos", "x")))
      val means = assigned
        .groupBy(col("cell"), col("pos"))
        .agg((sum(col("x").cast(DecimalType(28, 12))) /
          count(lit(1))).cast(DoubleType).as("m"))
        .collect()
      val next = Array.tabulate(centroids.length)(c => centroids(c).clone())
      means.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
      }
      centroids = next.map(l2normalize)
    }
    centroids
  }

  /** Per-query probe list: the `nprobe` cell indexes with the largest
    * query·centroid dot (shared by the transient [[topK]] and the
    * persisted [[IvfIndex.topK]]). */
  private[operators] def probeCells(qv: Column,
      centroids: Array[Array[Double]], nprobe: Int): Column = {
    val scored = (0 until centroids.length).map { i =>
      struct(NativeExprs.dotProduct(qv,
        typedLit(centroids(i).toSeq)).as("d"),
        lit(i).as("cell"))
    }
    slice(reverse(array_sort(array(scored: _*))), 1, nprobe)
      .getField("cell")
  }

  /** Exact-cosine top-k over the union of the `nprobe` nearest cells per
    * query. `nprobe` is the recall/cost knob: cells not probed are never
    * read — the point of IVF at scale. */
  def topK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int = 5, nCells: Int = 16, iters: Int = 3,
      nprobe: Int = 8): DataFrame = {
    val proj = corpus.select(col(idCol), col(vecCol)).localCheckpoint()
    val centroids = trainOnProjection(proj, idCol, vecCol, nCells, iters)

    val c = proj.select(col(idCol).as("cand_id"), col(vecCol).as("cv"))
      .withColumn("cell", NativeExprs.nearestCentroid(col("cv"), centroids))

    val q = broadcast(queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("cell", explode(probeCells(col("qv"), centroids, nprobe))))

    val scored = c.join(q, Seq("cell"))
      .filter(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        Vectors.cosine(col("qv"), col("cv")).as("cosv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosv").desc, col("cand_id"))
    scored
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("cand_id"),
        round(col("cosv"), 6).as("cosine"), col("rk"))
  }
}
