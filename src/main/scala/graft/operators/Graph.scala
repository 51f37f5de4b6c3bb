package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Minimal graph operators for dedup pipelines: near-dup *pairs* (Dedup.*)
  * become near-dup *clusters* by connected components, and each cluster
  * keeps one representative (the min id) — the step that turns pairwise
  * similarity into an actual drop-list at corpus scale.
  */
object Graph {

  /** Connected components by min-label propagation over an undirected
    * edge list: every node starts labeled with itself; each round adopts
    * the minimum label among itself and its neighbors; fixpoint = each
    * node labeled with its component's minimum id. Deterministic
    * (min is order-independent), converges in O(component diameter)
    * rounds — dup clusters are shallow, so a handful. Each round is one
    * shuffle; at extreme scale swap in the large-star/small-star
    * contraction (same contract, fewer rounds on long chains).
    *
    * Returns (`n`, `cluster`) for every node appearing in `edges`. */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
      maxRounds: Int = 50, driverThreshold: Long = 1L << 20): DataFrame = {
    val und = edges.select(col(aCol).cast("long").as("a"),
        col(bCol).cast("long").as("b"))
      .union(edges.select(col(bCol).cast("long").as("a"),
        col(aCol).cast("long").as("b")))
      .distinct()
      .cache()
    // Small graphs (the common case once pairs came from a good candidate
    // generator) resolve in one driver-side union-find instead of
    // O(diameter) distributed rounds — the same size-based strategy switch
    // as a broadcast join. The distributed path below stays the scale
    // story for billion-edge graphs.
    if (und.count() <= driverThreshold) {
      val spark = edges.sparkSession
      import spark.implicits._
      val es = und.as[(Long, Long)].collect()
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) {
          val nx = parent.getOrElse(c, c); parent(c) = r; c = nx
        }
        r
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        // union by min so the representative is the component minimum
        if (ra != rb) {
          if (ra < rb) parent(rb) = ra else parent(ra) = rb
        }
      }
      val nodes = es.iterator.map(_._1).toSeq.distinct
      und.unpersist()
      return nodes.map(n => (n, find(n))).toDF("n", "l")
    }
    var labels = und.select(col("a").as("n")).distinct()
      .withColumn("l", col("n"))
      .cache()
    var round = 0
    var changed = 1L
    while (changed > 0 && round < maxRounds) {
      val nbrMin = und
        .join(labels.withColumnRenamed("n", "b2"), col("b") === col("b2"))
        .groupBy(col("a").as("n2")).agg(min(col("l")).as("nl"))
      val next = labels
        .join(nbrMin, col("n") === col("n2"), "left")
        .select(col("n"), least(col("l"), coalesce(col("nl"), col("l"))).as("l"))
        .cache()
      changed = next.join(labels.withColumnRenamed("l", "l0"), "n")
        .filter(col("l") =!= col("l0")).count()
      labels.unpersist()
      labels = next
      round += 1
    }
    und.unpersist()
    if (changed > 0) {
      labels.unpersist() // release the last round's cache on the error path too
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxRounds rounds " +
          s"($changed labels still changing) — component diameter exceeds " +
          "maxRounds; raise maxRounds or switch to star contraction")
    }
    // Materialize the fixpoint via the still-cached plan into an eager
    // localCheckpoint, then drop the cache: no cache entry outlives the
    // call, and the iterative lineage (O(rounds) joins) is truncated so
    // consumers don't risk recomputing it. Trade-off: localCheckpoint
    // blocks are executor-local and not fault-tolerant — a long-lived
    // cluster deployment should write the result to storage instead of
    // holding this handle across executor churn (the blocks free when the
    // returned DataFrame is garbage collected).
    val result = labels.localCheckpoint(true)
    labels.unpersist()
    result
  }
}
