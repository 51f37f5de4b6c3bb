package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class IvfSpec extends SparkSpec {
  import spark.implicits._

  /** Four well-separated direction clusters in 8-d: members of a cluster
    * share a dominant axis with small deterministic jitter. */
  private def clustered(nPerCluster: Int) = {
    val rows = for {
      c <- 0 until 4
      i <- 0 until nPerCluster
    } yield {
      val v = Array.fill(8)(0.05f * ((c * 31 + i * 7) % 5))
      v(c * 2) = 10.0f + (i % 3)
      (c.toLong * nPerCluster + i, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("on clustered data, probing 1 of 4 cells recovers the exact top-k") {
    val corpus = clustered(25)
    val queries = corpus.filter(col("vec_id").isin(0L, 30L, 60L, 90L))
    val exact = Similarity.bruteForceTopK(corpus, queries,
      "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    val ivf = Ivf.topK(corpus, queries, "vec_id", "embedding",
      k = 3, nCells = 4, iters = 3, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(ivf == exact)
  }

  test("centroid training is deterministic across invocations") {
    val corpus = clustered(10)
    val a = Ivf.trainCentroids(corpus, "vec_id", "embedding", k = 4, iters = 3)
    val b = Ivf.trainCentroids(corpus, "vec_id", "embedding", k = 4, iters = 3)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("persisted index round-trips the quantizer and serves the exact top-k") {
    val corpus = clustered(25)
    val queries = corpus.filter(col("vec_id").isin(0L, 30L, 60L, 90L))
    val dir = tmpDir("ivf_idx").toString
    val trained = IvfIndex.build(corpus, "vec_id", "embedding",
      nCells = 4, iters = 3, dir)
    assert(IvfIndex.loadCentroids(spark, dir).map(_.toSeq).toSeq ==
      trained.map(_.toSeq).toSeq, "centroids must round-trip bit-for-bit")
    val exact = Similarity.bruteForceTopK(corpus, queries,
      "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    val served = IvfIndex.topK(spark, dir, queries, "vec_id", "embedding",
      k = 3, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(served == exact,
      "probing 1 of 4 cells on clustered data must recover the exact answer")
  }

  test("persisted probe reads only the probed cells' partition directories") {
    val corpus = clustered(25)
    val dir = tmpDir("ivf_prune").toString
    IvfIndex.build(corpus, "vec_id", "embedding", nCells = 4, iters = 3, dir)
    val allFiles = {
      val root = java.nio.file.Paths.get(dir, "cells")
      val s = java.nio.file.Files.walk(root)
      try s.filter(_.toString.endsWith(".parquet")).count()
      finally s.close()
    }
    // AQE wraps executed stages in leaf nodes `collect` can't descend
    // into; the pruning property is AQE-independent, so assert it on the
    // plain physical plan
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = IvfIndex.topK(spark, dir,
        corpus.filter(col("vec_id") === 0L), "vec_id", "embedding",
        k = 3, nprobe = 1)
      df.collect()
      val scan = df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
            if f.relation.location.rootPaths.exists(
              _.toString.contains("cells")) => f
      }.head
      assert(scan.partitionFilters.nonEmpty,
        "the probed-cell list must reach the scan as a partition filter")
      val read = scan.metrics("numFiles").value
      assert(read > 0 && read < allFiles,
        s"1-of-4-cell probe must not open every cell's files " +
          s"(read $read of $allFiles)")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
