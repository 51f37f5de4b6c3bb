package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariants for the round-105 operators, pinned at sf0.001. */
class Round105Spec extends SparkSpec {

  test("t58: Huffman cost matches a heap replay and the Shannon bounds") {
    val rows = Round105Queries.t58_huffman_economics(spark, sf).collect()
    assert(rows.nonEmpty)
    // independent driver replay: binary heap instead of the two-queue
    val freqs = graft.Tables.load(spark, sf, "documents")
      .filter(length(col("text")) > 0)
      .select(col("source"), explode(split(col("text"), "")).as("x"))
      .groupBy(col("source"), col("x")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(2)))
      .groupBy(_._1).map { case (s, cs) => s -> cs.map(_._2) }
    def heapCost(ws: Iterable[Long]): Long = {
      val pq = scala.collection.mutable.PriorityQueue.empty[Long](
        Ordering[Long].reverse)
      ws.foreach(pq.enqueue(_))
      var acc = 0L
      while (pq.size >= 2) {
        val m = pq.dequeue() + pq.dequeue()
        acc += m
        pq.enqueue(m)
      }
      acc
    }
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val bits = r.getAs[Long]("huffman_bits")
      assert(bits === heapCost(freqs(src)), s"heap replay differs for $src")
      val n = r.getAs[Long]("n_chars").toDouble
      val h = r.getAs[Double]("entropy_bits")
      val avg = r.getAs[Double]("avg_code_len")
      // Shannon: H <= avg < H + 1 (rounding slack 1e-5)
      assert(avg >= h - 1e-5, s"below entropy bound for $src")
      assert(avg < h + 1 + 1e-5, s"above redundancy bound for $src")
      assert(r.getAs[Double]("efficiency") <= 1.0 + 1e-5)
    }
    // expression anchors (sorted ascending input)
    import graft.functions.HuffmanCostExpr
    val df = spark.range(1).select(
      HuffmanCostExpr.huffmanCost(typedLit(Seq(1L, 1L))).as("a"),
      HuffmanCostExpr.huffmanCost(typedLit(Seq(1L, 1L, 2L))).as("b"),
      HuffmanCostExpr.huffmanCost(typedLit(Seq(1L, 2L, 3L))).as("c"),
      HuffmanCostExpr.huffmanCost(typedLit(Seq(7L))).as("d"),
      HuffmanCostExpr.huffmanCost(typedLit(Seq.empty[Long])).as("e"))
      .collect()(0)
    assert(df.getLong(0) === 2L)   // two leaves: one merge of 1+1
    assert(df.getLong(1) === 6L)   // depths 2,2,1 -> 1*2 + 1*2 + 2*1
    assert(df.getLong(2) === 9L)   // merges 1+2=3, 3+3=6
    assert(df.getLong(3) === 0L)   // degenerate one-leaf tree
    assert(df.getLong(4) === 0L)
  }

  test("t59: isotonic fit is monotone and matches a front-first merge replay") {
    val rows = Round105Queries.t59_isotonic_calibration(spark, sf).collect()
    assert(rows.nonEmpty)
    val bySource = rows.groupBy(_.getAs[String]("source"))
    // third algorithm: repeatedly merge the FIRST adjacent violation
    // (the isotonic fit is unique, so front-first must equal the
    // expression's stack order and the oracle's minimax)
    def frontFirst(bins: Seq[(Long, Long)]): Seq[Double] = {
      var pools = bins.map { case (w, wy) => (w, wy, 1) }.toBuffer
      var changed = true
      while (changed) {
        changed = false
        val i = pools.indices.dropRight(1).find(i =>
          pools(i)._2 * pools(i + 1)._1 > pools(i + 1)._2 * pools(i)._1)
        i.foreach { i =>
          val a = pools(i); val b = pools(i + 1)
          pools(i) = (a._1 + b._1, a._2 + b._2, a._3 + b._3)
          pools.remove(i + 1)
          changed = true
        }
      }
      pools.toSeq.flatMap { case (w, wy, c) =>
        Seq.fill(c)(wy.toDouble / w.toDouble)
      }
    }
    bySource.foreach { case (src, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("bin"))
      val fits = sorted.map(_.getAs[Double]("rate_iso"))
      assert(fits.zip(fits.tail).forall { case (a, b) => a <= b },
        s"non-monotone fit for $src")
      val ref = frontFirst(sorted.map(r =>
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_pos"))).toSeq)
        .map(v => math.round(v * 1e6) / 1e6)
      assert(fits.toSeq === ref, s"front-first replay differs for $src")
      // pool means conserve mass: sum w*fit == sum wy (fit is exact
      // rational per pool; allow fp slack from the rounding to 6)
      val mass = sorted.map(r =>
        r.getAs[Long]("n_docs") * r.getAs[Double]("rate_iso")).sum
      val wy = sorted.map(_.getAs[Long]("n_pos")).sum
      assert(math.abs(mass - wy) < 1e-3, s"mass not conserved for $src")
    }
  }
}
