package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import scala.collection.mutable

/** Invariants for the round-113 operators, pinned at sf0.001. */
class Round113Spec extends SparkSpec {

  test("q161: matching is perfect, stable (no blocking pair), and replays GS") {
    val rows = Round113Queries.q161_stable_matching(spark, sf).collect()
    assert(rows.length === 25)
    val w = graft.Tables.load(spark, sf, "lineitem")
      .join(graft.Tables.load(spark, sf, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .join(graft.Tables.load(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(graft.Tables.load(spark, sf, "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").cast("long").as("u"),
        col("s_nationkey").cast("long").as("v"))
      .agg(count(lit(1)).as("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val n = 25
    val prefC = (0 until n).map(i => (0 until n).sortBy(j =>
      (-w.getOrElse((i.toLong, j.toLong), 0L), j))).toArray
    val rankS = (0 until n).map { j =>
      val order = (0 until n).sortBy(i =>
        (-w.getOrElse((i.toLong, j.toLong), 0L), i))
      order.zipWithIndex.map { case (i, r) => i -> r }.toMap
    }.toArray
    // driver GS replay
    val nextIdx = Array.fill(n)(0)
    val pC = Array.fill(n)(-1); val pS = Array.fill(n)(-1)
    while (pC.contains(-1)) {
      val p = pC.indexOf(-1)
      val j = prefC(p)(nextIdx(p)); nextIdx(p) += 1
      val cur = pS(j)
      if (cur == -1) { pS(j) = p; pC(p) = j }
      else if (rankS(j)(p) < rankS(j)(cur)) {
        pS(j) = p; pC(p) = j; pC(cur) = -1
      }
    }
    val names = graft.Tables.load(spark, sf, "nation")
      .select(col("n_name"), col("n_nationkey").cast("long")).collect()
      .map(r => r.getString(0) -> r.getLong(1).toInt).toMap
    val got = rows.map(r => names(r.getAs[String]("cust_nation")) ->
      names(r.getAs[String]("supp_nation"))).toMap
    (0 until n).foreach { i =>
      assert(got(i) === pC(i), s"partner differs for cust nation $i")
    }
    // perfect matching: each side used exactly once
    assert(got.values.toSeq.distinct.length === n)
    // stability: no blocking pair (i prefers j to partner AND j prefers i)
    val rankC = (0 until n).map(i =>
      prefC(i).zipWithIndex.map { case (j, r) => j -> r }.toMap).toArray
    for (i <- 0 until n; j <- 0 until n if j != got(i)) {
      val iPrefers = rankC(i)(j) < rankC(i)(got(i))
      val jPrefers = rankS(j)(i) < rankS(j)(pS(j))
      assert(!(iPrefers && jPrefers), s"blocking pair ($i, $j)")
    }
  }

  test("m38: blob sizes replay a driver flood fill and agree with m37") {
    val rows = Round113Queries.m38_blob_sizes(spark, sf).collect()
    assert(rows.nonEmpty)
    val m37 = Round103Queries.m37_blob_count(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_blobs"), r.getAs[Long]("n_on"))).toMap
    val texts = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def floodSizes(text: String): Seq[Long] = {
      val on = (0 until 64).filter { i =>
        (text.charAt(i % text.length).toInt % 256) >= 105
      }.toSet
      val seen = mutable.Set.empty[Int]
      val sizes = mutable.ArrayBuffer.empty[Long]
      on.toSeq.sorted.foreach { s0 =>
        if (!seen.contains(s0)) {
          val q = mutable.Queue(s0); seen += s0
          var c = 0L
          while (q.nonEmpty) {
            val x = q.dequeue(); c += 1
            Seq((x % 8 > 0, x - 1), (x % 8 < 7, x + 1),
              (x >= 8, x - 8), (x < 56, x + 8)).foreach {
              case (ok, nb) =>
                if (ok && on.contains(nb) && !seen.contains(nb)) {
                  seen += nb; q.enqueue(nb)
                }
            }
          }
          sizes += c
        }
      }
      sizes.sorted(Ordering[Long].reverse).toSeq
    }
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val want = floodSizes(texts(id))
      val csv = r.getAs[String]("sizes_csv")
      val got = if (csv.isEmpty) Seq.empty[Long] else
        csv.split(",").map(_.toLong).toSeq
      assert(got === want, s"sizes differ for doc $id")
      assert(r.getAs[Long]("n_blobs") === want.length.toLong)
      assert(r.getAs[Long]("n_blobs") === m37(id)._1, "disagrees with m37")
      assert(got.sum === m37(id)._2, "sizes don't sum to n_on")
      assert(r.getAs[Long]("max_blob") ===
        (if (want.isEmpty) 0L else want.max))
    }
  }

  test("e35: streaming EMD equals the q159 batch answer row-for-row") {
    val batch = Round112Queries.q159_wasserstein_drift(spark, sf).collect()
    val stream = Round113Queries.e35_stream_wasserstein(spark, sf).collect()
    assert(stream.length === batch.length)
    batch.zip(stream).foreach { case (b, s2) =>
      assert(b.getAs[String]("type_a") === s2.getAs[String]("type_a"))
      assert(b.getAs[String]("type_b") === s2.getAs[String]("type_b"))
      assert(b.getAs[Long]("emd_permille_hours") ===
        s2.getAs[Long]("emd_permille_hours"))
    }
  }
}
