package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariants for the round-114 operators, pinned at sf0.001. */
class Round114Spec extends SparkSpec {

  test("q162: only the removed node's keys move; placement replays in driver") {
    val rows = Round114Queries.q162_consistent_hashing(spark, sf).collect()
    assert(rows.length === 25)
    val total = rows.map(_.getAs[Long]("n_before")).sum
    assert(rows.map(_.getAs[Long]("n_after")).sum === total,
      "keys lost in resharding")
    val removed = rows.filter(_.getAs[Long]("is_removed") === 1L)
    assert(removed.length === 1)
    // consistent hashing's defining property: exactly the removed node's
    // keys move, nothing else
    assert(rows.map(_.getAs[Long]("moved_in")).sum ===
      removed(0).getAs[Long]("n_before"))
    assert(removed(0).getAs[Long]("n_after") === 0L)
    rows.filter(_.getAs[Long]("is_removed") === 0L).foreach { r =>
      assert(r.getAs[Long]("n_after") ===
        r.getAs[Long]("n_before") + r.getAs[Long]("moved_in"),
        s"survivor ${r.getAs[String]("n_name")} lost keys")
    }
    // driver replay of the full placement
    val P = BigInt("2305843009213693951")
    def mix(k: Long, a: Long, b: Long): Long = {
      val h1 = (BigInt(k) * a + b).mod(P)
      ((h1 * h1).mod(P) * 179424673L + 15485867L).mod(P).toLong
    }
    val ring = (for (nk <- 0L until 25L; vn <- 0L until 8L)
      yield (mix(nk * 31 + vn + 1, 1299709L, 104729L), nk))
      .sorted
    val keys = graft.Tables.load(spark, sf, "customer")
      .select(col("c_custkey")).collect().map(_.getLong(0))
    def owner(ringArr: Seq[(Long, Long)], ck: Long): Long = {
      val kp = mix(ck, 15485863L, 1999L)
      ringArr.find(_._1 >= kp).getOrElse(ringArr.head)._2
    }
    val before = keys.groupBy(owner(ring, _)).map { case (o, ks) =>
      o -> ks.length.toLong }
    val names = graft.Tables.load(spark, sf, "nation")
      .select(col("n_name"), col("n_nationkey").cast("long")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val nk = names(r.getAs[String]("n_name"))
      assert(r.getAs[Long]("n_before") === before.getOrElse(nk, 0L),
        s"placement differs for node $nk")
    }
    val rem = before.toSeq.sortBy { case (o, n) => (-n, o) }.head._1
    assert(names(removed(0).getAs[String]("n_name")) === rem)
    val ring2 = ring.filterNot(_._2 == rem)
    val after = keys.groupBy(owner(ring2, _)).map { case (o, ks) =>
      o -> ks.length.toLong }
    rows.foreach { r =>
      val nk = names(r.getAs[String]("n_name"))
      assert(r.getAs[Long]("n_after") === after.getOrElse(nk, 0L))
    }
  }

  test("m39: morphology obeys the lattice laws and replays per pixel") {
    val rows = Round114Queries.m39_morphology(spark, sf).collect()
    assert(rows.nonEmpty)
    val texts = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val text = texts(r.getAs[Long]("doc_id"))
      val on = (0 until 64).filter { i =>
        (text.charAt(i % text.length).toInt % 256) >= 105 }.toSet
      def inGrid(i: Int) = i >= 0 && i < 64
      def nbrs(i: Int) = Seq(
        if (i % 8 > 0) Some(i - 1) else None,
        if (i % 8 < 7) Some(i + 1) else None,
        if (i >= 8) Some(i - 8) else None,
        if (i < 56) Some(i + 8) else None).flatten
      val ero = on.filter(i => nbrs(i).length == 4 &&
        nbrs(i).forall(on.contains))
      val dil = (0 until 64).filter(i => on.contains(i) ||
        nbrs(i).exists(on.contains)).toSet
      val opened = (0 until 64).filter(i => ero.contains(i) ||
        nbrs(i).exists(ero.contains)).toSet
      assert(r.getAs[Long]("n_on") === on.size.toLong)
      assert(r.getAs[Long]("n_eroded") === ero.size.toLong)
      assert(r.getAs[Long]("n_dilated") === dil.size.toLong)
      assert(r.getAs[Long]("n_opened") === opened.size.toLong)
      // lattice laws: erosion <= original <= dilation; opening <= original
      assert(ero.subsetOf(on) && on.subsetOf(dil) && opened.subsetOf(on))
      val mask = opened.foldLeft(0L)((m, i) => m | (1L << i))
      assert(r.getAs[Long]("opened_lo") === (mask & 0xFFFFFFFFL))
      assert(r.getAs[Long]("opened_hi") === (mask >>> 32))
    }
  }
}
