package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariants for the round-121 operators, pinned at sf0.001. */
class Round121Spec extends SparkSpec {

  /** Driver mirror of CountMin.mix61: h1 = (k·a+b) mod P, then
    * (h1² mod P · A2 + B2) mod P over the 2^61−1 field. */
  private def mix61(k: Long, a: Long, b: Long): Long = {
    val P = BigInt((1L << 61) - 1)
    val h1 = (BigInt(k) * a + b).mod(P)
    ((h1 * h1).mod(P) * 179424673L + 15485867L).mod(P).toLong
  }

  test("a25: every register table and estimate replays in the driver") {
    val rows = Round121Queries.a25_hll_m_sweep(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("m")).toSeq === Seq(16L, 32L, 64L))
    val keys = graft.Tables.load(spark, sf, "lineitem")
      .select(col("l_partkey")).collect().map(_.getLong(0))
    val exact = keys.distinct.length.toLong
    rows.foreach { r =>
      val m = r.getAs[Long]("m")
      assert(r.getAs[Long]("exact_distinct") === exact)
      val regs = Array.fill(m.toInt)(0)
      keys.foreach { k =>
        val h = mix61(k, 1299709L, 104729L)
        val v = h / m
        val rank =
          if (v == 0) 56 else math.min(56, java.lang.Long.numberOfTrailingZeros(v) + 1)
        val b = (h % m).toInt
        if (rank > regs(b)) regs(b) = rank
      }
      val zeros = regs.count(_ == 0).toLong
      assert(r.getAs[Long]("zero_registers") === zeros)
      val t56 = regs.map(rk =>
        if (rk == 0) BigInt(1) << 56 else BigInt(1) << (56 - rk)).sum
      val alpha = Map(16L -> BigInt(172288), 32L -> BigInt(713728),
        64L -> BigInt(2904064))(m)
      val est = (alpha * (BigInt(1) << 56)) / (t56 * 1000)
      assert(BigInt(r.getAs[Long]("hll_est")) === est, s"m=$m")
      assert(r.getAs[Long]("err_ppm") ===
        (est - exact).abs.toLong * 1000000L / exact)
    }
  }

  test("p55: bins conserve rows and fill near target except the tail") {
    val rows = Round121Queries.p55_compaction_plan(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = graft.Tables.load(spark, sf, "orders").count()
    assert(rows.map(_.getAs[Long]("bin_rows")).sum === total)
    val target = rows.head.getAs[Long]("target_rows")
    assert(target === (total + 3) / 4)
    // bins are consecutive from 0
    assert(rows.map(_.getAs[Long]("bin")).toSeq ===
      rows.indices.map(_.toLong))
    // next-fit on the running sum: every bin except the last holds at
    // least one row short of overflowing when the next partition lands
    rows.dropRight(1).foreach { r =>
      assert(r.getAs[Long]("fill_bp") <= 10000 + 10000,
        "a bin cannot exceed twice the target under next-fit")
    }
  }

  test("m41: clipping counters replay the WAV fixture sample rule") {
    val rows = Round121Queries.m41_audio_clip_gate(spark, sf).collect()
    assert(rows.length === 500)
    val texts = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.take(40).foreach { r =>
      val text = texts(r.getAs[Long]("doc_id"))
      val smp = (0 until 64).map { i =>
        (text.charAt(i % text.length).toInt * 257) % 65536 - 32768
      }
      assert(r.getAs[Long]("n_samples") === 64L)
      assert(r.getAs[Long]("n_clipped") ===
        smp.count(s => math.abs(s) >= 20000).toLong)
      assert(r.getAs[Long]("sum_samples") === smp.map(_.toLong).sum)
      assert(r.getAs[Long]("peak_abs") === smp.map(s => math.abs(s)).max.toLong)
    }
    // the 20000 threshold genuinely splits: some clips flag, some don't
    val flagged = rows.count(_.getAs[Long]("n_clipped") > 0)
    assert(flagged > 0 && flagged <= rows.length)
  }
}
