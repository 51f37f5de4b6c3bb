package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.{HistQuantile, Hll}

/** Semantic invariants of the nineteenth batch: the sketch MERGE laws
  * (the property that makes HLL/histograms the right 100 TB primitives —
  * per-partition sketches must combine losslessly), estimator error
  * against exact ground truth, quantile bracket containment, and split
  * partition/ratio contracts.
  */
class Round19QueriesSpec extends SparkSpec {
  import spark.implicits._

  test("HLL merge law: registers(A ∪ B) = max-merge(registers(A), registers(B))") {
    val ev = graft.Tables.load(spark, sf, "events")
      .select($"event_type", $"user_id")
    val whole = Hll.registers(ev, Seq("event_type"), "user_id")
    val a = Hll.registers(ev.filter($"user_id" % 2 === 0),
      Seq("event_type"), "user_id")
    val b = Hll.registers(ev.filter($"user_id" % 2 === 1),
      Seq("event_type"), "user_id")
    val merged = Hll.merge(a, b, Seq("event_type"))
    assert(whole.exceptAll(merged).isEmpty && merged.exceptAll(whole).isEmpty,
      "merging half-corpus register tables must reproduce the whole-corpus" +
        " registers cell for cell")
  }

  test("grouped HLL estimates land within the 64-register error envelope") {
    val rows = Round19Queries.a8_hll_grouped(spark, sf).collect()
    assert(rows.length >= 3, "events must have several event types")
    rows.foreach { r =>
      val est = r.getLong(1)
      val exact = r.getLong(4)
      if (exact >= 5L * Hll.NumRegisters)
        // asymptotic regime, m=64: σ ≈ 1.04/√64 ≈ 13%; allow ~3σ
        assert(est > 0 && math.abs(est - exact).toDouble / exact < 0.45,
          s"${r.getString(0)}: est $est vs exact $exact drifts too far")
      else
        // n ≪ m: the raw estimator (no linear-counting branch — Hll
        // scaladoc) plateaus near α·m ≈ 45; bias stays bounded by it
        assert(est > 0 && est <= exact + 2L * Hll.NumRegisters,
          s"${r.getString(0)}: low-cardinality est $est vs exact $exact " +
            s"exceeds the documented raw-bias plateau")
    }
  }

  test("histogram merge law: hist(A ∪ B) adds counts cell for cell") {
    val cents = graft.Tables.load(spark, sf, "lineitem")
      .select(round($"l_extendedprice" * 100).cast("long").as("c"))
    val whole = HistQuantile.histogram(cents, "c", 100000L)
    val merged = HistQuantile.merge(
      HistQuantile.histogram(cents.filter($"c" % 2 === 0), "c", 100000L),
      HistQuantile.histogram(cents.filter($"c" % 2 === 1), "c", 100000L))
    assert(whole.exceptAll(merged).isEmpty && merged.exceptAll(whole).isEmpty)
  }

  test("quantile brackets contain their exact rank values") {
    val rows = Round19Queries.a9_quantile_hist(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(50L, 90L, 99L))
    rows.foreach { r =>
      val (rank, lo, hi, exact, n) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(lo <= exact && exact <= hi,
        s"q=${r.getLong(0)}: exact $exact outside bracket [$lo, $hi]")
      assert(rank >= 1 && rank <= n)
    }
    // p50 <= p90 <= p99 (monotone in q)
    val exacts = rows.map(_.getLong(4)).toSeq
    assert(exacts == exacts.sorted, s"quantiles must be monotone: $exacts")
  }

  test("streamed HLL registers equal the batch registers cell for cell") {
    val streamed = Round19Queries.e19_stream_hll_grouped(spark, sf)
    val ev = graft.Tables.load(spark, sf, "events")
      .select($"event_type", $"user_id")
    val batch = Hll.registers(ev, Seq("event_type"), "user_id")
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("hash split partitions the corpus with ~80/10/10 mass") {
    val rows = Round19Queries.p26_train_split(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = graft.Tables.load(spark, sf, "documents").count()
    assert(rows.values.sum == total,
      "every document must land in exactly one split")
    assert(rows.keySet == Set("train", "val", "test"))
    val train = rows("train").toDouble / total
    assert(train > 0.70 && train < 0.90, s"train fraction $train off target")
    // determinism: recomputing yields the identical assignment stats
    val again = Round19Queries.p26_train_split(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == rows)
  }

  test("histogram bins floor (not truncate) so negatives match SQL // semantics") {
    // -5 div 10 truncates to 0 but floors to -1; the oracle's `//` floors.
    val vals = Seq(-25L, -20L, -1L, 0L, 9L, 10L, 19L).toDF("c")
    val bins = HistQuantile.histogram(vals, "c", 10L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bins == Map(-3L -> 1L, -2L -> 1L, -1L -> 1L, 0L -> 2L, 1L -> 2L),
      s"floor-binning broken: $bins")
  }

  test("dyadicSketch rejects negative keys loudly instead of corrupting cells") {
    val keys = Seq(3L, -7L, 12L).toDF("k")
    val e = intercept[Exception] {
      graft.operators.CountMin.dyadicSketch(
        keys, graft.operators.CountMin.DefaultFamily, 64).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("negative key")), e.toString)
  }
}
