package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand fixtures for the sketch-planning + SSSP batch: CM inner product
  * bounds the true join size, KMV order statistics, portable minhash
  * slots replay under BigInt arithmetic, Bellman-Ford relaxes to the
  * hand-computed distances. */
class Round16QueriesSpec extends SparkSpec {

  import spark.implicits._

  test("cm inner product: exact when one key, total-product when all collide") {
    import graft.operators.CountMin
    val fam = Seq((1299709L, 104729L), (15485863L, 1999L))
    // single shared key, no cross terms possible: est = 2·1 = |A ⋈ B|
    val cmA = CountMin.sketch(Seq(1L, 1L).toDF("k"), fam, w = 64)
    val cmB = CountMin.sketch(Seq(1L).toDF("k"), fam, w = 64)
    assert(CountMin.joinSizeEstimate(cmA, cmB).collect()(0).getLong(0) == 2L)
    // w = 1 collapses every key into one cell: est = ΣA·ΣB = 3·2 = 6,
    // an overcount of the true size 2 (key 1 only) — never an undercount
    val cA = CountMin.sketch(Seq(1L, 1L, 2L).toDF("k"), fam, w = 1)
    val cB = CountMin.sketch(Seq(1L, 9L).toDF("k"), fam, w = 1)
    val est = CountMin.joinSizeEstimate(cA, cB).collect()(0).getLong(0)
    assert(est == 6L)
    assert(est >= 2L)
  }

  test("portable minhash: slots replay under plain modular arithmetic") {
    import graft.functions.{NativeExprs, NativeHash, RollingMinHash, Text}
    val M = BigInt(RollingMinHash.M)
    val sig = Seq("w1 w2 w3 w4").toDF("text")
      .select(NativeExprs.minhashSigPortable(
        Text.shingles(col("text"), 3), 4).as("sig"))
      .collect()(0).getSeq[Long](0)
    // two 3-gram shingles; expected slot j = min over shingles of
    // (B2^(j+1) · polyHash(sh)) mod M, recomputed here with BigInt
    val expected = (0 until 4).map { j =>
      Seq("w1 w2 w3", "w2 w3 w4").map { sh =>
        (BigInt(1000033).modPow(BigInt(j + 1), M) *
          BigInt(NativeHash.polyHash(sh)) mod M).toLong
      }.min
    }
    assert(sig == expected)
    // empty shingle set -> all-sentinel signature
    val empty = Seq("w1").toDF("text")
      .select(NativeExprs.minhashSigPortable(
        Text.shingles(col("text"), 3), 4).as("sig"))
      .collect()(0).getSeq[Long](0)
    assert(empty.forall(_ == RollingMinHash.M))
  }

  test("identical docs agree on every minhash slot") {
    import graft.functions.{NativeExprs, Text}
    val sigs = Seq("a b c d e f", "a b c d e f").toDF("text")
      .select(NativeExprs.minhashSigPortable(
        Text.shingles(col("text"), 3), 32).as("sig"))
      .collect().map(_.getSeq[Long](0))
    assert(sigs(0) == sigs(1))
  }

  test("sssp: hand graph distances; unreachable nodes stay absent") {
    val edges = Seq((0L, 1L, 5L), (1L, 2L, 1L), (0L, 2L, 10L),
      (3L, 0L, 1L)).toDF("src", "dst", "w")
    val out = graft.operators.Graph.sssp(edges, source = 0L)
      .orderBy(col("node"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // 0→2 direct costs 10 but 0→1→2 costs 6; node 3 only reaches 0,
    // nothing reaches it
    assert(out.toSeq == Seq((0L, 0L), (1L, 5L), (2L, 6L)))
  }

  test("sssp: longer-but-cheaper paths win over fewer hops") {
    val edges = Seq((0L, 9L, 100L), (0L, 1L, 1L), (1L, 2L, 1L),
      (2L, 3L, 1L), (3L, 9L, 1L)).toDF("src", "dst", "w")
    val out = graft.operators.Graph.sssp(edges, source = 0L)
      .filter(col("node") === 9L).collect()(0).getLong(1)
    assert(out == 4L)
  }
}
