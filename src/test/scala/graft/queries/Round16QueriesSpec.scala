package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand fixtures for the sketch-planning + SSSP batch: CM inner product
  * bounds the true join size, KMV order statistics, portable minhash
  * slots replay under BigInt arithmetic, Bellman-Ford relaxes to the
  * hand-computed distances. */
class Round16QueriesSpec extends SparkSpec {

  import spark.implicits._

  test("cm inner product: min over rows, never under the true join size") {
    import graft.operators.CountMin
    // fam row 0 (identity mod 8): A{1,1,2} -> b1:2, b2:1; B{1,9} -> b1:2
    //   (9 ≡ 1): ip = 2·2 = 4
    // fam row 1 ((5k+3) mod 8): A -> b0:2 (k=1), b5:1; B -> b0:2: ip = 4
    // true |A ⋈ B| = key 1: 2·1 = 2 -> est 4 is an overcount, min = 4
    val fam = Seq((1L, 0L), (5L, 3L))
    val cmA = CountMin.sketch(Seq(1L, 1L, 2L).toDF("k"), fam, w = 8)
    val cmB = CountMin.sketch(Seq(1L, 9L).toDF("k"), fam, w = 8)
    val est = CountMin.joinSizeEstimate(cmA, cmB).collect()(0).getLong(0)
    assert(est == 4L)
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
