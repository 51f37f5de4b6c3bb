package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand fixtures for the HLL/bottleneck/normalization batch, plus the
  * mix61 chain pinned against a from-first-principles replay. */
class Round18QueriesSpec extends SparkSpec {

  import spark.implicits._

  test("mix61 column equals the mulmod chain computed outside Spark") {
    import graft.functions.RollingMinHash.{mulmod, M}
    import graft.operators.CountMin
    def mixRef(k: Long): Long = {
      val h1 = (mulmod(k, 1299709L) + 104729L) % M
      (mulmod(mulmod(h1, h1), 179424673L) + 15485867L) % M
    }
    val keys = Seq(0L, 1L, 2L, 1000L, 123456789L, M - 1)
    val got = keys.toDF("k")
      .select(col("k"), CountMin.mix61(col("k"), 1299709L, 104729L).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    keys.foreach(k => assert(got(k) == mixRef(k), s"key $k"))
    // sequential keys must NOT land in sequential or stride-patterned
    // buckets: over 0..255 at w=64, a pure affine map yields ≤ a few
    // distinct strides; the mixed chain should fill most buckets
    val buckets = (0L to 255L).map(mixRef(_) % 64).distinct.size
    assert(buckets > 48, s"only $buckets distinct buckets")
  }

  test("widest path: bottleneck maximizes the minimum edge weight") {
    // 0→1→3 bottleneck min(10, 2) = 2; 0→2→3 bottleneck min(4, 8) = 4:
    // the wider route wins even though both have two hops
    val edges = Seq((0L, 1L, 10L), (1L, 3L, 2L), (0L, 2L, 4L),
      (2L, 3L, 8L)).toDF("src", "dst", "w")
    val out = graft.operators.Graph.widestPath(edges, source = 0L)
      .filter(col("node") === 3L).collect()(0).getLong(1)
    assert(out == 4L)
  }

  test("widest path: direct narrow edge loses to a wide detour") {
    val edges = Seq((0L, 9L, 1L), (0L, 1L, 50L), (1L, 9L, 30L))
      .toDF("src", "dst", "w")
    val out = graft.operators.Graph.widestPath(edges, source = 0L)
      .filter(col("node") === 9L).collect()(0).getLong(1)
    assert(out == 30L)
  }

  test("custom top-k operator matches the window formulation") {
    import org.apache.spark.sql.expressions.Window
    val df = Seq(
      (1L, 10L, 5.0), (1L, 11L, 9.0), (1L, 12L, 9.0), (1L, 13L, 1.0),
      (2L, 20L, 3.0), (3L, 30L, 7.0))
      .toDF("key", "id", "score")
    val got = graft.operators.TopK
      .perKey(df, Seq("key"), "score", "id", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = df.withColumn("rn", row_number().over(
        Window.partitionBy(col("key"))
          .orderBy(col("score").desc, col("id"))))
      .filter(col("rn") <= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // key 1: ties at 9.0 break by id -> {11, 12}; singleton keys pass through
    assert(got == want)
    assert(got == Set((1L, 11L), (1L, 12L), (2L, 20L), (3L, 30L)))
  }

  test("custom top-k plans as partial/final heaps around one exchange") {
    val df = Seq((1L, 10L, 5.0), (2L, 20L, 3.0)).toDF("key", "id", "score")
    val plan = graft.operators.TopK
      .perKey(df, Seq("key"), "score", "id", k = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("GraftTopKPerKeyPartial"), plan)
    assert(plan.contains("GraftTopKPerKeyFinal"), plan)
  }

  test("normalization chain merges case/punct/whitespace variants") {
    val norm = (c: org.apache.spark.sql.Column) =>
      md5(trim(regexp_replace(regexp_replace(lower(c),
        "[^a-z0-9 ]", ""), " +", " ")))
    val out = Seq("Hello  World", "hello world !!", "HELLO, WORLD",
      "different text")
      .toDF("text").select(norm(col("text")).as("h"))
      .collect().map(_.getString(0))
    assert(out(0) == out(1) && out(1) == out(2))
    assert(out(3) != out(0))
  }
}
