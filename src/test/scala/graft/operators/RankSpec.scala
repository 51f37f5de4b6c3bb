package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Rank/prefix-sum machinery against the sequential definitions, over
  * seeded pseudo-random fixtures with adversarial partitioning — the
  * distributed two-level formulation must be indistinguishable from a
  * single-threaded scan. */
class RankSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(seed: Long, n: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, math.abs(rnd.nextLong() % 1000L)))
  }

  test("globalRank equals the sorted sequential index for random data") {
    for (seed <- Seq(1L, 42L, 777L)) {
      val rows = fixture(seed, 500)
      val df = rows.toDF("id", "v").repartition(((seed % 7) + 2).toInt)
      val got = Rank.globalRank(df, "r", $"v".desc, $"id")
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      val want = rows.sortBy { case (id, v) => (-v, id) }
        .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
      assert(got == want, s"seed $seed: distributed rank diverged")
    }
  }

  test("prefixSum equals the sequential inclusive scan for random data") {
    for (seed <- Seq(5L, 99L)) {
      val rows = fixture(seed, 500)
      val df = rows.toDF("id", "v").repartition(((seed % 5) + 2).toInt)
      val got = Rank.prefixSum(df, "c", $"v", $"id")
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      var acc = 0L
      val want = rows.sortBy(_._1).map { case (id, v) =>
        acc += v; id -> acc
      }.toMap
      assert(got == want, s"seed $seed: distributed scan diverged")
    }
  }

  test("empty and single-row inputs survive both operators") {
    val empty = Seq.empty[(Long, Long)].toDF("id", "v")
    assert(Rank.globalRank(empty, "r", $"id").count() == 0)
    assert(Rank.prefixSum(empty, "c", $"v", $"id").count() == 0)
    val one = Seq((7L, 13L)).toDF("id", "v")
    assert(Rank.globalRank(one, "r", $"id").head().getLong(2) == 1L)
    assert(Rank.prefixSum(one, "c", $"v", $"id").head().getLong(2) == 13L)
  }
}
