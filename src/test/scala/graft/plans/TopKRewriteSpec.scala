package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins [[WindowTopKRewrite]]: the window-top-k idiom replans onto the
  * bounded-heap operator (Window node GONE), results are identical to
  * the window execution, and the conservative guards refuse the
  * patterns where the rewrite would be unsound. */
class TopKRewriteSpec extends SparkSpec {
  import spark.implicits._

  graft.operators.TopK.installRewrite(spark)

  private def data(n: Int, keys: Int, seed: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    Seq.tabulate(n)(i =>
      (rnd.nextLong(keys), rnd.nextLong(50), i.toLong))
      .toDF("k", "v", "uid")
  }

  /** The canonical idiom: non-nullable DESC order + ASC tiebreak, rank
    * dropped. (Literal-backed columns are non-nullable already.) */
  private def idiom(df: DataFrame, k: Int): DataFrame = df
    .withColumn("rk", row_number().over(
      Window.partitionBy(col("k")).orderBy(col("v").desc, col("uid"))))
    .filter(col("rk") <= k)
    .select(col("k"), col("v"), col("uid"))

  test("the idiom plans as the heap operator with no Window node") {
    val plan = idiom(data(500, 20, 3), 2).queryExecution.executedPlan.toString
    assert(plan.contains("GraftTopKPerKeyFinal"), plan)
    assert(plan.contains("GraftTopKPerKeyPartial"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("rewritten results equal the window execution exactly") {
    (1 to 3).foreach { s =>
      val df = data(800, 31, s)
      val got = idiom(df, 3).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // ground truth computed without the rule: plain scala fold
      val want = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1)
        .flatMap { case (_, rows) =>
          rows.sortBy(t => (-t._2, t._3)).take(3).toSeq
        }.toSet
      assert(got == want)
    }
  }

  test("rank-consuming and nullable-order patterns do NOT rewrite") {
    val df = data(200, 10, 7)
    // (a) the rank column is kept → must stay a Window
    val keepsRank = df.withColumn("rk", row_number().over(
        Window.partitionBy(col("k")).orderBy(col("v").desc, col("uid"))))
      .filter(col("rk") <= 2)
    assert(keepsRank.queryExecution.executedPlan.toString.contains("Window"))
    // (b) nullable order key → must stay a Window (heap drops nulls)
    val nullable = df.withColumn("vn",
        when(col("v") > 25, col("v"))) // nullable by construction
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("k")).orderBy(col("vn").desc, col("uid"))))
      .filter(col("rk") <= 2)
      .select(col("k"), col("uid"))
    assert(nullable.queryExecution.executedPlan.toString.contains("Window"))
    // (c) no tiebreaker → must stay a Window (no total order)
    val noTie = df.withColumn("rk", row_number().over(
        Window.partitionBy(col("k")).orderBy(col("v").desc)))
      .filter(col("rk") <= 2)
      .select(col("k"), col("v"))
    assert(noTie.queryExecution.executedPlan.toString.contains("Window"))
  }

  test("multi-column ASC tiebreaks fold into a struct and still rewrite") {
    // NB: uid2 must come from the source relation — an expression like
    // `uid % 7` is NULLABLE in Spark (zero-divisor semantics) and the
    // rule correctly refuses it
    val rnd = new scala.util.Random(11)
    val df = Seq.tabulate(300)(i =>
        (rnd.nextLong(9), rnd.nextLong(50), i.toLong, rnd.nextLong(7)))
      .toDF("k", "v", "uid", "uid2")
    val q = df.withColumn("rk", row_number().over(
        Window.partitionBy(col("k"))
          .orderBy(col("v").desc, col("uid2"), col("uid"))))
      .filter(col("rk") <= 2)
      .select(col("k"), col("uid"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("GraftTopKPerKeyFinal"), plan)
    assert(!plan.contains("Window"), plan)
    val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // .toSeq before flatMap: flatMap on a Map with pair results would
    // collapse to one entry per key
    val want = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).toSeq
      .flatMap { case (_, rows) =>
        rows.sortBy(t => (-t._2, t._4, t._3)).take(2).map(t => (t._1, t._3))
          .toSeq
      }.toSet
    assert(got == want)
  }
}
