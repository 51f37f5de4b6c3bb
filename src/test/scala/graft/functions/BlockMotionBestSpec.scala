package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins the round-14 codegen'd [[NativeExprs.blockMotionBest]] against
  * the original windowed/higher-order spelling of m31's SAD search: both
  * must agree on every (sad, dy, dx, n_valid) — including the
  * (sad, dy, dx) lexicographic tie-break — over random rasters. */
class BlockMotionBestSpec extends SparkSpec {

  /** The pre-round-14 m31 shape: explode (blk, dy, dx), interpreted HOF
    * SAD, window rank 1 — the reference semantics. */
  private def windowed(frames: org.apache.spark.sql.DataFrame) = {
    val cand = frames
      .select(col("rid"), col("f0"), col("f1"),
        explode(expr("sequence(0, 3)")).as("blk"))
      .select(col("rid"), col("f0"), col("f1"), col("blk"),
        explode(expr("sequence(-1, 1)")).as("dy"))
      .select(col("rid"), col("f0"), col("f1"), col("blk"), col("dy"),
        explode(expr("sequence(-1, 1)")).as("dx"))
    val sad = cand.selectExpr("rid", "blk", "dx", "dy",
      """aggregate(transform(sequence(0, 15), i ->
        |  CASE WHEN (blk % 2) * 4 + i % 4 + dx BETWEEN 0 AND 7
        |        AND (blk div 2) * 4 + i div 4 + dy BETWEEN 0 AND 7
        |    THEN abs(CAST(f1[((blk div 2) * 4 + i div 4) * 8
        |                    + (blk % 2) * 4 + i % 4] AS BIGINT)
        |           - CAST(f0[((blk div 2) * 4 + i div 4 + dy) * 8
        |                    + (blk % 2) * 4 + i % 4 + dx] AS BIGINT))
        |    ELSE 0L END),
        |  0L, (acc, x) -> acc + x) AS sad""".stripMargin,
      """aggregate(transform(sequence(0, 15), i ->
        |  CASE WHEN (blk % 2) * 4 + i % 4 + dx BETWEEN 0 AND 7
        |        AND (blk div 2) * 4 + i div 4 + dy BETWEEN 0 AND 7
        |    THEN 1L ELSE 0L END), 0L, (acc, x) -> acc + x)
        |  AS n_valid""".stripMargin)
    sad.withColumn("rn", row_number().over(
        Window.partitionBy(col("rid"), col("blk"))
          .orderBy(col("sad"), col("dy"), col("dx"))))
      .filter(col("rn") === 1)
      .select(col("rid"), col("blk").cast("long").as("blk"),
        col("dx").cast("long").as("best_dx"),
        col("dy").cast("long").as("best_dy"), col("sad").as("best_sad"),
        col("n_valid"))
  }

  private def native(frames: org.apache.spark.sql.DataFrame) =
    frames
      .select(col("rid"), col("f0"), col("f1"),
        explode(expr("sequence(0, 3)")).as("blk"))
      .select(col("rid"), col("blk"),
        NativeExprs.blockMotionBest(col("f0"), col("f1"), col("blk"))
          .as("b"))
      .select(col("rid"), col("blk").cast("long").as("blk"),
        col("b").getItem(2).as("best_dx"),
        col("b").getItem(1).as("best_dy"),
        col("b").getItem(0).as("best_sad"),
        col("b").getItem(3).as("n_valid"))

  test("native argmin equals the windowed HOF spelling on random rasters") {
    val rnd = new scala.util.Random(41)
    val rows = (0 until 64).map { rid =>
      (rid.toLong, Array.fill(64)(rnd.nextInt(256)),
        Array.fill(64)(rnd.nextInt(256)))
    }
    // flat rasters force SAD ties across (dy, dx) — the tie-break case
    val flat = (64 until 72).map { rid =>
      (rid.toLong, Array.fill(64)(7), Array.fill(64)(7))
    }
    import spark.implicits._
    val frames = (rows ++ flat).toDF("rid", "f0", "f1")
    val a = windowed(frames).orderBy("rid", "blk").collect()
    val b = native(frames).orderBy("rid", "blk").collect()
    assert(a.length == b.length && a.length == 72 * 4)
    a.zip(b).foreach { case (x, y) => assert(x == y, s"$x != $y") }
  }
}
