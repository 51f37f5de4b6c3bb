package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand fixtures for d19: diagonal islands find maximal runs, repeats
  * split into separate runs, and the df cap drops ubiquitous grams. */
class Round15QueriesSpec extends SparkSpec {

  import spark.implicits._

  private def docs = Seq(
    (0L, "a b c d e f g h i j"),
    (1L, "x a b c d e f g h i j y"),
    (2L, "a b c d e f g h z1 z2 z3 a b c d e f g h"))
    .toDF("doc_id", "text")

  test("d19: maximal runs via diagonals; repeated passages are separate runs") {
    // (0,1): the shared 10-token run = 3 consecutive 8-grams on one
    //        diagonal -> 1 run of 3+7 = 10 tokens
    // (0,2)/(1,2): doc 2 contains "a..h" twice -> two 1-gram runs of 8
    val out = graft.operators.Substring
      .sharedRuns(docs, "doc_id", "text", n = 8, minRunTokens = 8)
      .orderBy(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (0L, 1L, 1L, 10L, 3L),
      (0L, 2L, 2L, 8L, 2L),
      (1L, 2L, 2L, 8L, 2L)))
  }

  test("d19: the minRun threshold prunes short matches") {
    val out = graft.operators.Substring
      .sharedRuns(docs, "doc_id", "text", n = 8, minRunTokens = 9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((0L, 1L)))
  }

  test("a3: estimates are exact without collisions, overcounts never undercount") {
    import graft.operators.CountMin
    // separated keys: every cell holds one key -> min = exact count
    val clean = Seq(1L, 1L, 1L, 2L).toDF("k")
    val fam2 = Seq((1L, 0L), (5L, 3L))
    val cm = CountMin.sketch(clean, fam2, w = 8)
    val est = CountMin.estimate(clean.distinct(), cm, fam2, w = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(est == Map(1L -> 3L, 2L -> 1L))
    // forced collision (single row, keys 8 apart at w=8): the shared
    // cell reads 4 for both keys — an overcount, never an undercount
    val fam1 = Seq((1L, 0L))
    val coll = Seq(1L, 1L, 1L, 9L).toDF("k")
    val cmC = CountMin.sketch(coll, fam1, w = 8)
    val estC = CountMin.estimate(coll.distinct(), cmC, fam1, w = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(estC == Map(1L -> 4L, 9L -> 4L))
  }

  test("d19: maxDf drops ubiquitous grams before the pair join") {
    // "a b c d e f g h" appears in all 3 docs (df=3) -> dropped at
    // cap 2; (0,1) survives on its remaining 2-gram diagonal (9 tokens)
    val out = graft.operators.Substring
      .sharedRuns(docs, "doc_id", "text", n = 8, minRunTokens = 8,
        maxDf = Some(2))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq((0L, 1L, 1L, 9L, 2L)))
  }
}
