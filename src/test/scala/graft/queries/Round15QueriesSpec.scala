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

  // test-side mirror of CountMin.mix61 / bucket (mulmod chain)
  private def bucketOf(k: Long, a: Long, b: Long, w: Int): Long = {
    import graft.functions.RollingMinHash.{mulmod, M}
    val h1 = (mulmod(k, a) + b) % M
    ((mulmod(mulmod(h1, h1), 179424673L) + 15485867L) % M) % w
  }

  test("a3: estimates are exact without collisions, overcounts never undercount") {
    import graft.operators.CountMin
    val fam2 = Seq((1299709L, 104729L), (15485863L, 1999L))
    // pick a partner key that shares no cell with key 1 under either row
    val clean2 = (2L to 500L).find(k2 => fam2.forall { case (a, b) =>
      bucketOf(k2, a, b, 64) != bucketOf(1L, a, b, 64) }).get
    val clean = Seq(1L, 1L, 1L, clean2).toDF("k")
    val cm = CountMin.sketch(clean, fam2, w = 64)
    val est = CountMin.estimate(clean.distinct(), cm, fam2, w = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(est == Map(1L -> 3L, clean2 -> 1L))
    // forced collision (single row): a key sharing key 1's cell reads the
    // merged count for both — an overcount, never an undercount
    val fam1 = Seq((1299709L, 104729L))
    val collider = (2L to 5000L).find(k2 =>
      bucketOf(k2, 1299709L, 104729L, 8) ==
        bucketOf(1L, 1299709L, 104729L, 8)).get
    val coll = Seq(1L, 1L, 1L, collider).toDF("k")
    val cmC = CountMin.sketch(coll, fam1, w = 8)
    val estC = CountMin.estimate(coll.distinct(), cmC, fam1, w = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(estC == Map(1L -> 4L, collider -> 4L))
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
