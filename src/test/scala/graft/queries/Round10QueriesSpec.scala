package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the round-10 batch: decontamination span
  * coverage, BPE merge selection + the replace convention, and the
  * leave-one-out trigram arithmetic. */
class Round10QueriesSpec extends SparkSpec {

  import spark.implicits._

  test("d17: overlapping hit spans merge into one island; disjoint spans add") {
    // doc 0 is eval; doc 1 embeds its 4-grams once (overlapping hits),
    // doc 2 twice with a gap (two disjoint islands)
    val docs = Seq(
      (0L, "w1 w2 w3 w4 w5 w6"),
      (1L, "x w1 w2 w3 w4 w5 w6 y"),
      (2L, "w1 w2 w3 w4 z1 z2 z3 w1 w2 w3 w4"))
      .toDF("doc_id", "text")
    val out = graft.operators.Decontaminate
      .report(docs, col("doc_id") === 0, n = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    // doc 1: hits at pos 1,2,3 -> spans [1,4],[2,5],[3,6] union = [1,6]
    assert(out(0) == ((1L, 3L, 6L, 8L, 0.75)))
    // doc 2: hits at pos 0 and 7 -> [0,3] + [7,10] = 8 of 11 tokens
    assert(out(1) == ((2L, 2L, 8L, 11L, 0.727273)))
  }

  test("t17: merge selection follows weighted pair counts with lexicographic ties") {
    // freq-weighted: b-c = 2+3+1 = 6 beats a-b = 5; then a-bc = 5; then abc-d = 2
    val words = Seq(("abcd", 2L), ("abc", 3L), ("bcd", 1L))
      .toDF("w", "freq")
    val out = graft.operators.Bpe.trainMerges(spark, words, rounds = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1, "b", "c", "bc", 6L),
      (2, "a", "bc", "abc", 5L),
      (3, "abc", "d", "abcd", 2L)))
  }

  test("t17: identical-symbol runs merge under the non-overlapping replace convention") {
    // "aaaa": round 1 merges (a,a) but the shared delimiter is consumed,
    // leaving [aa, a, a]; round 2 re-merges the trailing pair; round 3
    // joins the two halves. Deterministic and engine-shared (the DuckDB
    // oracle uses the same replace()), documented in Bpe's scaladoc.
    val words = Seq(("aaaa", 1L)).toDF("w", "freq")
    val out = graft.operators.Bpe.trainMerges(spark, words, rounds = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1, "a", "a", "aa", 3L),
      (2, "a", "a", "aa", 1L),
      (3, "aa", "aa", "aaaa", 1L)))
  }

  test("t17: training stops early when no mergeable pair remains") {
    // "ab" exhausts after one merge; rounds=3 must return 1 row, not throw
    val words = Seq(("ab", 2L), ("c", 5L)).toDF("w", "freq")
    val out = graft.operators.Bpe.trainMerges(spark, words, rounds = 3)
      .collect().map(r => (r.getInt(0), r.getString(3), r.getLong(4)))
    assert(out.toSeq == Seq((1, "ab", 2L)))
  }

  test("t19: segmentation counts reflect the learned merges") {
    // merges learned on this fixture: bc, a+bc, abc+d (see the t17 test)
    // => "abcd" tokenizes to 1 symbol, "abc" to 1, "bcd" to [bc, d] = 2
    val words = Seq(("abcd", 2L), ("abc", 3L), ("bcd", 1L))
      .toDF("w", "freq")
    val seg = graft.operators.Bpe.segmented(spark, words, rounds = 3)
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(seg == Map("abcd" -> 1L, "abc" -> 1L, "bcd" -> 2L))
  }

  test("t18: leave-one-out arithmetic on a hand example") {
    // d0,d1 identical "a b c"; d2 "a b d"; vocab = {a,b,c,d} so V=4.
    // d0's only trigram: C3=2, c3d=1; prefix bigram "a b": C2=3, c2d=1
    //   -> p = (2-1+1)/(3-1+4) = 1/3
    // d2: p = (1-1+1)/(3-1+4) = 1/6
    val docs = Seq((0L, "a b c"), (1L, "a b c"), (2L, "a b d"))
      .toDF("doc_id", "text")
    val dir = tmpDir("t18fix")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Round10Queries.t18_loo_lm(spark, dir.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(out.toSeq == Seq(
      (0L, 1L, r6(math.log(1.0 / 3))),
      (1L, 1L, r6(math.log(1.0 / 3))),
      (2L, 1L, r6(math.log(1.0 / 6)))))
  }

  test("t18: unique docs score strictly below their self-inclusive t9 twin") {
    // On the real fixture the LOO score removes each doc's own mass, so
    // no doc is flattered by its own trigrams; for docs whose trigrams
    // are corpus-unique (c3g == c3d) the held-out numerator drops to the
    // +1 floor and the score must sit below t9's ln(c3g/c2g) = ln of a
    // self-match. Spot-check the global mean is lower.
    val t9 = graft.queries.Round4Queries.t9_trigram_lm(spark, sf)
      .agg(avg("lm_score")).head.getDouble(0)
    val t18 = Round10Queries.t18_loo_lm(spark, sf)
      .agg(avg("loo_score")).head.getDouble(0)
    assert(t18 < t9)
  }
}
