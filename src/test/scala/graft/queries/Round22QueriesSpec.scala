package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Substring

/** Semantic invariants of the twenty-second batch: span removal excises
  * exactly the shared run (first occurrence kept), conservation of token
  * counts, and the mixture rebalance actually flattening the language
  * distribution deterministically.
  */
class Round22QueriesSpec extends SparkSpec {
  import spark.implicits._

  test("span removal excises exactly the planted run from the later doc") {
    val span = (1 to 15).map(i => s"shared$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $span gamma delta"),
      (2L, s"one two three $span four five"),
      (3L, "totally unrelated content with enough words to shingle fine"))
      .toDF("doc_id", "text")
    val out = Substring.removeSharedRuns(docs, "doc_id", "text",
        n = 8, minRunTokens = 12)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // doc 1 is the first occurrence: untouched
    assert(out(1L) == (19L, 0L, s"alpha beta $span gamma delta"))
    // doc 2 loses exactly the 15 shared tokens, order preserved
    assert(out(2L) == (20L, 15L, "one two three four five"))
    // doc 3 shares nothing
    assert(out(3L)._2 == 0L)
  }

  test("span removal conserves tokens on the fixture corpus") {
    val out = Substring.removeSharedRuns(
      graft.Tables.load(spark, sf, "documents"), "doc_id", "text",
      n = 8, minRunTokens = 12)
    val bad = out.filter(col("n_removed") < 0 ||
      col("n_removed") > col("n_tokens")).count()
    assert(bad == 0, "removal counts must stay within [0, n_tokens]")
    // cleaned text token count = n_tokens - n_removed, exactly
    val mism = out.withColumn("kept_ct",
        when(col("cleaned") === "", 0L)
          .otherwise(size(split(col("cleaned"), " ")).cast("long")))
      .filter(col("kept_ct") =!= col("n_tokens") - col("n_removed"))
      .count()
    assert(mism == 0, "rebuilt text must hold exactly the kept tokens")
  }

  test("mixture rebalance flattens the language distribution, reproducibly") {
    val rows = Round22Queries.t23_mixture_rebalance(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(rows.nonEmpty)
    val minOrig = rows.values.map(_._1).min
    rows.foreach { case (lang, (orig, ppm, kept)) =>
      assert(ppm == minOrig * 1000000L / orig, s"$lang rate")
      assert(kept <= orig)
      if (orig == minOrig)
        assert(kept == orig, "the rarest language keeps everything")
    }
    // flattening: kept spread (max/min) must not exceed the original
    // spread, and expected mass is minOrig per language (loose 3σ check)
    val keptCounts = rows.values.map(_._3)
    rows.foreach { case (lang, (orig, ppm, kept)) =>
      val expected = orig.toDouble * ppm / 1e6
      val sigma = math.sqrt(expected) max 1.0
      assert(math.abs(kept - expected) <= 4 * sigma,
        s"$lang: kept $kept vs expected $expected drifts > 4σ")
    }
    assert(keptCounts.max - keptCounts.min <=
      rows.values.map(_._1).max - minOrig)
    val again = Round22Queries.t23_mixture_rebalance(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(again == rows.view.mapValues(_._3).toMap, "assignment is pure")
  }
}
