package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.SparkSpec

/** Pins the native one-pass char-gram profile against the composable
  * Spark form it replaced (t5's round-12 rewrite must be semantics-
  * preserving) plus unit anchors for the normalize/edge rules. */
class CharGramStatsSpec extends SparkSpec {

  private def stats(s: String, n: Int): (Int, String, String) = {
    val r = CharGramStats.stats(UTF8String.fromString(s), n)
    (r.getInt(0),
      if (r.isNullAt(1)) null else r.getUTF8String(1).toString,
      if (r.isNullAt(2)) null else r.getUTF8String(2).toString)
  }

  test("unit anchors: normalize, dedup, ordering, short inputs") {
    assert(stats("abcabc", 3) === ((3, "abc", "cab"))) // abc bca cab abc
    assert(stats("", 3) === ((0, null, null)))
    assert(stats("ab", 3) === ((0, null, null)))
    assert(stats("abc", 3) === ((1, "abc", "abc")))
    // whitespace runs collapse, edges trim, case folds
    assert(stats("  A \t\n B ", 3) === stats("a b", 3))
    assert(stats("zzz zzz", 3) === ((4, " zz", "zzz"))) // 'z z' 'zz ' ' zz'
  }

  test("matches the composable form on non-ASCII edge inputs " +
      "(round-13 advisory fix: \\s is ASCII-only, lower() is the " +
      "codepoint-aware whole-string fold)") {
    import spark.implicits._
    // U+2028 line separator: Character.isWhitespace says yes, Java-regex
    // \s says NO — it must survive normalization as a regular char.
    // U+0130 İ: Character.toLowerCase gives 'i', lower() gives i + U+0307.
    // U+00C4/FULLWIDTH/emoji: multi-byte UTF-8 through the gram loop.
    val inputs = Seq(
      "a b cd", "İstanbul KEBAB", "ÄÖÜ äöü ss",
      "ＡＢＣ ｄｅｆ", "x🦀y🦀z", "tab\there  \n mixedws",
      "  ab ", "a b", "")
    val df = inputs.toDF("text")
    val grams = array_distinct(Text.charShingles(col("text"), 3))
    val want = df.select(col("text"), size(grams).as("n"),
        array_min(grams).as("mn"), array_max(grams).as("mx"))
      .collect().map(r => r.getString(0) ->
        ((r.getInt(1), r.getString(2), r.getString(3)))).toMap
    val got = df.select(col("text"), Text.charGramStats(col("text"), 3).as("g"))
      .select(col("text"), col("g.n_grams"), col("g.min_gram"), col("g.max_gram"))
      .collect().map(r => r.getString(0) ->
        ((r.getInt(1), r.getString(2), r.getString(3)))).toMap
    assert(got === want, "native form diverged from the composable form")
  }

  test("matches the composable Spark form on the sf0.001 corpus") {
    val docs = graft.Tables.load(spark, sf, "documents")
    val grams = array_distinct(Text.charShingles(col("text"), 3))
    val want = docs.select(col("doc_id"),
        size(grams).as("n_grams"), array_min(grams).as("min_gram"),
        array_max(grams).as("max_gram"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getString(2), r.getString(3)))).toMap
    val got = docs.select(col("doc_id"),
        Text.charGramStats(col("text"), 3).as("g"))
      .select(col("doc_id"), col("g.n_grams"), col("g.min_gram"),
        col("g.max_gram"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getString(2), r.getString(3)))).toMap
    assert(got.nonEmpty)
    assert(got === want, "native form diverged from the composable form")
  }
}
