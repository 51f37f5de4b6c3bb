package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Benchmark decontamination: flag training documents that share any
  * token n-gram with an evaluation set, and measure *how much* of each
  * document the shared spans cover (the GPT-3/PaLM-style report — a doc
  * that embeds a whole eval example is worse than one sharing a single
  * idiom).
  *
  * Reference scope: extension beyond the reference surface (its
  * transform dialect is open, /root/reference/tools.py:58-65); the
  * operator family follows the published decontamination recipe
  * (n-gram collision against the eval set, Brown et al. 2020 app. C).
  *
  * Scale shape, in order:
  *   1. positional n-grams come from the native codegen'd
  *      [[graft.functions.NativeExprs]] shingle expression — one pass,
  *      no per-row UDF;
  *   2. the eval side is DISTINCT n-grams of the (small) eval corpus and
  *      is **broadcast** — eval benchmarks are MBs against a 100 TB
  *      train side, so the probe is map-side and shuffle-free;
  *   3. span coverage is an interval union computed with the classic
  *      islands trick — windows are partitioned BY doc_id (never a
  *      global window), so coverage is embarrassingly parallel in the
  *      number of contaminated docs.
  *
  * At 100 TB the only wide operation is the final per-doc aggregate over
  * *hit* rows — a tiny fraction of the corpus when contamination is rare,
  * which is the operating point of the measurement.
  */
object Decontaminate {

  /** Per-document contamination report against the eval split.
    *
    * @param docs     (idCol, textCol) corpus, eval rows included
    * @param isEval   predicate over `docs` columns choosing the eval split
    * @param n        n-gram width (13 in the published recipes; smaller
    *                 for short-document or small-vocabulary corpora)
    * @return contaminated train docs only: doc_id, n_matched,
    *         covered_tokens, n_tok, contamination_frac
    */
  def report(docs: DataFrame, isEval: Column, n: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import graft.functions.Text
    // one scan: positional n-grams for both splits, split by the predicate
    val grams = docs
      .select(col(idCol), isEval.as("__ev"),
        Text.tokenCount(col(textCol)).cast(LongType).as("n_tok"),
        posexplode(Text.shingles(col(textCol), n)).as(Seq("pos", "ng")))
    val evalSet = grams.where(col("__ev")).select(col("ng")).distinct()
    val hits = grams.where(!col("__ev"))
      .join(broadcast(evalSet), "ng")
      .select(col(idCol), col("n_tok"), col("pos"),
        (col("pos") + lit(n - 1)).as("e"))
    coverage(hits, idCol)
  }

  /** The eval split's DISTINCT n-gram set — the (small, broadcastable)
    * static side of an ingest-time decontamination gate. */
  def evalGrams(docs: DataFrame, isEval: Column, n: Int,
      textCol: String = "text"): DataFrame = {
    import graft.functions.Text
    docs.where(isEval)
      .select(explode(Text.shingles(col(textCol), n)).as("ng"))
      .distinct()
  }

  /** Collision rows (id, n_tok, pos, e) of `train` against a prepared
    * eval n-gram set. `train` may be a STREAMING DataFrame: the probe is
    * a stateless stream-static broadcast join, so decontamination runs at
    * ingest time with zero state — [[coverage]] finishes the (tiny) hit
    * set after the drain. */
  def hitsAgainst(train: DataFrame, evalSet: DataFrame, n: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import graft.functions.Text
    train
      .select(col(idCol),
        Text.tokenCount(col(textCol)).cast(LongType).as("n_tok"),
        posexplode(Text.shingles(col(textCol), n)).as(Seq("pos", "ng")))
      .join(broadcast(evalSet), "ng")
      .select(col(idCol), col("n_tok"), col("pos"),
        (col("pos") + lit(n - 1)).as("e"))
  }

  /** Interval-union span coverage over hit rows (id, n_tok, pos, e):
    * islands per doc, then per-island extents summed. Windows partition
    * by the doc id — never global. */
  def coverage(hits: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val prev = byDoc.rowsBetween(Window.unboundedPreceding, -1)
    val islands = hits
      .withColumn("mep", max(col("e")).over(prev))
      .withColumn("new_isl",
        when(col("mep").isNull || col("pos") > col("mep"), 1).otherwise(0))
      .withColumn("g", sum(col("new_isl")).over(byDoc))
    islands
      .groupBy(col(idCol), col("n_tok"), col("g"))
      .agg(min(col("pos")).as("s0"), max(col("e")).as("e0"),
        count(lit(1)).as("nh"))
      .groupBy(col(idCol), col("n_tok"))
      .agg(sum(col("nh")).cast(LongType).as("n_matched"),
        sum(col("e0") - col("s0") + 1).cast(LongType).as("covered_tokens"))
      .select(col(idCol), col("n_matched"), col("covered_tokens"),
        col("n_tok"),
        round(col("covered_tokens").cast("double") /
          col("n_tok").cast("double"), 6).as("contamination_frac"))
      .orderBy(col(idCol))
  }
}
