package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multinomial Naive-Bayes text classification — the fastText-style
  * "train a classifier on a seed set, score the corpus" step of
  * quality/language filtering (CCNet, GPT-3's quality classifier use
  * exactly this shape with fancier features).
  *
  * Scale shape: the model is a vocabulary-sized table of per-class
  * token log-likelihoods — a dictionary that BROADCASTS (or
  * shuffle-joins on `w` if the vocabulary outgrows the threshold; both
  * sides are n-gram-keyed, nothing pairwise). Scoring the corpus is one
  * explode + one dictionary join + one aggregate: the same plan family
  * as TF-IDF (t7) and the trigram LM (t9), so the 100 TB argument is
  * identical. Training is two aggregates over the seed split.
  *
  * Determinism: per-(doc, class) scores are `round(·, 6)` BEFORE the
  * argmax, so both engines argmax over identical values; ties break
  * toward the lexicographically smaller class label via struct-min
  * (the rounded score rides in a never-compared third field — no
  * negate-back, so no -0.0 asymmetry).
  *
  * Reference scope: extension beyond the reference surface
  * (/root/reference/tools.py:58-65 leaves the transform dialect open).
  */
object NaiveBayes {

  /** Train on `isTrain` rows (add-one smoothing over the train
    * vocabulary), score the rest: (id, pred, label, correct, score). */
  def classify(docs: DataFrame, isTrain: Column, idCol: String,
      textCol: String, labelCol: String): DataFrame = {
    import graft.functions.Text
    val toks = docs.select(col(idCol).as("id"), isTrain.as("__tr"),
      col(labelCol).as("label"), explode(Text.tokens(col(textCol))).as("w"))
    val train = toks.where(col("__tr"))
    val trainDocs = docs.where(isTrain)

    val nTrain = trainDocs.agg(count(lit(1)).as("n_train"))
    val prior = trainDocs.groupBy(col(labelCol).as("lg"))
      .agg(count(lit(1)).as("n_docs"))
    val ntok = train.groupBy(col("label").as("lg"))
      .agg(count(lit(1)).as("n_tok"))
    val voc = train.agg(countDistinct(col("w")).as("v_sz"))
    val cnt = train.groupBy(col("label").as("lg"), col("w"))
      .agg(count(lit(1)).as("cnt"))

    val classes = prior.join(ntok, "lg").crossJoin(voc).crossJoin(nTrain)
    val scored = toks.where(!col("__tr")).select("id", "w")
      .crossJoin(broadcast(classes))
      .join(broadcast(cnt), Seq("lg", "w"), "left")
      .select(col("id"), col("lg"), col("n_docs"), col("n_train"),
        log((coalesce(col("cnt"), lit(0L)) + 1).cast(DoubleType) /
          (col("n_tok") + col("v_sz")).cast(DoubleType)).as("lp"))
      .groupBy(col("id"), col("lg"), col("n_docs"), col("n_train"))
      .agg(round(log(col("n_docs").cast(DoubleType) /
        col("n_train").cast(DoubleType)) + sum(col("lp")), 6).as("score"))

    val pred = scored
      .groupBy(col("id"))
      .agg(min(struct((-col("score")).as("ns"), col("lg").as("lg"),
        col("score").as("sc"))).as("best"))
      .select(col("id"), col("best.lg").as("pred"),
        col("best.sc").as("score"))
    pred.join(docs.select(col(idCol).as("id"), col(labelCol).as("label")),
        "id")
      .select(col("id"), col("pred"), col("label"),
        (col("pred") === col("label")).as("correct"), col("score"))
  }
}
