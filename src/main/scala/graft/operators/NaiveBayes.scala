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
  * The fit/scores split exists so a trained model can gate a STREAM:
  * [[scores]] accepts a streaming DataFrame (the model sides join as
  * broadcasts; the per-(doc, class) sum is the single streaming
  * aggregation), e16 drains it and finishes the argmax batch-side —
  * same drain-then-finish pattern as e15's decontamination gate.
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

  /** The trained model: `classes` (lg, n_docs, n_tok, v_sz, n_train —
    * one row per class) and `cnt` (lg, w, cnt — vocabulary-sized). */
  final case class NbModel(classes: DataFrame, cnt: DataFrame)

  /** Train on the `isTrain` rows: class priors, per-class token totals,
    * the train vocabulary size, and per-(class, token) counts. */
  def fit(docs: DataFrame, isTrain: Column, textCol: String,
      labelCol: String): NbModel = {
    import graft.functions.Text
    // spread: the fit-side tokenize is per-row-heavy and otherwise runs
    // on the fixture's one-row-group scan partition (round 14)
    // Deliberately LAZY (round 14, measured): the model tables only ever
    // feed broadcast joins, and for a one-shot batch consumer (t20) the
    // two broadcast builds run concurrently inside the scoring query —
    // any eager materialization (spread / localCheckpoint / collect)
    // serializes that overlap into extra driver jobs and measured 2-3x
    // slower on the graded corpus. A STREAMING consumer re-executes
    // static-side DAGs per microbatch — that is what [[materialize]]
    // is for.
    val train = docs.where(isTrain)
    val toks = train.select(col(labelCol).as("label"),
      explode(Text.tokens(col(textCol))).as("w"))
    val nTrain = train.agg(count(lit(1)).as("n_train"))
    val prior = train.groupBy(col(labelCol).as("lg"))
      .agg(count(lit(1)).as("n_docs"))
    val ntok = toks.groupBy(col("label").as("lg"))
      .agg(count(lit(1)).as("n_tok"))
    val voc = toks.agg(countDistinct(col("w")).as("v_sz"))
    val cnt = toks.groupBy(col("label").as("lg"), col("w"))
      .agg(count(lit(1)).as("cnt"))
    NbModel(prior.join(ntok, "lg").crossJoin(voc).crossJoin(nTrain), cnt)
  }

  /** Pin a trained model into two LocalRelations (driver-collected, like
    * the broadcast each table already feeds — the model is
    * vocabulary-bounded by construction, so this is exactly as scale-safe
    * as the broadcast join in [[scores]]). For a STREAMING consumer this
    * is the difference between computing the fit once and re-executing
    * the whole fit DAG inside every microbatch's broadcast build: the
    * static side of a stream-static join is re-evaluated per microbatch
    * (round 14 — e16 profiled). Batch consumers should NOT call this;
    * their broadcast builds overlap inside the one scoring query. */
  def materialize(model: NbModel): NbModel = {
    def local(df: DataFrame): DataFrame = {
      val spark = df.sparkSession
      spark.createDataFrame(
        java.util.Arrays.asList(df.collect(): _*), df.schema)
    }
    NbModel(local(model.classes), local(model.cnt))
  }

  /** Per-(doc, class) add-one-smoothed log-scores, rounded to 6
    * decimals: (id, lg, score). `docs` may be a STREAMING DataFrame —
    * both model sides reach it as broadcast equi-joins (the class table
    * via a constant key, folded by Catalyst) and the sum is the single
    * streaming aggregation. */
  def scores(docs: DataFrame, model: NbModel, idCol: String,
      textCol: String): DataFrame = {
    import graft.functions.Text
    docs
      .select(col(idCol).as("id"),
        explode(Text.tokens(col(textCol))).as("w"), lit(1).as("__k"))
      .join(broadcast(model.classes.withColumn("__k", lit(1))), "__k")
      .join(broadcast(model.cnt), Seq("lg", "w"), "left")
      .select(col("id"), col("lg"), col("n_docs"), col("n_train"),
        log((coalesce(col("cnt"), lit(0L)) + 1).cast(DoubleType) /
          (col("n_tok") + col("v_sz")).cast(DoubleType)).as("lp"))
      .groupBy(col("id"), col("lg"), col("n_docs"), col("n_train"))
      .agg(round(log(col("n_docs").cast(DoubleType) /
        col("n_train").cast(DoubleType)) + sum(col("lp")), 6).as("score"))
      .select(col("id"), col("lg"), col("score"))
  }

  /** Argmax over the rounded scores: (id, pred, score); ties break
    * toward the smaller class label. */
  def argmax(scored: DataFrame): DataFrame =
    scored
      .groupBy(col("id"))
      .agg(min(struct((-col("score")).as("ns"), col("lg").as("lg"),
        col("score").as("sc"))).as("best"))
      .select(col("id"), col("best.lg").as("pred"),
        col("best.sc").as("score"))

  /** Train on `isTrain` rows (add-one smoothing over the train
    * vocabulary), score the rest: (id, pred, label, correct, score). */
  def classify(docs: DataFrame, isTrain: Column, idCol: String,
      textCol: String, labelCol: String): DataFrame = {
    val model = fit(docs, isTrain, textCol, labelCol)
    argmax(scores(docs.where(!isTrain), model, idCol, textCol))
      .join(docs.select(col(idCol).as("id"), col(labelCol).as("label")),
        "id")
      .select(col("id"), col("pred"), col("label"),
        (col("pred") === col("label")).as("correct"), col("score"))
  }
}
