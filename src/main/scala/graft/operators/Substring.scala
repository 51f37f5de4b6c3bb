package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT shared-substring-run detection between document pairs — the
  * distributed form of the suffix-array substring dedup of Lee et al.
  * 2022 ("Deduplicating Training Data Makes Language Models Better"):
  * find every maximal token run shared verbatim across documents, and
  * report pairs whose longest run passes a threshold. [[Dedup
  * .winnowOverlap]] (d13) is the sampled approximation of this; here
  * matches are exact and maximal.
  *
  * Mechanics: any shared run of ≥ `n` tokens appears as a DIAGONAL of
  * matching positional n-grams — pairs (posA, posB) with constant
  * posA − posB. So: positional n-grams → gram equi-join (pairs only
  * meet through shared grams, never all-pairs) → per (pair, diagonal)
  * consecutive-position islands = maximal runs (length = grams + n − 1).
  *
  * Scale shape: the join is keyed by gram (d2/d13's family). A gram in
  * df documents contributes ~df² rows — the same boilerplate hazard as
  * d13, bounded the same way: `maxDf` drops grams above a document
  * frequency cap BEFORE the join (lossy only for runs made entirely of
  * ubiquitous grams; d13b's knob, same spec treatment). Windows
  * partition by (pair, diagonal) — never global.
  *
  * Reference scope: extension beyond the reference surface
  * (/root/reference/tools.py:58-65 leaves the transform dialect open).
  */
object Substring {

  /** Maximal-run islands per (pair, diagonal):
    * (id_a, id_b, diag, isl, pa_min, len_grams). Shared by the detection
    * (sharedRuns) and removal (removeSharedRuns) faces. */
  private def islands(docs: DataFrame, idCol: String, textCol: String,
      n: Int, maxDf: Option[Int]): DataFrame = {
    import graft.functions.Text
    val grams = docs
      .select(col(idCol).as("id"),
        posexplode(Text.shingles(col(textCol), n)).as(Seq("pos", "g")))
      .localCheckpoint() // both join sides + the optional df filter
    val kept = maxDf match {
      case Some(cap) =>
        val dfc = grams.groupBy(col("g"))
          .agg(countDistinct(col("id")).as("df"))
          .where(col("df") <= cap)
          .select(col("g"))
        grams.join(dfc, "g")
      case None => grams
    }
    val a = kept.select(col("id").as("id_a"), col("pos").as("pa"), col("g"))
    val b = kept.select(col("id").as("id_b"), col("pos").as("pb"), col("g"))
    val m = a.join(b, "g").where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("pa"), col("pb"),
        (col("pa") - col("pb")).as("diag"))
    val w = Window.partitionBy(col("id_a"), col("id_b"), col("diag"))
      .orderBy(col("pa"))
    m.withColumn("rn", row_number().over(w))
      .withColumn("isl", col("pa") - col("rn"))
      .groupBy(col("id_a"), col("id_b"), col("diag"), col("isl"))
      .agg(min(col("pa")).as("pa_min"), count(lit(1)).as("len_grams"))
  }

  /** Per document pair: run count, longest shared run (tokens), and
    * total matched grams — pairs whose longest run ≥ `minRunTokens`. */
  def sharedRuns(docs: DataFrame, idCol: String, textCol: String,
      n: Int, minRunTokens: Int, maxDf: Option[Int] = None): DataFrame =
    islands(docs, idCol, textCol, n, maxDf)
      .select(col("id_a"), col("id_b"),
        (col("len_grams") + lit(n - 1)).cast("long").as("run_tokens"),
        col("len_grams"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_runs"),
        max(col("run_tokens")).as("max_run_tokens"),
        sum(col("len_grams")).as("shared_grams"))
      .where(col("max_run_tokens") >= minRunTokens)

  /** Corpus-level repeated-span REMOVAL — the apply step of Lee et al.
    * 2022's ExactSubstr dedup: every maximal token run of ≥
    * `minRunTokens` shared verbatim with a lower-id document is excised
    * from the higher-id copy (first corpus occurrence wins; earlier ids
    * are the standing corpus in ingest order). Returns one row per input
    * document: (id, n_tokens, n_removed, cleaned) with `cleaned` rebuilt
    * from the surviving tokens in order — empty string when everything
    * was boilerplate.
    *
    * Scale shape: coverage positions come from the SAME gram-keyed
    * island join as [[sharedRuns]] (never all-pairs; `maxDf` bounds
    * boilerplate grams); the rebuild groups by document — the
    * collect_list per doc holds one document's tokens, the same memory
    * class as the document itself. */
  def removeSharedRuns(docs: DataFrame, idCol: String, textCol: String,
      n: Int, minRunTokens: Int, maxDf: Option[Int] = None): DataFrame = {
    import graft.functions.Text
    val toks = docs.select(col(idCol).as("id"),
      posexplode(Text.tokens(col(textCol))).as(Seq("pos", "tok")))
    val covered = islands(docs, idCol, textCol, n, maxDf)
      .where(col("len_grams") + lit(n - 1) >= minRunTokens)
      .select(col("id_b").as("id"),
        explode(sequence(col("pa_min") - col("diag"),
          col("pa_min") - col("diag") + col("len_grams") + lit(n - 2)))
          .as("pos"))
      .distinct()
    val keptAgg = toks.join(covered, Seq("id", "pos"), "left_anti")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          e => e.getField("tok")), " ").as("cleaned"))
    toks.groupBy(col("id")).agg(count(lit(1)).as("n_tokens"))
      .join(keptAgg, Seq("id"), "left")
      .select(col("id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L)))
          .as("n_removed"),
        coalesce(col("cleaned"), lit("")).as("cleaned"))
  }
}
