package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed BPE merge training (Sennrich et al. 2016) over the corpus
  * word-type table — the tokenizer-training step of a training-data
  * pipeline, formulated the way it scales:
  *
  *   - the corpus collapses to (word type, frequency) first — vocabulary
  *     grows ~log-linearly with corpus size, so at 100 TB the type table
  *     is millions of rows where the corpus is trillions of tokens, and
  *     every later pass works on types weighted by frequency;
  *   - each round is ONE pair-count aggregate (map-side combined) over
  *     the type table plus a 1-row argmax to the driver (like the k×dim
  *     IVF centroid state, [[Ivf]]) — never a corpus-scale shuffle;
  *   - applying a merge is a per-row codegen'd `replace` on a
  *     delimiter-encoded symbol string — embarrassingly parallel.
  *
  * Symbol sequences are encoded as U+001F-delimited strings
  * (`"§a§b§c§"`), and a merge of pair (a,b) is literal
  * `replace(seq, "§a§b§", "§ab§")`. Replacement is non-overlapping
  * left-to-right — the convention shared bit-for-bit by Spark and the
  * DuckDB oracle, so merges are engine-reproducible. (On a run of ≥3
  * identical symbols this consumes the shared delimiter and merges
  * alternately — a deterministic variant of classic greedy BPE; ties in
  * pair counts break lexicographically on (left, right).)
  *
  * Reference scope: extension beyond the reference surface (its
  * transform dialect is open, /root/reference/tools.py:58-65).
  */
object Bpe {

  val Sep = "\u001f"

  /** Training loop shared by [[trainMerges]] and [[segmented]]: the merge
    * records plus the final per-word-type state (`w`, `freq`, `seq`). */
  private def train(words: DataFrame, rounds: Int)
      : (Seq[(Int, String, String, String, Long)], DataFrame) = {
    // "abc" -> "§a§b§c§": every symbol wrapped by delimiters
    var state = words
      .select(col("w"), col("freq").cast(LongType).as("freq"),
        concat(lit(Sep), regexp_replace(col("w"), "(.)", "$1" + Sep))
          .as("seq"))
      .localCheckpoint()

    val merges = Iterator.from(1).take(rounds).map { r =>
      val syms = filter(split(col("seq"), Sep), x => x =!= lit(""))
      val pairs = state
        .select(col("freq"), syms.as("L"))
        .where(size(col("L")) >= 2)
        .select(col("freq"),
          explode(transform(slice(col("L"), lit(1), size(col("L")) - 1),
            (x, i) => struct(x.as("a"),
              element_at(col("L"), i + 2).as("b")))).as("p"))
      val best = pairs
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(desc("cnt"), asc("a"), asc("b"))
        .limit(1)
        .collect() // 1-row argmax: the only driver state per round
      best.headOption.map { row =>
        val a = row.getString(0)
        val b = row.getString(1)
        val cnt = row.getLong(2)
        state = state.withColumn("seq",
          replace(col("seq"), lit(Sep + a + Sep + b + Sep),
            lit(Sep + a + b + Sep)))
        (r, a, b, a + b, cnt)
      }
    }.takeWhile(_.isDefined).flatten.toSeq // stop when no pair remains

    (merges, state)
  }

  /** The first `rounds` BPE merges learned from `words` (columns `w`,
    * `freq`): one row per round — (round, lft, rgt, merged, cnt). */
  def trainMerges(spark: SparkSession, words: DataFrame,
      rounds: Int): DataFrame = {
    import spark.implicits._
    train(words, rounds)._1.toDF("round", "lft", "rgt", "merged", "cnt")
  }

  /** The apply side of the tokenizer: train `rounds` merges, then return
    * the per-word-type segmentation table (`w`, `freq`, `n_sym` — the
    * post-merge symbol count). The whole corpus tokenizes by joining its
    * exploded tokens against this vocabulary-sized dictionary — the same
    * n-gram-keyed join shape as TF-IDF/t9, never a per-document loop. */
  def segmented(spark: SparkSession, words: DataFrame,
      rounds: Int): DataFrame = {
    val (_, state) = train(words, rounds)
    state.select(col("w"), col("freq"),
      size(filter(split(col("seq"), Sep), x => x =!= lit("")))
        .cast(LongType).as("n_sym"))
  }
}
