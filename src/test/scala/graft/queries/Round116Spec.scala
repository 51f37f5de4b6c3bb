package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariants for the round-116 operators, pinned at sf0.001. */
class Round116Spec extends SparkSpec {

  test("t65: repetition fractions replay against a driver brute force") {
    val rows = Round116Queries.t65_gopher_repetition(spark, sf).collect()
    assert(rows.nonEmpty)
    val texts = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val toks = texts(r.getAs[Long]("doc_id")).trim.split("\\s+").toSeq
      val bg = toks.sliding(2).map(_.mkString(" ")).toSeq
      val n = bg.length.toLong
      assert(r.getAs[Long]("n_bigrams") === n)
      val dup = (n - bg.distinct.length) * 10000L / n
      val top = bg.groupBy(identity).values.map(_.length).max * 10000L / n
      assert(r.getAs[Long]("dup_bp") === dup)
      assert(r.getAs[Long]("top_bp") === top)
      // fractions live in [0, 10000] and top-bigram mass bounds dup mass:
      // each duplicated occurrence belongs to SOME bigram's count
      assert(dup >= 0 && dup <= 10000 && top >= 1 && top <= 10000)
    }
  }

  test("t66: MATTR equals the sliding-window brute force and sits in (0, 1]") {
    val rows = Round116Queries.t66_mattr(spark, sf).collect()
    assert(rows.nonEmpty)
    val texts = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val toks = texts(r.getAs[Long]("doc_id")).trim.split("\\s+").toSeq
      val wins = toks.sliding(20).toSeq
      assert(r.getAs[Long]("n_windows") === wins.length.toLong)
      val sumD = wins.map(_.distinct.length.toLong).sum
      val bp = sumD * 10000L / (wins.length.toLong * 20L)
      assert(r.getAs[Long]("mattr_bp") === bp)
      assert(bp > 0 && bp <= 10000)
    }
  }

  test("p53: the sample is the exact 50 smallest priorities, reproducibly") {
    val a = Round116Queries.p53_hash_priority_sample(spark, sf).collect()
    val b = Round116Queries.p53_hash_priority_sample(spark, sf).collect()
    assert(a.length === 50)
    // byte-identical across runs — determinism is the operator's contract
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    // replay: the driver computes every priority and takes the true top-50
    val all = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("n_chars")).collect()
      .map { r =>
        val id = r.getLong(0)
        val w = r.get(1).asInstanceOf[Number].longValue
        (id * 2654435761L % 1000003L * 10000L / w, id)
      }.sorted.take(50)
    assert(a.map(r => (r.getAs[Long]("priority"),
      r.getAs[Long]("doc_id"))).toSeq === all.toSeq)
    // weighting direction: the sampled docs' mean weight exceeds the
    // corpus mean (dividing the hash by w favors heavy documents)
    val corpusMean = graft.Tables.load(spark, sf, "documents")
      .agg(avg(col("n_chars"))).collect().head.getDouble(0)
    val sampleMean = a.map(_.getAs[Long]("w")).sum.toDouble / a.length
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean vs corpus $corpusMean")
  }
}
