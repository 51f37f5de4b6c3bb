package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariants for the round-122 operators, pinned at sf0.001. */
class Round122Spec extends SparkSpec {

  test("d49: purity and Rand index replay from the contingency table") {
    val r = Round122Queries.d49_kmeans_validation(spark, sf).collect()
    assert(r.length === 1)
    val row = r.head
    // driver replay from the same assignment + label join
    val asg = graft.operators.Kmeans
      .lloyd(graft.Tables.load(spark, sf, "embeddings"),
        "vec_id", "embedding", k = 4, iters = 2)
      .select(col("id").as("vec_id"), col("c").as("cluster")).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    val lab = graft.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("label")).collect()
      .map(x => x.getLong(0) -> x.get(1).asInstanceOf[Number].longValue)
    val cont = lab.groupBy(p => (asg(p._1), p._2))
      .map { case (k, vs) => k -> vs.length.toLong }
    val nn = lab.length.toLong
    def c2(x: Long) = x * (x - 1) / 2
    val snij2 = cont.values.map(c2).sum
    val sai2 = cont.groupBy(_._1._1).values
      .map(m => c2(m.values.sum)).sum
    val sbj2 = cont.groupBy(_._1._2).values
      .map(m => c2(m.values.sum)).sum
    val purity = cont.groupBy(_._1._1).values
      .map(_.values.max).sum
    assert(row.getAs[Long]("n_vectors") === nn)
    assert(row.getAs[Long]("purity_bp") === purity * 10000L / nn)
    assert(row.getAs[Long]("rand_bp") ===
      (c2(nn) + 2 * snij2 - sai2 - sbj2) * 10000L / c2(nn))
    // RI and purity live in (0, 10000]; with 10 labels vs k=4, purity
    // cannot be perfect
    assert(row.getAs[Long]("rand_bp") > 0 && row.getAs[Long]("rand_bp") <= 10000)
    assert(row.getAs[Long]("purity_bp") < 10000)
    assert(row.getAs[Long]("n_labels") === 10L)
  }

  test("t70: diversity ratios replay and rise with n") {
    val rows = Round122Queries.t70_distinct_ngrams(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n")).toSeq === Seq(1L, 2L, 3L))
    val texts = graft.Tables.load(spark, sf, "documents")
      .select(col("text")).collect().map(_.getString(0))
    rows.foreach { r =>
      val n = r.getAs[Long]("n").toInt
      val grams = texts.flatMap(t => t.trim.split("\\s+")
        .sliding(n).filter(_.length == n).map(_.mkString(" ")))
      assert(r.getAs[Long]("total") === grams.length.toLong)
      assert(r.getAs[Long]("n_distinct") === grams.distinct.length.toLong)
      assert(r.getAs[Long]("distinct_bp") ===
        grams.distinct.length.toLong * 10000L / grams.length)
    }
    // longer n-grams are strictly more diverse on natural-ish text
    val bps = rows.map(_.getAs[Long]("distinct_bp")).toSeq
    assert(bps(0) < bps(1) && bps(1) < bps(2), s"diversity curve $bps")
  }
}
