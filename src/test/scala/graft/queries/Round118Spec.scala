package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariants for the round-118 operators, pinned at sf0.001. */
class Round118Spec extends SparkSpec {

  test("s26: drift ranks replay against a driver recompute; cos in [-1,1]") {
    val rows = Round118Queries.s26_centroid_drift(spark, sf).collect()
    assert(rows.length === 5)
    val cos = rows.map(_.getAs[Double]("centroid_cos")).distinct
    assert(cos.length === 1 && cos.head >= -1.0 && cos.head <= 1.0)
    // driver recompute of the quantized per-dim sums
    val embs = graft.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.round(x.toDouble * 1000)).toArray)
    val (a, b) = embs.partition(_._1 % 2 == 0)
    def sums(h: Array[(Long, Array[Long])]): Array[Long] =
      h.map(_._2).reduce((u, v) => u.zip(v).map { case (x, y) => x + y })
    val (sa, sb) = (sums(a), sums(b))
    val (na, nb) = (a.length.toLong, b.length.toLong)
    val shifts = sa.indices
      .map(i => (math.abs(sa(i) * nb - sb(i) * na), i.toLong))
      .sortBy { case (d, i) => (-d, i) }.take(5)
    rows.zip(shifts).foreach { case (r, (d, i)) =>
      assert(r.getAs[Long]("dim") === i)
      assert(r.getAs[Long]("shift_x") === d)
      assert(r.getAs[Long]("sa") === sa(i.toInt))
      assert(r.getAs[Long]("sb") === sb(i.toInt))
    }
    val dot = sa.zip(sb).map { case (x, y) => x * y }.sum.toDouble
    val exp = dot / (math.sqrt(sa.map(x => x * x).sum.toDouble) *
      math.sqrt(sb.map(x => x * x).sum.toDouble))
    assert(math.abs(cos.head - exp) < 1e-6)
  }

  test("t68: OOV counts replay against driver token sets") {
    val rows = Round118Queries.t68_oov_rate(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("text")).collect()
    val vocab = docs.filter(_.getString(1) != "src0")
      .flatMap(_.getString(2).trim.split("\\s+")).toSet
    val ev = docs.filter(_.getString(1) == "src0")
      .map(r => r.getLong(0) -> r.getString(2).trim.split("\\s+").toSeq).toMap
    assert(rows.length === ev.size)
    rows.foreach { r =>
      val toks = ev(r.getAs[Long]("doc_id"))
      val oov = toks.count(!vocab.contains(_)).toLong
      assert(r.getAs[Long]("n_tok") === toks.length.toLong)
      assert(r.getAs[Long]("n_oov") === oov)
      assert(r.getAs[Long]("oov_bp") === oov * 10000L / toks.length)
    }
  }

  test("e37: the streaming monitor equals the batch OOV scan row-for-row") {
    val streamed = Round118Queries.e37_stream_oov_monitor(spark, sf)
      .collect().map(_.toString).toSeq
    val batch = Round118Queries.t68_oov_rate(spark, sf)
      .collect().map(_.toString).toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }
}
