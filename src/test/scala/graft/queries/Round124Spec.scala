package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariants for the round-124 operators, pinned at sf0.001. */
class Round124Spec extends SparkSpec {

  test("m44: per-block error is bounded by the scaled quantizer and " +
      "shrinks as quality rises") {
    val rows = Round124Queries.m44_jpeg_quality_sweep(spark, sf).collect()
    assert(rows.nonEmpty)
    // recompute the source block value from the text rule
    val texts = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val errByQ = scala.collection.mutable.Map[Long, (Long, Long)]()
    rows.foreach { r =>
      assert(r.getAs[Long]("v_min") === r.getAs[Long]("v_max"),
        "DC-only block must decode uniformly")
      assert(r.getAs[Long]("n_px") === 64L)
      val cps = texts(r.getAs[Long]("doc_id")).codePoints().toArray
      val v = cps((r.getAs[Long]("blk") % cps.length).toInt) % 256
      val err = math.abs(r.getAs[Long]("v_min") - v)
      val qdc = r.getAs[Long]("q_dc")
      assert(err <= qdc / 16 + 2, s"error $err exceeds quantizer bound " +
        s"for q_dc=$qdc")
      val (s0, n0) = errByQ.getOrElse(r.getAs[Long]("quality"), (0L, 0L))
      errByQ(r.getAs[Long]("quality")) = (s0 + err, n0 + 1)
    }
    def mean(q: Long) = { val (s, n) = errByQ(q); s.toDouble / n }
    assert(mean(90) <= mean(50) && mean(50) <= mean(25),
      s"mean abs error must shrink with quality: " +
        s"${errByQ.toSeq.sortBy(_._1)}")
  }

  test("m45: census partitions exactly into decoded + poison") {
    val r = Round124Queries.m45_jpeg_poison_census(spark, sf).collect().head
    val nTotal = r.getAs[Long]("n_total")
    val nDec = r.getAs[Long]("n_decoded")
    val nPoison = r.getAs[Long]("n_poison")
    assert(nTotal === nDec + nPoison)
    val expectPoison = graft.Tables.load(spark, sf, "documents")
      .filter(col("doc_id") % 5 === 0).count()
    assert(nPoison === expectPoison)
    assert(r.getAs[Long]("sum_pixels") > 0L)
  }
}
