package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariants for the round-98 operators, pinned at sf0.001. */
class Round98Spec extends SparkSpec {

  test("q141: matched quantity is exactly min(supply, demand) per part") {
    val rows = Round98Queries.q141_fifo_allocation(spark, sf).collect()
    assert(rows.nonEmpty)
    val li = graft.Tables.load(spark, sf, "lineitem")
    def flowSum(pred: String) = li.filter(expr(pred))
      .groupBy(col("l_partkey"))
      .agg(sum(col("l_quantity").cast("long")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sup = flowSum("l_suppkey % 2 = 0")
    val dem = flowSum("l_suppkey % 2 = 1")
    rows.foreach { r =>
      val pk = r.getAs[Long]("pk")
      assert(r.getAs[Long]("matched") === math.min(sup(pk), dem(pk)))
      assert(r.getAs[Long]("unfilled") === math.max(dem(pk) - sup(pk), 0L))
      assert(r.getAs[Long]("leftover") === math.max(sup(pk) - dem(pk), 0L))
      // COGS is bounded by matched * [min, max] unit cost
      assert(r.getAs[Long]("cogs_cents") >= 0L)
    }
    // FIFO ordering actually matters: a LIFO replay for some part must
    // differ in COGS unless all unit costs are equal — verify the
    // interval overlap respects receipt order for one part driver-side
    val pk0 = rows.head.getAs[Long]("pk")
    val rec = li.filter(expr(s"l_suppkey % 2 = 0 AND l_partkey = $pk0"))
      .select(unix_micros(graft.Tables.tsMicros(
          li.filter(expr(s"l_suppkey % 2 = 0 AND l_partkey = $pk0")),
          "l_shipdate")).as("sd"),
        col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("long").as("q"),
        expr("CAST(ROUND(l_extendedprice * 100 / l_quantity) AS BIGINT)")
          .as("uc"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong,
        r.getLong(3), r.getLong(4)))
      .sortBy(r => (r._1, r._2, r._3, r._4, r._5))
    val demand = dem.getOrElse(pk0, 0L)
    var left = demand
    var cogs = 0L
    rec.foreach { case (_, _, _, q, uc) =>
      val take = math.min(left, q); cogs += take * uc; left -= take
    }
    assert(rows.head.getAs[Long]("cogs_cents") === cogs,
      s"FIFO COGS mismatch for part $pk0")
  }

  test("m33: compositing interpolates between the two rasters") {
    val rows = Round98Queries.m33_alpha_composite(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("out_min") >= 0L)
      assert(r.getAs[Long]("out_max") <= 255L)
      assert(r.getAs[Long]("out_sum") >= 64L * r.getAs[Long]("out_min"))
      assert(r.getAs[Long]("out_sum") <= 64L * r.getAs[Long]("out_max"))
    }
    // alpha = 0 -> output is exactly the dst raster (doc 0 qualifies)
    val texts = graft.Tables.load(spark, sf, "documents")
      .filter(col("doc_id") === 0).select(col("text"))
      .collect().head.getString(0)
    val cps = texts.codePoints().toArray
    val dstSum = (0 until 64)
      .map(i => (cps((i + 1) % cps.length) % 256).toLong).sum
    val d0 = rows.find(_.getAs[Long]("doc_id") == 0L).get
    assert(d0.getAs[Long]("alpha") === 0L)
    assert(d0.getAs[Long]("out_sum") === dstSum)
  }

  test("e33: the streaming skyline equals the batch q139 answer") {
    val stream = Round98Queries.e33_stream_skyline(spark, sf).collect()
    val batch = Round97Queries.q139_skyline(spark, sf).collect()
    assert(stream.map(_.toSeq).toSeq === batch.map(_.toSeq).toSeq)
  }
}
