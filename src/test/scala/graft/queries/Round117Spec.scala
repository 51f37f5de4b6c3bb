package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariants for the round-117 operators, pinned at sf0.001. */
class Round117Spec extends SparkSpec {

  test("t67: mixture entropy is bounded by log2(n_langs) and counts docs") {
    val rows = Round117Queries.t67_lang_mixture(spark, sf).collect()
    assert(rows.nonEmpty)
    val totalDocs = graft.Tables.load(spark, sf, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === totalDocs)
    rows.foreach { r =>
      val h = r.getAs[Double]("lang_entropy")
      val k = r.getAs[Long]("n_langs")
      assert(h >= -1e-9, s"entropy $h negative")
      assert(h <= math.log(k.toDouble) / math.log(2.0) + 1e-9,
        s"entropy $h exceeds log2($k)")
      assert(r.getAs[Long]("top_lang_docs") <= r.getAs[Long]("n_docs"))
    }
  }

  test("d48: containment replays against a driver shingle-set brute force") {
    val rows = Round117Queries.d48_source_overlap(spark, sf).collect()
    assert(rows.nonEmpty)
    // driver recompute: per-source distinct 3-shingle sets from raw text
    val sets = graft.Tables.load(spark, sf, "documents")
      .select(col("source"), col("text")).collect()
      .groupBy(_.getString(0))
      .map { case (src, rs) =>
        src -> rs.flatMap { r =>
          val t = r.getString(1).trim.split("\\s+")
          if (t.length >= 3) t.sliding(3).map(_.mkString(" ")) else Iterator.empty
        }.toSet
      }
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("src_a"), r.getAs[String]("src_b"))
      assert(a < b, "pair orientation")
      val inter = (sets(a) & sets(b)).size.toLong
      assert(r.getAs[Long]("sz_a") === sets(a).size.toLong)
      assert(r.getAs[Long]("sz_b") === sets(b).size.toLong)
      assert(r.getAs[Long]("shared") === inter)
      assert(r.getAs[Long]("containment_bp") ===
        inter * 10000L / math.min(sets(a).size, sets(b).size))
      assert(r.getAs[Long]("containment_bp") <= 10000L)
    }
    // every source pair with any overlap appears exactly once
    val seen = rows.map(r => (r.getString(rows.head.fieldIndex("src_a")),
      r.getString(rows.head.fieldIndex("src_b")))).toSet
    val expected = for {
      a <- sets.keys; b <- sets.keys
      if a < b && (sets(a) & sets(b)).nonEmpty
    } yield (a, b)
    assert(seen === expected.toSet)
  }

  test("e36: streaming gate equals the batch aggregation row-for-row") {
    val streamed = Round117Queries.e36_stream_quality_gate(spark, sf)
      .collect().map(_.toString).toSeq
    val batch = {
      import org.apache.spark.sql.types.LongType
      val docs = graft.Tables.load(spark, sf, "documents")
      val t = docs.select(col("source"),
        split(trim(col("text")), "\\s+").as("t"))
        .filter(size(col("t")) >= 2)
        .withColumn("bg", expr(
          "transform(sequence(1, size(t) - 1), i -> concat(t[i-1], ' ', t[i]))"))
        .select(col("source"),
          expr("(size(bg) - size(array_distinct(bg))) * 10000 div size(bg)")
            .as("dup_bp"),
          expr("""array_max(transform(array_distinct(bg),
            |  x -> size(filter(bg, y -> y = x)))) * 10000 div size(bg)"""
            .stripMargin).as("top_bp"))
      t.groupBy(col("source"))
        .agg(count(lit(1)).cast(LongType).as("n_docs"),
          sum(when(col("dup_bp") >= 500, 1L).otherwise(0L)).as("n_flag_dup"),
          sum(when(col("top_bp") >= 600, 1L).otherwise(0L)).as("n_flag_top"),
          sum(when(col("dup_bp") >= 500 || col("top_bp") >= 600, 1L)
            .otherwise(0L)).as("n_gated"))
        .orderBy(col("source")).collect().map(_.toString).toSeq
    }
    assert(streamed === batch)
    // the gate must actually split the corpus (thresholds are calibrated
    // against the metric medians, not rubber stamps)
    val gated = Round117Queries.e36_stream_quality_gate(spark, sf)
      .agg(sum(col("n_gated")), sum(col("n_docs"))).collect().head
    assert(gated.getLong(0) > 0 && gated.getLong(0) < gated.getLong(1))
  }

  test("m40: pixel entropy replays the text-derived histogram per doc") {
    val rows = Round117Queries.m40_image_entropy(spark, sf).collect()
    assert(rows.length === 500)
    val texts = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.take(40).foreach { r =>
      val text = texts(r.getAs[Long]("doc_id"))
      val vals = (0 until 64).map(i => text.charAt(i % text.length).toInt % 256)
      assert(r.getAs[Long]("n_pixels") === 64L)
      assert(r.getAs[Long]("n_values") === vals.distinct.length.toLong)
      val h = r.getAs[Double]("pixel_entropy")
      assert(h >= 0.0 && h <= 6.0 + 1e-9) // log2(64) bits max
    }
  }
}
