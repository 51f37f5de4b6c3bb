package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariants for the round-126 operators, pinned at sf0.001. */
class Round126Spec extends SparkSpec {

  test("m48: FLAC decode is lossless and the coding decisions are real") {
    val rows = Round126Queries.m48_flac_audio(spark, sf).collect()
    val nDocs = graft.Tables.load(spark, sf, "documents").count()
    assert(rows.length === nDocs)
    rows.foreach { r =>
      // losslessness is earned per sample by the bitstream decode
      assert(r.getAs[Long]("sum_abs_err") === 0L,
        s"doc ${r.getAs[Long]("doc_id")} not lossless")
      assert(r.getAs[Long]("n_samples") === 192L)
      assert(r.getAs[Long]("n_frames") === 3L)
      // FIXED orders stay in the encoder's {0,1,2} window
      assert(r.getAs[Long]("sum_order") >= 0L &&
        r.getAs[Long]("sum_order") <= 6L)
      // a frame can never code below the CONSTANT floor (8+16 bits) and
      // the wobble keeps residual frames under VERBATIM cost
      assert(r.getAs[Long]("sub_bits") >= 3 * 24L)
      assert(r.getAs[Long]("sub_bits") < 3 * (8 + 64 * 16L))
    }
    // the ramp makes the order choice genuinely vary across the corpus
    val distinctOrders = rows.map(_.getAs[Long]("sum_order")).distinct
    assert(distinctOrders.length > 1,
      s"order choice degenerate: ${distinctOrders.toSeq}")
  }

  test("m49: TIFF decode reads real containers and PackBits genuinely packs") {
    val rows = Round126Queries.m49_tiff_decode(spark, sf).collect()
    assert(rows.length ===
      graft.Tables.load(spark, sf, "documents").count().toInt)
    rows.foreach { r =>
      assert(r.getAs[Int]("width") === 16 && r.getAs[Int]("height") === 16)
      assert(r.getAs[Int]("n_strips") === 4)
      assert(r.getAs[Long]("n_px") === 256L)
      val odd = r.getAs[Long]("doc_id") % 2 == 1
      assert(r.getAs[Int]("compression") === (if (odd) 32773 else 1))
      if (odd) // the run-blocks must actually compress below raw size
        assert(r.getAs[Long]("comp_bytes") < 256L,
          s"doc ${r.getAs[Long]("doc_id")} did not pack")
      else assert(r.getAs[Long]("comp_bytes") === 256L)
    }
  }

  test("t71: planted PII is found, lookalikes and bad checksums are not") {
    val byteTotals = Round126Queries.t71_pii_scan(spark, sf)
      .agg(sum("n_docs").as("n"), sum("n_pii_docs").as("pii"),
        sum("n_emails").as("em"), sum("n_ip_candidates").as("cand"),
        sum("n_valid_ips").as("vip"), sum("n_cards").as("cards"),
        sum("n_valid_cards").as("vcards"), sum("chars_redacted").as("red"))
      .collect().head
    val ids = graft.Tables.load(spark, sf, "documents")
      .select("doc_id").collect().map(_.getLong(0))
    assert(byteTotals.getAs[Long]("n") === ids.length.toLong)
    // exact planted counts from the mod rules
    assert(byteTotals.getAs[Long]("em") === ids.count(_ % 3 == 0).toLong)
    assert(byteTotals.getAs[Long]("cards") === ids.count(_ % 5 == 0).toLong)
    // every 999.x lookalike is a candidate but never validates
    assert(byteTotals.getAs[Long]("cand") ===
      (ids.count(_ % 4 == 0) + ids.count(_ % 8 == 0)).toLong)
    assert(byteTotals.getAs[Long]("vip") === ids.count(_ % 4 == 0).toLong)
    // broken check digits (doc_id ≡ 5 mod 10) fail Luhn, the rest pass
    assert(byteTotals.getAs[Long]("vcards") ===
      ids.count(i => i % 5 == 0 && i % 10 != 5).toLong)
    // redaction strictly shrinks every PII-bearing doc
    assert(byteTotals.getAs[Long]("red") > 0L)
    assert(byteTotals.getAs[Long]("pii") ===
      ids.count(i => i % 3 == 0 || i % 4 == 0 || i % 5 == 0).toLong)
  }
}
