package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pins the H.264 Annex-B plumbing: emulation-prevention escape/strip
  * (§7.4.1.1), the Exp-Golomb walk, and the fixture census closed
  * forms the m52 oracle replays. */
class H264NalSpec extends AnyFunSuite {

  test("emulation prevention: escape inserts 03 at every phantom code") {
    val rbsp = Array[Byte](1, 0, 0, 1, 2, 0, 0, 2, 9, 0, 0, 3, 7, 0, 0, 0)
    val ebsp = H264Nal.escapeRbsp(rbsp)
    // each 00 00 0x run gains an 03: 4 sites
    assert(ebsp.length === rbsp.length + 4)
    val (back, stripped) = H264Nal.unescapeRbsp(ebsp)
    assert(stripped === 4)
    assert(back.toSeq === rbsp.toSeq)
  }

  test("emulation prevention: 00 00 above 03 is NOT escaped") {
    val rbsp = Array[Byte](0, 0, 4, 0, 0, 0x7F)
    val ebsp = H264Nal.escapeRbsp(rbsp)
    assert(ebsp.toSeq === rbsp.toSeq)
    assert(H264Nal.unescapeRbsp(ebsp)._1.toSeq === rbsp.toSeq)
  }

  test("escape/strip round trip across adversarial zero runs") {
    // long zero runs: 00 00 00 00 00 01 needs TWO escapes
    val rbsp = Array[Byte](5, 0, 0, 0, 0, 0, 1, 5)
    val (back, stripped) = H264Nal.unescapeRbsp(H264Nal.escapeRbsp(rbsp))
    assert(back.toSeq === rbsp.toSeq)
    assert(stripped === 2)
  }

  test("census parses the fixture to the doc_id closed forms") {
    for (docId <- 0L to 40L) {
      val row = H264Nal.census(H264Nal.encode(docId))
      val nIdr = (1 + docId % 3).toInt
      assert(row.getInt(0) === 2 + nIdr, s"n_nals docId=$docId")
      assert(row.getInt(1) === 1, s"n_sps docId=$docId")
      assert(row.getInt(2) === 1, s"n_pps docId=$docId")
      assert(row.getInt(3) === nIdr, s"n_idr docId=$docId")
      assert(row.getInt(4) === 2 * nIdr, s"n_epb docId=$docId")
      assert(row.getInt(5) === 16 * (2 + docId % 9), s"width docId=$docId")
      assert(row.getInt(6) === 16 * (2 + docId % 7), s"height docId=$docId")
      assert(row.getInt(7) === 4 + docId % 3, s"log2max docId=$docId")
      assert(row.getInt(8) === 30, s"level docId=$docId")
      assert(row.getLong(9) === 24L * nIdr, s"idr bytes docId=$docId")
    }
  }

  test("the raw stream really contains escaped phantom codes") {
    val stream = H264Nal.encode(7L)
    def count(pat: Array[Byte]): Int = {
      var c = 0
      for (i <- 0 to stream.length - pat.length)
        if (pat.indices.forall(j => stream(i + j) == pat(j))) c += 1
      c
    }
    // 2 IDR slices (7%3=1 → nIdr=2): each has 00 00 03 01 and 00 00 03 02
    assert(count(Array[Byte](0, 0, 3, 1)) === 2)
    assert(count(Array[Byte](0, 0, 3, 2)) === 2)
    // exactly one 4-byte start code (before the SPS), then 3-byte codes
    assert(stream.take(4).toSeq === Seq[Byte](0, 0, 0, 1))
    // no UNESCAPED phantom start codes: every 00 00 01 in the stream is
    // a real start code: count must equal the NAL count (3-byte codes
    // include the tail of the 4-byte one)
    assert(count(Array[Byte](0, 0, 1)) === 2 + 2)
  }

  test("census rejects a set forbidden_zero_bit") {
    val stream = H264Nal.encode(1L)
    val bad = stream.clone()
    bad(4) = (bad(4) | 0x80).toByte // NAL header after the 4-byte start
    intercept[IllegalArgumentException] { H264Nal.census(bad) }
  }
}
