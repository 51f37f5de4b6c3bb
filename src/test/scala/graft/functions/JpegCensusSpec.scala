package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** Pins the marker-walk census against both fixture families (the m54
  * oracle's contract): the REAL baseline encoder's output and the
  * deterministic SOF2 progressive fixture, plus the failure posture on
  * structural corruption. */
class JpegCensusSpec extends AnyFunSuite {

  private def row(b: Array[Byte]) = {
    val r = JpegCensus.census(b)
    (r.getBoolean(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4),
      r.getInt(5), r.getInt(6), r.getInt(7), r.getInt(8), r.getInt(9),
      r.getBoolean(10))
  }

  test("progressive fixture census matches the closed forms") {
    for (id <- Seq(1L, 3L, 5L, 7L, 11L, 23L, 101L)) {
      val (prog, sof, w, h, nc, scans, dqt, dht, app, cov, eoi) =
        row(JpegCensus.buildProgressive(id))
      assert(prog && sof === 0xC2, s"id=$id")
      assert(w === JpegCensus.plannedWidth(id))
      assert(h === JpegCensus.plannedHeight(id))
      assert(nc === 3)
      assert(scans === 1 + 3 * JpegCensus.plannedAcBands(id))
      assert(dqt === 2 && dht === 2 && app === 1)
      assert(cov === 64 * 3, s"coverage invariant id=$id")
      assert(eoi)
    }
  }

  test("baseline encoder output census: SOF0, one full interleaved scan") {
    val text = UTF8String.fromString("census of a real baseline payload")
    val jpg = JpegCodec.encodeGrayBlocksJpeg(text, 4, 4, 50)
    val (prog, sof, w, h, nc, scans, dqt, dht, app, cov, eoi) = row(jpg)
    assert(!prog && sof === 0xC0)
    assert(w === 32 && h === 32 && nc === 1)
    assert(scans === 1 && dqt === 1 && dht === 2 && app === 1)
    assert(cov === 64)
    assert(eoi)
  }

  test("the census fixture is a MARKER-layer artifact: its filler entropy " +
      "still fails the real SOF2 pixel decoder loudly (census is the path " +
      "for it), while genuine progressive streams now decode") {
    // round 13: decodeJpeg gained full Annex G progressive support, so
    // SOF2 alone no longer rejects — but this fixture's entropy is
    // deterministic filler, not Huffman-coded data, and the decoder must
    // stay loud on it rather than return garbage pixels
    val e = intercept[IllegalArgumentException] {
      JpegCodec.decodeJpeg(JpegCensus.buildProgressive(5L))
    }
    assert(e.getMessage.contains("jpeg"))
    // a REAL progressive stream decodes (full coverage in JpegCodecSpec)
    val real = JpegCodec.encodeJpeg(16, 8, 1,
      Array.tabulate[Byte](128)(i => (i * 3).toByte), 75, progressive = true)
    assert(JpegCensus.census(real).getBoolean(0)) // is_progressive
    assert(JpegCodec.decodeJpeg(real).width === 16)
  }

  test("census fails loudly on structural corruption") {
    intercept[IllegalArgumentException] {
      JpegCensus.census(Array[Byte](0x12, 0x34))
    }
    val good = JpegCensus.buildProgressive(9L)
    // truncate inside a segment header
    intercept[IllegalArgumentException] {
      JpegCensus.census(java.util.Arrays.copyOf(good, 8))
    }
  }
}
