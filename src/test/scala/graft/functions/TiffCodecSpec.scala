package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the TIFF codec: round trips under both compressions,
  * PackBits chunking edges (runs of 128/129/256, literals > 128), the
  * size formula the m49 oracle replays, the IFD walk (Software tag
  * skipped, inline vs out-of-line strip arrays), and loud rejection of
  * malformed containers. */
class TiffCodecSpec extends AnyFunSuite {

  /** Independent PackBits reference decoder (written from the TIFF 6.0
    * Appendix wording, not from TiffCodec's helpers). */
  private def refUnpack(b: Array[Byte]): Array[Int] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var p = 0
    while (p < b.length) {
      val h = b(p).toInt; p += 1
      if (h >= 0) { (0 to h).foreach { _ => out += (b(p) & 0xff); p += 1 } }
      else if (h != -128) { val v = b(p) & 0xff; p += 1
        (0 until 1 - h).foreach(_ => out += v) }
    }
    out.toArray
  }

  test("round trip: packbits and uncompressed, multi-strip, text fixture") {
    val px = TiffCodec.textPixels("tiff goes brr (not really, it is RLE)", 256)
    for (comp <- Seq(TiffCodec.CompNone, TiffCodec.CompPackBits)) {
      val img = TiffCodec.decodeTiff(TiffCodec.encodeTiff(px, 16, 16, 4, comp))
      assert(img.px.toSeq === px.toSeq, s"comp=$comp")
      assert(img.width === 16 && img.height === 16 && img.nStrips === 4)
      assert(img.compression === comp)
      if (comp == TiffCodec.CompNone) assert(img.compBytes === 256L)
    }
  }

  test("packbits matches an independent reference decoder on edge runs") {
    val cases = Seq(
      Array.fill(128)(7), // exactly one full run chunk
      Array.fill(129)(7), // chunk + 1 leftover → literal pair
      Array.fill(256)(7), // two full chunks
      Array.tabulate(200)(identity), // literal > 128 → two literal chunks
      Array(5, 5, 9, 9, 9, 1, 2, 3, 8, 8), // mixed run/literal/run
      Array(1), // single byte
      Array.tabulate(130)(i => if (i < 129) 4 else 9)) // 129-run then single
    cases.foreach { c =>
      val packed = TiffCodec.packBits(c, 0, c.length)
      assert(refUnpack(packed).toSeq === c.toSeq, s"case ${c.take(6).toSeq}…")
      assert(TiffCodec.unpackBits(packed.map(identity), 0, packed.length,
        c.length).toSeq === c.toSeq)
    }
  }

  test("packed size equals the oracle's run-structure formula") {
    val px = TiffCodec.textPixels("size formula check", 256)
    (0 until 4).foreach { s =>
      val packed = TiffCodec.packBits(px, s * 64, 64)
      // replay: group equal-adjacent, runs >= 2 cost 2·(L/128) + (L%128>0 ? 2:0),
      // adjacent singletons merge into literals costing m + ceil(m/128)
      var expect = 0
      var i = s * 64
      var lit = 0
      while (i < s * 64 + 64) {
        var j = i + 1
        while (j < s * 64 + 64 && px(j) == px(i)) j += 1
        val len = j - i
        if (len >= 2) {
          if (lit > 0) { expect += lit + (lit + 127) / 128; lit = 0 }
          expect += 2 * (len / 128) + (if (len % 128 == 0) 0 else 2)
        } else lit += 1
        i = j
      }
      if (lit > 0) expect += lit + (lit + 127) / 128
      assert(packed.length === expect, s"strip $s")
    }
  }

  test("IFD walk: Software tag present and skipped; arrays out of line") {
    val px = TiffCodec.textPixels("ifd walk", 256)
    val payload = TiffCodec.encodeTiff(px, 16, 16, 4, TiffCodec.CompPackBits)
    val ascii = new String(payload.filter(b => b >= 32 && b < 127).map(_.toChar))
    assert(ascii.contains("graft tiff"))
    assert(TiffCodec.decodeTiff(payload).px.toSeq === px.toSeq)
    // single-strip variant inlines offsets/counts in the IFD entry
    val one = TiffCodec.encodeTiff(px, 16, 16, 16, TiffCodec.CompNone)
    val img = TiffCodec.decodeTiff(one)
    assert(img.nStrips === 1 && img.px.toSeq === px.toSeq)
  }

  test("malformed containers are rejected loudly") {
    val px = TiffCodec.textPixels("bad", 256)
    val good = TiffCodec.encodeTiff(px, 16, 16, 4, TiffCodec.CompNone)
    val badMagic = good.clone(); badMagic(2) = 43
    assert(intercept[IllegalArgumentException](
      TiffCodec.decodeTiff(badMagic)).getMessage.contains("header"))
    // truncating a strip's byte count trips the exact-size check
    val packed = TiffCodec.encodeTiff(px, 16, 16, 4, TiffCodec.CompPackBits)
    val truncated = java.util.Arrays.copyOf(packed, packed.length)
    // corrupt a PackBits header byte inside strip 0 (offset 8 = first strip)
    truncated(8) = 127 // claims 128 literals, strip is shorter than that
    intercept[Exception](TiffCodec.decodeTiff(truncated))
  }
}
