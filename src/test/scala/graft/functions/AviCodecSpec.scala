package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the AVI/MJPEG container codec: per-frame decode
  * equality against direct JpegCodec decodes, the RIFF odd-size pad
  * rule on frame chunks, frame ordering (offset value rule), header
  * cross-checks, and loud rejection of structural corruption. */
class AviCodecSpec extends AnyFunSuite {

  private val text = "the quick brown fox JUMPS over 13 lazy dogs!"

  test("frame luma sums equal direct per-frame JPEG decodes") {
    val avi = AviCodec.encodeAviMjpeg(text, 4, 2, 2, 50)
    val sums = AviCodec.decodeFrameLumaSums(avi)
    assert(sums.length === 4)
    val cps = text.codePoints().toArray
    for (f <- 0 until 4) {
      // rebuild frame f's JPEG independently and decode it directly
      val raster = new Array[Byte](16 * 16)
      for (y <- 0 until 16; x <- 0 until 16) {
        val k = (y / 8) * 2 + x / 8
        raster(y * 16 + x) = (cps((k + f) % cps.length) % 256).toByte
      }
      val direct = JpegCodec.decodeJpeg(
        JpegCodec.encodeJpeg(16, 16, 1, raster, 50))
      assert(sums(f) === direct.pixels.map(_.toLong).sum,
        s"frame $f luma sum drift")
    }
  }

  test("consecutive frames differ (the offset value rule is real)") {
    val sums = AviCodec.decodeFrameLumaSums(
      AviCodec.encodeAviMjpeg(text, 4, 2, 2, 50))
    assert(sums.distinct.length > 1)
  }

  test("odd-sized JPEG frames exercise the RIFF pad rule without desync") {
    // sweep texts; every container must decode all 4 frames in order,
    // and across the sweep at least one frame chunk must be odd-sized
    // (proving the pad path is actually live, not vacuously green)
    var sawOdd = false
    for (i <- 0 until 64) {
      // vary the PREFIX — the block-value rule reads the first few
      // codepoints, so a suffix change would leave every frame identical
      val avi = AviCodec.encodeAviMjpeg(s"$i~${i * 37}%$text", 4, 2, 2, 50)
      var p = 0
      for (_ <- 0 until 4) {
        p = avi.indexOfSlice("00dc".getBytes, p + 1)
        val sz = (avi(p + 4) & 0xff) | ((avi(p + 5) & 0xff) << 8) |
          ((avi(p + 6) & 0xff) << 16) | ((avi(p + 7) & 0xff) << 24)
        if (sz % 2 == 1) sawOdd = true
      }
      assert(AviCodec.decodeFrameLumaSums(avi).length === 4)
    }
    assert(sawOdd, "no odd-sized frame in 256 JPEGs — pad rule untested")
  }

  test("avih frame-count cross-check fires on a truncated movi") {
    val avi = AviCodec.encodeAviMjpeg(text, 4, 2, 2, 50)
    // truncate after the 2nd frame: find the 3rd '00dc' and cut there,
    // patching the movi LIST + RIFF sizes so the walk stays in bounds
    def find(n: Int): Int = {
      var p = 0; var seen = 0
      while (seen < n) {
        p = avi.indexOfSlice("00dc".getBytes, p + 1); seen += 1
      }
      p
    }
    val cut = find(3)
    val bad = java.util.Arrays.copyOf(avi, cut)
    // patch RIFF size
    val rs = bad.length - 8
    bad(4) = rs.toByte; bad(5) = (rs >> 8).toByte
    bad(6) = (rs >> 16).toByte; bad(7) = (rs >> 24).toByte
    // patch the movi LIST size: locate 'movi' fourcc
    val mv = bad.indexOfSlice("movi".getBytes)
    val msz = bad.length - mv
    bad(mv - 4) = msz.toByte; bad(mv - 3) = (msz >> 8).toByte
    bad(mv - 2) = (msz >> 16).toByte; bad(mv - 1) = (msz >> 24).toByte
    val e = intercept[IllegalArgumentException] {
      AviCodec.decodeFrameLumaSums(bad)
    }
    assert(e.getMessage.contains("avih declared"))
  }

  test("a non-AVI RIFF payload is rejected loudly") {
    val wav = AudioCodec.encodeWav(8000, AudioCodec.textSamples("abc", 16))
    val e = intercept[IllegalArgumentException] {
      AviCodec.decodeFrameLumaSums(wav)
    }
    assert(e.getMessage.contains("not a RIFF/AVI"))
  }
}
