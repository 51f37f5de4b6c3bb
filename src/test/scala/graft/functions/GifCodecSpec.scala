package graft.functions

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import graft.SparkSpec
import graft.functions.GifCodec.{decodeGif, encodeGif}

/** The GIF codec, pinned four ways:
  *
  *  1. GOLDEN BYTES — an LZW code stream laid out BY HAND (codes picked
  *     and bit-packed in comments, not by our compressor), so an
  *     encoder/decoder bug pair in the variable-width coder can't
  *     cancel out. Covers the CLEAR prelude, a KwKwK reference, and
  *     LSB-first packing.
  *  2. ROUND-TRIPS — encode→decode identity across shapes chosen to hit
  *     the coder's edges: constant rasters (deep KwKwK chains), random
  *     rasters big enough to fill the 4096-entry dictionary and force a
  *     mid-stream CLEAR, and sizes straddling every 2^w code-width
  *     boundary (the classic early-change off-by-one).
  *  3. INTEROP, BOTH DIRECTIONS — the JDK's independent ImageIO GIF
  *     codec decodes our bytes pixel-exact, and we decode ImageIO's
  *     (GIF89a, interlaced) output pixel-exact. Two implementations
  *     that never shared code agreeing on the bitstream is the
  *     strongest "this is the real format" evidence available in-container.
  *  4. FAILURES — bad signature, truncated stream, a local color table,
  *     and an out-of-dictionary code must each fail loudly.
  */
class GifCodecSpec extends SparkSpec {

  private val rnd = new scala.util.Random(7)

  private def roundtrip(w: Int, h: Int, data: Array[Byte]): Unit = {
    val dec = decodeGif(encodeGif(w, h, data))
    assert(dec.width == w && dec.height == h && dec.channels == 1)
    assert(dec.pixels.length == w * h)
    var i = 0
    while (i < data.length) {
      assert(dec.pixels(i) == (data(i) & 0xff), s"pixel $i")
      i += 1
    }
  }

  test("round-trip: constant raster (deep KwKwK chains)") {
    roundtrip(8, 8, Array.fill(64)(7.toByte))
    roundtrip(200, 200, Array.fill(40000)(255.toByte))
  }

  test("round-trip: random rasters incl. dictionary-full CLEAR resets") {
    for ((w, h) <- Seq((16, 16), (64, 64), (200, 200))) {
      val a = new Array[Byte](w * h); rnd.nextBytes(a)
      roundtrip(w, h, a)
    }
  }

  test("round-trip: sizes straddling every code-width boundary") {
    // incompressible-ish data makes code count track pixel count, so
    // these cross the 9→10→11-bit width bumps at every offset
    for (n <- Seq(253, 254, 255, 256, 509, 510, 511, 512, 513,
        765, 766, 767, 768, 1021, 1022, 1023, 1024, 1025))
      roundtrip(n, 1, Array.tabulate(n)(i => ((i * 131) % 251).toByte))
  }

  // ── golden bytes: hand-packed LZW stream ───────────────────────────────

  test("golden bytes: hand-packed LZW stream incl. KwKwK decodes") {
    // Pixels [5, 5, 5, 5]: encoder emits CLEAR(256), 5, 258 (KwKwK:
    // seq(5)+first(seq(5)) = 5,5), 5, EOI(257) — entry 258=(5,5) is
    // referenced before the decoder has added it.
    //   codes, 9-bit, LSB-first: 256=0b100000000, 5=0b000000101,
    //   258=0b100000010, 5, 257=0b100000001
    //   bit stream (low bit first per byte):
    //   256: 00000000 1 | 5: 00000101 0... packed by hand below:
    //   b0 = 0x00 (low 8 of 256)
    //   b1 = 0x0B (bit0 = 256's bit8=1; bits1..7 = 5's bits0..6 = 0000101 → 0b0000101_1 = 0x0B)
    //   b2 = 0x08 (bits0..1 = 5's bits7..8 = 00; bits2..7 = 258's bits0..5 = 000010 → 0b001000_00 = 0x08)
    //   b3 = 0x14 (bits0..2 = 258's bits6..8 = 001 → val 0b100; bits3..7 = 5's bits0..4 = 00101 → 0b00101_100 = 0x2C)
    //   recompute: 258 = 0b100000010; bits6..8 = 0,0,1 → stored LSB-first as bit0=bit6(0),bit1=bit7(0),bit2=bit8(1) → 0b...100 = 4
    //   b3 = 4 | (5's bits0..4 = 10100 << 3)?? 5 = 0b000000101, bits0..4 = 1,0,1,0,0 → <<3 gives 0b0101000 = 0x28; b3 = 0x28|0x04 = 0x2C
    //   b4: bits0..3 = 5's bits5..8 = 0000; bits4..7 = 257's bits0..3 = 1000 → 0b0001_0000 = 0x10
    //   b5: bits0..4 = 257's bits4..8 = 00001 → bit4=1 → 0x10
    val codes = Array(0x00, 0x0b, 0x08, 0x2c, 0x10, 0x10).map(_.toByte)
    val out = new ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF87a".getBytes("US-ASCII"))
    u16(4); u16(1)
    out.write(0xf7); out.write(0); out.write(0)
    (0 until 256).foreach(i => { out.write(i); out.write(i); out.write(i) })
    out.write(0x2c); u16(0); u16(0); u16(4); u16(1); out.write(0)
    out.write(8) // min code size
    out.write(codes.length); out.write(codes); out.write(0)
    out.write(0x3b)
    val dec = decodeGif(out.toByteArray)
    assert(dec.width == 4 && dec.height == 1)
    assert(dec.pixels.toSeq == Seq(5, 5, 5, 5))
  }

  // ── interop with the JDK's independent codec ───────────────────────────

  test("interop: JDK ImageIO decodes our bytes pixel-exact") {
    val data = Array.tabulate(16 * 16)(i => ((i * 37 + 11) % 256).toByte)
    val img = ImageIO.read(new ByteArrayInputStream(encodeGif(16, 16, data)))
    assert(img != null && img.getWidth == 16 && img.getHeight == 16)
    for (i <- 0 until 256) {
      val rgb = img.getRGB(i % 16, i / 16)
      val want = data(i) & 0xff
      assert((rgb & 0xff) == want && ((rgb >> 8) & 0xff) == want &&
        ((rgb >> 16) & 0xff) == want, s"pixel $i")
    }
  }

  test("interop: we decode JDK ImageIO output (GIF89a, interlaced)") {
    val bi = new BufferedImage(16, 16, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 16; x <- 0 until 16)
      bi.getRaster.setSample(x, y, 0, (x * 16 + y * 3) % 256)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(bi, "gif", bos)
    val dec = decodeGif(bos.toByteArray)
    assert(dec.width == 16 && dec.height == 16)
    for (i <- 0 until 256)
      assert(dec.pixels(i) == bi.getRaster.getSample(i % 16, i / 16, 0),
        s"pixel $i")
  }

  test("generic dispatch routes GIF magic") {
    val enc = encodeGif(4, 2, Array.tabulate(8)(_.toByte))
    val dec = ImageCodec.decode(enc)
    assert(dec.channels == 1 && dec.width == 4 && dec.height == 2)
  }

  // ── loud failures ──────────────────────────────────────────────────────

  test("corrupt payloads fail loudly") {
    val good = encodeGif(8, 8, Array.fill(64)(9.toByte))
    // bad signature
    val badSig = good.clone(); badSig(4) = '6'
    intercept[IllegalArgumentException](decodeGif(badSig))
    // truncated
    intercept[IllegalArgumentException](decodeGif(good.take(40)))
    // local color table flag on the image descriptor
    val lct = good.clone()
    val idOff = 6 + 7 + 768 // header + LSD + GCT
    assert(lct(idOff) == 0x2c)
    lct(idOff + 9) = 0x80.toByte
    intercept[IllegalArgumentException](decodeGif(lct))
    // a code beyond the dictionary: hand-build with first code = 300
    // (non-root before any entries exist)
    val out = new ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF87a".getBytes("US-ASCII")); u16(1); u16(1)
    out.write(0xf7); out.write(0); out.write(0)
    (0 until 256).foreach(i => { out.write(i); out.write(i); out.write(i) })
    out.write(0x2c); u16(0); u16(0); u16(1); u16(1); out.write(0); out.write(8)
    // 256 (CLEAR) then 300: 9-bit LSB-first: 0x00, (1 | 300.bits0..6<<1):
    // 300 = 0b100101100 → bits0..6 = 0101100(=0x2C)... b1 = 1 | (0x2C<<1) = 0x59
    // b2 = 300.bits7..8 = 0b10 → 0x02
    out.write(3); out.write(Array(0x00, 0x59, 0x02).map(_.toByte)); out.write(0)
    out.write(0x3b)
    intercept[IllegalArgumentException](decodeGif(out.toByteArray))
  }
}
