package graft.functions

import javax.imageio.ImageIO
import java.awt.image.BufferedImage
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the baseline JPEG codec. The load-bearing checks
  * triangulate against the JDK's ImageIO JPEG codec — an INDEPENDENT
  * implementation (libjpeg lineage) that ships with every JVM — in both
  * directions: ImageIO must decode our streams to the same pixels we do
  * (proves the bitstream is real, standards-conforming JFIF), and we
  * must decode ImageIO-encoded streams to the same pixels ImageIO does
  * (proves the decoder handles real-world JFIF it didn't produce). The
  * integer IDCT mirrors the published Loeffler–Ligtenberg–Moshovitz
  * fixed-point factorization, so agreement is BIT-EXACT, asserted as
  * maxdiff 0 — any drift in a constant, a descale shift, or the Huffman
  * tables fails loudly. */
class JpegCodecSpec extends AnyFunSuite {

  private def grayOf(bi: BufferedImage, w: Int, h: Int): Array[Int] =
    Array.tabulate(h * w)(i => bi.getRaster.getSample(i % w, i / w, 0))

  private def rgbOf(bi: BufferedImage, w: Int, h: Int): Array[Int] = {
    val out = new Array[Int](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val p = bi.getRGB(x, y)
      val o = (y * w + x) * 3
      out(o) = (p >> 16) & 0xff; out(o + 1) = (p >> 8) & 0xff
      out(o + 2) = p & 0xff
    }
    out
  }

  private def iioRead(b: Array[Byte]): BufferedImage =
    ImageIO.read(new java.io.ByteArrayInputStream(b))

  test("gray block-constant fixture decodes to the closed DC form, " +
      "uniformly per block") {
    val text = "the quick brown fox JUMPS over 13 lazy dogs!"
    val cps = text.codePoints().toArray
    val jpg = JpegCodec.encodeJpeg(32, 32, 1,
      JpegCodec.grayBlockRaster(text, 4, 4), 50)
    assert(JpegCodec.sniff(jpg))
    val d = JpegCodec.decodeJpeg(jpg)
    assert(d.width === 32 && d.height === 32 && d.channels === 1)
    for (k <- 0 until 16) {
      val v = cps(k % cps.length) % 256
      val f = 8 * (v - 128)
      val dq = JpegCodec.quantize(f, 16) * 16
      val expect = math.max(0, math.min(255, Math.floorDiv(dq + 4, 8) + 128))
      val by = (k / 4) * 8; val bx = (k % 4) * 8
      val got = (for (yy <- 0 until 8; xx <- 0 until 8)
        yield d.pixels((by + yy) * 32 + bx + xx)).distinct
      assert(got === Seq(expect), s"block $k (v=$v)")
    }
  }

  test("ImageIO decodes our gray and 4:4:4 color streams bit-identically " +
      "(general AC path, q85 random rasters)") {
    val rng = new scala.util.Random(7)
    val (w, h) = (24, 16)
    val gray = Array.fill[Byte](w * h)(rng.nextInt(256).toByte)
    val gj = JpegCodec.encodeJpeg(w, h, 1, gray, 85)
    val gd = JpegCodec.decodeJpeg(gj)
    assert(grayOf(iioRead(gj), w, h).toSeq === gd.pixels.toSeq)
    val color = Array.fill[Byte](w * h * 3)(rng.nextInt(256).toByte)
    val cj = JpegCodec.encodeJpeg(w, h, 3, color, 85, subsample420 = false)
    val cd = JpegCodec.decodeJpeg(cj)
    assert(rgbOf(iioRead(cj), w, h).toSeq === cd.pixels.toSeq)
  }

  test("we decode ImageIO-encoded JFIF (independent encoder) bit-identically " +
      "to ImageIO's own decode") {
    val (w, h) = (20, 14)
    val src = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      src.getRaster.setSample(x, y, 0, (x * 9 + y * 13) % 256)
    val bos = new java.io.ByteArrayOutputStream()
    assert(ImageIO.write(src, "jpg", bos), "JDK JPEG writer unavailable")
    val ext = bos.toByteArray
    val d = JpegCodec.decodeJpeg(ext)
    assert(d.width === w && d.height === h && d.channels === 1)
    assert(grayOf(iioRead(ext), w, h).toSeq === d.pixels.toSeq)
  }

  test("4:2:0 constant-color stream agrees with ImageIO (subsampled MCU " +
      "path) and reconstructs near the source color") {
    val (w, h) = (32, 32)
    val raster = new Array[Byte](w * h * 3)
    for (i <- 0 until w * h) {
      raster(3 * i) = 200.toByte; raster(3 * i + 1) = 80.toByte
      raster(3 * i + 2) = 40.toByte
    }
    val jpg = JpegCodec.encodeJpeg(w, h, 3, raster, 50, subsample420 = true)
    val d = JpegCodec.decodeJpeg(jpg)
    // constant image: replication and any interpolating upsampler agree
    assert(rgbOf(iioRead(jpg), w, h).toSeq === d.pixels.toSeq)
    // lossy chain stays close to the source on a constant image
    for (c <- 0 until 3) {
      val srcV = raster(c) & 0xff
      assert(math.abs(d.pixels(c) - srcV) <= 6, s"channel $c drifted")
    }
  }

  test("non-MCU-multiple dims pad on encode and crop on decode") {
    val rng = new scala.util.Random(11)
    val (w, h) = (21, 11)
    val gray = Array.fill[Byte](w * h)(rng.nextInt(256).toByte)
    val jpg = JpegCodec.encodeJpeg(w, h, 1, gray, 75)
    val d = JpegCodec.decodeJpeg(jpg)
    assert(d.width === w && d.height === h)
    assert(grayOf(iioRead(jpg), w, h).toSeq === d.pixels.toSeq)
    val color = Array.fill[Byte](w * h * 3)(rng.nextInt(256).toByte)
    val cj = JpegCodec.encodeJpeg(w, h, 3, color, 75, subsample420 = true)
    val cd = JpegCodec.decodeJpeg(cj)
    assert(cd.width === w && cd.height === h && cd.channels === 3)
  }

  test("quality scaling: lower quality -> smaller stream, table verbatim " +
      "at 50, and decode stays loud on corrupt/unsupported input") {
    assert(JpegCodec.scaledTable(Array.fill(64)(16), 50).forall(_ == 16))
    val rng = new scala.util.Random(3)
    val raster = Array.tabulate[Byte](64 * 64)(i =>
      ((i % 64) * 2 + rng.nextInt(32)).toByte)
    val hi = JpegCodec.encodeJpeg(64, 64, 1, raster, 90)
    val lo = JpegCodec.encodeJpeg(64, 64, 1, raster, 20)
    assert(lo.length < hi.length)
    // a baseline scan script mislabeled SOF2 is MALFORMED progressive
    // (Ss=0 demands Se=0 per G.1) — loud error, never garbage pixels
    val sof0 = hi.indexOfSlice(Seq[Byte](0xff.toByte, 0xc0.toByte))
    assert(sof0 > 0)
    val prog = hi.clone(); prog(sof0 + 1) = 0xc2.toByte
    val e1 = intercept[IllegalArgumentException](JpegCodec.decodeJpeg(prog))
    assert(e1.getMessage.contains("DC scan"))
    // truncated entropy data fails loudly
    val e2 = intercept[IllegalArgumentException](
      JpegCodec.decodeJpeg(hi.take(hi.length - 30)))
    assert(e2.getMessage.contains("jpeg"))
    // and the family dispatcher routes JPEG magic here
    assert(ImageCodec.decode(hi).width === 64)
  }

  // ── progressive (SOF2, T.81 Annex G) ────────────────────────────────────

  private def hasSof2(b: Array[Byte]): Boolean =
    b.indexOfSlice(Seq[Byte](0xff.toByte, 0xc2.toByte)) > 0

  test("progressive reorders losslessly: SOF2 streams decode to pixels " +
      "IDENTICAL to the baseline stream of the same raster") {
    val rng = new scala.util.Random(19)
    for ((w, h) <- Seq((24, 16), (21, 11))) {
      val gray = Array.fill[Byte](w * h)(rng.nextInt(256).toByte)
      val base = JpegCodec.decodeJpeg(JpegCodec.encodeJpeg(w, h, 1, gray, 85))
      val pj = JpegCodec.encodeJpeg(w, h, 1, gray, 85, progressive = true)
      assert(hasSof2(pj), s"${w}x$h gray: no SOF2 marker")
      val pd = JpegCodec.decodeJpeg(pj)
      assert(pd.pixels.toSeq === base.pixels.toSeq, s"${w}x$h gray")
      val color = Array.fill[Byte](w * h * 3)(rng.nextInt(256).toByte)
      for (sub <- Seq(false, true)) {
        val cb = JpegCodec.decodeJpeg(
          JpegCodec.encodeJpeg(w, h, 3, color, 85, subsample420 = sub))
        val cpj = JpegCodec.encodeJpeg(w, h, 3, color, 85,
          subsample420 = sub, progressive = true)
        assert(hasSof2(cpj))
        assert(JpegCodec.decodeJpeg(cpj).pixels.toSeq === cb.pixels.toSeq,
          s"${w}x$h color sub=$sub")
      }
    }
  }

  test("ImageIO decodes our progressive streams bit-identically (proves " +
      "the SOF2 bitstream is standards-conforming)") {
    val rng = new scala.util.Random(23)
    val (w, h) = (24, 16)
    val gray = Array.fill[Byte](w * h)(rng.nextInt(256).toByte)
    val gj = JpegCodec.encodeJpeg(w, h, 1, gray, 85, progressive = true)
    assert(grayOf(iioRead(gj), w, h).toSeq ===
      JpegCodec.decodeJpeg(gj).pixels.toSeq)
    val color = Array.fill[Byte](w * h * 3)(rng.nextInt(256).toByte)
    val cj = JpegCodec.encodeJpeg(w, h, 3, color, 85, subsample420 = false,
      progressive = true)
    assert(rgbOf(iioRead(cj), w, h).toSeq ===
      JpegCodec.decodeJpeg(cj).pixels.toSeq)
  }

  test("we decode ImageIO-written progressive JPEG (independent encoder, " +
      "multi-band scan script with EOB runs) bit-identically to ImageIO") {
    import javax.imageio.{ImageWriteParam, IIOImage}
    def iioProgressive(src: BufferedImage): Array[Byte] = {
      val writer = ImageIO.getImageWritersByFormatName("jpg").next()
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(ImageWriteParam.MODE_DEFAULT)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new IIOImage(src, null, null), param)
      ios.close(); writer.dispose()
      bos.toByteArray
    }
    val (w, h) = (40, 28) // big enough for nontrivial EOB runs
    val gsrc = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      gsrc.getRaster.setSample(x, y, 0, (x * 9 + y * 13 + (x * y) % 7) % 256)
    val gp = iioProgressive(gsrc)
    assert(hasSof2(gp), "JDK writer did not emit SOF2")
    val gd = JpegCodec.decodeJpeg(gp)
    assert(gd.width === w && gd.height === h && gd.channels === 1)
    assert(grayOf(iioRead(gp), w, h).toSeq === gd.pixels.toSeq)
    // color: the JDK writer emits 4:2:0, and the JDK DECODER upsamples
    // 4:2:0 chroma by triangular interpolation ("fancy upsampling")
    // where we use replication — a presentation choice, not an entropy
    // difference. Isolate the progressive entropy path instead: the
    // writer's baseline and progressive streams carry IDENTICAL
    // quantized coefficients, so OUR decode of both must agree pixel
    // for pixel (same upsampler on both sides).
    val csrc = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      csrc.setRGB(x, y, ((x * 37 + y) % 256 << 16) | ((y * 29 + x) % 256 << 8)
        | ((x * y + 11) % 256))
    val cp = iioProgressive(csrc)
    assert(hasSof2(cp))
    val bos = new java.io.ByteArrayOutputStream()
    assert(ImageIO.write(csrc, "jpg", bos))
    val cbase = bos.toByteArray
    assert(!hasSof2(cbase))
    val cd = JpegCodec.decodeJpeg(cp)
    assert(cd.channels === 3)
    assert(JpegCodec.decodeJpeg(cbase).pixels.toSeq === cd.pixels.toSeq)
  }

  test("progressive gray block-constant fixture decodes to the SAME " +
      "closed DC form as the baseline fixture (the m55 oracle)") {
    val text = "the quick brown fox JUMPS over 13 lazy dogs!"
    import org.apache.spark.unsafe.types.UTF8String
    val u = UTF8String.fromString(text)
    val base = JpegCodec.decodeJpeg(
      JpegCodec.encodeGrayBlocksJpeg(u, 4, 4, 50))
    val pj = JpegCodec.encodeGrayBlocksJpegProgressive(u, 4, 4, 50)
    assert(hasSof2(pj))
    assert(JpegCodec.decodeJpeg(pj).pixels.toSeq === base.pixels.toSeq)
    val cbase = JpegCodec.decodeJpeg(
      JpegCodec.encodeColorTilesJpeg(u, 2, 2, 50))
    val cpj = JpegCodec.encodeColorTilesJpegProgressive(u, 2, 2, 50)
    assert(hasSof2(cpj))
    assert(JpegCodec.decodeJpeg(cpj).pixels.toSeq === cbase.pixels.toSeq)
  }

  test("scan-script gaps error loudly (r14 progression audit): a " +
      "refinement with no first scan, AC before DC, and a duplicate " +
      "first scan are all rejected, never decoded to garbage") {
    val rng = new scala.util.Random(7)
    val gray = Array.tabulate[Byte](32 * 32)(i =>
      (((i * 5) % 211) + rng.nextInt(5)).toByte)
    val pj = JpegCodec.encodeJpeg(32, 32, 1, gray, 85, progressive = true)
    // entropy data is byte-stuffed (FF always followed by 00 / RSTn),
    // so FF DA only ever occurs as a real SOS marker
    def sosOffsets(b: Array[Byte]): Seq[Int] = {
      val out = scala.collection.mutable.ArrayBuffer[Int]()
      var i = 2
      while (i + 1 < b.length) {
        if ((b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) == 0xda) out += i
        i += 1
      }
      out.toSeq
    }
    val sos = sosOffsets(pj)
    assert(sos.length === 4) // gray: DC-first, AC-first, DC-ref, AC-ref
    JpegCodec.decodeJpeg(pj) // intact stream decodes
    // (a) excise the AC-first scan → its refinement has no predecessor
    val noAcFirst = pj.take(sos(1)) ++ pj.drop(sos(2))
    val e1 = intercept[IllegalArgumentException](
      JpegCodec.decodeJpeg(noAcFirst))
    assert(e1.getMessage.contains("no first scan"))
    // (b) excise the DC-first scan → AC scan precedes the DC first scan
    val noDcFirst = pj.take(sos(0)) ++ pj.drop(sos(1))
    val e2 = intercept[IllegalArgumentException](
      JpegCodec.decodeJpeg(noDcFirst))
    assert(e2.getMessage.contains("before its DC first scan"))
    // (c) duplicate the AC-first scan → re-establishes a decoded band
    val dup = pj.take(sos(2)) ++ pj.slice(sos(1), sos(2)) ++ pj.drop(sos(2))
    val e3 = intercept[IllegalArgumentException](JpegCodec.decodeJpeg(dup))
    assert(e3.getMessage.contains("duplicate first scan"))
  }
}
