package graft.functions

import java.util.zip.{CRC32, Deflater}

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.ImageCodec.decode
import graft.functions.PngCodec.{decodePng, encodePng}

/** The PNG codec, pinned the same three ways as [[ImageCodecSpec]]:
  *
  *  1. GOLDEN BYTES — chunks laid out by hand with HAND-FILTERED
  *     scanlines (the filtered byte values are computed in comments, not
  *     by our `filterRow`), so an encoder/decoder bug pair in the filter
  *     math can't cancel out. Covers Sub, Up, Average (incl. the floor),
  *     and Paeth (incl. a tie-break case).
  *  2. ROUND-TRIPS — encode→decode identity for gray + RGB across sizes;
  *     heights ≥ 5 exercise all five cycling filter types.
  *  3. FAILURES — a flipped IDAT byte (CRC), bit depth 16, Adam7
  *     interlace, an out-of-range scanline filter type, a truncated
  *     stream, and an unknown critical chunk must each fail loudly;
  *     a split IDAT and an ancillary tEXt chunk must not.
  */
class PngCodecSpec extends SparkSpec {
  import spark.implicits._

  // ── manual chunk plumbing (independent of the encoder) ─────────────────

  private val Sig = Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte)

  private def be32(v: Int): Array[Byte] = Array(
    (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  private def chunk(ctype: String, data: Array[Byte]): Array[Byte] = {
    val t = ctype.getBytes("US-ASCII")
    val c = new CRC32(); c.update(t); c.update(data)
    be32(data.length) ++ t ++ data ++ be32(c.getValue.toInt)
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater(); d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](4096)
    while (!d.finished()) out.write(tmp, 0, d.deflate(tmp))
    d.end(); out.toByteArray
  }

  private def ihdr(w: Int, h: Int, depth: Int, colorType: Int,
      interlace: Int = 0): Array[Byte] =
    be32(w) ++ be32(h) ++
      Array[Byte](depth.toByte, colorType.toByte, 0, 0, interlace.toByte)

  private def png(w: Int, h: Int, colorType: Int,
      filtered: Array[Byte]): Array[Byte] =
    Sig ++ chunk("IHDR", ihdr(w, h, 8, colorType)) ++
      chunk("IDAT", deflate(filtered)) ++ chunk("IEND", Array.emptyByteArray)

  // ── 1. golden bytes: hand-filtered scanlines ───────────────────────────

  test("golden gray PNG: Sub then Paeth scanlines reconstruct by hand-math") {
    // raw rows: [10, 30] / [15, 20], bpp = 1
    // row0 Sub:   filt = [10-0, 30-10]              = [10, 20]
    // row1 Paeth: x0 pred = up(10)        → 15-10   = 5
    //             x1 p = 15+30-10 = 35 → pred up(30) → 20-30 = -10 ≡ 246
    val d = decodePng(png(2, 2, 0,
      Array[Byte](1, 10, 20, 4, 5, 246.toByte)))
    assert(d.width == 2 && d.height == 2 && d.channels == 1)
    assert(d.pixels.toSeq == Seq(10, 30, 15, 20))
  }

  test("golden gray PNG: Up and Average (floor) scanlines") {
    // raw rows: [100, 50, 25] / [60, 70, 80] / [61, 71, 81]
    // row0 None: [100, 50, 25]
    // row1 Average: [60-(0+100)/2, 70-(60+50)/2, 80-(70+25)/2] = [10, 15, 33]
    // row2 Up:      [61-60, 71-70, 81-80]                      = [1, 1, 1]
    val d = decodePng(png(3, 3, 0, Array[Byte](
      0, 100, 50, 25,
      3, 10, 15, 33,
      2, 1, 1, 1)))
    assert(d.pixels.toSeq == Seq(100, 50, 25, 60, 70, 80, 61, 71, 81))
  }

  test("golden RGB PNG: Sub steps by the 3-byte pixel, not by sample") {
    // one row, two RGB pixels: (200, 10, 20) (210, 15, 30), bpp = 3
    // Sub: first pixel verbatim; second = [210-200, 15-10, 30-20] = [10, 5, 10]
    val d = decodePng(png(2, 1, 2,
      Array[Byte](1, 200.toByte, 10, 20, 10, 5, 10)))
    assert(d.channels == 3)
    assert(d.pixels.toSeq == Seq(200, 10, 20, 210, 15, 30))
  }

  test("Paeth tie-break prefers left over up over up-left") {
    // raw rows (gray): [8, 8] / [8, x] — for x: a=8 (left), b=8 (up),
    // c=8 (up-left) → p=8, all distances 0 → predictor = a (left) = 8
    // encode raw x = 12 → filt = 12 - 8 = 4
    val d = decodePng(png(2, 2, 0, Array[Byte](0, 8, 8, 4, 0, 4)))
    assert(d.pixels.toSeq == Seq(8, 8, 8, 12))
  }

  // ── 2. round-trips ─────────────────────────────────────────────────────

  private def raster(n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((i * 37 + 201) % 256).toByte) // crosses 127

  test("RGB round-trip across sizes; h≥5 cycles all five filters") {
    for ((w, h) <- Seq((1, 1), (3, 5), (8, 8), (5, 7))) {
      val rgb = raster(w * h * 3)
      val d = decode(encodePng(w, h, 3, rgb)) // via the magic-sniff dispatch
      assert(d.width == w && d.height == h && d.channels == 3)
      assert(d.pixels.toSeq == rgb.map(_ & 0xff).toSeq, s"${w}x$h")
    }
  }

  test("gray round-trip (color type 0)") {
    val g = raster(6 * 6)
    val d = decodePng(encodePng(6, 6, 1, g))
    assert(d.channels == 1 && d.pixels.toSeq == g.map(_ & 0xff).toSeq)
  }

  test("split IDAT: the zlib stream may span chunks") {
    val filtered = Array[Byte](0, 100, 50, 25, 2, 1, 1, 1) // 3×2 gray
    val z = deflate(filtered)
    val (za, zb) = z.splitAt(z.length / 2)
    val bytes = Sig ++ chunk("IHDR", ihdr(3, 2, 8, 0)) ++
      chunk("IDAT", za) ++ chunk("IDAT", zb) ++
      chunk("IEND", Array.emptyByteArray)
    assert(decodePng(bytes).pixels.toSeq == Seq(100, 50, 25, 101, 51, 26))
  }

  test("ancillary chunks are skipped; unknown critical chunks fail") {
    val base = Sig ++ chunk("IHDR", ihdr(1, 1, 8, 0)) ++
      chunk("tEXt", "comment".getBytes("US-ASCII")) ++
      chunk("IDAT", deflate(Array[Byte](0, 42))) ++
      chunk("IEND", Array.emptyByteArray)
    assert(decodePng(base).pixels.toSeq == Seq(42))
    val critical = Sig ++ chunk("IHDR", ihdr(1, 1, 8, 0)) ++
      chunk("ZZZZ", Array[Byte](1)) ++
      chunk("IDAT", deflate(Array[Byte](0, 42))) ++
      chunk("IEND", Array.emptyByteArray)
    intercept[IllegalArgumentException](decodePng(critical))
  }

  // ── 3. failures: wrong CRC / depth / interlace / filter must be loud ───

  test("a flipped IDAT byte fails the CRC check") {
    val ok = encodePng(4, 4, 3, raster(48))
    val bad = ok.clone()
    // flip one byte inside the IDAT payload (signature 8 + IHDR 25 +
    // IDAT length/type 8 puts the payload at offset 41+)
    bad(45) = (bad(45) ^ 0x40).toByte
    val e = intercept[IllegalArgumentException](decodePng(bad))
    assert(e.getMessage.contains("CRC"), e.getMessage)
  }

  test("bit depth 16 is rejected") {
    val bytes = Sig ++ chunk("IHDR", ihdr(1, 1, 16, 0)) ++
      chunk("IDAT", deflate(Array[Byte](0, 1, 2))) ++
      chunk("IEND", Array.emptyByteArray)
    val e = intercept[IllegalArgumentException](decodePng(bytes))
    assert(e.getMessage.contains("bit depth"), e.getMessage)
  }

  test("Adam7 interlace is rejected, palette color type is rejected") {
    val interlaced = Sig ++ chunk("IHDR", ihdr(1, 1, 8, 0, interlace = 1)) ++
      chunk("IDAT", deflate(Array[Byte](0, 1))) ++
      chunk("IEND", Array.emptyByteArray)
    intercept[IllegalArgumentException](decodePng(interlaced))
    val palette = Sig ++ chunk("IHDR", ihdr(1, 1, 8, 3)) ++
      chunk("IDAT", deflate(Array[Byte](0, 1))) ++
      chunk("IEND", Array.emptyByteArray)
    intercept[IllegalArgumentException](decodePng(palette))
  }

  test("out-of-range scanline filter type fails") {
    val e = intercept[IllegalArgumentException](
      decodePng(png(1, 1, 0, Array[Byte](7, 5))))
    assert(e.getMessage.contains("filter type"), e.getMessage)
  }

  test("truncated / oversized zlib payloads fail") {
    // too few raw bytes for the geometry
    intercept[IllegalArgumentException](
      decodePng(png(2, 2, 0, Array[Byte](0, 1, 2)))) // want 2×(1+2)=6
    // too many
    intercept[IllegalArgumentException](
      decodePng(png(1, 1, 0, Array[Byte](0, 1, 0, 2))))
  }

  // ── pipeline parity ────────────────────────────────────────────────────

  private lazy val docs =
    Seq((1L, "the quick brown fox"), (2L, "zebra"), (3L, "Data!"))
      .toDF("doc_id", "text")

  test("stats via PNG equal stats via PPM (format-independent raster)") {
    def stats(fmt: String) = docs
      .withColumn("st", ImageExprs.imageStats(
        ImageExprs.encodeImageFromText(col("text"), fmt, 6, 5)))
      .select($"doc_id", $"st.sum_all", $"st.sum_c0", $"st.row0_sum",
        $"st.px_min", $"st.px_max")
      .collect().map(_.toString).sorted.toSeq
    assert(stats("png") == stats("ppm"))
  }

  test("tEXt chunks: metadata round-trips, pixels unchanged, corruption loud") {
    import graft.functions.PngCodec.{encodePngWithText, textChunkValue}
    val g = raster(4 * 3)
    val withMeta = encodePngWithText(4, 3, 1, g,
      Seq("lang" -> "en", "source" -> "src7"))
    assert(textChunkValue(withMeta, "lang") == "en")
    assert(textChunkValue(withMeta, "source") == "src7")
    assert(textChunkValue(withMeta, "absent") == null)
    // ancillary chunks must not perturb the raster
    assert(decode(withMeta).pixels.toSeq ==
      decodePng(encodePng(4, 3, 1, g)).pixels.toSeq)
    // hand-laid tEXt chunk (not via our encoder) parses too
    val hand = Sig ++ chunk("IHDR", ihdr(1, 1, 8, 0)) ++
      chunk("tEXt", "k".getBytes("ISO-8859-1") ++ Array[Byte](0) ++
        "v".getBytes("ISO-8859-1")) ++
      chunk("IDAT", deflate(Array[Byte](0, 42))) ++
      chunk("IEND", Array.emptyByteArray)
    assert(textChunkValue(hand, "k") == "v")
    // a flipped byte in the tEXt payload fails its CRC on the walk
    val bad = withMeta.clone()
    bad(8 + 25 + 9) = (bad(8 + 25 + 9) ^ 0x01).toByte // inside first tEXt
    intercept[IllegalArgumentException](textChunkValue(bad, "lang"))
  }

  test("png_gray encodeFromText round-trips the codepoint fold") {
    val rows = docs
      .withColumn("px", ImageExprs.decodePixels(
        ImageExprs.encodeImageFromText(col("text"), "png_gray", 4, 3)))
      .select($"text", $"px").collect()
    rows.foreach { r =>
      assert(r.getSeq[Int](1) ==
        ImageCodec.textRaster(r.getString(0), 12).map(_ & 0xff).toSeq)
    }
  }
}
